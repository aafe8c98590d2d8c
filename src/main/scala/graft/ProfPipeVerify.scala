package graft

import org.apache.spark.sql.DataFrame

/** Session-2 (r15 continuation) A/B of `graft.pipeline.verifyShape`
  * on `d_pipeline_e2e`: "exploded" (the shipped r9 distinct-row
  * verification frame) vs "arr" (per-doc hash arrays via
  * Dedup.pairJaccardArrays — no distinct exchange, no per-id size
  * aggregation, candidate-bounded verify exchange only).
  * Protocol: one JVM, 2 warm rounds then N measured, variant order
  * rotated per round, noop sink.
  * Run: tools/run_main.sh graft.ProfPipeVerify [dir] [rounds]. */
object ProfPipeVerify {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 9
    val spark = Sessions.build("32")

    def withConfs[T](kv: (String, String)*)(f: => T): T = {
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally kv.foreach { case (k, _) => spark.conf.unset(k) }
    }
    def withShape[T](v: String)(f: => T): T =
      withConfs("graft.pipeline.verifyShape" -> v)(f)

    def q(): DataFrame = SparkEntry.queries("d_pipeline_e2e")(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    // "arr" (the shipped default) keeps the single-consumer candidate
    // hash frame inline — no shCand checkpoint job; the historical
    // "arrFold" variant (arr + foldBoundaries=shCand) is now identical
    // to it and was retired after the N=15 run confirmed the ordering
    val variants: Seq[(String, () => Unit)] = Seq(
      "exploded" -> (() => withShape("exploded")(noop(q()))),
      "arr" -> (() => withShape("arr")(noop(q())))
    )

    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()

    val results = scala.collection.mutable.Map[String,
      scala.collection.mutable.Buffer[Double]]()
    for (r <- 0 until (rounds + 2)) {
      val order = variants.indices.map(i => (i + r) % variants.size)
      for (i <- order) {
        val (name, run) = variants(i)
        val t0 = System.nanoTime()
        run()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r >= 2) {
          results.getOrElseUpdate(name,
            scala.collection.mutable.Buffer()) += dt
          println(f"[prof-pipev] round=${r - 2}%2d $name%-9s $dt%7.3f s")
        }
      }
    }
    println("[prof-pipev] ---- med/min over measured rounds ----")
    for ((name, _) <- variants) {
      val xs = results(name).sorted
      println(f"[prof-pipev] $name%-9s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
