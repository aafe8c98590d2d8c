package graft

import org.apache.spark.sql.DataFrame

/** Session-2 (r15 continuation) A/B of the three one-shot plan-shape
  * switches in `graft.endstate.oneShotShape` (StreamCuration):
  *
  *  - fp1x     — stage-1 single fingerprint pass (semi-join on doc_id)
  *  - spanwin  — stage-3 window-min instead of groupBy+join-back
  *  - arrverify — stage-4 per-doc hash-array verification
  *
  * "base" is the shape shipped at the r15 snapshot (conf = "", i.e.
  * every switch off). Protocol: one JVM, 2 warm rounds then N
  * measured, variant order rotated per round, noop sink.
  * Run: tools/run_main.sh graft.ProfEnd15b [dir] [rounds]. */
object ProfEnd15b {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.build("32")

    def withShape[T](v: String)(f: => T): T = {
      spark.conf.set("graft.endstate.oneShotShape", v)
      try f finally spark.conf.unset("graft.endstate.oneShotShape")
    }

    def q(): DataFrame = SparkEntry.queries("d_incremental_endstate")(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val variants: Seq[(String, () => Unit)] = Seq(
      "base" -> (() => withShape("")(noop(q()))),
      "fp1x" -> (() => withShape("fp1x")(noop(q()))),
      "spanwin" -> (() => withShape("spanwin")(noop(q()))),
      "arrverify" -> (() => withShape("arrverify")(noop(q()))),
      "all3" -> (() => withShape("fp1x,spanwin,arrverify")(noop(q()))),
      "all4" -> (() => withShape("fp1x,spanwin,arrverify,k3ids")(noop(q())))
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
          println(f"[prof-end15b] round=${r - 2}%2d $name%-10s $dt%7.3f s")
        }
      }
    }
    println("[prof-end15b] ---- med/min over measured rounds ----")
    for ((name, _) <- variants) {
      val xs = results(name).sorted
      println(f"[prof-end15b] $name%-10s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
