package graft

import org.apache.spark.sql.DataFrame

/** Round-15 decomposition of `d_incremental_endstate`'s residual (the
  * suite's #1 row: driver 3.77 s, recorded 2.99 s, vs a 1.34 s DuckDB
  * oracle). After the r14 sh+bands fold the one-shot form is TWO jobs:
  * the k3 localCheckpoint (stages 1-3: fingerprint dedup, quality gate,
  * stale-span anti-join) and the final kept job (stage 4: minhash/LSH/
  * verify + anti-join). The variants separate the remaining suspects:
  *
  *  - foldNone: the r13 every-boundary shape (regression guard for the
  *    r14 fold — VERDICT #9 asked for one re-measure as AQE evolves);
  *  - aqeOff: is the residual AQE re-planning latency per exchange?
  *    (11 exchanges in the final job; each pays a runtime re-optimize
  *    round-trip at this data size) — NOT a shippable config (AQE is
  *    load-bearing at scale: coalescing, skew, runtime BHJ), purely a
  *    floor attribution probe;
  *  - initNarrow: wide-start initialPartitionNum (cores*8 = 256) vs
  *    cores — does the wide start cost map-output registration /
  *    coalescing work at bench scale? (SCALE.md r11 measured the wide
  *    start WINNING >1M docs; this checks what it costs at 500 docs.)
  *
  * Protocol: one JVM, 2 warm rounds then N measured, variant order
  * rotated per round, noop sink. Run:
  * tools/run_main.sh graft.ProfEnd15 [dir] [rounds]. */
object ProfEnd15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.build("32")

    def withConfs[T](kv: (String, String)*)(f: => T): T = {
      val olds = kv.map { case (k, _) => k -> spark.conf.getOption(k) }
      kv.foreach { case (k, v) => spark.conf.set(k, v) }
      try f finally olds.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    def q(): DataFrame = SparkEntry.queries("d_incremental_endstate")(spark, dir)
    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val variants: Seq[(String, () => Unit)] = Seq(
      "shipped" -> (() => noop(q())),
      "foldNone" -> (() =>
        withConfs("graft.endstate.foldOneShot" -> "")(noop(q()))),
      "aqeOff" -> (() =>
        withConfs("spark.sql.adaptive.enabled" -> "false")(noop(q()))),
      "initNarrow" -> (() =>
        withConfs(
          "spark.sql.adaptive.coalescePartitions.initialPartitionNum" -> "32")(
          noop(q())))
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
          println(f"[prof-end15] round=${r - 2}%2d $name%-12s $dt%7.3f s")
        }
      }
    }
    println("[prof-end15] ---- med/min over measured rounds ----")
    for ((name, _) <- variants) {
      val xs = results(name).sorted
      println(f"[prof-end15] $name%-12s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
