package graft

/** A/B the one SMJ that survives AQE at runtime (r15 triage: every
  * other sweep-flagged SortMergeJoin rewrites to broadcast once real
  * sizes are known; x2_idempotent_merge's FULL OUTER cannot broadcast).
  * Full-outer ShuffledHashJoin has been supported since Spark 3.1, and
  * the scale-adaptive way to get it is AQE's
  * maxShuffledHashJoinLocalMapThreshold — the rewrite fires only when
  * every post-shuffle partition fits the local map, so a corpus-sized
  * merge at 100 TB keeps SMJ's graceful spill while bench/steady-state
  * partitions skip both sorts. Same-JVM, rotated variant order, noop
  * sink (§1.4), min/med over N rounds.
  *
  * Run: tools/run_main.sh graft.ProfX2 [rounds] */
object ProfX2 {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(7)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Seq("orders").foreach(t => Tables.read(spark, dir, t).count())

    val fn = SparkEntry.queries("x2_idempotent_merge")
    val variants: Seq[(String, () => Unit)] = Seq(
      ("smj-shipped", () => {
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "0")
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      }),
      ("shj-aqe-256m", () => {
        spark.conf.set("spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold", "256m")
        fn(spark, dir).write.mode("overwrite").format("noop").save()
      }))

    // 2 warm rounds, then N measured with rotation
    for (_ <- 1 to 2; (_, run) <- variants) run()
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 0 until rounds) {
      val order = if (r % 2 == 0) variants else variants.reverse
      for ((name, run) <- order) {
        val t0 = System.nanoTime()
        run()
        times(name) = times(name) :+ (System.nanoTime() - t0) / 1e9
      }
    }
    for ((name, _) <- variants) {
      val v = times(name).sorted
      println(f"[prof-x2] $name%-14s med=${v(v.size / 2)}%6.3f min=${v.head}%6.3f n=${v.size}")
    }
    spark.stop()
  }
}
