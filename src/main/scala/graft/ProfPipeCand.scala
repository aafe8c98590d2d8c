package graft

/** Focused follow-up to ProfPipe14 (r15, VERDICT #9): the 6-variant
  * grid's single folds read "inside noise" on medians but their mins
  * dipped below shipped (1.89-1.97 vs 2.24), which a 5-round grid
  * cannot resolve. Two-variant rotated A/B at higher N settles whether
  * folding the `cand` localCheckpoint (the best single) is a real win
  * under current AQE or tail luck. Same protocol as every Prof main:
  * same JVM, rotated order, noop sink, min/med over N.
  * Run: tools/run_main.sh graft.ProfPipeCand [rounds] */
object ProfPipeCand {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(9)
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()
    val variants: Seq[(String, String)] = Seq(
      ("shipped  ", ""), ("fold-cand", "cand"))
    def run(conf: String): Double = {
      spark.conf.set("graft.pipeline.foldBoundaries", conf)
      val t0 = System.nanoTime()
      SparkEntry.queries("d_pipeline_e2e")(spark, dir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    for (_ <- 1 to 2; (_, c) <- variants) run(c) // warm
    val times = scala.collection.mutable.Map[String, Vector[Double]]()
      .withDefaultValue(Vector.empty)
    for (r <- 0 until rounds) {
      val order = if (r % 2 == 0) variants else variants.reverse
      for ((name, c) <- order) times(name) = times(name) :+ run(c)
    }
    for ((name, _) <- variants) {
      val v = times(name).sorted
      println(f"[pipe-cand] $name med=${v(v.size / 2)}%6.3f min=${v.head}%6.3f " +
        v.map(x => f"$x%.2f").mkString("all=", ",", ""))
    }
    spark.stop()
  }
}
