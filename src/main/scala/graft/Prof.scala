package graft

/** Dev tool: time a subset of registered queries (name prefixes as args)
  * against a scale dir, twice each (cold/warm), printing per-query secs.
  * Run: sbt "runMain graft.Prof /root/testdata/sf0.1 d_ s_ann". */
object Prof {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val prefixes = if (args.length > 1) args.drop(1).toSeq else Seq("")
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.cacheEnabled = true
    Seq("documents", "embeddings").foreach(t => Tables.read(spark, dir, t).count())
    val picks = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => prefixes.exists(n.startsWith) }
    for ((name, fn) <- picks) {
      val t0 = System.nanoTime()
      val c = fn(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $name%-28s ${dt}%8.3f s  rows=$c")
    }
    spark.stop()
  }
}
