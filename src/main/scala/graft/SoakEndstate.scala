package graft

/** Stage-boundary timing for d_incremental_endstate's batch form.
  * Run with GRAFT_STAGE_TIMING=1:
  *   GRAFT_STAGE_TIMING=1 sbt "runMain graft.SoakEndstate /root/testdata/sf0.1"
  */
object SoakEndstate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()
    for (round <- 1 to 3) {
      println(s"[soak] --- round $round ---")
      val t0 = System.nanoTime()
      graft.streaming.StreamCuration.endstateBatch(Tables.documents(spark, dir))
        .write.mode("overwrite").format("noop").save()
      println(f"[soak] total ${(System.nanoTime() - t0) / 1e9}%.3f s")
    }
    spark.stop()
  }
}
