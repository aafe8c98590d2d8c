package graft
import org.apache.spark.scheduler._
import org.apache.spark.sql.functions._

/** Scratch: per-Spark-stage inventory of ONE warm pipelineE2e pass at
  * 1M docs — task counts, wall, task-time sum, shuffle bytes — to diff
  * the r13 ids3 plan against r12's (r12: ~20 s; r13: 50-260 s, same
  * host, interleaved). Run in BOTH trees:
  * SPARK_DRIVER_MEM=48g sbt "runMain graft.ProfStage13" */
object ProfStage13 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val docs = spark.range(n).select(
        col("id").as("doc_id"),
        (col("id") % 3).cast("string").as("source"),
        expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w', pmod(hash(31337 * 100 + i), 65536))))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w',
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i % 20 = 7 THEN -(id * 100 + i)
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 65536)))) END""".stripMargin)
          .as("text"))
      .repartition(32).cache()
    docs.count()

    @volatile var record = false
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        if (record) {
          val si = e.stageInfo
          val wall = (for {s <- si.submissionTime; c <- si.completionTime}
            yield (c - s) / 1000.0).getOrElse(-1.0)
          val m = si.taskMetrics
          rows.add(f"[stg] id=${si.stageId}%4d tasks=${si.numTasks}%4d " +
            f"wall=$wall%8.2fs cpu=${if (m != null) m.executorCpuTime / 1e9 else -1}%9.2fs " +
            f"run=${if (m != null) m.executorRunTime / 1e3 else -1}%9.2fs " +
            f"shW=${if (m != null) m.shuffleWriteMetrics.bytesWritten >> 20 else -1}%6dMB " +
            f"shR=${if (m != null) m.shuffleReadMetrics.totalBytesRead >> 20 else -1}%6dMB " +
            s"name=${si.name.takeWhile(_ != '\n').take(60)}")
        }
      }
    })

    for (pass <- 1 to 2) {
      record = pass == 2
      val t0 = System.nanoTime()
      def stage(name: String, f: () => org.apache.spark.sql.DataFrame) = {
        val s0 = System.nanoTime(); val r = f()
        if (pass == 2) rows.add(f"[pipe-stage] $name%-30s ${(System.nanoTime() - s0) / 1e9}%8.2f s")
        r
      }
      graft.llm.CurationQueries.pipelineE2e(docs, stage)
        .write.mode("overwrite").format("noop").save()
      println(f"[pass$pass] total ${(System.nanoTime() - t0) / 1e9}%8.2f s")
    }
    Thread.sleep(500)
    rows.forEach(println(_))
    spark.stop()
  }
}
