package graft

import org.apache.spark.scheduler._
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Scratch: name the ~0.45-0.55 s floor on sql_local_volume and
  * j3_star_join (DuckDB: 0.06-0.09 s at sf0.1) — per-run job/stage/
  * task counts + scheduler-delay accounting + the executed plan's
  * exchange inventory, min-of-7 warm. Not driver contract.
  * Run on a QUIET host: sbt "runMain graft.ProfFloor [sfDir]". */
object ProfFloor {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation", "region")
      .foreach(t => Tables.read(spark, sfDir, t).count())

    val jobs = new AtomicInteger; val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong // sum of task run times
    val schedDelayMs = new AtomicLong // launch - stage submit, summed
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = { jobs.incrementAndGet(); () }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = { stages.incrementAndGet(); () }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskInfo != null) {
          taskTimeMs.addAndGet(e.taskInfo.duration)
          ()
        }
      }
    })

    for (q <- Seq("sql_local_volume", "j3_star_join")) {
      val fn = SparkEntry.queries(q)
      // warm
      (1 to 2).foreach(_ => fn(spark, sfDir).write.mode("overwrite").format("noop").save())
      val runs = (1 to 7).map { _ =>
        jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        Thread.sleep(150) // let the listener bus drain
        (dt, jobs.get, stages.get, tasks.get, taskTimeMs.get)
      }
      val best = runs.minBy(_._1)
      println(f"[floor] $q%-18s min=${best._1}%6.3f s med=${runs.map(_._1).sorted.apply(3)}%6.3f s " +
        f"jobs=${best._2} stages=${best._3} tasks=${best._4} " +
        f"taskTime=${best._5}ms (wall-parallel ~${best._5 / 32.0}%.0fms)")
      val plan = fn(spark, sfDir).queryExecution.executedPlan.toString
      val nEx = "Exchange".r.findAllIn(plan).length
      val nBc = "BroadcastExchange".r.findAllIn(plan).length
      println(f"[floor] $q%-18s exchanges=${nEx - nBc} broadcasts=$nBc " +
        f"wscg-spans=${"WholeStageCodegen".r.findAllIn(plan).length}")
    }
    spark.stop()
  }
}
