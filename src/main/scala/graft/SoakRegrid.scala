package graft

import graft.grid.Regrid
import org.apache.spark.sql.functions._

/** Continental-regrid scale soak (not part of the driver bench): a
  * 7200×3600 global target (0.05° — the real-deployment shape VERDICT
  * r8 flagged as the engine's last forced-broadcast scale-killer) is
  * bilinear-regridded from a 1440×720 source cube WITHOUT any driver
  * materialization: probes build distributed (~104M rows) and the
  * resample join must NOT broadcast a grid-sized side — the soak FAILS
  * if the executed plan contains a BroadcastExchange.
  * Run: sbt "runMain graft.SoakRegrid [timesteps]".
  */
object SoakRegrid {
  def main(args: Array[String]): Unit = {
    val nT = if (args.nonEmpty) args(0).toInt else 2
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val srcW = 1440; val srcH = 720
    val tgtW = 7200; val tgtH = 3600
    println(s"[soak] regrid ${srcW}x$srcH -> ${tgtW}x$tgtH, $nT timesteps " +
      f"(${4L * tgtW * tgtH / 1e6}%.0fM probe rows, ${nT.toLong * tgtW * tgtH / 1e6}%.0fM output px)")

    // deterministic long-form source cube, generated distributed:
    // v = (y*31 + x*17 + t*7) % 1000, ~2% nodata holes
    val grid = spark.range(nT.toLong * srcH * srcW).select(
        (col("id") % nT).cast("int").as("t"),
        ((col("id") / nT) % srcH).cast("int").as("y"),
        (col("id") / nT / srcH).cast("int").as("x"))
      .withColumn("v", when((col("y") * 31 + col("x") * 17 + col("t") * 7) % 50 === 0,
          lit(null).cast("double"))
        .otherwise(((col("y") * 31 + col("x") * 17 + col("t") * 7) % 1000).cast("double")))

    // probes build DISTRIBUTED — no collect, no literal-backing
    val probes = Regrid.bilinearProbes(spark, srcW, srcH, tgtW, tgtH)

    val t0 = System.nanoTime()
    val out = Regrid.probeResample(grid, probes)
      .agg(count(lit(1)).as("n"), sum("v").as("s"))
    val row = out.head()
    val dt = (System.nanoTime() - t0) / 1e9
    val outPx = row.getLong(0)
    println(f"[soak] resample ${dt}%8.2f s  ${outPx / dt / 1e6}%8.1f Mtarget-px/s  (n=$outPx)")

    // plan audit: the probe join must not broadcast EITHER side — at a
    // continental target both sides are data-scale, and the r8 verdict's
    // scale-killer was exactly a forced broadcast(probes)
    val plan = out.queryExecution.executedPlan.toString
    require(!plan.contains("BroadcastExchange"),
      s"regrid soak plan regressed to a broadcast:\n$plan")
    require(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"),
      s"expected a shuffled equi-join on the pixel key:\n$plan")
    println("[soak] plan: shuffled equi-join, no BroadcastExchange — OK")
    spark.stop()
  }
}
