package graft

import graft.grid.{GridStore, ZOrder}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._

/** Scale soak for the Morton-clustered tile layout: writes a year of a
  * 512x512-tile grid (~96M tile rows at daily cadence would be the
  * real thing; the soak scales the tile count and keeps one date per
  * run unit) both row-major and z-ordered, then measures how many rows
  * the parquet scans actually surface for a bbox read — the 2-D
  * pruning claim at millions of rows, not the spec's 65k.
  * Run: sbt "runMain graft.SoakZorder [tilesPerSide] [dates]".
  */
object SoakZorder {
  def main(args: Array[String]): Unit = {
    val side = if (args.nonEmpty) args(0).toInt else 1024
    val dates = if (args.length > 1) args(1).toInt else 4
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val n = side.toLong * side * dates
    println(f"[soak] zorder layout: $side x $side tiles x $dates dates = $n%,d rows")
    // date = id DIV side² so every date holds the FULL side×side grid
    // (a modulo date would confound the date with tile_x residues and
    // make the per-date grids sparse)
    val tiles = spark.range(n).select(
      ((col("id") / side) % side).cast("int").as("tile_y"),
      (col("id") % side).cast("int").as("tile_x"),
      col("id").as("v"),
      expr(s"timestamp_micros(CAST(id DIV ${side.toLong * side} AS BIGINT) * 86400000000)").as("t"),
      lit("chirps").as("collection"))

    val base = java.nio.file.Files.createTempDirectory("graft-soak-z-").toString
    val t0 = System.nanoTime()
    GridStore.writeZOrdered(tiles, s"$base/z", maxRecordsPerFile = 16384)
    val tz = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    tiles.withColumn("p_date", date_format(col("t"), "yyyy-MM-dd"))
      .repartition(col("collection"), col("p_date"))
      .sortWithinPartitions(
        col("collection"), col("p_date"), col("tile_y"), col("tile_x"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 16384L)
      .partitionBy("collection", "p_date").parquet(s"$base/rm")
    val trm = (System.nanoTime() - t1) / 1e9
    println(f"[soak] write: z-ordered $tz%.1f s, row-major $trm%.1f s " +
      f"(${n / tz / 1e6}%.1f / ${n / trm / 1e6}%.1f M rows/s)")

    def scanRows(df: DataFrame): Long = {
      // collect executes THE SAME QueryExecution whose metrics we read
      // (count()/foreach() build separate plans); the bbox result is
      // bounded (b*b*dates rows), so the driver materialization is safe
      df.collect()
      def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case other => other.collectLeaves().flatMap {
          case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
          case l => Seq(l)
        }
      }
      unwrap(df.queryExecution.executedPlan)
        .collect { case f: FileSourceScanExec => f.metrics("numOutputRows").value }.sum
    }
    // an aligned 1/8-side bbox: z-order covers it with O(1) contiguous
    // key ranges per date; row-major must open every row group whose
    // tile_y range intersects
    val b = side / 8
    def bbox(path: String) = spark.read.parquet(path)
      .filter(col("tile_y").between(b, 2 * b - 1) &&
        col("tile_x").between(b, 2 * b - 1))
    val expect = b.toLong * b * dates
    val got = bbox(s"$base/z").count()
    require(got == expect, s"bbox content wrong: $got vs $expect")
    require(bbox(s"$base/rm").count() == expect)

    val rm = scanRows(bbox(s"$base/rm"))
    val z = scanRows(bbox(s"$base/z"))
    println(f"[soak] bbox ($b x $b of $side): row-major scanned $rm%,d rows, " +
      f"z-ordered $z%,d (${rm.toDouble / z}%.1fx fewer)")
    require(z < rm, "z-order lost its pruning advantage at soak scale")
    spark.stop()
  }
}
