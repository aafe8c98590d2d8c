package graft.grid

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{FileSourceScanExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  test("zkey column matches the reference interleave across the domain") {
    val coords = Seq(
      (0, 0), (0, 1), (1, 0), (1, 1), (255, 255), (256, 0),
      (0x7FFFFFFF, 0), (0, 0x7FFFFFFF), (0x7FFFFFFF, 0x7FFFFFFF),
      (48, 64), (12345, 54321)) ++
      (1 to 200).map(i => (i * 7919 % 100000, i * 104729 % 100000))
    val got = coords.toDF("y", "x")
      .select(col("y"), col("x"), ZOrder.zkey(col("y"), col("x")).as("z"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    coords.foreach { case (y, x) =>
      assert(got((y, x)) == ZOrder.zkeyRef(y, x), s"($y, $x)")
      assert(got((y, x)) >= 0L, s"($y, $x) produced a negative key")
    }
    // per-coordinate order is preserved when the other is fixed
    assert(ZOrder.zkeyRef(5, 9) < ZOrder.zkeyRef(6, 9))
    assert(ZOrder.zkeyRef(5, 9) < ZOrder.zkeyRef(5, 10))
    // interleave is a bijection on the sample
    assert(got.values.toSet.size == got.size)
    // out-of-domain coordinates are loud, not garbled keys
    val e = intercept[Exception] {
      Seq((-1, 4)).toDF("y", "x")
        .select(ZOrder.zkey(col("y"), col("x"))).collect()
    }
    assert(e.getMessage.contains("non-negative"))
  }

  /** Sum of rows the parquet scans actually surfaced (i.e. rows in row
    * groups that SURVIVED min/max pruning — skipped groups never
    * produce rows). */
  private def scanRows(df: DataFrame): Long = {
    df.collect()
    def unwrap(p: SparkPlan): Seq[SparkPlan] = p match {
      case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
      case other => other.collectLeaves().flatMap {
        case a: AdaptiveSparkPlanExec => unwrap(a.executedPlan)
        case l => Seq(l)
      }
    }
    val scans = unwrap(df.queryExecution.executedPlan)
      .collect { case f: FileSourceScanExec => f }
    assert(scans.nonEmpty, "no parquet scan in the executed plan")
    scans.map(_.metrics("numOutputRows").value).sum
  }

  test("z-ordered layout prunes a bbox read in BOTH dimensions; row-major only in one") {
    // one date, a 256x256 tile grid, ~2k-row pruning units: the
    // lexicographic layout packs each unit with FULL x-ranges (8
    // complete y rows), so the x predicate can never skip a unit the
    // y predicate kept; the Morton layout packs square-ish regions,
    // so both predicates skip
    val n = 256
    val tiles = spark.range(n.toLong * n).select(
      (col("id") / n).cast("int").as("tile_y"),
      (col("id") % n).cast("int").as("tile_x"),
      col("id").as("v"),
      lit(java.sql.Timestamp.valueOf("1996-01-01 00:00:00")).as("t"),
      lit("chirps").as("collection"))

    val zPath = Files.createTempDirectory("graft-zorder-").toString
    GridStore.writeZOrdered(tiles, zPath, maxRecordsPerFile = 2048)

    val rmPath = Files.createTempDirectory("graft-rowmajor-").toString
    tiles.withColumn("p_date", date_format(col("t"), "yyyy-MM-dd"))
      .repartition(col("collection"), col("p_date"))
      .sortWithinPartitions(
        col("collection"), col("p_date"), col("tile_y"), col("tile_x"))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", 2048L)
      .partitionBy("collection", "p_date").parquet(rmPath)

    def bbox(path: String) = spark.read.parquet(path)
      .filter(col("tile_y").between(96, 127) && col("tile_x").between(96, 127))

    // both layouts agree on the answer
    val expect = (96 to 127).flatMap(y => (96 to 127).map(z => (y, z))).toSet
    for (p <- Seq(zPath, rmPath)) {
      val got = bbox(p).select("tile_y", "tile_x").collect()
        .map(r => (r.getInt(0), r.getInt(1))).toSet
      assert(got == expect, s"wrong bbox content from $p")
    }

    val rmRows = scanRows(bbox(rmPath))
    val zRows = scanRows(bbox(zPath))
    // row-major: y alone selects 32 rows x 256 tiles = 4 full units
    // (8192 rows); z-order: the aligned 32x32 quad is ONE contiguous
    // 1024-key z range, spanning at most 2 units
    assert(rmRows >= 8192, s"row-major scan surfaced only $rmRows rows — " +
      "pruning-unit layout changed, the comparison below is no longer meaningful")
    assert(zRows * 2 <= rmRows,
      s"z-order read $zRows rows vs row-major $rmRows — 2-D pruning lost")
  }
}
