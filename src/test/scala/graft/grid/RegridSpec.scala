package graft.grid

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegridSpec extends SparkSpec {
  import spark.implicits._

  private val srcW = 16; private val srcH = 12
  // weights are quantized to 2^-20: a full 16-tap kernel on values ~100
  // carries at most a few 1e-3 of quantization error
  private val quantTol = 0.01

  private def linearGrid = {
    val rows = for (y <- 0 until srcH; x <- 0 until srcW)
      yield (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        y, x, 2.0 + 3.0 * x + 5.0 * y)
    rows.toDF("t", "y", "x", "v")
  }

  private def checkLinear(out: org.apache.spark.sql.DataFrame,
                          interiorOnly: Boolean) = {
    val rx = srcW / 12.0; val ry = srcH / 9.0
    val withF = out
      .withColumn("fx", (col("xt") + 0.5) * rx - 0.5)
      .withColumn("fy", (col("yt") + 0.5) * ry - 0.5)
    val checked = (if (interiorOnly)
      withF.filter(floor(col("fx")) >= 1 && floor(col("fx")) + 2 <= srcW - 1 &&
                   floor(col("fy")) >= 1 && floor(col("fy")) + 2 <= srcH - 1)
    else withF)
      .withColumn("expect", lit(2.0) + col("fx") * 3.0 + col("fy") * 5.0)
    assert(checked.count() > 20)
    val bad = checked.filter(abs(col("v") - col("expect")) > quantTol)
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("cubic resampling reproduces a linear field (interior, quant precision)") {
    checkLinear(Regrid.cubic(spark, linearGrid, srcW, srcH, 12, 9), interiorOnly = true)
  }

  test("bilinear resampling reproduces a linear field everywhere clamps don't bind") {
    // ratio 4/3 keeps all corners in-bounds, so bilinear is exact on a
    // linear field across the whole target (up to weight quantization)
    checkLinear(Regrid.bilinear(spark, linearGrid, srcW, srcH, 12, 9), interiorOnly = false)
  }

  test("cubic renormalizes around nodata holes and never invents NULLs") {
    val holey = linearGrid.filter(!(col("x") === 8 && col("y") === 6))
    val out = Regrid.cubic(spark, holey, srcW, srcH, 12, 9)
    assert(out.filter(col("v").isNull).isEmpty)
    assert(out.filter(isnan(col("v"))).isEmpty)
  }

  test("bilinear renormalizes around nodata holes") {
    val holey = linearGrid.filter(!(col("x") === 8 && col("y") === 6))
    val out = Regrid.bilinear(spark, holey, srcW, srcH, 12, 9)
    assert(out.filter(col("v").isNull).isEmpty)
    assert(out.filter(isnan(col("v"))).isEmpty)
  }

  test("reprojection probes: a linear-in-grid field survives the warp") {
    // v = 2 + 3x + 5y is integer-valued (the probeResample contract) and
    // linear in the source pixel frame, so the warped value at each
    // target must equal 2 + 3·fx + 5·fy at the target center's
    // back-projected fractional source coordinate.
    val w = 64; val h = 48
    val rows = for (y <- 0 until h; x <- 0 until w)
      yield (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        y, x, (2 + 3 * x + 5 * y).toDouble)
    val grid = rows.toDF("t", "y", "x", "v")
    val probes = Regrid.reprojectProbes(spark, w, h, -180.0, 90.0,
      360.0 / w, 180.0 / h, 48, 32, -18000000.0, 14000000.0, 750000.0, 875000.0)
    val out = Regrid.probeResample(grid, probes)
    val R = graft.ops.Geo.EarthR
    val checked = out
      .withColumn("mx", lit(-18000000.0) + (col("xt") + 0.5) * 750000.0)
      .withColumn("my", lit(14000000.0) - (col("yt") + 0.5) * 875000.0)
      .withColumn("lon", col("mx") / (R * math.Pi / 180.0))
      .withColumn("lat", (atan(exp(col("my") / R)) * 2 - math.Pi / 2) * (180.0 / math.Pi))
      .withColumn("fx", (col("lon") + 180.0) / (360.0 / w) - 0.5)
      .withColumn("fy", (lit(90.0) - col("lat")) / (180.0 / h) - 0.5)
      // skip clamped edges where bilinear extrapolation binds
      .filter(col("fx") >= 0 && col("fx") <= w - 1 && col("fy") >= 0 && col("fy") <= h - 1)
      .withColumn("expect", lit(2.0) + col("fx") * 3.0 + col("fy") * 5.0)
    assert(checked.count() > 500)
    val bad = checked.filter(abs(col("v") - col("expect")) > quantTol)
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("generic-CRS probes (transverse Mercator) reproduce a linear field") {
    val w = 64; val h = 48
    val rows = for (y <- 0 until h; x <- 0 until w)
      yield (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        y, x, (2 + 3 * x + 5 * y).toDouble)
    val grid = rows.toDF("t", "y", "x", "v")
    val inv: (Double, Double) => (Double, Double) = graft.ops.Geo.invTransverseMercator(15.0)
    val probes = Regrid.reprojectProbesGeneric(spark, w, h, -180.0, 90.0,
      360.0 / w, 180.0 / h, 25, 15, -2000000.0, 6000000.0, 160000.0, 200000.0, inv)
    val out = Regrid.probeResample(grid, probes).collect()
      .map(r => (r.getInt(1), r.getInt(2)) -> r.getDouble(3)).toMap
    assert(out.size > 300)
    for (((yt, xt), v) <- out) {
      val (lon, lat) = inv(-2000000.0 + (xt + 0.5) * 160000.0,
        6000000.0 - (yt + 0.5) * 200000.0)
      val fx = (lon + 180.0) / (360.0 / w) - 0.5
      val fy = (90.0 - lat) / (180.0 / h) - 0.5
      if (fx >= 0 && fx <= w - 1 && fy >= 0 && fy <= h - 1)
        assert(math.abs(v - (2 + 3 * fx + 5 * fy)) < quantTol, s"($yt,$xt): $v")
    }
  }

  test("local probe twin matches the distributed generic builder exactly") {
    val inv: (Double, Double) => (Double, Double) = graft.ops.Geo.invTransverseMercator(15.0)
    val dist = Regrid.reprojectProbesGeneric(spark, 64, 48, -180.0, 90.0,
      5.625, 3.75, 25, 15, -2000000.0, 6000000.0, 160000.0, 200000.0, inv)
      .collect() // builder emits (yt, xt, sx, sy, wq); twin yields (yt, xt, sy, sx, wq)
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(3), r.getInt(2), r.getLong(4)))
    val local = Regrid.reprojectProbesLocal(64, 48, -180.0, 90.0,
      5.625, 3.75, 25, 15, -2000000.0, 6000000.0, 160000.0, 200000.0, inv)
    assert(dist.sorted.toSeq == local.sorted)
  }

  test("probe-resample plan: one broadcast join against the grid, no cartesian") {
    for (df <- Seq(Regrid.bilinear(spark, linearGrid, srcW, srcH, 12, 9),
                   Regrid.cubic(spark, linearGrid, srcW, srcH, 12, 9))) {
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"), plan)
      assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(!plan.contains("SortMergeJoin"), plan)
      val nJoins = "BroadcastHashJoin".r.findAllIn(plan).length
      assert(nJoins == 1, s"expected exactly 1 broadcast join, got $nJoins:\n$plan")
    }
  }
}
