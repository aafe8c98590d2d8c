package graft.grid

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegridSpec extends SparkSpec {
  import spark.implicits._

  private val srcW = 16; private val srcH = 12

  private def linearGrid = {
    val rows = for (y <- 0 until srcH; x <- 0 until srcW)
      yield (java.sql.Timestamp.valueOf("2024-01-01 00:00:00"),
        y, x, 2.0 + 3.0 * x + 5.0 * y)
    rows.toDF("t", "y", "x", "v")
  }

  test("cubic resampling reproduces a linear field exactly (interior)") {
    val out = Regrid.cubic(spark, linearGrid, srcW, srcH, 12, 9)
    val rx = srcW / 12.0; val ry = srcH / 9.0
    val checked = out
      .withColumn("fx", (col("xt") + 0.5) * rx - 0.5)
      .withColumn("fy", (col("yt") + 0.5) * ry - 0.5)
      // interior targets: full 4×4 kernel support
      .filter(floor(col("fx")) >= 1 && floor(col("fx")) + 2 <= srcW - 1 &&
              floor(col("fy")) >= 1 && floor(col("fy")) + 2 <= srcH - 1)
      .withColumn("expect", lit(2.0) + col("fx") * 3.0 + col("fy") * 5.0)
    assert(checked.count() > 20)
    val bad = checked.filter(abs(col("v") - col("expect")) > 1e-9)
    assert(bad.isEmpty, bad.collect().take(3).mkString(","))
  }

  test("cubic renormalizes around nodata holes and never invents NULLs") {
    val holey = linearGrid.filter(!(col("x") === 8 && col("y") === 6))
    val out = Regrid.cubic(spark, holey, srcW, srcH, 12, 9)
    assert(out.filter(col("v").isNull).isEmpty)
    // the neighbourhood of the hole deviates from linear but stays finite
    assert(out.filter(isnan(col("v"))).isEmpty)
  }
}
