package graft.grid

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Regridding library (SURVEY F14, reference geoprocessing/regrid.py:
  * 23-70 — resampling ∈ {nearest, bilinear, cubic, average}, NaN in/out).
  * Nearest/average/bilinear ship as verified queries in GridQueries;
  * this file adds cubic convolution (Keys kernel, a = −0.5 — the
  * catmull-rom variant GDAL uses) with NaN-aware weight
  * renormalization, in the single-join plan shape:
  *
  *   targets × 16 (dy,dx) offsets → one equi-join against source pixels
  *   → groupBy target summing w·v and w·valid → safe divide.
  *
  * The kernel weight is evaluated from one shared SQL fragment so the
  * DuckDB oracle reproduces the identical IEEE expression tree.
  */
object Regrid {

  /** Keys cubic kernel w(d), a=−0.5, as a SQL expression over `d` ≥ 0.
    * Shared verbatim between Spark (expr) and the DuckDB oracle. */
  def kernelSql(d: String): String =
    s"""(CASE WHEN $d < 1.0 THEN ((1.5 * $d - 2.5) * $d) * $d + 1.0
       |      WHEN $d < 2.0 THEN ((-0.5 * $d + 2.5) * $d - 4.0) * $d + 2.0
       |      ELSE 0.0 END)""".stripMargin.replace("\n", " ")

  /** Cubic-resample a long-form grid (t,y,x,v) of srcW×srcH onto
    * tgtW×tgtH (same extent). Returns (t, yt, xt, v). */
  def cubic(spark: SparkSession, grid: DataFrame,
            srcW: Int, srcH: Int, tgtW: Int, tgtH: Int): DataFrame = {
    val rx = srcW.toDouble / tgtW; val ry = srcH.toDouble / tgtH
    val targets = spark.range(tgtH).select(col("id").cast("int").as("yt"))
      .crossJoin(spark.range(tgtW).select(col("id").cast("int").as("xt")))
      .withColumn("fx", (col("xt") + 0.5) * rx - 0.5)
      .withColumn("fy", (col("yt") + 0.5) * ry - 0.5)
    val offsets = spark.range(4).select((col("id") - 1).cast("int").as("dy"))
      .crossJoin(spark.range(4).select((col("id") - 1).cast("int").as("dx")))
    val probes = targets.crossJoin(offsets)
      .withColumn("sx", floor(col("fx")).cast("int") + col("dx"))
      .withColumn("sy", floor(col("fy")).cast("int") + col("dy"))
      .filter(col("sx") >= 0 && col("sx") < srcW && col("sy") >= 0 && col("sy") < srcH)
      .withColumn("wx", expr(kernelSql("abs(fx - sx)")))
      .withColumn("wy", expr(kernelSql("abs(fy - sy)")))
      .withColumn("w", col("wx") * col("wy"))
    val ts = grid.select("t").distinct()
    probes.crossJoin(ts)
      .join(grid.withColumnRenamed("t", "gt"),
        col("gt") === col("t") && col("y") === col("sy") && col("x") === col("sx"),
        "inner")
      .groupBy("t", "yt", "xt")
      .agg(sum(col("w") * col("v")).as("num"), sum(col("w")).as("den"))
      .select(col("t"), col("yt"), col("xt"),
        when(col("den") === 0.0, lit(null)).otherwise(col("num") / col("den")).as("v"))
      .filter(col("v").isNotNull)
  }
}
