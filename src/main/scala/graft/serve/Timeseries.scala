package graft.serve

import graft.ops.Zonal
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Read-side analysis entry points (reference
  * analysis/timeseries/service.py, §3.3): point and area time-series
  * over the long-form pixel cube. Predicates go bbox-first so they
  * reach the storage layer as sargable filters before any mask work.
  */
object Timeseries {

  /** Nearest-pixel time series at (lat, lon). */
  def point(pixels: DataFrame, lat: Double, lon: Double,
            west: Double, north: Double, pw: Double, ph: Double,
            gridW: Int, gridH: Int): DataFrame = {
    val cx = math.min(gridW - 1, math.max(0, math.floor((lon - west) / pw))).toInt
    val cy = math.min(gridH - 1, math.max(0, math.floor((north - lat) / ph))).toInt
    pixels.filter(col("x") === cx && col("y") === cy)
      .select(col("t"), col("v")).orderBy(col("t"))
  }

  /** Area time-series over a WKT polygon with an aggregation `how` ∈
    * {mean, sum, min, max, std}: bbox prefilter → exact containment →
    * per-timestep reduce (skipna semantics: NULL pixels absent). */
  def area(pixels: DataFrame, wkt: String,
           bbox: (Double, Double, Double, Double), how: String): DataFrame = {
    val (w, s, e, n) = bbox
    val masked = pixels
      .filter(col("lon") >= w && col("lon") < e && col("lat") >= s && col("lat") < n)
      .filter(Zonal.containsPoint(lit(wkt), col("lon"), col("lat")))
    val agg = how match {
      case "mean" => avg(col("v"))
      case "sum" => sum(col("v"))
      case "min" => min(col("v"))
      case "max" => max(col("v"))
      case "std" => stddev_pop(col("v"))
      case other => throw new IllegalArgumentException(s"how=$other")
    }
    masked.groupBy("t").agg(agg.as("value"), count(col("v")).as("n_pixels"))
      .orderBy(col("t"))
  }
}
