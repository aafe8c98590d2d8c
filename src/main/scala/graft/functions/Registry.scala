package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions, so
  * `spark.sql("SELECT haversine_km(a,b,c,d) ...")` works alongside the
  * Column API. Called from Sessions.build; a spark-submit deployment
  * would wire the same registrations through SparkSessionExtensions'
  * injectFunction. */
object Registry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("haversine_km",
      exprs => Haversine(exprs(0), exprs(1), exprs(2), exprs(3)), "scala_udf")
    reg.createOrReplaceTempFunction("tile_stats_partial",
      exprs => TileStatsPartial(exprs.head), "scala_udf")
    reg.createOrReplaceTempFunction("tile_masked_stats",
      exprs => TileMaskedStats(exprs(0), exprs(1)), "scala_udf")
  }
}
