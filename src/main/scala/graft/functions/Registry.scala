package graft.functions

import org.apache.spark.sql.SparkSession

/** SQL registration for the engine's native expressions, so
  * `spark.sql("SELECT haversine_km(a,b,c,d) ...")` works alongside the
  * Column API. Called from Sessions.build for embedded use; a
  * spark-submit deployment injects the same builders through
  * `graft.GraftExtensions` (spark.sql.extensions). */
object Registry {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    graft.GraftExtensions.builders.foreach { case (name, _, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
