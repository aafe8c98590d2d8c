package graft
/** Dev tool: dump formatted plans for key queries (pushdown/broadcast audit). */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("8")
    val dir = "/root/testdata/sf0.01"
    for (name <- Seq("p1_time_filter", "j3_star_join", "j1_zonal_stats", "a3_temporal_aggregate")) {
      println(s"===== $name =====")
      println(SparkEntry.queries(name)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
