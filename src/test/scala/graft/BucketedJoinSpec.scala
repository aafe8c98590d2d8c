package graft

import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claim that corpus-sized equi-joins
  * (PQ codes ⋈ IVF cells on vec_id) co-locate under bucketing: both
  * sides written bucketed by the join key produce a join plan with NO
  * shuffle exchange — at 100 TB that is the difference between a
  * network-bound job and a map-side one. */
class BucketedJoinSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed-by-key tables join without a shuffle exchange") {
    val n = 10000
    val codes = spark.range(n).select(col("id").as("vec_id"),
      (col("id") % 8).cast("int").as("cid"))
    val cells = spark.range(n).select(col("id").as("vec_id"),
      (col("id") % 4).cast("int").as("cell"))
    resetManagedTables("b_codes", "b_cells")
    codes.write.bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("b_codes")
    cells.write.bucketBy(8, "vec_id").sortBy("vec_id")
      .mode("overwrite").saveAsTable("b_cells")

    val joined = spark.table("b_codes").join(spark.table("b_cells"), "vec_id")
    assert(joined.count() == n)
    // inspect AFTER execution so the adaptive plan is final; the
    // explain string sees through AdaptiveSparkPlanExec
    val plan = joined.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed join must not shuffle:\n$plan")

    // control: the same join over unbucketed parquet DOES shuffle —
    // the bucketing, not the data size, removes the exchange
    val dir = java.nio.file.Files.createTempDirectory("graft-unbucketed-").toString
    codes.write.mode("overwrite").parquet(s"$dir/codes")
    cells.write.mode("overwrite").parquet(s"$dir/cells")
    val flat = spark.read.parquet(s"$dir/codes")
      .join(spark.read.parquet(s"$dir/cells"), "vec_id")
    // AQE may broadcast the small side; disable to see the shuffle shape
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val flatPlan = flat.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode)
      assert(flatPlan.contains("Exchange hashpartitioning"),
        s"control join should shuffle:\n$flatPlan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}
