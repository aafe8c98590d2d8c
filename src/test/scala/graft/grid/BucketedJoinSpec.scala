package graft.grid

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Bucketing: the pre-shuffle that makes repeated big×big joins (fact ×
  * fact, e.g. lineitem×orders or tile-table×tile-table self-joins)
  * exchange-free — both sides land pre-hashed on the join key. */
class BucketedJoinSpec extends SparkSpec {

  test("bucketed tables join without a shuffle exchange") {
    // default warehouse (./spark-warehouse, gitignored) — the dir is a
    // static conf and cannot be repointed on a live session; clear the
    // physical locations too (a fresh in-memory catalog forgets tables
    // from previous JVMs but their directories survive)
    resetManagedTables("li_b", "o_b")
    Tables.lineitem(spark, sf0001)
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_b")
    Tables.orders(spark, sf0001)
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_b")

    val joined = spark.table("li_b")
      .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
    val plan = joined.queryExecution.executedPlan.toString

    // the join itself must not re-shuffle either side
    val joinPart = plan.split("HashAggregate").last
    assert(!joinPart.contains("Exchange hashpartitioning(l_orderkey") &&
      !joinPart.contains("Exchange hashpartitioning(o_orderkey"),
      s"join re-shuffled:\n$plan")
    // and it's still correct
    val direct = Tables.lineitem(spark, sf0001)
      .join(Tables.orders(spark, sf0001), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").agg(sum(col("l_quantity")).as("q"))
    assert(joined.orderBy("o_orderstatus").collect().toSeq ==
      direct.orderBy("o_orderstatus").collect().toSeq)
  }
}
