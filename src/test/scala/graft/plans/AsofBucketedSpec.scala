package graft.plans

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Evidence for the SCALE.md claim that the native as-of operator's
  * ClusteredDistribution is satisfied by bucketed sources: both sides
  * written bucketed (and sorted) by the key produce an as-of plan with
  * NO shuffle exchange — the composed union+window form always pays a
  * union shuffle regardless of layout. */
class AsofBucketedSpec extends SparkSpec {

  test("bucketed-by-key sides as-of join without a shuffle exchange") {
    val n = 2000L
    val left = spark.range(n).select((col("id") % 50).as("k"),
      (col("id") * 7 % 1000).as("lt"), col("id").as("rowid"))
    val right = spark.range(n / 2).select((col("id") % 50).as("k"),
      (col("id") * 13 % 1000).as("rt"), (col("id") * 3).as("p"))

    resetManagedTables("b_asof_l", "b_asof_r")
    left.write.bucketBy(8, "k").sortBy("k", "lt")
      .mode("overwrite").saveAsTable("b_asof_l")
    right.write.bucketBy(8, "k").sortBy("k", "rt")
      .mode("overwrite").saveAsTable("b_asof_r")

    // force the streaming-merge exec: this spec is about bucketed
    // layout satisfying ITS distribution/ordering (a small right side
    // would otherwise legitimately pick the broadcast exec)
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "-1")
    try {
    val out = AsofJoinNative.asof(spark.table("b_asof_l"),
      spark.table("b_asof_r"), "k", "lt", "rt", Seq("p"))
    assert(out.count() == n)
    val plan = out.queryExecution.explainString(
      org.apache.spark.sql.execution.SimpleMode)
    assert(plan.contains("AsofJoin"), s"native node missing:\n$plan")
    assert(!plan.contains("BroadcastAsofJoin"), s"must use the merge exec:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"bucketed as-of must not shuffle:\n$plan")

    // correctness on the same data: agree with the composed form
    val expected = AsofJoin.asof(spark.table("b_asof_l"),
        spark.table("b_asof_r"), "k", "lt", "rt", Seq("p"))
      .select("rowid", "asof_p").collect()
      .map(r => (r.getLong(0), r.get(1))).toSet
    val got = out.select("rowid", "asof_p").collect()
      .map(r => (r.getLong(0), r.get(1))).toSet
    assert(got == expected)
    } finally spark.conf.set(thrKey, prevThr)
  }
}
