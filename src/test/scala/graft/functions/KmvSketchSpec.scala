package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

class KmvSketchSpec extends SparkSpec {

  test("heap keeps the k smallest as a multiset") {
    val h = new KmvHeap(3)
    Seq(9L, 2L, 7L, 2L, 11L, 1L).foreach(h.insert)
    assert(h.kthMin.contains(2L)) // smallest three = {1, 2, 2}
    val h2 = new KmvHeap(3)
    Seq(5L, 4L).foreach(h2.insert)
    assert(h2.kthMin.isEmpty) // below k → None
  }

  test("matches the row_number window form on real data") {
    val k = 8
    val d = spark.read.parquet(s"$sf0001/events.parquet")
      .select(col("event_type"), col("user_id")).distinct()
      .withColumn("u",
        expr("CAST(conv(substring(md5(CAST(user_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val viaWindow = d.withColumn("rn",
        row_number().over(Window.partitionBy("event_type")
          .orderBy(col("u").asc, col("user_id").asc)))
      .filter(col("rn") === k)
      .select(col("event_type"), col("u").as("uk"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val viaSketch = d.groupBy("event_type")
      .agg(KmvSketch.kthMin(col("u"), k).as("uk"))
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(viaSketch.keySet == viaSketch.keySet)
    viaSketch.foreach { case (g, uk) =>
      assert(uk == viaWindow.get(g), s"group $g: sketch=$uk window=${viaWindow.get(g)}")
    }
  }

  test("partition layout cannot perturb the sketch") {
    val base = spark.range(1000).select(
      (col("id") % 4).as("g"),
      expr("CAST(conv(substring(md5(CAST(id AS STRING)), 1, 15), 16, 10) AS BIGINT)").as("u"))
    val r1 = base.repartition(1).groupBy("g")
      .agg(KmvSketch.kthMin(col("u"), 16).as("uk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val r2 = base.repartition(17, col("u")).groupBy("g")
      .agg(KmvSketch.kthMin(col("u"), 16).as("uk")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(r1 == r2)
  }

  test("a15 plan is two-phase aggregation with no window") {
    val df = graft.SparkEntry.queries("a15_kmv_distinct")(spark, sf0001)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"a15 regressed to a window plan:\n$plan")
    assert(plan.contains("ObjectHashAggregate") || plan.contains("SortAggregate"),
      s"expected typed-imperative aggregation in the plan:\n$plan")
  }
}
