package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Approximate aggregates vs their exact counterparts — the sketches a
  * 100 TB deployment substitutes when exact distinct/quantiles would
  * shuffle too much (documented error bounds, deterministic here). */
class SketchSpec extends SparkSpec {

  test("approx_count_distinct tracks exact counts within rsd") {
    val e = Tables.events(spark, sf0001)
    val r = e.agg(
      countDistinct(col("user_id")).as("exact"),
      approx_count_distinct(col("user_id"), 0.02).as("approx")).collect()(0)
    val (exact, approx) = (r.getLong(0), r.getLong(1))
    assert(math.abs(approx - exact).toDouble / exact < 0.06,
      s"approx $approx vs exact $exact")
  }

  test("approx_percentile brackets the exact median") {
    val li = Tables.lineitem(spark, sf0001)
    val r = li.agg(
      expr("percentile(l_quantity, 0.5)").as("exact"),
      expr("approx_percentile(l_quantity, 0.5, 1000)").as("approx")).collect()(0)
    assert(math.abs(r.getDouble(0) - r.getDouble(1)) <= 1.0)
  }
}
