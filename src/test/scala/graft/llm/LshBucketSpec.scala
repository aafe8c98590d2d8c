package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The compiled map-side bucket build must reproduce the md5-seeded SQL
  * formulation bit-for-bit (that formulation IS the DuckDB oracle) with
  * zero exchanges in its physical plan. */
class LshBucketSpec extends SparkSpec {
  import spark.implicits._

  private lazy val q =
    Similarity.quantized(Tables.embeddings(spark, sf0001)).cache()

  /** The former posexplode + md5 + double-groupBy formulation, kept here
    * as the executable definition the fast path is checked against. */
  private def referenceBuckets(nPlanes: Int): Map[Long, Long] = {
    val comps = q.select(col("vec_id"), posexplode(col("q")).as(Seq("i", "qv")))
    comps
      .select(col("vec_id"), col("i"), col("qv"),
        explode(sequence(lit(0), lit(nPlanes - 1))).as("p"))
      .withColumn("sgn",
        expr("CASE WHEN instr('01234567', substring(md5(concat(CAST(p AS STRING), '_', CAST(i AS STRING))), 1, 1)) > 0 THEN 1 ELSE -1 END"))
      .groupBy("vec_id", "p")
      .agg(sum(col("sgn") * col("qv")).as("proj"))
      .withColumn("bit", when(col("proj") >= 0, 1L).otherwise(0L))
      .groupBy("vec_id").agg(sum(expr("shiftleft(bit, p)")).as("bucket"))
      .as[(Long, Long)].collect().toMap
  }

  test("compiled buckets equal the md5 SQL definition (8 planes)") {
    val fast = Similarity.buckets(q, 8).as[(Long, Long)].collect().toMap
    val ref = referenceBuckets(8)
    assert(fast.nonEmpty && fast == ref)
  }

  test("compiled buckets equal the md5 SQL definition (5 planes)") {
    assert(Similarity.buckets(q, 5).as[(Long, Long)].collect().toMap ==
      referenceBuckets(5))
  }

  test("sign table matches Spark's md5 hex convention") {
    val table = graft.functions.HyperplaneBucket.signTable(8, 64)
    val viaSql = spark.sql(
      """SELECT p, i,
        |  CASE WHEN instr('01234567', substring(md5(concat(CAST(p AS STRING), '_', CAST(i AS STRING))), 1, 1)) > 0
        |  THEN 1 ELSE 0 END AS pos
        |FROM (SELECT explode(sequence(0, 7)) AS p) CROSS JOIN (SELECT explode(sequence(0, 63)) AS i)""".stripMargin)
      .as[(Int, Int, Int)].collect()
    viaSql.foreach { case (p, i, pos) =>
      assert(((table(i) >> p) & 1) == pos, s"sign mismatch at plane=$p dim=$i")
    }
  }

  test("k-means assignment is map-side (no window, no per-vector shuffle)") {
    val cents = Similarity.ivfKmeansCentroids(q, 4, 1)
    val assigned = Similarity.assignNearest(q, cents)
    val plan = assigned.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("Exchange"), plan)
    // every vector gets exactly one centroid, ids within range
    assert(assigned.count() == q.count())
    val cids = assigned.select("cid").distinct().as[Long].collect()
    assert(cids.forall(c => c >= 0 && c < 4))
  }

  test("bucket build plan has zero exchanges (map-side only)") {
    val plan = Similarity.buckets(q, 8).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
    assert(plan.contains("hyperplane_bucket"), plan)
  }
}
