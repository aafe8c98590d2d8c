package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** LSH-blocked embedding near-dup sweep: the pigeonhole candidate join
  * must recover exactly the pairs of its definition (same label, bucket
  * hamming <= probeDist, cos >= threshold) with no all-pairs product. */
class NeardupBlockSpec extends SparkSpec {
  import spark.implicits._

  private lazy val q = {
    val base = Similarity.quantized(Tables.embeddings(spark, sf0001))
    base.join(Tables.embeddings(spark, sf0001).select(col("vec_id"), col("label")), "vec_id").cache()
  }

  private def bruteforce(probeDist: Int, minCos: Double): Set[(Long, Long, Long)] = {
    val qb = q.join(Similarity.buckets(q.select("vec_id", "q", "nrm2"), 8), "vec_id")
    val a = qb.select(col("label"), col("vec_id").as("doc_a"), col("q").as("qa"),
      col("nrm2").as("na"), col("bucket").as("ba"))
    val b = qb.select(col("label"), col("vec_id").as("doc_b"), col("q").as("qb"),
      col("nrm2").as("nb"), col("bucket").as("bb"))
    a.join(b, Seq("label")).filter(col("doc_a") < col("doc_b"))
      .filter(expr(s"bit_count(ba ^ bb) <= $probeDist"))
      .withColumn("cos", expr(Similarity.cosExpr))
      .filter(col("cos") >= minCos)
      .select("label", "doc_a", "doc_b").as[(Long, Long, Long)].collect().toSet
  }

  private def blocked(probeDist: Int, minCos: Double): Set[(Long, Long, Long)] =
    Similarity.neardupBlocked(q, "label", 8, probeDist, minCos)
      .select("label", "doc_a", "doc_b").as[(Long, Long, Long)].collect().toSet

  test("blocked sweep equals its brute-force definition (d=2, cos>=0.0)") {
    val bf = bruteforce(2, 0.0)
    assert(bf.nonEmpty, "fixture yields no qualifying pairs; test is vacuous")
    assert(blocked(2, 0.0) == bf)
  }

  test("blocked sweep equals its brute-force definition (d=1, cos>=0.3)") {
    assert(blocked(1, 0.3) == bruteforce(1, 0.3))
  }

  test("s_embed_neardup plan has no cartesian/nested-loop join and joins on bucket blocks") {
    val plan = SimilarityQueries.queries("s_embed_neardup")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(plan.contains("bv"), "join should key on bucket block value:\n" + plan)
  }
}
