package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Pigeonhole-blocked simhash: identical answer to the quadratic scan,
  * with a plan that never materializes an all-pairs product. */
class SimhashBlockSpec extends SparkSpec {
  import spark.implicits._

  private lazy val sim =
    Dedup.simhash64(
      Dedup.shingles(Tables.documents(spark, sf0001), "doc_id", "text")).cache()

  private def bruteforce(maxDist: Int): Set[(Long, Long, Int)] = {
    val a = sim.select(col("id").as("doc_a"), col("simhash").as("ha"))
    val b = sim.select(col("id").as("doc_b"), col("simhash").as("hb"))
    a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet
  }

  private def blocked(maxDist: Int): Set[(Long, Long, Int)] =
    Dedup.simhashCandidates(sim, maxDist)
      .withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
      .filter(col("hamming") <= maxDist)
      .select("doc_a", "doc_b", "hamming").as[(Long, Long, Int)].collect().toSet

  test("blocked candidates recover exactly the brute-force pairs (d=6)") {
    val bf = bruteforce(6)
    assert(bf.nonEmpty, "fixture has no hamming<=6 pairs; test is vacuous")
    assert(blocked(6) == bf)
  }

  test("blocked candidates recover exactly the brute-force pairs (d=3)") {
    assert(blocked(3) == bruteforce(3))
  }

  test("d_simhash physical plan has no cartesian/nested-loop join") {
    val plan = DedupQueries.queries("d_simhash")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
