package graft.functions

import graft.SparkSpec
import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** The one-pass minhash kernel must produce BIT-IDENTICAL signatures to
  * the relational shingles → md5-slot-min form the SQL oracles mirror —
  * including the short-document drop and duplicate-window idempotence. */
class MinhashSlotsSpec extends SparkSpec {
  import spark.implicits._

  test("kernel signatures equal the relational shingle form, row for row") {
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "a a a a a a a a"), // duplicate windows — idempotent min
      (3L, "über café naïve 中文 token mix here"),
      (4L, "too short"), // < 3 tokens → no row either way
      (5L, "exactly three tokens")
    ).toDF("doc_id", "text")
    val rel = Dedup.minhashSignature(
      Dedup.shingles(docs, "doc_id", "text", spread = false))
      .orderBy("id").collect()
    val ker = Dedup.minhashFromText(docs, "doc_id", "text")
      .orderBy("id").collect()
    assert(rel.length == ker.length && rel.length == 4)
    rel.zip(ker).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("the kernel participates in whole-stage codegen") {
    val df = spark.range(2)
      .select(array(concat(lit("t"), col("id").cast("string")),
        lit("b"), lit("c"), lit("d")).as("ws"))
      .select(MinhashSlots.minhashSlots(col("ws"), 3).as("ms"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("minhash_slots"), s"expression folded away in:\n$plan")
    assert(df.collect().forall(_.getSeq[Int](0).length == 8))
  }
}
