package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** `term_counts` parity: the doc-local kernel must produce exactly the
  * rows of the relational explode → groupBy(doc, word) form it
  * replaces in t_tfidf_topk. */
class TermCountsSpec extends SparkSpec {

  test("kernel (term, tf) pairs equal the explode+groupBy form") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat sat on the mat the end"),
      (2L, "a a a b"),
      (3L, ""),            // split("") = [""] — one empty token, like explode
      (4L, "solo")
    ).toDF("doc_id", "text")
    val ws = split(trim(lower(col("text"))), "\\s+")

    val kernel = docs.select(col("doc_id"),
        explode(TermCounts.termCounts(ws)).as("e"))
      .select(col("doc_id"), col("e.term").as("w"), col("e.tf").as("tf"))
    val relational = docs.select(col("doc_id"), explode(ws).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))

    val k = kernel.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    val r = relational.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).sorted
    assert(k.toSeq == r.toSeq)
    // and the kernel's per-row output is term-sorted (deterministic)
    val row1 = docs.filter(col("doc_id") === 1)
      .select(TermCounts.termCounts(ws)).collect().head
      .getSeq[org.apache.spark.sql.Row](0).map(_.getString(0))
    assert(row1 == row1.sorted)
  }

  test("null token arrays yield null (rows drop at explode, like the old form)") {
    import spark.implicits._
    val docs = Seq((1L, Some("x y")), (2L, None)).toDF("doc_id", "text")
    val ws = split(trim(lower(col("text"))), "\\s+")
    val out = docs.select(col("doc_id"),
      explode(TermCounts.termCounts(ws)).as("e")).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 1L))
  }
}
