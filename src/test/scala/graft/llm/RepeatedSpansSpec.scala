package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Exact repeated-span detection over hand-built documents where the
  * duplicated windows are known by construction. */
class RepeatedSpansSpec extends SparkSpec {
  import spark.implicits._

  private def w(n: Int, tag: String): String =
    (1 to n).map(i => s"$tag$i").mkString(" ")

  test("a 20-token span shared by two docs is reported once, others not") {
    // docs 1 and 2 share exactly one 20-token run; doc 3 is disjoint.
    val shared = w(20, "s")
    val docs = Seq(
      (1L, s"${w(5, "a")} $shared ${w(5, "b")}"),
      (2L, s"${w(7, "c")} $shared"),
      (3L, w(40, "z"))
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(Dedup.spanHashes(docs, "doc_id", "text", 20))
      .collect()
    assert(out.length == 1)
    val r = out.head
    assert(r.getAs[Long]("n_docs") == 2L)
    assert(r.getAs[Long]("n_occ") == 2L)
    assert(r.getAs[Long]("first_doc") == 1L)
  }

  test("a span repeated twice within ONE doc does not qualify; across docs it counts occurrences") {
    val shared = w(20, "s")
    val docs = Seq(
      // within-doc repeat only (n_docs=1): must NOT appear
      (1L, s"$shared ${w(3, "x")} $shared"),
      (2L, w(30, "q"))
    ).toDF("doc_id", "text")
    assert(Dedup.repeatedSpans(Dedup.spanHashes(docs, "doc_id", "text", 20)).isEmpty)

    // same shape but doc 2 also carries the span: now n_occ counts all 3
    val docs2 = Seq(
      (1L, s"$shared ${w(3, "x")} $shared"),
      (2L, s"${w(4, "q")} $shared")
    ).toDF("doc_id", "text")
    val out = Dedup.repeatedSpans(Dedup.spanHashes(docs2, "doc_id", "text", 20))
      .filter(col("n_occ") === 3).collect()
    assert(out.length == 1 && out.head.getAs[Long]("n_docs") == 2L)
  }

  test("docs shorter than the window emit nothing") {
    val docs = Seq((1L, w(19, "s")), (2L, w(19, "s"))).toDF("doc_id", "text")
    assert(Dedup.spanHashes(docs, "doc_id", "text", 20).isEmpty)
  }

  test("window count per doc is len - w + 1") {
    val docs = Seq((1L, w(25, "u"))).toDF("doc_id", "text")
    assert(Dedup.spanHashes(docs, "doc_id", "text", 20).count() == 6L)
  }
}
