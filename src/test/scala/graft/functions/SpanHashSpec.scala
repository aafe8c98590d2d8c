package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The native one-pass window hasher must be bit-identical to the
  * Column-composed md5(concat_ws(" ", slice(...))) it replaces — the
  * DuckDB oracles hash that exact formulation. */
class SpanHashSpec extends SparkSpec {
  import spark.implicits._

  private def composed(w: Int) =
    transform(sequence(lit(0), size(col("ws")) - w),
      i => md5(concat_ws(" ", slice(col("ws"), i + 1, lit(w)))))

  test("parity with the composed form, including multi-byte UTF-8 tokens") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "über café naïve 中文 tokens mixed with ascii ones here now ok",
      "a b c d e f",
      "exactly five tokens here ok"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
    for (w <- Seq(2, 5, 6)) {
      val both = docs.filter(size(col("ws")) >= w)
        .select(col("id"),
          composed(w).as("a"),
          SpanHashWindows.spanHashWindows(col("ws"), w).as("b"))
        .collect()
      assert(both.nonEmpty)
      both.foreach { r =>
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"w=$w mismatch for id=${r.getLong(0)}")
      }
    }
  }

  test("null tokens are skipped exactly like concat_ws") {
    val docs = spark.range(1).select(array(lit("a"), lit(null).cast("string"),
      lit("c"), lit("d")).as("ws"))
    val both = docs.select(composed(3).as("a"),
      SpanHashWindows.spanHashWindows(col("ws"), 3).as("b")).collect()(0)
    assert(both.getSeq[String](0) == both.getSeq[String](1))
  }

  test("arrays shorter than the window yield an empty array, not null") {
    val out = Seq((1L, Seq("a", "b"))).toDF("id", "ws")
      .select(SpanHashWindows.spanHashWindows(col("ws"), 3).as("h"))
      .collect()(0).getSeq[String](0)
    assert(out.isEmpty)
  }

  test("long form equals conv(substring(md5, 1, 15), 16, 10) of the string form") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog again and again",
      "über café naïve 中文 tokens mixed with ascii ones here now ok",
      "a b c d e f"
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
      .select(col("id"), split(trim(lower(col("text"))), "\\s+").as("ws"))
    for (w <- Seq(2, 5)) {
      val both = docs.filter(size(col("ws")) >= w)
        .select(
          transform(SpanHashWindows.spanHashWindows(col("ws"), w),
            h => conv(substring(h, 1, 15), 16, 10).cast("long")).as("a"),
          SpanHashWindows.spanHashWindowsLong(col("ws"), w).as("b"))
        .collect()
      both.foreach { r =>
        assert(r.getSeq[Long](0) == r.getSeq[Long](1), s"w=$w mismatch")
      }
    }
  }

  test("the expression participates in whole-stage codegen") {
    // build on Range with a non-foldable token so neither
    // ConvertToLocalRelation nor constant folding evaluates the
    // expression before codegen; '*(1)' marks a whole-stage-codegen span
    val df = spark.range(2)
      .select(array(concat(lit("t"), col("id").cast("string")),
        lit("b"), lit("c")).as("ws"))
      .select(SpanHashWindows.spanHashWindows(col("ws"), 2).as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
    assert(plan.contains("span_hash_windows"), s"expression folded away in:\n$plan")
    assert(df.collect().forall(_.getSeq[String](0).length == 2))
  }
}
