package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RunStatsSpec extends SparkSpec {

  private def trueDistinct = expr("size(array_distinct(ws))").cast("long")
  // O(n²) exact max-multiplicity — fine at spec scale
  private def trueMaxRun(arr: String) = coalesce(
    expr(s"array_max(transform(array_distinct($arr), x -> size(filter($arr, y -> y <=> x))))")
      .cast("long"), lit(0L))

  test("array run stats match exact counts on the corpus") {
    val ws = split(trim(lower(col("text"))), "\\s+")
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), ws.as("ws"))
      .select(col("doc_id"),
        StringArrayRunStats.runStats(col("ws")).as("rs"),
        trueDistinct.as("td"), trueMaxRun("ws").as("tm"))
    val bad = d.filter(col("rs.n_distinct") =!= col("td") ||
      col("rs.max_run") =!= col("tm")).count()
    assert(bad == 0)
  }

  test("fused bigram stats match the composed column forms") {
    val ws = split(trim(lower(col("text"))), "\\s+")
    val d = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), ws.as("ws"))
      .withColumn("bg", graft.llm.TextAnalysis.bigramsOf("ws"))
      .select(col("doc_id"),
        BigramRunStats.bigramStats(col("ws")).as("rs"),
        trueDistinct.as("td"),
        trueMaxRun("bg").as("tbm"),
        size(col("bg")).cast("long").as("tnb"))
    val bad = d.filter(col("rs.n_distinct_words") =!= col("td") ||
      col("rs.max_bigram_run") =!= col("tbm") ||
      col("rs.n_bigrams") =!= col("tnb")).count()
    assert(bad == 0)
  }

  test("edge cases: empty, nulls, singletons") {
    val d = spark.sql(
      """SELECT * FROM VALUES
        |  (array()),
        |  (array(CAST(NULL AS STRING))),
        |  (array(CAST(NULL AS STRING), CAST(NULL AS STRING), 'a')),
        |  (array('a')),
        |  (array('a', 'a', 'a')),
        |  (array('a', 'b', 'a', 'b'))
        |AS t(ws)""".stripMargin)
      .select(StringArrayRunStats.runStats(col("ws")).as("rs"),
        BigramRunStats.bigramStats(col("ws")).as("bs"))
      .collect()
    def rs(i: Int) = (d(i).getStruct(0).getLong(0), d(i).getStruct(0).getLong(1))
    def bs(i: Int) = (d(i).getStruct(1).getLong(0), d(i).getStruct(1).getLong(1),
      d(i).getStruct(1).getLong(2))
    assert(rs(0) == (0L, 0L) && bs(0) == (0L, 0L, 0L))
    assert(rs(1) == (1L, 1L) && bs(1) == (1L, 0L, 0L))
    assert(rs(2) == (2L, 2L)) // two nulls hash equal, 'a' distinct
    assert(bs(2)._3 == 2L)    // (null,null), (null,'a') bigrams
    assert(rs(3) == (1L, 1L))
    assert(rs(4) == (1L, 3L) && bs(4) == (1L, 2L, 2L)) // bigram (a,a) ×2
    assert(rs(5) == (2L, 2L) && bs(5)._2 == 2L && bs(5)._3 == 3L) // (a,b) ×2
  }

  test("kernel runs inside whole-stage codegen") {
    // same discipline as SpanHashSpec: non-foldable input so nothing
    // pre-evaluates; '*(1)' marks the whole-stage-codegen span
    val df = spark.range(10).select(
      StringArrayRunStats.runStats(split(concat(lit("a b c "), col("id")), " ")).as("rs"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"no codegen span in:\n$plan")
    assert(plan.contains("string_array_run_stats"), s"expression folded away in:\n$plan")
    assert(df.collect().length == 10)
  }
}
