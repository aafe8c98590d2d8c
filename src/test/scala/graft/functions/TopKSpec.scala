package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.unsafe.types.UTF8String

class TopKSpec extends SparkSpec {

  test("buffer keeps rank order with the (score DESC, term ASC) tie-break") {
    val b = new TopKBuf(3)
    def ins(s: Double, t: String) = b.insert(s, UTF8String.fromString(t))
    ins(1.0, "c"); ins(5.0, "z"); ins(5.0, "a"); ins(2.0, "m"); ins(9.0, "q")
    assert((0 until b.size).map(i => (b.scores(i), b.terms(i).toString)) ==
      Seq((9.0, "q"), (5.0, "a"), (5.0, "z")))
    // below-k groups emit what they have
    val small = new TopKBuf(4)
    small.insert(1.0, UTF8String.fromString("only"))
    assert(small.size == 1)
    // NaN orders ABOVE every value (Spark's sort semantics under
    // DESC), insertion-order independent; NaN ties break on the term
    val n1 = new TopKBuf(2)
    n1.insert(Double.NaN, UTF8String.fromString("n"))
    n1.insert(99.0, UTF8String.fromString("v"))
    val n2 = new TopKBuf(2)
    n2.insert(99.0, UTF8String.fromString("v"))
    n2.insert(Double.NaN, UTF8String.fromString("n"))
    for (b <- Seq(n1, n2)) {
      assert(b.terms(0).toString == "n" && b.scores(0).isNaN)
      assert(b.terms(1).toString == "v")
    }
  }

  test("matches the row_number window form on real data") {
    import spark.implicits._
    val words = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(col("doc_id"), explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).cast("double").as("score"))
    val viaWindow = words.withColumn("rn",
        row_number().over(Window.partitionBy("doc_id")
          .orderBy(col("score").desc, col("w").asc)))
      .filter(col("rn") <= 3)
      .select("doc_id", "w", "score", "rn")
      .as[(Long, String, Double, Int)].collect().toSet
    val viaAgg = words.groupBy("doc_id")
      .agg(TopK.byScore(col("score"), col("w"), 3).as("top"))
      .select(col("doc_id"), posexplode(col("top")))
      .select(col("doc_id"), col("col.term"), col("col.score"),
        (col("pos") + 1).cast("int"))
      .as[(Long, String, Double, Int)].collect().toSet
    assert(viaAgg == viaWindow)
  }

  test("partition layout cannot perturb the result") {
    import spark.implicits._
    val rows = (0 until 500).map { i =>
      ((i % 7).toLong, s"t${i % 40}", ((i * 37) % 23).toDouble)
    }.toDF("g", "term", "score").distinct()
    def run(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(TopK.byScore(col("score"), col("term"), 5).as("top"))
        .select(col("g"), col("top").cast("string"))
        .as[(Long, String)].collect().toMap
    val a = run(rows.repartition(1))
    val b = run(rows.repartition(32))
    assert(a == b)
  }
}
