package graft.functions

import graft.SparkSpec
import graft.llm.TextAnalysis
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Parity of the byte-scan kernels with the java.util.regex column
  * forms they replaced — on the real corpus AND on adversarial crafted
  * strings (boundary, backtracking, multi-byte, overlap cases). Spark's
  * regexp_* functions run Java regex, so equality here IS the claimed
  * semantic equivalence. */
class TextScanSpec extends SparkSpec {

  private def reCount(c: org.apache.spark.sql.Column, re: String) =
    size(regexp_extract_all(c, lit(re), lit(0))).cast("long")

  private def crafted: DataFrame = {
    import spark.implicits._
    Seq(
      "the quick brown fox and the lazy dog",
      "la de que el en un una the and",
      "der die das und ist ein nicht",
      "le les des une est et dans",
      "the_and of to in_ is that4 for",  // '_'/digit joins break \b
      "汉字テスト the 汉",
      "", " ", "THE AND OF", "thethe the and theand",
      "a.b,c;d:e!f?g...h", "¡¿punct!?",
      "ünïcödé wörds the and ü",
      "1the and2 3of4 _the the_"
    ).toDF("t")
  }

  test("word-set counts match the \\b-alternation regex on corpus + crafted") {
    val langs = Seq("en", "es", "de", "fr")
    def check(df: DataFrame): Unit = {
      val counts = TextScan.wordSetCounts(lower(col("t")),
        langs.map(TextAnalysis.stopwords(_)))
      val cols = langs.zipWithIndex.flatMap { case (l, i) =>
        Seq(counts.getItem(i).cast("long").as(s"k_$l"),
          reCount(lower(col("t")), TextAnalysis.stopwordRe(l)).as(s"r_$l"))
      }
      val bad = df.select(cols: _*)
        .filter(langs.map(l => col(s"k_$l") =!= col(s"r_$l")).reduce(_ || _))
        .count()
      assert(bad == 0)
    }
    check(crafted)
    check(spark.read.parquet(s"$sf0001/documents.parquet").select(col("text").as("t")))
  }

  test("ascii class / alpha / cjk counts match their regex forms") {
    def check(df: DataFrame): Unit = {
      val bad = df.select(
          TextScan.alphaCount(col("t")).as("ka"),
          length(regexp_replace(col("t"), "[^A-Za-z]", "")).cast("long").as("ra"),
          TextScan.asciiClassCount(col("t"), ".,;:!?").as("kp"),
          reCount(col("t"), "[.,;:!?]").as("rp"),
          TextScan.cjkCount(col("t")).as("kc"),
          reCount(col("t"), TextAnalysis.cjkRe).as("rc"))
        .filter(col("ka") =!= col("ra") || col("kp") =!= col("rp") ||
          col("kc") =!= col("rc"))
        .count()
      assert(bad == 0)
    }
    check(crafted)
    check(spark.read.parquet(s"$sf0001/documents.parquet").select(col("text").as("t")))
  }

  test("langId kernel form equals the regex formula on the corpus") {
    val t = col("text")
    val cEn = reCount(lower(t), TextAnalysis.stopwordRe("en"))
    val cEs = reCount(lower(t), TextAnalysis.stopwordRe("es"))
    val cDe = reCount(lower(t), TextAnalysis.stopwordRe("de"))
    val cFr = reCount(lower(t), TextAnalysis.stopwordRe("fr"))
    val regexPred = when(reCount(t, TextAnalysis.cjkRe) > 0, "zh")
      .when(cEn + cEs + cDe + cFr === 0, "und")
      .when(cEn >= cEs && cEn >= cDe && cEn >= cFr, "en")
      .when(cEs >= cDe && cEs >= cFr, "es")
      .when(cDe >= cFr, "de")
      .otherwise("fr")
    val bad = spark.read.parquet(s"$sf0001/documents.parquet")
      .select(TextAnalysis.langId(t).as("k"), regexPred.as("r"))
      .filter(col("k") =!= col("r")).count()
    assert(bad == 0)
  }
}
