package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operator library for training-data pipelines: token
  * counting, quality scoring, language-ID heuristics, fingerprinting.
  * All pure Column expressions (codegen'd, no UDFs) so they run at full
  * scan speed over 100 TB of documents.
  */
object TextAnalysis {

  /** Whitespace word tokens. */
  def words(text: Column): Column = split(trim(text), "\\s+")

  /** Whitespace token count. */
  def tokenCountWs(text: Column): Column = size(words(text))

  /** BPE-ish token count: alpha runs, digit runs, and single punctuation
    * each count as one token (a cheap proxy for byte-pair encoders). */
  def tokenCountRe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** chars/4 heuristic token estimate, exact integer arithmetic. */
  def tokenCountApprox(text: Column): Column =
    ((length(text) + 3) / 4).cast("long")

  /** Count of matches of a regex. */
  def countMatches(text: Column, re: String): Column =
    size(regexp_extract_all(text, lit(re), lit(0)))

  /** Non-distinct word-bigram array over a word-array column (order
    * preserved, multiplicity kept — the DISTINCT shared shingle index
    * cannot serve repetition counts). Shared by the gopher-quality
    * and repetition folds so their bigram construction cannot
    * diverge. */
  def bigramsOf(wsCol: String): Column = expr(
    s"transform(slice($wsCol, 1, size($wsCol) - 1), (x, i) -> concat(x, ' ', $wsCol[i + 1]))")

  /** Number of distinct strings in `arr`, as a per-row fold: boundary
    * count over the sorted array of 64-bit element hashes (primitive
    * sort + compares; equal hash = equal string up to the ~2^-65
    * per-pair xxhash64 collision odds, negligible at per-document
    * cardinalities and the same determinism class as the md5-derived
    * dedup keys everywhere else in this library). Shuffle-free
    * replacement for explode + countDistinct when the answer is
    * per-row. Native kernel (functions/RunStats.scala) — the composed
    * `aggregate(array_sort(transform(...)))` form evaluates its fold
    * lambda interpreted per element, a 2–6× constant on scan-rate ops. */
  def distinctCount(arr: Column): Column =
    graft.functions.StringArrayRunStats.runStats(arr).getField("n_distinct")

  /** Count of the most frequent string in `arr` (0 for empty), as a
    * per-row fold: longest equal run in the sorted element-hash array
    * (same collision reasoning as [[distinctCount]]). Shuffle-free
    * replacement for explode + groupBy + max(count); same native
    * kernel as [[distinctCount]]. */
  def maxRunCount(arr: Column): Column =
    graft.functions.StringArrayRunStats.runStats(arr).getField("max_run")

  /** Normalized fingerprint: md5 of lowercased whitespace-collapsed text
    * (rolling-hash document identity for exact/near-exact dedup). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** The engine's document quality score (t_quality_score's formula,
    * shared with the curation pipelines): stopword density up,
    * punctuation density down, alpha ratio up, clamped to [0, 1].
    * Integer counts + single IEEE divisions so it hashes cross-engine.
    * Counts come from the single-pass byte-scan kernels
    * (functions/TextScan.scala) instead of java.util.regex — identical
    * match semantics (stated per kernel), 5-10× the scan rate. */
  def qualityScore(t: Column): Column = {
    import graft.functions.TextScan
    val nChars = length(t).cast("long")
    val nWords = tokenCountWs(t).cast("long")
    val nAlpha = TextScan.alphaCount(t)
    val nPunct = TextScan.asciiClassCount(t, ".,;:!?")
    val nStop = TextScan.wordSetCounts(lower(t), Seq(stopwords("en")))
      .getItem(0).cast("long")
    least(lit(1.0), greatest(lit(0.0),
      lit(0.25) + nStop.cast("double") / nWords * 2.0
        - nPunct.cast("double") / nChars * 3.0
        + nAlpha.cast("double") / nChars * 0.5))
  }

  /** Language stopword marker lists for the language-ID heuristic. */
  val stopwords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "for"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "un", "una"),
    "de" -> Seq("der", "die", "das", "und", "ist", "ein", "nicht"),
    "fr" -> Seq("le", "les", "des", "une", "est", "et", "dans")
  )

  /** The same lists as `\b`-delimited alternations — the regex twins
    * the DuckDB oracles run (WordSetCounts documents the equivalence). */
  val stopwordRe: Map[String, String] =
    stopwords.map { case (l, ws) => l -> ws.mkString("\\b(", "|", ")\\b") }
  val cjkRe = "[\\u4e00-\\u9fff]"

  /** Heuristic language ID: CJK presence wins, else argmax of stopword
    * hit counts with a fixed tie-break order, 'und' when all zero.
    * All four counts come from ONE token scan (WordSetCounts); the
    * CJK probe is a code-point range scan — no regex on the hot path. */
  def langId(text: Column): Column = {
    import graft.functions.TextScan
    val counts = TextScan.wordSetCounts(lower(text),
      Seq(stopwords("en"), stopwords("es"), stopwords("de"), stopwords("fr")))
    val cEn = counts.getItem(0)
    val cEs = counts.getItem(1)
    val cDe = counts.getItem(2)
    val cFr = counts.getItem(3)
    when(TextScan.cjkCount(text) > 0, "zh")
      .when(cEn + cEs + cDe + cFr === 0, "und")
      .when(cEn >= cEs && cEn >= cDe && cEn >= cFr, "en")
      .when(cEs >= cDe && cEs >= cFr, "es")
      .when(cDe >= cFr, "de")
      .otherwise("fr")
  }
}
