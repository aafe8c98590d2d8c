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
    * Integer counts + single IEEE divisions so it hashes cross-engine. */
  def qualityScore(t: Column): Column = {
    val nChars = length(t).cast("long")
    val nWords = tokenCountWs(t).cast("long")
    val nAlpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("long")
    val nPunct = countMatches(t, "[.,;:!?]").cast("long")
    val nStop = countMatches(lower(t), stopwordRe("en")).cast("long")
    least(lit(1.0), greatest(lit(0.0),
      lit(0.25) + nStop.cast("double") / nWords * 2.0
        - nPunct.cast("double") / nChars * 3.0
        + nAlpha.cast("double") / nChars * 0.5))
  }

  /** Language stopword marker lists for the n-gram language-ID heuristic. */
  val stopwordRe: Map[String, String] = Map(
    "en" -> "\\b(the|and|of|to|in|is|that|for)\\b",
    "es" -> "\\b(el|la|de|que|los|en|un|una)\\b",
    "de" -> "\\b(der|die|das|und|ist|ein|nicht)\\b",
    "fr" -> "\\b(le|les|des|une|est|et|dans)\\b"
  )
  val cjkRe = "[\\u4e00-\\u9fff]"

  /** Heuristic language ID: CJK presence wins, else argmax of stopword
    * hit counts with a fixed tie-break order, 'und' when all zero. */
  def langId(text: Column): Column = {
    val lower_ = lower(text)
    val cEn = countMatches(lower_, stopwordRe("en"))
    val cEs = countMatches(lower_, stopwordRe("es"))
    val cDe = countMatches(lower_, stopwordRe("de"))
    val cFr = countMatches(lower_, stopwordRe("fr"))
    when(countMatches(text, cjkRe) > 0, "zh")
      .when(cEn + cEs + cDe + cFr === 0, "und")
      .when(cEn >= cEs && cEn >= cDe && cEn >= cFr, "en")
      .when(cEs >= cDe && cEs >= cFr, "es")
      .when(cDe >= cFr, "de")
      .otherwise("fr")
  }
}
