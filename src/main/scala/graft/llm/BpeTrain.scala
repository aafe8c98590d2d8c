package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed BPE tokenizer training (Sennrich et al. 2016 — the
  * byte-pair-encoding merge loop every modern tokenizer trainer runs).
  *
  * Scale shape (the fastBPE/HuggingFace-trainer discipline, same as
  * `t_bpe_pairs`): the corpus collapses to the VOCABULARY first — one
  * corpus-sized word-count aggregation — and every training round runs
  * over distinct words weighted by count, so per-round cost is
  * vocabulary-sized regardless of corpus size. The driver loop is
  * bounded by the requested merge count (a config-scale constant, like
  * the IVF k-means iterations); each round's argmax pulls ONE row to
  * the driver. Per-round state is persisted eagerly so the plan never
  * grows with the round number.
  *
  * Pair counting counts overlapping occurrences ("aaa" contributes
  * (a,a) twice) and merge application is leftmost-greedy
  * non-overlapping ("aaa" + (a,a) → ["aa","a"]) — the reference
  * semantics of the original implementation.
  */
object BpeTrain {

  /** One trained merge: rank is the round (0-based), pair (a, b)
    * concatenates to the new token. */
  final case class Merge(rank: Int, a: String, b: String)

  /** Seed tokenization: one token per Unicode CODE POINT. Splitting by
    * UTF-16 char would break surrogate pairs (emoji, CJK extensions)
    * into lone surrogates, which do not survive Spark's UTF-8 row
    * encoding — distinct characters would collapse into '?' pairs and
    * trained tokens would no longer reconstruct their words. */
  def charTokens(w: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out += new String(Character.toChars(cp))
      i += Character.charCount(cp)
    }
    out.result()
  }

  /** The trainer's deterministic tie-break order: UTF-8 byte order —
    * what Spark's binary string collation sorts by. (Java String
    * ordering differs for supplementary vs U+E000..U+FFFF characters;
    * pinning the bytes keeps driver-side reimplementations honest.) */
  val tokenOrder: Ordering[String] = (a: String, b: String) => {
    val ab = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val bb = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(ab.length, bb.length)
    var r = 0
    while (i < n && r == 0) { r = (ab(i) & 0xff) - (bb(i) & 0xff); i += 1 }
    if (r != 0) r else ab.length - bb.length
  }

  /** Leftmost-greedy non-overlapping application of ONE merge to a
    * token sequence. */
  def applyMerge(toks: IndexedSeq[String], a: String, b: String): IndexedSeq[String] = {
    val out = IndexedSeq.newBuilder[String]
    var i = 0
    while (i < toks.length) {
      if (i + 1 < toks.length && toks(i) == a && toks(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += toks(i); i += 1 }
    }
    out.result()
  }

  /** Tokenize one word with a trained merge list (rank order). */
  def encode(word: String, merges: Seq[Merge]): IndexedSeq[String] =
    merges.sortBy(_.rank).foldLeft(charTokens(word)) {
      (ts, m) => applyMerge(ts, m.a, m.b)
    }

  /** Train `nMerges` merges over a (word, count) vocabulary frame.
    *
    * @param wordCounts columns (w: string, c: long) — the output shape
    *                   of a corpus word-count aggregation
    * @return the merge table in training order plus the final
    *         tokenized vocabulary (w, toks, c)
    */
  def train(wordCounts: DataFrame, nMerges: Int): (Seq[Merge], DataFrame) = {
    val spark = wordCounts.sparkSession
    import spark.implicits._

    // seed: every word as its character sequence, vocabulary-sized.
    // localCheckpoint (eager) rather than persist: an iterative loop
    // that persists each round nests every prior round's cached plan
    // inside the next one's — the plan tree (and the cache-name
    // treeString Spark renders for it) grows quadratically with the
    // merge count until the plan STRING alone OOMs the driver (caught
    // by SoakBpe at 24 merges). Checkpointing truncates the lineage to
    // the materialized blocks, so every round's plan is one map over a
    // LogicalRDD regardless of rank.
    var vocab: Dataset[(String, Seq[String], Long)] = wordCounts
      .select(col("w"), col("c").cast("long"))
      .as[(String, Long)]
      .map { case (w, c) => (w, charTokens(w): Seq[String], c) }
      .localCheckpoint()

    val merges = Seq.newBuilder[Merge]
    var rank = 0
    var exhausted = false
    while (rank < nMerges && !exhausted) {
      // adjacent-pair counts weighted by word count (overlap counted);
      // vocabulary-sized explode + one hash aggregation
      val best = vocab.flatMap { case (_, ts, c) =>
        (0 until ts.length - 1).map(i => ((ts(i), ts(i + 1)), c))
      }.groupByKey(_._1).mapValues(_._2).reduceGroups(_ + _)
        .map { case ((a, b), n) => (a, b, n) }
        .toDF("a", "b", "n")
        // deterministic argmax: count desc, then pair in UTF-8 byte
        // order ([[tokenOrder]] — Spark's binary string collation) —
        // the tie-break every reproducible trainer fixes
        .orderBy(col("n").desc, col("a").asc, col("b").asc)
        .head(1)
      if (best.isEmpty || best(0).getLong(2) < 2) exhausted = true
      else {
        val (a, b) = (best(0).getString(0), best(0).getString(1))
        merges += Merge(rank, a, b)
        vocab = vocab.map { case (w, ts, c) =>
          (w, applyMerge(ts.toIndexedSeq, a, b): Seq[String], c)
        }.localCheckpoint() // eager: truncate lineage to one round
        rank += 1
      }
    }
    val out = vocab.toDF("w", "toks", "c")
    (merges.result(), out)
  }

  /** Corpus → (word, count) vocabulary frame, the trainer's input:
    * the ONLY corpus-sized aggregation in the whole training run. */
  def vocabOf(spark: SparkSession, docs: DataFrame): DataFrame =
    docs.select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
      .filter(length(col("w")) >= 1)
      .groupBy("w").agg(count(lit(1)).as("c"))
}
