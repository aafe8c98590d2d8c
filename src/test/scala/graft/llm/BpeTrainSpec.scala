package graft.llm

import graft.SparkSpec

/** BPE training must reproduce the sequential reference algorithm
  * (Sennrich et al. 2016) exactly: same merges in the same order under
  * the deterministic (count desc, pair asc) tie-break, leftmost-greedy
  * non-overlapping application, overlapping pair counting. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** Independent sequential reference trainer (code-point seeds,
    * UTF-8-byte tie-break — BpeTrain.tokenOrder's contract). */
  private def refTrain(wc: Map[String, Long], nMerges: Int): Seq[(String, String)] = {
    implicit val ord: Ordering[String] = BpeTrain.tokenOrder
    var vocab: Map[String, (IndexedSeq[String], Long)] =
      wc.map { case (w, c) => w -> (BpeTrain.charTokens(w), c) }
    val merges = Seq.newBuilder[(String, String)]
    var done = false
    var k = 0
    while (k < nMerges && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, (ts, c)) <- vocab; i <- 0 until ts.length - 1)
        counts((ts(i), ts(i + 1))) = counts.getOrElse((ts(i), ts(i + 1)), 0L) + c
      if (counts.isEmpty) done = true
      else {
        val ((a, b), n) = counts.toSeq.minBy { case ((a, b), n) => (-n, a, b) }
        if (n < 2) done = true
        else {
          merges += ((a, b))
          vocab = vocab.map { case (w, (ts, c)) =>
            w -> (BpeTrain.applyMerge(ts, a, b), c)
          }
          k += 1
        }
      }
    }
    merges.result()
  }

  test("applyMerge is leftmost-greedy non-overlapping; counting overlaps") {
    assert(BpeTrain.applyMerge(IndexedSeq("a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "a"))
    assert(BpeTrain.applyMerge(IndexedSeq("a", "a", "a", "a"), "a", "a") ==
      IndexedSeq("aa", "aa"))
    assert(BpeTrain.applyMerge(IndexedSeq("x", "a", "b", "y"), "a", "b") ==
      IndexedSeq("x", "ab", "y"))
    assert(BpeTrain.applyMerge(IndexedSeq("a", "b"), "b", "a") ==
      IndexedSeq("a", "b"))
  }

  test("distributed trainer matches the sequential reference on the classic corpus") {
    // includes non-BMP words: U+1F44D/U+1F600 are surrogate PAIRS in
    // UTF-16 — code-point seeding must keep them distinct through
    // Spark's UTF-8 row encoding (char-level splitting would collapse
    // both into lone-surrogate '?' tokens)
    val wc = Map("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L,
      "lowest" -> 2L, "aaaa" -> 4L,
      "👍👍ok" -> 3L, "😀😀ok" -> 2L)
    val df = wc.toSeq.toDF("w", "c")
    val (merges, vocabOut) = BpeTrain.train(df, 10)
    val expect = refTrain(wc, 10)
    assert(merges.map(m => (m.a, m.b)) == expect,
      s"merge sequences diverged:\n got=${merges.map(m => (m.a, m.b))}\n exp=$expect")
    // the returned vocabulary is the encode() of each word
    val got = vocabOut.as[(String, Seq[String], Long)].collect()
      .map { case (w, ts, c) => w -> ((ts, c)) }.toMap
    for ((w, c) <- wc) {
      assert(got(w)._2 == c)
      assert(got(w)._1 == BpeTrain.encode(w, merges), s"word $w")
    }
    // trained tokens reconstruct their words
    for ((w, _) <- wc)
      assert(got(w)._1.mkString == w, s"tokens of $w don't concatenate back")
  }

  test("trains on the real corpus vocabulary; merge count bounded and useful") {
    val docs = graft.Tables.documents(spark, sf0001)
    val vocab = BpeTrain.vocabOf(spark, docs)
    val (merges, out) = BpeTrain.train(vocab, 6)
    assert(merges.length == 6)
    assert(merges.map(m => (m.a, m.b)).distinct.length == 6, "duplicate merges")
    // every merge must actually shorten the corpus tokenization
    val totalToks = out.selectExpr("sum(size(toks) * c)").head().getLong(0)
    val totalChars = out.selectExpr("sum(length(w) * c)").head().getLong(0)
    assert(totalToks < totalChars,
      s"6 merges should compress: $totalToks tokens vs $totalChars chars")
  }
}
