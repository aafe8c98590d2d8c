package graft

import org.apache.spark.sql.functions._

/** Scale soak for the BPE trainer: merges over a corpus-derived
  * vocabulary, demonstrating the fastBPE discipline — the corpus is
  * scanned ONCE (the word-count aggregation) and every training round
  * is vocabulary-sized regardless of corpus size.
  * Run: sbt "runMain graft.SoakBpe [docs] [merges]".
  */
object SoakBpe {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 200000
    val merges = if (args.length > 1) args(1).toInt else 24
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // synthetic corpus: 220-word docs over a 10k-word Zipf-ish
    // vocabulary (hash-mixed so word boundaries don't confound ranks)
    val docs = spark.range(nDocs).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, 219), i ->
        concat('w', pmod(hash(id * 220 + i), 100) * pmod(hash(id + i * 7), 100))), ' ')""")
        .as("text"))

    val t0 = System.nanoTime()
    val vocab = graft.llm.BpeTrain.vocabOf(spark, docs)
    val nVocab = vocab.count()
    val tv = (System.nanoTime() - t0) / 1e9
    println(f"[soak] corpus $nDocs%,d docs -> $nVocab%,d distinct words in $tv%.1f s " +
      "(the ONLY corpus-sized pass)")

    val t1 = System.nanoTime()
    val (ms, out) = graft.llm.BpeTrain.train(vocab, merges)
    val tt = (System.nanoTime() - t1) / 1e9
    require(ms.length == merges, s"trained ${ms.length} of $merges merges")
    val toks = out.selectExpr("sum(size(toks) * c)").head().getLong(0)
    val chars = out.selectExpr("sum(length(w) * c)").head().getLong(0)
    println(f"[soak] $merges merges in $tt%.1f s (${tt / merges}%.2f s/round, " +
      f"vocabulary-sized); corpus compression ${chars.toDouble / toks}%.2fx " +
      f"($chars%,d chars -> $toks%,d tokens)")
    spark.stop()
  }
}
