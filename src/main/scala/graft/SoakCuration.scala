package graft

import graft.streaming.StreamCuration
import org.apache.spark.sql.functions._

/** Incremental-curation soak: a synthetic corpus (seeded exact dups,
  * near-dups, and boilerplate-heavy docs) arrives in N id-ordered
  * batches through the persisted-state pipeline. Prints per-batch
  * wall time and state sizes — the claim under test is that batch
  * cost tracks the BATCH (state joins are equi-key), not the
  * accumulated corpus, and that the final kept set equals the batch
  * run's. Run: sbt "runMain graft.SoakCuration [nDocs] [nBatches]". */
object SoakCuration {
  def main(args: Array[String]): Unit = {
    // 12 batches default: the last batches curate against state ≥ 10×
    // the batch — the regime where any state-sized per-batch cost
    // (shuffle, sort, dedup) would dominate the printed times
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    val nBatches = if (args.length > 1) args(1).toInt else 12
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    // id%50==1 → near-dup of predecessor; id%97==5 → exact dup of a
    // fixed template (spread through the whole id range, so every
    // batch has cross-batch exact dups); ~80 words
    val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        (col("id") % 3).cast("string").as("source"),
        expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | element_at($vocabExpr, pmod(hash(31337 * 100 + i), 64) + 1)))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | element_at($vocabExpr,
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i = 7 THEN -id
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 64) + 1))) END""".stripMargin)
          .as("text"))
      .cache()
    docs.count()
    println(s"[soak-curation] $nDocs docs, $nBatches batches")

    val stateDir = java.nio.file.Files.createTempDirectory("graft-soakcur-").toString
    val per = nDocs / nBatches
    var keptTotal = 0L
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      val lo = b.toLong * per
      val hi = if (b == nBatches - 1) Long.MaxValue else (b + 1).toLong * per
      val tb = System.nanoTime()
      // dedup=false — the hot-path load the streaming runner uses
      val st = StreamCuration.loadState(spark, stateDir, dedup = false)
      val (kept, delta) = StreamCuration.processBatch(
        docs.filter(col("doc_id") >= lo && col("doc_id") < hi), st)
      val nKept = kept.count()
      StreamCuration.saveDeltas(delta, stateDir)
      keptTotal += nKept
      val dtb = (System.nanoTime() - tb) / 1e9
      println(f"[soak-curation] batch $b%2d  ${dtb}%7.2f s  ${per / dtb}%8.0f docs/s  kept=$nKept  state/batch=${b.toDouble}%.0f×")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[soak-curation] incremental total ${dt}%7.2f s  ${nDocs / dt}%8.0f docs/s  kept=$keptTotal")

    val tB = System.nanoTime()
    val batchKept = StreamCuration.endstateBatch(docs).count()
    val dtB = (System.nanoTime() - tB) / 1e9
    println(f"[soak-curation] single-batch      ${dtB}%7.2f s  ${nDocs / dtB}%8.0f docs/s  kept=$batchKept")
    assert(keptTotal == batchKept,
      s"incremental kept $keptTotal != batch kept $batchKept")
    println("[soak-curation] incremental == batch")
    spark.stop()
  }
}
