package graft

import graft.llm.Similarity
import graft.streaming.StreamIndex
import org.apache.spark.sql.functions._

/** Incremental-SemDeDup soak: a clustered corpus with seeded semantic
  * near-duplicates arrives in N id-ordered batches through
  * [[StreamIndex.semdedupBatch]] (quantizer trained on batch 0 and
  * frozen; k defaults to the Similarity.cellCount ⌈√n⌉ curve, or pass
  * an explicit k as arg 3). Claims under test: per-batch cost tracks
  * the BATCH (the state comparison reads only the touched cells via
  * partition pruning — run with GRAFT_STAGE_TIMING=1 to print the
  * pruned row count per batch — and within-cell pairs are
  * cluster-bounded), and the accumulated drop set equals the one-shot
  * batch answer. `geometry` arg 4: "mixed" scatters every base cluster
  * through every batch (worst case for pruning — each batch touches
  * all cells); "local" gives batches topic-locality (a 1000-id run =
  * one topic), the regime where cell pruning holds the per-batch state
  * read FLAT as the corpus grows — the scale claim the auto-k default
  * exists for.
  * Run: sbt "runMain graft.SoakSemdedup [nVecs] [nBatches] [k|auto] [mixed|local]". */
object SoakSemdedup {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 200000
    val nBatches = if (args.length > 1) args(1).toInt else 10
    val kArg = args.lift(2).filterNot(_ == "auto").map(_.toInt)
      .getOrElse(StreamIndex.Auto)
    val local = args.lift(3).contains("local")
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // SoakIndex's clustered geometry, plus seeded near-dups: every
    // id ≡ 7 (mod 100) is its predecessor's vector with a 2% nudge —
    // ~2k true semantic duplicates per 100k docs, scattered across the
    // id range so drops cross batch boundaries
    // base-cluster key: "mixed" scatters 200 topics across all ids;
    // "local" assigns a fresh topic per 1000-id run (id-ordered batches
    // then have topic locality, so later batches touch fresh cells).
    // The near-dup branch (id % 100 = 7) copies its PREDECESSOR's base.
    def base(e: String) = if (local) s"(($e) DIV 1000)" else s"pmod($e, 200)"
    val emb = spark.range(nVecs).select(col("id").as("vec_id"),
        expr(s"""transform(sequence(0, 63), i ->
          | CAST(CASE WHEN id % 100 = 7 THEN
          |   CAST(pmod(hash(${base("id - 1")} * 64 + i), 2001) - 1000 AS DOUBLE) * 0.9 / 1000.0
          |     + CAST(pmod(hash((id - 1) * 64 + i), 2001) - 1000 AS DOUBLE) * 0.098 / 1000.0
          |     + CAST(pmod(hash(id * 3 + i), 41) - 20 AS DOUBLE) * 0.002 / 1000.0
          | ELSE
          |   CAST(pmod(hash(${base("id")} * 64 + i), 2001) - 1000 AS DOUBLE) * 0.9 / 1000.0
          |     + CAST(pmod(hash(id * 64 + i), 2001) - 1000 AS DOUBLE) * 0.1 / 1000.0
          | END AS FLOAT))""".stripMargin).as("embedding"))
    val q = Similarity.quantized(emb).cache()
    q.count()
    println(s"[soak-semdedup] $nVecs vectors x 64 dims, $nBatches batches, " +
      s"k=${if (kArg > 0) kArg.toString else "auto(" + Similarity.cellCount(nVecs) + ")"} " +
      s"geometry=${if (local) "local" else "mixed"}")

    val inc = java.nio.file.Files.createTempDirectory("graft-soaksdd-inc-").toString
    val per = nVecs / nBatches
    // quantizer pre-trained on a 1-in-10 stratified sample of the FULL
    // id range (the production FAISS train-on-sample step) — without
    // it, first-batch training under "local" drift maps unseen topics
    // onto whichever frozen cells sit nearest and the pruned state
    // read creeps toward corpus-sized
    StreamIndex.trainQuantizer(q.filter(col("vec_id") % 10 === 3), inc,
      k = (if (kArg > 0) kArg else Similarity.cellCount(nVecs)))
    val t0 = System.nanoTime()
    for (b <- 0 until nBatches) {
      val lo = b.toLong * per
      val hi = if (b == nBatches - 1) Long.MaxValue else (b + 1).toLong * per
      val tb = System.nanoTime()
      // maxCluster is lifted above the largest final cell population:
      // the cap is PREFIX-exact by design (a per-batch decision cannot
      // see future cluster growth — the StreamCuration combined-cap
      // caveat), so the equality claim is tested with the cap inert
      // and the cap behavior itself is spec-gated at small scale
      val drops = StreamIndex.semdedupBatch(
        q.filter(col("vec_id") >= lo && col("vec_id") < hi), inc,
        minCos = 0.995, maxCluster = 50000, k = kArg)
      val n = drops.count()
      val dtb = (System.nanoTime() - tb) / 1e9
      println(f"[soak-semdedup] batch $b%2d  ${dtb}%7.2f s  ${per / dtb}%8.0f vec/s  drops=$n  state/batch=${b}x")
    }
    val dt = (System.nanoTime() - t0) / 1e9
    val incDrops = spark.read.parquet(s"$inc/drops").distinct()
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println(f"[soak-semdedup] incremental total ${dt}%7.2f s  ${nVecs / dt}%8.0f vec/s  drops=${incDrops.size}")

    // one-shot batch twin with the SAME frozen quantizer
    val one = java.nio.file.Files.createTempDirectory("graft-soaksdd-one-").toString
    val t1 = System.nanoTime()
    val cents = spark.read.parquet(s"$inc/centroids") // same frozen quantizer
    val batchDrops = Similarity.semdedup(
        Similarity.assignNearest(q, cents), minCos = 0.995, maxCluster = 50000)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    println(f"[soak-semdedup] single-batch   ${(System.nanoTime() - t1) / 1e9}%7.2f s  drops=${batchDrops.size}")
    println(if (incDrops == batchDrops) "[soak-semdedup] incremental == batch"
      else s"[soak-semdedup] DIVERGED: only-inc=${(incDrops -- batchDrops).take(5)} only-batch=${(batchDrops -- incDrops).take(5)}")
    spark.stop()
  }
}
