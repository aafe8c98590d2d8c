package graft.streaming

import graft.SparkSpec
import graft.llm.Similarity
import org.apache.spark.sql.functions._

/** The incremental-SemDeDup contract: with the quantizer trained on
  * the first batch and frozen, any id-ordered batch split accumulates
  * EXACTLY the one-shot batch drop set (greedy arrival-order = the
  * batch rule under monotone ids), and a replayed batch perturbs
  * nothing after the reader's distinct (X2). */
class SemdedupStreamSpec extends SparkSpec {

  // 40 vectors in 2D: four loose directions plus exact near-dup pairs
  // scattered across the id range so drops span batch boundaries
  private def corpus = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val base = Seq((1.0, 0.0), (0.0, 1.0), (-1.0, 0.3), (0.5, -0.9))
    val rows = (0L until 40L).map { id =>
      val (bx, by) = base((id % 4).toInt)
      // ids ≡ 2 (mod 5) shadow the previous id's direction almost
      // exactly → near-dups of some earlier doc
      val (x, y) =
        if (id % 5 == 2) (bx * 0.998 + 0.001, by * 0.998)
        else (bx + (id % 7) * 0.02, by - (id % 3) * 0.02)
      val q = Seq(x, y).map(v => math.floor(v * 1048576).toLong)
      Row(id, q, q.map(v => v * v).sum)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("vec_id", LongType), StructField("q", ArrayType(LongType)),
        StructField("nrm2", LongType))))
  }

  private def dropSet(df: org.apache.spark.sql.DataFrame) =
    df.select("cid", "vec_id", "dup_of", "max_cos").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet

  test("3-batch incremental drops == one-shot batch drops (frozen quantizer)") {
    val c = corpus.localCheckpoint()
    val inc = java.nio.file.Files.createTempDirectory("graft-sdd-inc-").toString
    for ((lo, hi) <- Seq((0L, 14L), (14L, 27L), (27L, 100L)))
      StreamIndex.semdedupBatch(
        c.filter(col("vec_id") >= lo && col("vec_id") < hi), inc,
        minCos = 0.995, k = 4)
    val incDrops = dropSet(spark.read.parquet(s"$inc/drops").distinct())

    // batch twin: SAME first-batch-trained centroids, one-shot rule
    val one = java.nio.file.Files.createTempDirectory("graft-sdd-one-").toString
    StreamIndex.semdedupBatch(c.filter(col("vec_id") < 14), one,
      minCos = 0.995, k = 4) // trains the quantizer on the first batch
    val cents = spark.read.parquet(s"$one/centroids")
    val batchDrops = dropSet(
      Similarity.semdedup(Similarity.assignNearest(c, cents), minCos = 0.995))

    assert(incDrops.nonEmpty, "corpus should contain near-dups")
    assert(incDrops == batchDrops,
      s"only-incremental=${incDrops -- batchDrops} only-batch=${batchDrops -- incDrops}")
  }

  test("a replayed batch appends identical rows: distinct() restores the set (X2)") {
    val c = corpus.localCheckpoint()
    val dir = java.nio.file.Files.createTempDirectory("graft-sdd-rep-").toString
    StreamIndex.semdedupBatch(c.filter(col("vec_id") < 20), dir, minCos = 0.995, k = 4)
    val first = dropSet(spark.read.parquet(s"$dir/drops").distinct())
    // crash-replay: the same batch again (state now includes the batch
    // itself; doc_a < doc_b keeps self-pairs suppressed and re-derives
    // the same qualifying pairs)
    StreamIndex.semdedupBatch(c.filter(col("vec_id") < 20), dir, minCos = 0.995, k = 4)
    val replayed = dropSet(spark.read.parquet(s"$dir/drops").distinct())
    assert(first == replayed, s"replay diverged: ${replayed -- first}")
  }
}
