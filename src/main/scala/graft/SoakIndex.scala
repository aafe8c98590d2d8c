package graft

import graft.llm.Similarity
import graft.streaming.StreamIndex
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Incremental-index soak: a clustered synthetic corpus arrives in N
  * id-ordered batches through [[StreamIndex]] (quantizer trained on
  * batch 0, k=32 cells, frozen). Claims under test: absorb cost tracks
  * the BATCH (broadcast-assign + partitioned append — never a corpus
  * shuffle), search cost tracks the PROBED CELLS (partition-pruned
  * read), and the final index answers identically to a single-batch
  * build, with recall vs brute force reported honestly.
  * Run: sbt "runMain graft.SoakIndex [nVecs] [nBatches]". */
object SoakIndex {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 200000
    val nBatches = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // 200 hash-derived cluster centers + 10% noise (the SoakAnn
    // clustered geometry: neighbors are within-cluster, which is what
    // IVF exploits — and what embeddings of a real corpus look like)
    val emb = spark.range(nVecs).select(col("id").as("vec_id"),
        expr("""transform(sequence(0, 63), i ->
          | CAST(CAST(pmod(hash(pmod(id, 200) * 64 + i), 2001) - 1000 AS DOUBLE) * 0.9 / 1000.0
          |     + CAST(pmod(hash(id * 64 + i), 2001) - 1000 AS DOUBLE) * 0.1 / 1000.0 AS FLOAT))""".stripMargin)
          .as("embedding"))
    val q = Similarity.quantized(emb).cache()
    q.count()
    println(s"[soak-index] $nVecs vectors x 64 dims, $nBatches batches, k=32 cells")

    val queries = q.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"))
    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

    val idx = java.nio.file.Files.createTempDirectory("graft-soakidx-").toString
    val per = nVecs / nBatches
    for (b <- 0 until nBatches) {
      val lo = b.toLong * per
      val hi = if (b == nBatches - 1) Long.MaxValue else (b + 1).toLong * per
      val t0 = System.nanoTime()
      StreamIndex.processBatch(
        q.filter(col("vec_id") >= lo && col("vec_id") < hi), idx, k = 32, iters = 2)
      val dtAbsorb = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val n = StreamIndex.search(spark, idx, queries, nprobe = 4, topK = 10).count()
      val dtSearch = (System.nanoTime() - t1) / 1e9
      println(f"[soak-index] batch $b%2d  absorb ${dtAbsorb}%6.2f s (${per / dtAbsorb}%8.0f vec/s)" +
        f"  search ${dtSearch}%6.2f s ($n rows)")
    }

    val inc = topSets(StreamIndex.search(spark, idx, queries, nprobe = 4, topK = 10))

    // single-batch build with the same quantizer: must answer identically
    val one = java.nio.file.Files.createTempDirectory("graft-soakidx-one-").toString
    StreamIndex.processBatch(q.filter(col("vec_id") < per), one, k = 32, iters = 2)
    StreamIndex.processBatch(q.filter(col("vec_id") >= per), one, k = 32, iters = 2)
    val oneSets = topSets(StreamIndex.search(spark, one, queries, nprobe = 4, topK = 10))
    assert(inc == oneSets, "incremental index diverged from single-batch build")
    println("[soak-index] incremental == batch build")

    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    val corpus = q.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb"))
    val exact = topSets(queries.crossJoin(corpus).filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", expr(Similarity.cosExpr))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10))
    val hits = exact.map { case (k, s) => (inc.getOrElse(k, Set.empty) & s).size }.sum
    println(f"[soak-index] recall@10 vs brute force: ${hits.toDouble / exact.map(_._2.size).sum}%.3f" +
      " (nprobe=4 of 32 cells — recall buys linearly with nprobe)")
    spark.stop()
  }
}
