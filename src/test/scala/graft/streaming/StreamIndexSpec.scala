package graft.streaming

import graft.{SparkSpec, Tables}
import graft.llm.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental IVF index must equal a batch build (frozen
  * centroids make assignment arrival-order-free), absorb replayed
  * batches without perturbation (X2), and answer searches through a
  * PARTITION-PRUNED read of only the probed cells. */
class StreamIndexSpec extends SparkSpec {

  private def corpus: DataFrame =
    Similarity.quantized(Tables.embeddings(spark, sf0001))

  private def queriesOf(q: DataFrame): DataFrame =
    q.filter(col("vec_id") < 8)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"))

  private def results(idx: String): Seq[(Long, Long, Double, Int)] =
    StreamIndex.search(spark, idx, queriesOf(corpus), nprobe = 2, topK = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
      .toSeq.sorted

  private def tmpDir() =
    java.nio.file.Files.createTempDirectory("graft-sidx-spec-").toString

  test("incremental build over 3 batches equals the single-batch build") {
    val q = corpus
    val inc = tmpDir()
    Seq((0L, 200L), (200L, 350L), (350L, Long.MaxValue)).foreach { case (lo, hi) =>
      StreamIndex.processBatch(q.filter(col("vec_id") >= lo && col("vec_id") < hi), inc, k = StreamIndex.K)
    }
    val one = tmpDir()
    // same first-batch quantizer, whole corpus in one append: the
    // reference batch build under the frozen-centroid contract
    StreamIndex.processBatch(q.filter(col("vec_id") < 200), one, k = StreamIndex.K)
    StreamIndex.processBatch(q.filter(col("vec_id") >= 200), one, k = StreamIndex.K)
    val (ri, r1) = (results(inc), results(one))
    assert(ri.nonEmpty && ri == r1,
      s"incremental diverged from batch: inc=${ri.take(3)} one=${r1.take(3)}")

    // replaying a mid-stream batch must change nothing (appends
    // collapse through the distinct load)
    StreamIndex.processBatch(
      q.filter(col("vec_id") >= 200L && col("vec_id") < 350L), inc)
    assert(results(inc) == r1, "replayed batch perturbed search results")
  }

  test("search reads the inverted lists through a pruned partition scan") {
    val q = corpus
    val idx = tmpDir()
    StreamIndex.processBatch(q, idx)
    val res = StreamIndex.search(spark, idx, queriesOf(q), nprobe = 2, topK = 3)
    res.collect()
    val scans = res.queryExecution.executedPlan.collectLeaves().map(_.toString)
    // find the lists scan by its path — other scans also print a
    // (vacuous) "PartitionFilters: []" line and must not match
    val listScan = scans.find(_.contains("/lists"))
    assert(listScan.isDefined, s"no lists file scan found in:\n${scans.mkString("\n")}")
    // the scan must carry a real partition filter on cid — an empty
    // PartitionFilters would mean the whole index is read every search
    assert(listScan.get.matches("(?s).*PartitionFilters: \\[[^\\]]*cid.*"),
      s"lists scan is not partition-pruned:\n${listScan.get}")
    // and with 8 queries × nprobe=2 over K=8 cells, at most 8 distinct
    // cells are probed — fewer cell directories than K must satisfy
    // the search when probes overlap (sanity that pruning is by cid)
    assert(res.select("qid").distinct().count() == 8)
  }

  test("training does not require dense 0-based ids") {
    // a stream whose ids start far from 0 must still train k cells and
    // answer searches — the quantizer seeds from the k SMALLEST ids,
    // not ids < k
    val q = corpus.withColumn("vec_id", col("vec_id") + 1000000L)
    val idx = tmpDir()
    StreamIndex.processBatch(q, idx) // k = Auto: ⌈√n⌉ of the training batch
    assert(spark.read.parquet(s"$idx/centroids").count() ==
      graft.llm.Similarity.cellCount(q.count()))
    val queries = q.filter(col("vec_id") < 1000008L)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"))
    val res = StreamIndex.search(spark, idx, queries, nprobe = 2, topK = 3)
    assert(res.count() == 24, "8 queries x top-3 expected")
  }
}
