package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.{FileSourceScanExec, QueryExecution, SortExec, SparkPlan}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.execution.joins.BaseJoinExec
import org.apache.spark.sql.util.QueryExecutionListener

/** The 100 TB claim behind StreamCuration's state design, asserted on
  * real executed plans: with persisted state ~10× the batch, EVERY
  * state access in processBatch streams corpus-sized state scan-only —
  * no shuffle exchange, no sort, no broadcast between a state-table
  * scan and the join that consumes it. Span/band state reads are
  * additionally asserted BUCKETED (the layout that lets the batch side
  * shuffle into the state's partitioning instead of the reverse).
  * processBatch checkpoints stages eagerly, so the state joins execute
  * during the call itself — plans are captured per executed query via
  * a QueryExecutionListener, not from the final frame's lineage. */
class StreamCurationPlanSpec extends SparkSpec {

  // (node, ancestors nearest-first), flattening AQE wrappers
  private def flatten(p: SparkPlan, anc: List[SparkPlan]): Seq[(SparkPlan, List[SparkPlan])] =
    p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan, anc)
      case q: QueryStageExec => flatten(q.plan, anc)
      case r: ReusedExchangeExec => flatten(r.child, r :: anc)
      case other =>
        (other, anc) +: other.children.flatMap(c => flatten(c, other :: anc))
    }

  test("state scans stream unexchanged, unsorted, unbroadcast into their first join; span/band scans are bucketed") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-curplan-").toString
    val nState = 3000L
    val nBatch = 300L

    // SoakCuration's corpus shape — exact dups of one template spread
    // through the id range (cross-batch bloom hits), near-dups of the
    // predecessor — PLUS batch docs (id ≥ nState, id%40=3) that copy a
    // STATE doc with one word changed every 15 positions: no intact
    // 20-token window survives (passes the stale-span gate) but
    // shingle Jaccard ≈ 0.68 still band-collides and verifies, so
    // stage 4's cross-batch candidate path (band probe + doc-state
    // join) genuinely executes
    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    def corpus(lo: Long, hi: Long) = spark.range(lo, hi).select(
      col("id").as("doc_id"), lit("s").as("source"),
      expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
           | element_at($vocabExpr, pmod(hash(31337 * 100 + i), 64) + 1)))
           | WHEN id >= $nState AND id % 40 = 3 THEN concat_ws(' ', transform(sequence(0, 79), i ->
           | element_at($vocabExpr,
           |   pmod(hash(CASE WHEN i % 15 = 7 THEN -(id * 100 + i)
           |             ELSE (id - $nState) * 100 + i END), 64) + 1)))
           | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
           | element_at($vocabExpr,
           |   pmod(hash(CASE WHEN id % 50 = 1 AND i = 7 THEN -id
           |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
           |             ELSE id * 100 + i END), 64) + 1))) END""".stripMargin)
        .as("text"))

    // seed state: one big wave through the persisted path
    val (_, d0) = StreamCuration.processBatch(corpus(0, nState),
      StreamCuration.emptyState(spark))
    StreamCuration.saveDeltas(d0, stateDir)

    // At spec scale the WHOLE state fits under the default 10 MB
    // broadcast threshold, so AQE would happily broadcast corpus-sized
    // state frames — the opposite of the 100 TB size relationship this
    // test pins. 10 KB keeps the genuinely-tiny probe frames
    // (bloom-positive fps, candidate ids, state-hit spans — all
    // candidate-bounded) broadcastable while state stays streamed.
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    spark.conf.set(thrKey, "10240")

    val captured = new java.util.concurrent.ConcurrentLinkedQueue[(String, SparkPlan)]()
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
        captured.add(funcName -> qe.executedPlan)
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val st = StreamCuration.loadState(spark, stateDir, dedup = false)
      val (kept, _) = StreamCuration.processBatch(corpus(nState, nState + nBatch), st)
      assert(kept.count() > 0, "batch should keep some docs")

      // the listener bus is async — drain until the capture stabilizes
      var last = -1
      var stable = 0
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      while (stable < 3 && System.nanoTime() < deadline) {
        Thread.sleep(200)
        val n = captured.size()
        if (n == last) stable += 1 else { stable = 0; last = n }
      }

      import scala.jdk.CollectionConverters._
      val plans = captured.asScala.toSeq
      def stateScanOf(p: SparkPlan): Option[String] = p match {
        case f: FileSourceScanExec =>
          f.relation.location.rootPaths.map(_.toString)
            .find(_.contains(stateDir))
            .map(_.split('/').last)
        case _ => None
      }
      val nodes = plans.flatMap { case (fn, p) => flatten(p, Nil).map { case (n, a) => (fn, n, a) } }
      val stateScans = nodes.collect { case (fn, n: FileSourceScanExec, anc) =>
        stateScanOf(n).map(name => (fn, name, n, anc)) }.flatten
      val seen = stateScans.map(_._2).toSet
      // every state table must actually have been read, or the
      // assertions below pass vacuously
      for (t <- Seq("fps", "spans", "bands", "docs"))
        assert(seen.contains(t), s"no captured plan scans state table '$t' (saw $seen)")

      for ((fn, name, scan, anc) <- stateScans if name != "wm") {
        val toJoin = anc.takeWhile(!_.isInstanceOf[BaseJoinExec])
        val bad = toJoin.collect {
          case e: ShuffleExchangeExec => e
          case e: BroadcastExchangeExec => e
          case e: SortExec => e
        }
        assert(bad.isEmpty,
          s"state '$name' scan in query '$fn' is exchanged/sorted before its first join " +
            s"(${bad.map(_.nodeName).mkString(", ")}):\n${anc.headOption.map(_.treeString).getOrElse("")}")
        if (name == "spans" || name == "bands")
          assert(scan.metadata.contains("SelectedBucketsCount"),
            s"state '$name' scan in query '$fn' is not bucketed:\n${scan.treeString}")
      }
    } finally {
      spark.listenerManager.unregister(listener)
      spark.conf.set(thrKey, prevThr)
    }
  }
}
