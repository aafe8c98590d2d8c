package graft

import java.util.concurrent.{CountDownLatch, TimeUnit}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.util.QueryExecutionListener

/** Round-15 triage (VERDICT #5): for the sweep-flagged queries, capture
  * the plan that ACTUALLY ran — PlanSweep's `--final` mode explains the
  * DataFrame's own (never-executed) QueryExecution, so with AQE on it
  * still prints `isFinalPlan=false` shapes; the authoritative final
  * plan lives in the noop write's QueryExecution, observable only via
  * a QueryExecutionListener. Conditions replicate the bench surface
  * (local[32], sf0.1, base tables pinned) because AQE's runtime
  * SMJ→BHJ rewrites depend on the real sizes the bench sees.
  *
  * Run: tools/run_main.sh graft.TriageR15 [query ...]
  * Writes plans/r15/triage/<query>_executed.txt */
object TriageR15 {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    val out = java.nio.file.Paths.get("plans/r15/triage")
    java.nio.file.Files.createDirectories(out)

    // bench surface: pin the base tables
    Tables.cacheEnabled = true
    Seq("lineitem", "orders", "customer", "supplier", "part", "nation",
      "region", "documents", "embeddings").foreach(t =>
      Tables.read(spark, dir, t).count())
    Tables.events(spark, dir).count()

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else Seq("s_ann_recall_eval", "j1b_zonal_levels", "j1_zonal_stats",
        "a19_threshold_area", "s_ann_ivf", "t_unigram_surprisal",
        "t_tfidf_topk", "s_ann_ivfpq_resid", "s_embed_neardup",
        "w9_funnel", "x2_idempotent_merge", "s_ann_lsh", "d_containment")

    @volatile var captured: (String, Long) = ("", 0L)
    @volatile var latch = new CountDownLatch(1)
    spark.listenerManager.register(new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit = {
        captured = (qe.explainString(org.apache.spark.sql.execution.FormattedMode), durationNs)
        latch.countDown()
      }
      override def onFailure(funcName: String, qe: QueryExecution, exception: Exception): Unit =
        latch.countDown()
    })

    for (name <- names) {
      val fn = SparkEntry.queries(name)
      // warm once (codegen + shared-index builds), capture the second run
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      latch = new CountDownLatch(1)
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      val wall = (System.nanoTime() - t0) / 1e9
      latch.await(30, TimeUnit.SECONDS)
      val txt = captured._1
      java.nio.file.Files.write(out.resolve(s"${name}_executed.txt"),
        (txt + "\n").getBytes("UTF-8"))
      def n(pat: String) = pat.r.findAllIn(txt).length
      println(f"[triage] $name%-28s wall=$wall%6.3f smj=${n("""\(\d+\) SortMergeJoin""")} bhj=${n("""\(\d+\) BroadcastHashJoin""")} bnlj=${n("""\(\d+\) BroadcastNestedLoopJoin""")} exch=${n("""\(\d+\) Exchange""")} aqeRead=${n("""AQEShuffleRead""")}")
    }
    spark.stop()
  }
}
