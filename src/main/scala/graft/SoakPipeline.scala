package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextAnalysis}

/** Offline stage-by-stage timing of d_pipeline_e2e — where do the
  * seconds actually go at sf0.1? Each boundary is timed as its own
  * eager materialization so the per-stage cost (compute + barrier
  * constant) is visible in isolation. Run:
  *   sbt "runMain graft.SoakPipeline /root/testdata/sf0.1"
  */
object SoakPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[soak] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"[soak] --- round $round ---")
      val docs = Tables.documents(spark, dir)
      val keep1 = docs
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val d1 = docs.join(keep1, "doc_id")
      val quality = TextAnalysis.qualityScore(col("text"))
      val d2 = timed("chk d2 (exact+quality)") {
        d1.filter(quality >= 0.3).localCheckpoint()
      }
      val heavy = Dedup.spanCoverage(
          Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false), 20)
        .filter(col("coverage") > 0.5).select("doc_id")
      val d3 = timed("chk d3 (span gate)") {
        d2.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint()
      }
      val sh = timed("chk sh (shingles)") {
        Dedup.shingles(d3, "doc_id", "text", spread = false).localCheckpoint()
      }
      val pairs = Dedup.pairJaccard(
          Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh))), sh)
        .filter(col("jacc") >= 0.5).select("doc_a", "doc_b")
      val dropFuzzy = Dedup.canonicalize(pairs)
        .filter(col("id") =!= col("canonical"))
        .select(col("id").as("doc_id"))
      val d4 = d3.join(dropFuzzy, Seq("doc_id"), "left_anti")
      timed("final agg + noop") {
        d4.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"))
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
