package graft

import graft.llm.{Dedup, TextAnalysis}
import org.apache.spark.sql.functions._

/** Scratch profiler for the heavy curation pipelines: times each stage
  * of d_pipeline_e2e in isolation (eager materialization per stage) so
  * the fixed-constant budget is attributable. Not part of the driver
  * contract. Run: sbt "runMain graft.ProfilePipeline [sfDir]". */
object ProfilePipeline {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    Tables.cacheEnabled = true
    Tables.documents(spark, sfDir).count()

    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }

    for (round <- 1 to 2) {
      println(s"[profile] ---- round $round ----")
      val docs = Tables.documents(spark, sfDir)
      val keep1 = docs
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val d1 = docs.join(keep1, "doc_id")
      val quality = TextAnalysis.qualityScore(col("text"))
      val d2 = t("s1+2 exact-dedup+quality")(
        d1.filter(quality >= 0.3).localCheckpoint())
      val heavy = Dedup.spanCoverage(
          Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false), 20)
        .filter(col("coverage") > 0.5).select("doc_id")
      val d3 = t("s3 span-coverage gate")(
        d2.join(heavy, Seq("doc_id"), "left_anti").localCheckpoint())
      val sh = t("s4a shingles")(
        Dedup.shingles(d3, "doc_id", "text", spread = false).localCheckpoint())
      val bands = t("s4b minhash+bands")(
        Dedup.lshBands(Dedup.minhashSignature(sh)).localCheckpoint())
      val cand = t("s4c candidatePairs")(
        Dedup.candidatePairs(bands).localCheckpoint())
      val pairs = t("s4d pairJaccard")(
        Dedup.pairJaccard(cand, sh)
          .filter(col("jacc") >= 0.5).select("doc_a", "doc_b").localCheckpoint())
      val dropFuzzy = t("s4e canonicalize")(
        Dedup.canonicalize(pairs)
          .filter(col("id") =!= col("canonical"))
          .select(col("id").as("doc_id")).localCheckpoint())
      val d4 = d3.join(dropFuzzy, Seq("doc_id"), "left_anti")
      t("s5 final agg + noop write")(
        d4.groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"))
          .write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
