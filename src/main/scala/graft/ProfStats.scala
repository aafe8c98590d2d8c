package graft

import org.apache.spark.sql.functions._

/** Scratch: print Catalyst size estimates for the span streams the
  * adaptive spanCoverage shape chooser would see. Not driver contract. */
object ProfStats {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, "/root/testdata/sf0.1").count()
    val docs = Tables.documents(spark, "/root/testdata/sf0.1")
    val sh = graft.llm.Dedup.spanHashes(docs, "doc_id", "text", 20, spread = false)
    println("[stats] sf0.1 spans estimate = " +
      sh.queryExecution.optimizedPlan.stats.sizeInBytes)
    println("[stats] sf0.1 docs estimate  = " +
      docs.queryExecution.optimizedPlan.stats.sizeInBytes)

    // the pipeline's spansIn: spans of d2 (exact-dedup join + quality)
    val keep1 = docs
      .withColumn("fp", graft.llm.TextAnalysis.fingerprint(col("text")))
      .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
    val d2 = docs.join(keep1, "doc_id")
      .filter(graft.llm.TextAnalysis.qualityScore(col("text")) >= 0.3)
    val shD2 = graft.llm.Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false)
    println("[stats] sf0.1 pipeline-d2 spans estimate = " +
      shD2.queryExecution.optimizedPlan.stats.sizeInBytes)

    val corpus = spark.range(5000000L).select(
        col("id").as("doc_id"),
        expr("""concat_ws(' ', transform(sequence(0, 79), i ->
          concat('w', pmod(hash(id * 100 + i), 65536))))""").as("text"))
    val sh2 = graft.llm.Dedup.spanHashes(corpus, "doc_id", "text", 20, spread = false)
    println("[stats] 5M-range spans estimate = " +
      sh2.queryExecution.optimizedPlan.stats.sizeInBytes)
    val cached = corpus.repartition(32).cache()
    cached.count()
    val sh3 = graft.llm.Dedup.spanHashes(cached, "doc_id", "text", 20, spread = false)
    println("[stats] 5M-cached spans estimate = " +
      sh3.queryExecution.optimizedPlan.stats.sizeInBytes)
    spark.stop()
  }
}
