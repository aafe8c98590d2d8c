package graft
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scratch: root-cause the r13 ids3 regression (SoakPipelineScale 1M:
  * r12 code 15.7 s vs HEAD 120.1 s on the SAME fresh-boot host — NOT
  * host drift). Interleaves three span-shape variants of the ids3
  * stage in one JVM, two rounds, so within-run numbers are
  * comparable:
  *   A shipped adaptive     (defaults: at 1M, count-sized bloom + shuffle semi)
  *   B forced window        (windowShapeMaxBytes = Long.Max)
  *   D r12-exact            (inlined: no count, default-sized bloom subquery)
  * The r13 interim count+broadcast-semi leg measured 543/42.1 s
  * cold/warm here vs 33.1/26.6 s for D — removed.
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.ProfIds13 [n]" */
object ProfIds13 {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(1000000)
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    val docs = spark.range(n).select(
        col("id").as("doc_id"),
        (col("id") % 3).cast("string").as("source"),
        expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w', pmod(hash(31337 * 100 + i), 65536))))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w',
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i % 20 = 7 THEN -(id * 100 + i)
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 65536)))) END""".stripMargin)
          .as("text"))
      .repartition(32).cache()
    docs.count()

    def ids3(shape: String): Unit = {
      val keep1 = docs
        .withColumn("fp", graft.llm.TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      val d1 = docs.join(keep1, "doc_id")
      val d2 = d1.filter(graft.llm.TextAnalysis.qualityScore(col("text")) >= 0.3)
      val sh = graft.llm.Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false)
      val heavy: DataFrame =
        if (shape == "D") { // r12-exact, inlined
          val dup = sh.repartition(col("h")).groupBy("h")
            .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
            .filter(col("mn") =!= col("mx"))
            .select("h")
            .localCheckpoint(false)
          graft.llm.Dedup.mergedCoverage(sh
            .filter(graft.functions.BloomSemi.probe(dup, "h", col("h")))
            .join(dup, Seq("h"), "left_semi")
            .select(col("id"), col("n_tokens"), col("pos").as("start"),
              (col("pos") + 19).as("fin")))
            .filter(col("coverage") > 0.5).select("doc_id")
        } else
          graft.llm.Dedup.spanCoverage(sh, 20,
              sizeHint = Some(docs.queryExecution.optimizedPlan.stats.sizeInBytes))
            .filter(col("coverage") > 0.5).select("doc_id")
      d2.select(col("doc_id"), col("source"),
          size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
        .join(heavy, Seq("doc_id"), "left_anti")
        .write.mode("overwrite").format("noop").save()
    }

    val variants = Seq(
      "A" -> Map.empty[String, String], // shipped: count-sized bloom + shuffle semi
      "B" -> Map("graft.span.windowShapeMaxBytes" -> Long.MaxValue.toString),
      "D" -> Map.empty[String, String]) // r12-exact, inlined
    for (round <- 1 to 2; (name, confs) <- variants) {
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      val t0 = System.nanoTime()
      ids3(name)
      println(f"[ids13] round=$round variant=$name  ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      Seq("graft.span.windowShapeMaxBytes").foreach(spark.conf.unset)
    }
    spark.stop()
  }
}
