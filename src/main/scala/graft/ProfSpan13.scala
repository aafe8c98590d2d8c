package graft

import org.apache.spark.sql.functions._

/** Scratch: decompose the r13 adaptive spanCoverage at soak scale —
  * times the dup build+count and the probe+merge separately, per
  * forced shape, on the SoakIds3Prof corpus. Not driver contract.
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.ProfSpan13 [n]" */
object ProfSpan13 {
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
    val keep1 = docs
      .withColumn("fp", graft.llm.TextAnalysis.fingerprint(col("text")))
      .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
    val d1 = docs.join(keep1, "doc_id")
    val d2 = d1.filter(graft.llm.TextAnalysis.qualityScore(col("text")) >= 0.3)
    def sh = graft.llm.Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false)
    println("[prof13] sh estimate = " +
      sh.queryExecution.optimizedPlan.stats.sizeInBytes)

    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[prof13] n=$n%8d  $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
    }
    for (pass <- 1 to 2) {
      // dup build + count alone
      var dup: org.apache.spark.sql.DataFrame = null
      t(s"p$pass dup build+ckpt+count") {
        dup = sh.repartition(col("h")).groupBy("h")
          .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
          .filter(col("mn") =!= col("mx")).select("h")
          .localCheckpoint(false)
        println("[prof13] nDup = " + dup.count())
      }
      t(s"p$pass probe BROADCAST semi + merge") {
        graft.llm.Dedup.mergedCoverage(
          sh.join(broadcast(dup), Seq("h"), "left_semi")
            .select(col("id"), col("n_tokens"), col("pos").as("start"),
              (col("pos") + 19).as("fin")))
          .filter(col("coverage") > 0.5).select("doc_id")
          .write.mode("overwrite").format("noop").save()
      }
      t(s"p$pass r12-exact (lazy ckpt, bloom subquery)") {
        val dup12 = sh.repartition(col("h")).groupBy("h")
          .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
          .filter(col("mn") =!= col("mx")).select("h")
          .localCheckpoint(false) // NO count: subquery materializes it
        graft.llm.Dedup.mergedCoverage(
          sh.filter(graft.functions.BloomSemi.probe(dup12, "h", col("h")))
            .join(dup12, Seq("h"), "left_semi")
            .select(col("id"), col("n_tokens"), col("pos").as("start"),
              (col("pos") + 19).as("fin")))
          .filter(col("coverage") > 0.5).select("doc_id")
          .write.mode("overwrite").format("noop").save()
      }
      t(s"p$pass shipped spanCoverage (adaptive)") {
        graft.llm.Dedup.spanCoverage(sh, 20)
          .filter(col("coverage") > 0.5).select("doc_id")
          .write.mode("overwrite").format("noop").save()
      }
    }
    spark.stop()
  }
}
