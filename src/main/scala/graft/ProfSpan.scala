package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Dev profile: span-coverage plan-shape bake-off at soak scale. Runs
  * the candidate shapes over the SoakIds3Prof corpus and prints warm
  * timings per stage — the evidence behind whichever shape
  * Dedup.spanCoverage ships. Run:
  * SPARK_DRIVER_MEM=48g sbt "runMain graft.ProfSpan [nDocs[,nDocs]]" */
object ProfSpan {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    import spark.implicits._
    def corpus(n: Int) = spark.range(n).select(
        col("id").as("doc_id"),
        expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w', pmod(hash(31337 * 100 + i), 65536))))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w',
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i % 20 = 7 THEN -(id * 100 + i)
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 65536)))) END""".stripMargin)
          .as("text"))
      .repartition(32).cache()
    for (n <- args.headOption.map(_.split(",").map(_.toInt).toSeq)
           .getOrElse(Seq(1000000)); pass <- 1 to 2) {
      val docs = corpus(n); docs.count()
      def t(name: String)(f: => DataFrame): Unit = {
        val t0 = System.nanoTime()
        f.write.mode("overwrite").format("noop").save()
        if (pass == 2)
          println(f"[prof-span] n=$n%8d  $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
      def sh = graft.llm.Dedup.spanHashes(docs, "doc_id", "text", 20, spread = false)

      // stage floor: the windowing kernel alone (count of span rows)
      t("0 windowing kernel only") { sh.groupBy().count() }

      // stage floor: the duplicated-hash aggregate alone
      def dupOf(s: DataFrame) = s.groupBy("h")
        .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select("h")
      t("1 dup agg (min/max groupBy)") { dupOf(sh) }

      // shape A (r11): window over h, full sort
      t("A window-over-h (r11 shape)") {
        import org.apache.spark.sql.expressions.Window
        val wh = Window.partitionBy("h")
        graft.llm.Dedup.mergedCoverage(sh
          .withColumn("min_id", min(col("id")).over(wh))
          .withColumn("max_id", max(col("id")).over(wh))
          .filter(col("min_id") =!= col("max_id"))
          .select(col("id"), col("n_tokens"), col("pos").as("start"),
            (col("pos") + 19).as("fin")))
      }

      // the dup agg with its input pre-partitioned BY H: partial+final
      // aggregate run in-stage over AQE-sized partitions instead of a
      // map-side partial that builds an input-split-sized hash map
      // (9.5M keys/split at 5M docs) and spills into sort fallback
      def dupWide(s: DataFrame) = s.repartition(col("h")).groupBy("h")
        .agg(min(col("id")).as("mn"), max(col("id")).as("mx"))
        .filter(col("mn") =!= col("mx")).select("h")
      t("1w dup agg (repartition-by-h)") { dupWide(sh) }

      // shape E: wide dup agg, materialized once (lazy localCheckpoint
      // of the narrow dup column), bloom prune + exact semi-join
      t("E wide-agg(ckpt) + bloom + semi") {
        val dup = dupWide(sh).localCheckpoint(false)
        graft.llm.Dedup.mergedCoverage(sh
          .filter(graft.functions.BloomSemi.probe(dup, "h", col("h")))
          .join(dup, Seq("h"), "left_semi")
          .select(col("id"), col("n_tokens"), col("pos").as("start"),
            (col("pos") + 19).as("fin")))
      }

      // shape E0: E without the bloom — AQE broadcasts the semi-join
      // when dup is small; measures what the bloom buys
      t("E0 wide-agg(ckpt) + semi only") {
        val dup = dupWide(sh).localCheckpoint(false)
        graft.llm.Dedup.mergedCoverage(sh
          .join(dup, Seq("h"), "left_semi")
          .select(col("id"), col("n_tokens"), col("pos").as("start"),
            (col("pos") + 19).as("fin")))
      }
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
