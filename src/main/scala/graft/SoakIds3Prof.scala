package graft
import org.apache.spark.sql.functions._

/** Sub-profile of the pipeline's ids3 boundary at 1M vs 5M docs: the
  * 5M soak showed ids3 at 6.4x over a 5x step — this names which of
  * its three components (exact-dedup groupBy, quality-gated slim
  * projection, span-hash coverage) carries the super-linearity. */
object SoakIds3Prof {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    sys.env.get("GRAFT_SHUFFLE_PARTS").foreach(p =>
      spark.conf.set("spark.sql.shuffle.partitions", p))
    def corpus(n: Int) = spark.range(n).select(
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
    for (n <- args.headOption.map(_.split(",").map(_.toInt).toSeq)
           .getOrElse(Seq(1000000, 5000000)); pass <- 1 to 2) {
      val docs = corpus(n); docs.count()
      def t(name: String)(f: => Unit): Unit = {
        val t0 = System.nanoTime(); f
        if (pass == 2)
          println(f"[ids3-prof] n=$n%8d  $name%-30s ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
      val keep1 = docs
        .withColumn("fp", graft.llm.TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      t("exact-dedup keep1") { keep1.write.mode("overwrite").format("noop").save() }
      val d1 = docs.join(keep1, "doc_id")
      val quality = graft.llm.TextAnalysis.qualityScore(col("text"))
      val d2 = d1.filter(quality >= 0.3)
      t("d2 quality-gated count") { d2.select("doc_id").write.mode("overwrite").format("noop").save() }
      val sh = graft.llm.Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false)
      // lazy: the scalable spanCoverage shape runs its dup-detection
      // jobs at construction — first dereference is inside the timed
      // span stage, so those jobs stay attributed to it
      lazy val heavy = graft.llm.Dedup.spanCoverage(sh, 20)
        .filter(col("coverage") > 0.5).select("doc_id")
      t("span coverage (full)") { heavy.write.mode("overwrite").format("noop").save() }
      t("ids3 slim anti-join") {
        d2.select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
          .join(heavy, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").format("noop").save()
      }
      // the r12 directive-#5 decomposition: does the anti-join's cost
      // come from re-evaluating heavy (probe pass + merge window), and
      // does a slim checkpoint of the keep-keys (the Rank pattern)
      // flatten it? keep-keys are ~8 B/flagged doc, so the checkpoint
      // is payload-free.
      t("ids3 anti-join (heavy ckpt'd)") {
        val heavyIds = heavy.localCheckpoint()
        d2.select(col("doc_id"), col("source"),
            size(split(trim(col("text")), "\\s+")).cast("long").as("n_tokens"))
          .join(heavyIds, Seq("doc_id"), "left_anti")
          .write.mode("overwrite").format("noop").save()
      }
      docs.unpersist(blocking = true)
    }
    spark.stop()
  }
}
