package graft

/** Scratch A/B (r14, VERDICT #2): d_pipeline_e2e's boundary set, the
  * same experiment ProfEndstate14 runs for the endstate form (where
  * folding sh+bands won 18%). Variants drive
  * graft.pipeline.foldBoundaries; interleaved same-JVM min/med-of-5 so
  * deltas are attributable on this noisy box. Not driver contract.
  * Run: sbt "runMain graft.ProfPipe14 [sfDir]" */
object ProfPipe14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, sfDir).count()
    val variants = Seq(
      "shipped     " -> "",
      "fold bands  " -> "bands",
      "fold cand   " -> "cand",
      "fold shCand " -> "shCand",
      "fold b+c+s  " -> "bands,cand,shCand",
      "fold all    " -> "ids3,bands,cand,shCand")
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("d_pipeline_e2e")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Rotate variant order per round (see ProfEndstate14: fixed order
    // lets monotone JVM warming favor later variants). Note the r14
    // shipped-is-optimal finding ran FIRST in its round, so the bias
    // ran against it and the conclusion only strengthens.
    for (_ <- 1 to 2; (_, v) <- variants) {
      spark.conf.set("graft.pipeline.foldBoundaries", v); run() }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val rounds = 5
    for (r <- 0 until rounds) {
      val order = variants.drop(r % variants.size) ++ variants.take(r % variants.size)
      for ((n, v) <- order) {
        spark.conf.set("graft.pipeline.foldBoundaries", v)
        acc(n) = run() :: acc(n)
      }
    }
    for ((n, _) <- variants)
      println(f"[pipe14] $n min=${acc(n).min}%6.3f s  " +
        f"med=${acc(n).sorted.apply(rounds / 2)}%6.3f s  all=${acc(n).reverse.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
