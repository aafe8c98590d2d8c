package graft

/** Scratch A/B: d_pipeline_e2e + d_span_coverage under each
  * spanCoverage shape, interleaved in one JVM (same caches, same JIT)
  * so bench-scale deltas are attributable. Not driver contract. */
object ProfPipeShape {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, sfDir).count()
    val qs = Seq("d_pipeline_e2e", "d_span_coverage")
    val shapes = Seq(
      // (name, windowShapeMaxBytes) — huge forces the window shape,
      // 0 forces the scalable shape, default leaves the estimate to pick
      "window  " -> Long.MaxValue.toString,
      "scalable" -> "0",
      "adaptive" -> (16L << 20).toString)
    def run(): Map[String, Double] = qs.map { q =>
      val t0 = System.nanoTime()
      SparkEntry.queries(q)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      q -> (System.nanoTime() - t0) / 1e9
    }.toMap
    shapes.foreach { case (_, v) =>
      spark.conf.set("graft.span.windowShapeMaxBytes", v); run() } // warm
    val acc = collection.mutable.Map[(String, String), List[Double]]()
      .withDefaultValue(Nil)
    for (_ <- 1 to 5; (n, v) <- shapes) {
      spark.conf.set("graft.span.windowShapeMaxBytes", v)
      run().foreach { case (q, t) => acc((n, q)) = t :: acc((n, q)) }
    }
    for ((n, _) <- shapes; q <- qs)
      println(f"[shape] $n $q%-18s min=${acc((n, q)).min}%6.3f s  " +
        f"med=${acc((n, q)).sorted.apply(2)}%6.3f s")
    spark.stop()
  }
}
