package graft

/** Scratch A/B (r14, VERDICT #3): d_incremental_endstate's one-shot
  * boundary set. The standing "folding boundaries makes it slower"
  * negative is an r8 measurement (SCALE.md #11a) that predates the r11
  * wide-start AQE policy and the r13 span shape; this re-measures it
  * with current code, same-JVM interleaved so deltas are attributable
  * (cross-JVM absolutes on this box swing 1.5-2x, SCALE.md r13).
  * Variants drive graft.endstate.foldOneShot: which of the k3/sh/bands
  * localCheckpoints to skip in the one-shot batch form. Not driver
  * contract. Run: sbt "runMain graft.ProfEndstate14 [sfDir]" */
object ProfEndstate14 {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, sfDir).count()
    val variants = Seq(
      "shipped    " -> "",
      "fold sh    " -> "sh",
      "fold bands " -> "bands",
      "fold sh+bd " -> "sh,bands",
      "fold all   " -> "k3,sh,bands")
    def run(): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries("d_incremental_endstate")(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      (System.nanoTime() - t0) / 1e9
    }
    // Two full warm rounds, then ROTATE the variant order each measured
    // round: with a fixed order, monotone JVM warming systematically
    // favors later-in-round variants (the first run of this harness
    // "showed" an 18% fold win that a replication reversed — ordering
    // bias, not signal).
    for (_ <- 1 to 2; (_, v) <- variants) {
      spark.conf.set("graft.endstate.foldOneShot", v); run() }
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    val rounds = 7
    for (r <- 0 until rounds) {
      val order = variants.drop(r % variants.size) ++ variants.take(r % variants.size)
      for ((n, v) <- order) {
        spark.conf.set("graft.endstate.foldOneShot", v)
        acc(n) = run() :: acc(n)
      }
    }
    for ((n, _) <- variants)
      println(f"[endstate] $n min=${acc(n).min}%6.3f s  " +
        f"med=${acc(n).sorted.apply(rounds / 2)}%6.3f s  all=${acc(n).reverse.map(t => f"$t%.2f").mkString(",")}")
    spark.stop()
  }
}
