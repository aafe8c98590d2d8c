package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Per-stage scaling measurement for the batch curation pipeline at
  * 50k / 200k / 1M docs — evidence for the claim that the
  * d_pipeline_e2e bench row's gap to DuckDB is a fixed job-scheduling
  * floor that AMORTIZES with corpus size. Runs the REAL query body
  * (`CurationQueries.pipelineE2e` — the registered query delegates to
  * the same function, so the soak cannot drift from what the bench
  * measures), timing each materialized boundary plus the final
  * aggregate. Corpus: the SoakCuration generator (seeded exact dups
  * every 97 ids, near-dups every 50, 80 words) so every dedup stage
  * does real work. Run on a QUIET host:
  * `SPARK_DRIVER_MEM=48g sbt "runMain graft.SoakPipelineScale [sizes,csv]"`. */
object SoakPipelineScale {
  def main(args: Array[String]): Unit = {
    val sizes = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(50000, 200000, 1000000))
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // 65536-word vocabulary: SoakCuration's 64-word vocab is fine at
    // 100k docs but adversarial at 1M — with 64 words there are only
    // ~262k possible 3-gram shingles, so minhash band buckets flood
    // with RANDOM collisions and the jaccard-verify stage measures the
    // hot-bucket pathology instead of pipeline scaling. A real corpus
    // has a vocabulary that dwarfs its shingle collision rate.
    def corpus(n: Int) = spark.range(n).select(
        col("id").as("doc_id"),
        (col("id") % 3).cast("string").as("source"),
        expr(s"""CASE WHEN id % 97 = 5 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w', pmod(hash(31337 * 100 + i), 65536))))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | concat('w',
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i = 7 THEN -id
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 65536)))) END""".stripMargin)
          .as("text"))
      .repartition(32).cache()

    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.Buffer[(Int, Double)]]()
    def record(size: Int, name: String, dt: Double): Unit = {
      println(f"[soak-scale] n=$size%8d  $name%-26s $dt%8.3f s")
      stages.getOrElseUpdate(name, scala.collection.mutable.Buffer()) += ((size, dt))
    }

    for (n <- sizes; pass <- 1 to 2) { // pass 1 warms JIT/codegen per size
      val docs = corpus(n)
      docs.count() // materialize outside the timed stages
      val total0 = System.nanoTime()
      def stage(name: String, f: () => DataFrame): DataFrame = {
        val t0 = System.nanoTime()
        val r = f()
        if (pass == 2) record(n, name, (System.nanoTime() - t0) / 1e9)
        r
      }
      val tAgg = System.nanoTime()
      graft.llm.CurationQueries.pipelineE2e(docs, stage)
        .write.mode("overwrite").format("noop").save()
      if (pass == 2) {
        record(n, "final jaccard+cc+rollup",
          (System.nanoTime() - tAgg) / 1e9 -
            stages.filterNot(_._1.startsWith("final")).values
              .flatMap(_.filter(_._1 == n).lastOption.map(_._2)).sum)
        val total = (System.nanoTime() - total0) / 1e9
        println(f"[soak-scale] n=$n%8d  TOTAL $total%8.3f s  ${n / total}%9.0f docs/s")
        stages.getOrElseUpdate("TOTAL",
          scala.collection.mutable.Buffer()) += ((n, total))
      }
      docs.unpersist(blocking = true)
    }

    println("[soak-scale] ---- per-stage scaling (time ratio largest/smallest size) ----")
    val span = sizes.max.toDouble / sizes.min
    stages.foreach { case (name, xs) =>
      val lo = xs.minBy(_._1)._2; val hi = xs.maxBy(_._1)._2
      println(f"[soak-scale] $name%-26s ${hi / lo}%6.1fx time over ${span}%4.0fx docs" +
        f"  (${xs.map { case (s, d) => f"$s%d:$d%.2fs" }.mkString("  ")})")
    }
    spark.stop()
  }
}
