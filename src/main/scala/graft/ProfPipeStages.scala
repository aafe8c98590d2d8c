package graft

import org.apache.spark.sql.DataFrame

/** Per-boundary timing of the SHIPPED d_pipeline_e2e plan (the real
  * query body via CurationQueries.pipelineE2e's stage hook — unlike
  * ProfilePipeline, which re-builds the pre-r9 shapes) at bench
  * conditions: pinned base tables, noop sink, N warm rounds. The
  * "rest" line is the final job (candidate ids, verify, canonicalize,
  * anti-join, per-source aggregate) — everything after the last
  * checkpointed boundary. Attribution evidence for the boundary-
  * optimum HELD call (OPTIMIZATION_r15 §6/§9b).
  * Run: tools/run_main.sh graft.ProfPipeStages [dir] [rounds]. */
object ProfPipeStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 5
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()

    val acc = scala.collection.mutable.Map[String,
      scala.collection.mutable.Buffer[Double]]()
    for (r <- 0 until (rounds + 1)) {
      val stageTimes = scala.collection.mutable.Buffer[(String, Double)]()
      val stage: (String, () => DataFrame) => DataFrame = (name, f) => {
        val t0 = System.nanoTime()
        val res = f()
        stageTimes += name -> (System.nanoTime() - t0) / 1e9
        res
      }
      val t0 = System.nanoTime()
      graft.llm.CurationQueries
        .pipelineE2e(Tables.documents(spark, dir), stage)
        .write.mode("overwrite").format("noop").save()
      val total = (System.nanoTime() - t0) / 1e9
      stageTimes += "rest (final job)" -> (total - stageTimes.map(_._2).sum)
      stageTimes += "TOTAL" -> total
      if (r >= 1) {
        for ((n, dt) <- stageTimes) {
          acc.getOrElseUpdate(n, scala.collection.mutable.Buffer()) += dt
          println(f"[prof-pipestages] round=${r - 1} $n%-28s $dt%7.3f s")
        }
      }
    }
    println("[prof-pipestages] ---- med over measured rounds ----")
    for ((n, xs0) <- acc) {
      val xs = xs0.sorted
      println(f"[prof-pipestages] $n%-28s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
