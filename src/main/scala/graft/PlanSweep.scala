package graft

/** Whole-suite plan audit: for EVERY registered query, count the plan
  * features the optimization guide says to check (§7.2) — Exchange
  * nodes, join strategies, scan pushdown — and flag the shapes that
  * would be scale bugs (cartesian products, sort-merge joins where a
  * broadcast was expected, scans with no pushed filters on filtered
  * paths). Output is one TSV line per query.
  *
  * Two modes:
  *  - default: the INITIAL plan (explain before execution — cheap, but
  *    with AQE on it shows `isFinalPlan=false` shapes that the runtime
  *    re-optimizer often rewrites, e.g. SMJ → BHJ once the built side's
  *    real size is known);
  *  - `--final OUTDIR`: EXECUTE each query through the noop sink first
  *    and count the final executed plan (AdaptiveSparkPlan's current
  *    physical plan) — the authoritative answer to "does this SMJ
  *    survive at runtime". Writes plan_sweep_final.tsv to OUTDIR.
  *
  * Run: sbt "runMain graft.PlanSweep" (writes plans/r14/plan_sweep.tsv)
  * or:  sbt "runMain graft.PlanSweep --final plans/r15". */
object PlanSweep {
  def main(args: Array[String]): Unit = {
    val finalMode = args.contains("--final")
    val outDir =
      if (finalMode) args(args.indexOf("--final") + 1) else "plans/r14"
    val spark = Sessions.build("8")
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Paths.get(outDir)
    java.nio.file.Files.createDirectories(out)
    val sb = new StringBuilder
    sb.append("query\texchanges\tbhj\tsmj\tshj\tbnlj\tcartesian\tsorts\twindows\tpushed_filters\treused_exchange\tcodegen_spans\n")
    for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
      try {
        val df = fn(spark, dir)
        val p = if (finalMode) {
          df.write.mode("overwrite").format("noop").save()
          // executedPlan after the action reflects AQE's final choices
          df.queryExecution
            .explainString(org.apache.spark.sql.execution.FormattedMode)
        } else df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        def n(pat: String) = pat.r.findAllIn(p).length
        // count physical-operator occurrences from the numbered node
        // list (lines like "(3) Exchange"), not prose mentions
        val exch = n("""\(\d+\) Exchange""")
        val bhj = n("""\(\d+\) BroadcastHashJoin""")
        val smj = n("""\(\d+\) SortMergeJoin""")
        val shj = n("""\(\d+\) ShuffledHashJoin""")
        val bnlj = n("""\(\d+\) BroadcastNestedLoopJoin""")
        val cart = n("""\(\d+\) CartesianProduct""")
        val sorts = n("""\(\d+\) Sort\b""")
        val wins = n("""\(\d+\) Window""")
        val pushed = n("""PushedFilters: \[[^\]]""") // non-empty lists only
        val reused = n("""ReusedExchange""")
        val wsc = n("""\(\d+\) WholeStageCodegen""")
        sb.append(s"$name\t$exch\t$bhj\t$smj\t$shj\t$bnlj\t$cart\t$sorts\t$wins\t$pushed\t$reused\t$wsc\n")
      } catch { case e: Throwable =>
        // pad to the full 12-column width so the TSV parses uniformly
        sb.append((Seq(name, "ERR", e.getClass.getSimpleName) ++
          Seq.fill(9)("ERR")).mkString("", "\t", "\n"))
      }
    }
    val fname = if (finalMode) "plan_sweep_final.tsv" else "plan_sweep.tsv"
    java.nio.file.Files.write(out.resolve(fname),
      sb.toString.getBytes("UTF-8"))
    println(s"[plan-sweep] wrote $outDir/$fname (${SparkEntry.queries.size} queries)")
    spark.stop()
  }
}
