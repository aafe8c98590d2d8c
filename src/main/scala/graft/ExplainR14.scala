package graft

/** Round-14 plan evidence: dumps `.explain("formatted")` for each query
  * the optimization round touched, BEFORE and AFTER, into plans/r14/.
  * "Before" is reproduced from the shipped code by forcing the
  * pre-r14 shape through its conf switch (the r14 changes are all
  * conf-gated plan choices), so both captures come from one build and
  * the diff isolates exactly the plan change being claimed.
  * Run: sbt "runMain graft.ExplainR14". */
object ExplainR14 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("8")
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Paths.get("plans/r14")
    java.nio.file.Files.createDirectories(out)

    // (query, confs for the BEFORE shape, confs for the AFTER shape)
    val picks: Seq[(String, Map[String, String], Map[String, String])] = Seq(
      // r14: one-shot endstate folds the sh+bands checkpoint boundaries
      // (ProfEndstate14: med 3.58 s vs 3.97 s shipped r13 shape).
      // before: fold nothing = the r13 every-boundary-checkpointed form.
      ("d_incremental_endstate",
        Map("graft.endstate.foldOneShot" -> ""),
        Map.empty[String, String]),
      // r14: pipeline fold experiment — shipped shape UNCHANGED (every
      // fold inside noise, combinations worse; ProfPipe14). Captured so
      // the "deliberately left alone" claim is checkable against the
      // identical before/after plans.
      ("d_pipeline_e2e",
        Map.empty[String, String],
        Map.empty[String, String])
    )

    def capture(name: String, confs: Map[String, String], suffix: String): Unit = {
      val toRestore = confs.keys.map(k => k -> spark.conf.getOption(k)).toSeq
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val txt = df.queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode).trim
        java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
          (txt + "\n").getBytes("UTF-8"))
        println(s"[explain-r14] wrote ${name}_$suffix.txt")
      } finally toRestore.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    for ((name, before, after) <- picks) {
      capture(name, before, "before")
      capture(name, after, "after")
    }
    spark.stop()
  }
}
