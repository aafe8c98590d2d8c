package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 plan evidence: dumps `.explain("formatted")` for each query
  * the optimization round touched, BEFORE and AFTER, into plans/r15/.
  * Where the r15 change is not conf-gated (f11's restructure), the
  * "before" frame is reconstructed inline from the pre-r15 expression
  * chain — both captures come from one build so the diff isolates the
  * claimed plan change. Run: sbt "runMain graft.ExplainR15". */
object ExplainR15 {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("8")
    val dir = "/root/testdata/sf0.01"
    val out = java.nio.file.Paths.get("plans/r15")
    java.nio.file.Files.createDirectories(out)

    // pre-r15 f11: md5 at scan parallelism, partial agg before the
    // exchange, buffers serialized across it
    def f11Before(s: SparkSession): DataFrame =
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))

    val picks: Seq[(String, Option[SparkSession => DataFrame])] = Seq(
      ("f11_input_hash", Some(f11Before _)),
      // before = the committed plans/r14/d_incremental_endstate_after.txt
      // (this round's change — hashed verification frame — is a code
      // restructure, so the r14 dump IS the pre-r15 plan)
      ("d_incremental_endstate", None)
    )

    def dump(name: String, df: DataFrame, suffix: String): Unit = {
      val txt = df.queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode).trim
      java.nio.file.Files.write(out.resolve(s"${name}_$suffix.txt"),
        (txt + "\n").getBytes("UTF-8"))
      println(s"[explain-r15] wrote ${name}_$suffix.txt")
    }

    for ((name, before) <- picks) {
      before.foreach(mk => dump(name, mk(spark), "before"))
      dump(name, SparkEntry.queries(name)(spark, dir), "after")
    }

    // session-2 one-shot shape switches (fp1x / spanwin / arrverify):
    // conf-gated, so both captures come straight from the conf
    def withConf[T](k: String, v: String)(f: => T): T = {
      spark.conf.set(k, v)
      try f finally spark.conf.unset(k)
    }
    withConf("graft.endstate.oneShotShape", "")(
      dump("d_incremental_endstate",
        SparkEntry.queries("d_incremental_endstate")(spark, dir), "s2shape_before"))
    dump("d_incremental_endstate",
      SparkEntry.queries("d_incremental_endstate")(spark, dir), "s2shape_after")
    // the dumps above show the FINAL job only (k3 sits behind its
    // localCheckpoint RDD); folding k3 via the existing boundary conf
    // yields one whole-query plan so the stage-1/stage-3 changes
    // (fp1x, spanwin) are visible too — explain-only, the shipped
    // execution keeps the k3 boundary (folding it measured 75% worse)
    // pipeline verify shape: the full-query dump cannot show this
    // change (the verify chain executes inside canonicalize's edge
    // checkpoint during construction), so dump the verify SUBCHAIN
    // itself — same operators over the same documents: candidate
    // pairs scored by the exploded distinct-row frame (before) vs the
    // per-doc hash-array frame (after)
    locally {
      import graft.llm.Dedup
      val docs = Tables.documents(spark, dir)
      val cand = Dedup.candidatePairs(
        Dedup.lshBands(Dedup.minhashFromText(docs, "doc_id", "text")))
      dump("pipeline_verify_subchain",
        Dedup.pairJaccardHashed(cand,
          Dedup.shingleHashes(docs, "doc_id", "text", spread = false))
          .filter(col("jacc") >= 0.5), "s2_before")
      dump("pipeline_verify_subchain",
        Dedup.pairJaccardArrays(cand,
          Dedup.shingleHashArrays(docs, "doc_id", "text"))
          .filter(col("jacc") >= 0.5), "s2_after")
    }
    withConf("graft.endstate.foldOneShot", "sh,bands,k3") {
      withConf("graft.endstate.oneShotShape", "")(
        dump("d_incremental_endstate",
          SparkEntry.queries("d_incremental_endstate")(spark, dir),
          "s2shape_full_before"))
      dump("d_incremental_endstate",
        SparkEntry.queries("d_incremental_endstate")(spark, dir),
        "s2shape_full_after")
    }
    spark.stop()
  }
}
