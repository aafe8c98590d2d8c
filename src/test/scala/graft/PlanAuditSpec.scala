package graft

/** Fleet-wide physical-plan audit over every registered query at
  * sf0.001: no accidental cartesian products or nested-loop joins.
  * Single-row broadcast cross joins (attaching a global aggregate like
  * a corpus-wide count to every row) are legitimate and whitelisted —
  * anything new showing up here must be justified or fixed. */
class PlanAuditSpec extends SparkSpec {

  // Queries whose plan legitimately contains a BroadcastNestedLoopJoin.
  // BNLJ is definitionally broadcast-sided; it is the RIGHT plan for
  // (a) non-equi predicate joins against a broadcast side — spatial
  // containment/bbox (zonal, xyz tiles, regrid probe), threshold
  // scans — and (b) tiny cross sides: the handful of ANN query
  // vectors, a one-row corpus aggregate, a config frame. Anything NEW
  // showing up here needs the same justification or an equi-key fix.
  private val reviewedBnlj = Set(
    "a19_threshold_area", "d_containment", "d_ngram_jaccard_capped", "f14_regrid_nearest",
    "j1_zonal_stats", "j1b_zonal_levels", "s10b_xyz_tiles",
    "s_ann_bruteforce", "s_ann_ivf", "s_ann_ivf_kmeans", "s_ann_ivfpq",
    "s_ann_ivfpq_rerank", // same 8-row coarse-probe cross as s_ann_ivfpq
    "s_ann_recall_eval", // composes the brute-force truth leg above
    "s_ann_ivfpq_resid", "s_ann_ivf_stream", "t_domain_mix",
    "t_unigram_surprisal", // one-row corpus-totals broadcast, like t_domain_mix
    "t_tfidf_topk", // one-row corpus-count broadcast, like t_domain_mix
    "v_transform_dispatch", "w9_funnel")

  test("no cartesian products; nested-loop joins only in the reviewed set") {
    var audited = 0
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap { case (name, fn) =>
      try {
        val df = fn(spark, sf0001)
        // execute FIRST: with AQE on, the pre-execution string shows the
        // initial plan; after an action the adaptive plan is final and
        // runtime replans (the thing this audit exists to catch) are
        // visible
        df.count()
        val plan = df.queryExecution.executedPlan.toString
        // sanity against node renames silently no-op'ing the audit
        assert(plan.contains("Scan") || plan.contains("Range"),
          s"$name: unrecognizable plan, audit patterns may be stale:\n$plan")
        audited += 1
        val cartesian = plan.contains("CartesianProduct")
        val bnlj = plan.contains("BroadcastNestedLoopJoin")
        if (cartesian || (bnlj && !reviewedBnlj.contains(name)))
          Some(s"$name: cartesian=$cartesian bnlj=$bnlj")
        else None
      } catch {
        case e: Throwable => Some(s"$name: failed to plan: ${e.getMessage}")
      }
    }
    assert(offenders.isEmpty, offenders.mkString("\n"))
    assert(audited == SparkEntry.queries.size)
  }

  test("sketch-backed rankers execute without a Window") {
    // a15_kmv_distinct and t_hash_sample replaced skewed row_number
    // windows with bounded-memory aggregates — a Window reappearing in
    // either plan means the scale fix regressed
    for (name <- Seq("a15_kmv_distinct", "t_hash_sample")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Window"), s"$name plan regained a Window:\n$plan")
    }
  }

  test("per-document text signals execute with ZERO exchanges") {
    // t_gopher_quality / t_repetition answer per-row questions with
    // sorted-hash run folds — the scale claim is that NOTHING
    // shuffles, and it is plan-gated here, not just prose
    for (name <- Seq("t_gopher_quality", "t_repetition")) {
      val df = SparkEntry.queries(name)(spark, sf0001)
      df.count()
      val plan = df.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"$name grew a shuffle — the per-row fold contract broke:\n$plan")
      assert(!plan.contains("Join"), s"$name grew a join:\n$plan")
    }
  }

  test("t_quality_lr: the model join is broadcast, never a corpus shuffle") {
    // classifier inference joins the exploded corpus against a
    // config-scale weight vector — if the weights ever arrive via a
    // shuffle join, every corpus word row pays an exchange for a
    // model-sized table
    val df = SparkEntry.queries("t_quality_lr")(spark, sf0001)
    df.count()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"t_quality_lr lost the broadcast model join:\n$plan")
    // the query has TWO joins (model, then the doc_id left join) — a
    // lone contains(BroadcastHashJoin) would pass even if the model
    // join degraded to a shuffle while the tiny doc_id join broadcast;
    // at this scale NO join may shuffle
    assert(!plan.contains("SortMergeJoin") && !plan.contains("ShuffledHashJoin"),
      s"t_quality_lr shuffles a join that should broadcast:\n$plan")
  }
}
