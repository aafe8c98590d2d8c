package graft

/** Dev tool: dump formatted physical plans for headline queries into
  * PLANS.md — the evidence for the pushdown/broadcast/shuffle claims in
  * README/SCALE. Run: sbt "runMain graft.Explain". */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.build("8")
    val dir = "/root/testdata/sf0.01"
    val picks = Seq(
      "p1_time_filter" -> "filter + projection pushdown to parquet",
      "j3_star_join" -> "all dimensions broadcast; single fact scan",
      "j1_zonal_stats" -> "broadcast boundary join + partial aggregation",
      "j1b_zonal_levels" -> "ONE broadcast join covers every admin level",
      "a3_temporal_aggregate" -> "calendar-bucket partial+final hash agg",
      "s_ann_lsh" -> "LSH bucket equi-join; bucket build has no exchange",
      "f7b_ramp_configured" -> "ramp sampling is a pure map-side projection",
      "f14_regrid_reproject" -> "CRS warp = the same single probe join",
      "w1_latest_item" -> "single window sort, no extra exchanges",
      "s_ann_ivfpq" -> "probed-cell ADC: one corpus join, broadcast LUT/cells",
      "t_repetition" -> "per-row sorted-hash folds: no exchange, no join — one projection over the scan",
      "t_pack_sequences" -> "packing = per-domain window, parallel not global",
      "a20_cube" -> "grouping-sets margins in ONE expand + hash aggregate",
      "w8_scd2" -> "two windows share one user_id exchange",
      "sql_local_volume" -> "five joins, every dimension broadcast, one fact shuffle",
      "s_ann_pq_rerank" -> "ADC candidates broadcast; raw vectors opened for 20 rows/query",
      "a21_pivot" -> "pivot = ONE hash aggregate, no distinct-values pre-pass",
      "d_repeated_spans" -> "input-spread exchange, then windowing as a projection; distinct-agg's two exchanges ship reduced partials; no joins",
      "d_span_coverage" -> "dup detection = map-side-combinable min/max hash AGGREGATE (no sort anywhere); a duplicated-hash bloom (scalar subquery) prunes singleton spans MAP-SIDE before any exchange; exact semi-join kills bloom FPs; interval merge rides the per-doc window partitioning",
      "j8b_asof_native" -> "custom-operator as-of; small right side auto-picks the broadcast exec: zero shuffles/sorts",
      "d_minhash_lsh" -> "capped LSH: ONE two-phase bounded_ids aggregate materializes buckets (NULL past the cap = hot-bucket exclusion); pairs stream from two Generates — the band stream crosses the wire once",
      "d_decontaminate_ngram" -> "gate below the shingle explode (one hash pass per doc); per-side dedup rides the join's h partitioning — each gram stream exchanges ONCE",
      "s10c_served_overview" -> "persisted-pyramid serving: the scan reads the _ov4 table (see Location), never base tiles; p_date + tile predicates stay sargable on the overview exactly as on a base scan",
      "f14_regrid_lcc" -> "conic-projection warp — still the same single broadcast probe join",
      "d_incremental_endstate" -> "four-stage greedy curation in one plan: each stage a checkpointed boundary, fuzzy stage joins only through band keys",
      "s_ann_ivf_stream" -> "incremental IVF search: the inverted-list scan carries PartitionFilters on the probed cell ids — only those cells' files open",
      "f14_regrid_stereo_ell" -> "datum-true warp: ellipsoidal math lives in the probe builder; the plan stays the one broadcast probe join",
      "s_semdedup" -> "cluster-bounded semantic dedup: assignment is map-side (literal centroids + native q_dot), pairs form only through the cid equi-join",
      "d_pii_redact" -> "PII scrub is ONE fused byte-scan kernel call per row — zero exchanges past the scan, no regex engine",
      "t_unigram_surprisal" -> "LM-filter shape: vocab count + token join share the word-key exchange; totals broadcast as one row; all-integer arithmetic",
      "a15_kmv_distinct" -> "KMV sketch as partial+final ObjectHashAggregate (k-entry heap state) — no window, no per-group sort",
      "t_gopher_quality" -> "fused BigramRunStats kernel: one call per document, zero exchanges",
      "f14_regrid_bilinear" -> "probe join with NO hint: config-scale probes broadcast on statistics; a continental target sort-merges (SoakRegrid)",
      "t_bpe_pairs" -> "BPE merge round: corpus collapses to the vocabulary first; pair explode runs over distinct words weighted by count",
      "s_ann_recall_eval" -> "recall@3 acceptance: brute-force truth vs IVF top-3, per-query join is evaluation-set-sized",
      "t_quality_lr" -> "classifier inference: model weights broadcast against the exploded corpus; per-doc margins reduce map-side",
      "f16_zorder_key" -> "Morton key = pure shift/mask projection inside whole-stage codegen; one distinct aggregate over the cube",
      "t_tfidf_topk" -> "tf is a map-side term_counts kernel projection (no corpus exchange); df vocabulary-sized, AQE-broadcast into the score join; top-k partials bound the doc shuffle",
      "m_image_ahash" -> "patterned corpus spread across cores (16-byte shuffle rows), then codec + hash entirely map-side — only (doc_id, 2 longs) ever shuffles")
    val sb = new StringBuilder
    sb.append("# PLANS — captured physical plans (sf0.01, local)\n\n")
    sb.append("Generated by `sbt \"runMain graft.Explain\"`. The things to\n")
    sb.append("check: `PushedFilters`/`ReadSchema` on scans (pushdown + column\n")
    sb.append("pruning), `BroadcastHashJoin` on dimension joins, `partial_`\n")
    sb.append("aggregates before exchanges (map-side combine).\n")
    for ((name, why) <- picks) {
      sb.append(s"\n## $name — $why\n\n```\n")
      sb.append(SparkEntry.queries(name)(spark, dir).queryExecution
        .explainString(org.apache.spark.sql.execution.FormattedMode).trim)
      sb.append("\n```\n")
    }
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get("PLANS.md"), sb.toString)
    println(s"[explain] wrote PLANS.md (${picks.size} plans)")
    spark.stop()
  }
}
