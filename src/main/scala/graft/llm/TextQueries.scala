package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified text-analysis queries over the `documents` table. */
object TextQueries extends QueryModule {

  override def queries = Map(
    // One BPE-training iteration at corpus scale: adjacent-character
    // pair counts weighted by word frequency — the merge-candidate
    // table a tokenizer trainer ranks each round. Scale shape: the
    // corpus collapses to the VOCABULARY first (one word-count
    // aggregation — the only corpus-sized shuffle), and pair explosion
    // runs over distinct words weighted by count, so the expensive
    // part is vocabulary-sized regardless of corpus size — exactly how
    // fastBPE/HF trainers stay tractable at 100 TB.
    "t_bpe_pairs" -> ((s, dir) => {
      val words = Tables.documents(s, dir)
        .select(explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .filter(length(col("w")) >= 2)
      val wc = words.groupBy("w").agg(count(lit(1)).as("c"))
      wc.select(col("c"), explode(expr(
          "transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))"))
          .as("pair"))
        .groupBy("pair").agg(sum(col("c")).as("n"))
    }),

    // Token counting: whitespace, BPE-ish regex, chars/4 estimate.
    "t_token_count" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n_ws"),
        TextAnalysis.tokenCountRe(col("text")).cast("long").as("n_re"),
        TextAnalysis.tokenCountApprox(col("text")).as("n_approx"))
    }),

    // Quality scoring: length/alpha/punct/stopword ratios + linear
    // score. Counts via the byte-scan kernels (TextScan.scala), regex
    // semantics preserved — the oracle still runs the regex forms.
    "t_quality_score" -> ((s, dir) => {
      import graft.functions.TextScan
      val t = col("text")
      val nChars = length(t).cast("long")
      val nWords = TextAnalysis.tokenCountWs(t).cast("long")
      val nAlpha = TextScan.alphaCount(t)
      val nPunct = TextScan.asciiClassCount(t, ".,;:!?")
      val nStop = TextScan.wordSetCounts(lower(t),
        Seq(TextAnalysis.stopwords("en"))).getItem(0).cast("long")
      Tables.documents(s, dir).select(
        col("doc_id"), nChars.as("n_chars"), nWords.as("n_words"),
        (nAlpha.cast("double") / nChars).as("alpha_ratio"),
        (nPunct.cast("double") / nChars).as("punct_ratio"),
        (nStop.cast("double") / nWords).as("stop_ratio"),
        TextAnalysis.qualityScore(t).as("quality"))
    }),

    // Language ID heuristic vs the labeled lang column.
    "t_langid" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), col("lang"),
        TextAnalysis.langId(col("text")).as("lang_pred"))
    }),

    // Document fingerprint (normalized md5).
    "t_fingerprint" -> ((s, dir) => {
      Tables.documents(s, dir).select(
        col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
    }),

    // Text normalization: the cleaning pass before tokenization —
    // lowercase, strip non-alphanumerics to spaces, collapse whitespace.
    "t_normalize" -> ((s, dir) => {
      Tables.documents(s, dir).select(col("doc_id"),
        trim(regexp_replace(
          regexp_replace(lower(col("text")), "[^a-z0-9 ]", " "),
          " +", " ")).as("clean"))
    }),

    // Exact dedup: group by content hash, canonical = min doc_id.
    "d_exact_dedup" -> ((s, dir) => {
      Tables.documents(s, dir)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("canonical"), count(lit(1)).as("n_dupes"))
    }),

    // Cross-source duplication matrix — the pipeline-observability
    // report behind "which feeds re-crawl each other": for every
    // source pair, how many normalized fingerprints they share. The
    // (source, fp) distinct runs FIRST so the join counts content
    // overlap, not doc-pair blowup, and the fp equi-join is
    // inverted-index shaped: a fingerprint held by k sources emits
    // k·(k−1)/2 rows — bounded by the source count, never the corpus.
    "d_source_overlap" -> ((s, dir) => {
      val sf = Tables.documents(s, dir)
        .select(col("source"), TextAnalysis.fingerprint(col("text")).as("fp"))
        .distinct()
      val a = sf.select(col("fp"), col("source").as("src_a"))
      val b = sf.select(col("fp"), col("source").as("src_b"))
      a.join(b, "fp").filter(col("src_a") < col("src_b"))
        .groupBy("src_a", "src_b").agg(count(lit(1)).as("n_shared"))
    }),

    // Deterministic stratified sampling — the dataset-curation
    // downsample: an md5 hash gate keeps ~20% of each language stratum
    // with NO random state, so any engine, cluster size, or re-run
    // reproduces the identical sample (rerunnable curation).
    "t_stratified_sample" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("g",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
        .filter(col("g") < 20)
        .select("doc_id", "lang", "g")
    }),

    // Deterministic EXACT-k per-group sample: the k docs with the
    // smallest doc-id hashes per source — reproducible (same corpus →
    // same sample, unlike ORDER BY rand()), and bounded-memory at any
    // scale: the per-group k-th minimum comes from the KMV aggregate
    // (k longs of state, partial+final — no window, no per-group
    // sort), then one filter pass keeps u ≤ k-th. Groups below k keep
    // everything (NULL threshold). Ties at the threshold (only hash
    // collisions) are kept by BOTH engines identically.
    "t_hash_sample" -> ((s, dir) => {
      val hashed = Tables.documents(s, dir)
        .withColumn("u",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      val kth = hashed.groupBy("source")
        .agg(graft.functions.KmvSketch.kthMin(col("u"), 5).as("uk"))
      hashed.join(kth, "source")
        .filter(col("uk").isNull || col("u") <= col("uk"))
        .select("source", "doc_id", "u")
    }),

    // Deterministic train/val/test split (80/10/10): the same hash gate
    // assigns each document a stable split — membership never changes
    // as the corpus grows, which leakage-free incremental training needs.
    "t_dataset_split" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("g",
          expr("CAST(conv(substring(md5(CAST(doc_id AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"))
        .withColumn("split",
          when(col("g") < 80, "train").when(col("g") < 90, "val").otherwise("test"))
        .groupBy("lang", "split")
        .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("first_doc"))
    })
  )

  override def oracleSql = Map(
    "t_bpe_pairs" ->
      """WITH toks AS (
        |  SELECT unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |wc AS (
        |  SELECT w, count(*) AS c FROM toks WHERE length(w) >= 2 GROUP BY w),
        |pairs AS (
        |  SELECT substring(w, CAST(i + 1 AS INT), 2) AS pair, c
        |  FROM (SELECT w, c, unnest(range(greatest(length(w) - 1, 0))) AS i FROM wc))
        |SELECT pair, CAST(sum(c) AS BIGINT) AS n FROM pairs GROUP BY pair""".stripMargin,
    "t_token_count" ->
      """SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_ws,
        |  CAST(len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS n_re,
        |  CAST((length(text) + 3) // 4 AS BIGINT) AS n_approx
        |FROM documents""".stripMargin,
    "t_quality_score" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS na,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS np,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS BIGINT) AS ns
        |  FROM documents)
        |SELECT doc_id, nc AS n_chars, nw AS n_words,
        |  CAST(na AS DOUBLE) / nc AS alpha_ratio,
        |  CAST(np AS DOUBLE) / nc AS punct_ratio,
        |  CAST(ns AS DOUBLE) / nw AS stop_ratio,
        |  least(1.0, greatest(0.0,
        |    0.25 + CAST(ns AS DOUBLE) / nw * 2.0
        |         - CAST(np AS DOUBLE) / nc * 3.0
        |         + CAST(na AS DOUBLE) / nc * 0.5)) AS quality
        |FROM c""".stripMargin,
    "t_langid" ->
      """WITH c AS (
        |  SELECT doc_id, lang,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS INT) AS c_en,
        |    CAST(len(regexp_extract_all(lower(text), '\b(el|la|de|que|los|en|un|una)\b')) AS INT) AS c_es,
        |    CAST(len(regexp_extract_all(lower(text), '\b(der|die|das|und|ist|ein|nicht)\b')) AS INT) AS c_de,
        |    CAST(len(regexp_extract_all(lower(text), '\b(le|les|des|une|est|et|dans)\b')) AS INT) AS c_fr,
        |    CAST(len(regexp_extract_all(text, '[\x{4e00}-\x{9fff}]')) AS INT) AS c_zh
        |  FROM documents)
        |SELECT doc_id, lang,
        |  CASE WHEN c_zh > 0 THEN 'zh'
        |       WHEN c_en + c_es + c_de + c_fr = 0 THEN 'und'
        |       WHEN c_en >= c_es AND c_en >= c_de AND c_en >= c_fr THEN 'en'
        |       WHEN c_es >= c_de AND c_es >= c_fr THEN 'es'
        |       WHEN c_de >= c_fr THEN 'de'
        |       ELSE 'fr' END AS lang_pred
        |FROM c""".stripMargin,
    "t_fingerprint" ->
      """SELECT doc_id, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |FROM documents""".stripMargin,
    "t_normalize" ->
      """SELECT doc_id,
        |  trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g')) AS clean
        |FROM documents""".stripMargin,
    "d_exact_dedup" ->
      """SELECT md5(text) AS h, min(doc_id) AS canonical, count(*) AS n_dupes
        |FROM documents GROUP BY 1""".stripMargin,
    "d_source_overlap" ->
      """WITH sf AS (
        |  SELECT DISTINCT source, md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
        |  FROM documents)
        |SELECT a.source AS src_a, b.source AS src_b, CAST(count(*) AS BIGINT) AS n_shared
        |FROM sf a JOIN sf b ON a.fp = b.fp AND a.source < b.source
        |GROUP BY 1, 2""".stripMargin,
    "t_stratified_sample" ->
      """SELECT doc_id, lang,
        |  CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS g
        |FROM documents
        |WHERE CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 < 20""".stripMargin,
    "t_hash_sample" ->
      """WITH h AS (
        |  SELECT source, doc_id,
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT) AS u
        |  FROM documents),
        |rn AS (
        |  SELECT source, u, row_number() OVER (PARTITION BY source ORDER BY u) AS r
        |  FROM h),
        |kth AS (
        |  SELECT source, max(CASE WHEN r = 5 THEN u END) AS uk
        |  FROM rn GROUP BY source)
        |SELECT h.source AS source, doc_id, u
        |FROM h JOIN kth ON h.source = kth.source
        |WHERE uk IS NULL OR u <= uk""".stripMargin,
    "t_dataset_split" ->
      """WITH g AS (
        |  SELECT doc_id, lang,
        |    CAST(concat('0x', substring(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT) % 100 AS gg
        |  FROM documents)
        |SELECT lang,
        |  CASE WHEN gg < 80 THEN 'train' WHEN gg < 90 THEN 'val' ELSE 'test' END AS split,
        |  count(*) AS n_docs, min(doc_id) AS first_doc
        |FROM g GROUP BY 1, 2""".stripMargin
  )
}
