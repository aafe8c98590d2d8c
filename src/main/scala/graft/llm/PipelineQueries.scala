package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators beyond similarity/dedup: intra-doc
  * repetition signals, sequence packing, and slowly-changing-dimension
  * interval builds. All exact-arithmetic so the DuckDB oracles
  * hash-match.
  */
object PipelineQueries extends QueryModule {

  /** Words of a doc, matching the oracle's
    * string_split_regex(trim(lower(text)), '\s+'). */
  private def wordsCol = split(trim(lower(col("text"))), "\\s+")

  override def queries = Map(
    // Intra-document repetition (the Gopher-style repetition filters):
    // duplicate-word fraction and the mass of the single most frequent
    // word bigram. Highly repetitive docs (boilerplate, keyword spam,
    // scraped nav bars) score high on both and get dropped before
    // training. Fully shuffle-free: every signal is a per-document
    // sorted-array fold (non-distinct bigram multiplicities come from
    // run lengths — the shared shingle index is DISTINCT by
    // construction and can't serve here, and the old explode + two
    // aggregations + join moved corpus-sized bigram rows for per-row
    // answers).
    "t_repetition" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val w = docs.select(col("doc_id"), wordsCol.as("ws"))
      val nWords = size(col("ws")).cast("long")
      // one fused native kernel call per document (RunStats.scala)
      val rs = graft.functions.BigramRunStats.bigramStats(col("ws"))
      val top = rs.getField("max_bigram_run")
      val tot = rs.getField("n_bigrams")
      w.select(
        col("doc_id"),
        nWords.as("n_words"),
        (lit(1.0) - rs.getField("n_distinct_words").cast("double") / nWords)
          .as("dup_word_frac"),
        when(tot > 0, top.cast("double") / tot).otherwise(lit(0.0))
          .as("top_bigram_frac"))
    }),

    // Curriculum ordering: a TOTAL global rank of the corpus by quality
    // (desc, doc_id tiebreak) — the order a curriculum schedule feeds
    // the trainer. row_number over an empty window would serialize the
    // corpus through one partition; Rank.globalRank range-partitions on
    // the sort key and stamps offsets from a two-pass prefix sum, so
    // 10⁹ docs rank with no partition ever holding more than its range
    // slice.
    "t_curriculum" -> ((s, dir) => {
      val quality = TextAnalysis.qualityScore(col("text"))
      val scored = Tables.documents(s, dir)
        .select(col("doc_id"), quality.as("quality"))
      graft.ops.Rank.globalRank(scored,
        Seq(col("quality").desc, col("doc_id").asc))
        .select(col("doc_id"), col("quality"), col("rank"))
    }),

    // Token-budget selection: take the highest-quality documents until
    // a token budget is exhausted ("the best 1B tokens"). The running
    // total in quality order is sum() OVER (ORDER BY …) — which Spark
    // plans as a SINGLE-partition window at any corpus size;
    // Rank.prefixSum is the range-partitioned two-pass form (partition
    // sums to the driver, offsets broadcast, map-side stamping).
    "t_token_budget" -> ((s, dir) => {
      val quality = TextAnalysis.qualityScore(col("text"))
      val scored = Tables.documents(s, dir).select(
        col("doc_id"), quality.as("quality"),
        size(wordsCol).cast("long").as("tokens"))
      graft.ops.Rank.prefixSum(scored,
        Seq(col("quality").desc, col("doc_id").asc), "tokens", "cum_tokens")
        .withColumn("keep", col("cum_tokens") <= 50000L)
    }),

    // Balanced shard assignment: distribute documents across 16 output
    // shards with near-equal TOKEN mass — the last step before writing
    // training shards. Greedy longest-processing-time bin packing is
    // inherently sequential; the distributed equivalent is rank by size
    // descending and deal round-robin (rank mod N), which bounds the
    // per-shard spread by one max-document and is fully parallel:
    // Rank.globalRank range-partitions the size sort, so no task ever
    // holds more than its range slice at any corpus size.
    "t_shard_assign" -> ((s, dir) => {
      val sized = Tables.documents(s, dir)
        .select(col("doc_id"), size(wordsCol).cast("long").as("tokens"))
      graft.ops.Rank.globalRank(sized,
        Seq(col("tokens").desc, col("doc_id").asc))
        .withColumn("shard", (col("rank") - 1) % 16)
        .groupBy("shard")
        .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"),
          min("tokens").as("min_tokens"), max("tokens").as("max_tokens"))
    }),

    // Linear quality-classifier inference (the fastText/DCLM-style
    // model-based filter): score = bias + Σ count(w)·weight(w) over a
    // trained vocabulary. The model is a config-scale artifact (like
    // the IVF centroids/PQ codebooks), so inference is a broadcast
    // hash join against the exploded corpus with map-side partial sums
    // — the per-doc shuffle carries one partial long per document, and
    // nothing corpus-sized ever moves. Integer centi-weights keep the
    // margin exact cross-engine.
    "t_quality_lr" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val weights = s.createDataFrame(QualityLrModel.weights)
        .toDF("w", "wt")
      val dot = docs.select(col("doc_id"), explode(wordsCol).as("w"))
        .join(broadcast(weights), Seq("w"))
        .groupBy("doc_id").agg(sum("wt").as("dot"))
      val margin = coalesce(col("dot"), lit(0L)) + lit(QualityLrModel.biasCents)
      docs.select(col("doc_id")).join(dot, Seq("doc_id"), "left")
        .select(col("doc_id"),
          (margin.cast("double") / 100.0).as("margin"),
          (margin > 0).as("keep"))
    }),

    // Sequence packing: greedy contiguous packing of documents into
    // fixed 2048-token training sequences, per source domain. Bin id is
    // floor(preceding-token-count / 2048) over a deterministic doc_id
    // order — the running-sum formulation keeps the whole operator a
    // window + aggregate (no sequential driver loop), and partitioning
    // by source keeps the windows parallel at cluster scale (a single
    // global window would serialize on one task; per-domain packing is
    // also what a curriculum-ordered pipeline actually wants).
    "t_pack_sequences" -> ((s, dir) => {
      val win = Window.partitionBy("source").orderBy("doc_id")
      Tables.documents(s, dir)
        .select(col("source"), col("doc_id"), size(wordsCol).cast("long").as("tokens"))
        .withColumn("cum", sum("tokens").over(win))
        .withColumn("bin", floor((col("cum") - col("tokens")) / lit(2048.0)))
        .groupBy("source", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("tokens").as("n_tokens"),
          min("doc_id").as("first_doc"), max("doc_id").as("last_doc"))
    }),

    // TF-IDF top terms per document with a RATIONAL idf weight
    // (tf·N/df instead of tf·log(N/df) — log's last-ulp varies across
    // libm implementations and would break the cross-engine hash gate;
    // the ranking intent is identical). tf never shuffles AT ALL: each
    // document's words live in its own row, so the `term_counts`
    // kernel computes the (term, tf) pairs as a map-side projection —
    // the textbook explode → groupBy(doc, word) form pays a
    // corpus-sized exchange for counts that never needed to leave the
    // row. df — the number of documents containing each word — derives
    // from tf's rows (they ARE the distinct (doc, word) pairs) with a
    // vocabulary-sized aggregate; the score join is left to AQE, which
    // broadcasts df at any realistic vocab scale.
    "t_tfidf_topk" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      // corpus size as a one-row broadcast (like t_domain_mix), not a
      // separate driver count() action per invocation
      val n = docs.agg(count(lit(1)).as("n"))
      val tf = docs.select(col("doc_id"),
          explode(graft.functions.TermCounts.termCounts(wordsCol)).as("e"))
        .select(col("doc_id"), col("e.term").as("w"), col("e.tf").as("tf"))
      val df = tf.groupBy("w").agg(count(lit(1)).as("df"))
      // per-doc top 3 via the bounded top-k aggregate: partials reduce
      // each map partition to ≤3 rows per doc BEFORE the doc_id
      // shuffle — where the window form shuffles every scored term and
      // sorts each group. Tie-break (score DESC, term ASC) identical.
      tf.join(df, Seq("w")).crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
        .groupBy("doc_id")
        .agg(graft.functions.TopK.byScore(col("score"), col("w"), 3).as("top"))
        .select(col("doc_id"), posexplode(col("top")))
        .select(col("doc_id"), col("col.term").as("term"),
          col("col.score").as("score"), (col("pos") + 1).cast("int").as("rank"))
    }),

    // Grouping-sets rollup (CUBE) over the event stream: every
    // (event_type × year) margin in ONE aggregation pass — Spark expands
    // the grouping sets map-side, so the plan stays a single hash
    // aggregate instead of 4 unioned scans. Sums use the exact-cents
    // discipline so the margins hash cross-engine.
    "a20_cube" -> ((s, dir) =>
      Tables.events(s, dir)
        .cube(col("event_type"), year(col("ts")).cast("long").as("yr"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))),

    // Pivot: per-user event counts spread across one column per event
    // type. An EXPLICIT value list keeps the schema static (Spark's
    // two-pass distinct-then-pivot would otherwise scan twice and make
    // the schema data-dependent); the plan is one hash aggregate with
    // map-side partials, exactly the manual CASE formulation the oracle
    // writes out.
    "a21_pivot" -> ((s, dir) =>
      Tables.events(s, dir)
        .groupBy("user_id")
        .pivot("event_type", Seq("click", "view", "signup", "purchase", "error"))
        .agg(count(lit(1)))
        .na.fill(0L)),

    // Ordered funnel (view → click → purchase): step k counts users
    // whose first step-k event follows their first step-(k-1) event.
    // Three aggregate+join stages, each shuffling only (user_id, ts)
    // pairs; the final single row is three broadcast-joined counts.
    "w9_funnel" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      def firstAfter(step: String, prev: org.apache.spark.sql.DataFrame, prevTs: String, outTs: String) =
        ev.filter(col("event_type") === step)
          .join(prev, Seq("user_id"))
          .filter(col("ts") > col(prevTs))
          .groupBy("user_id").agg(min("ts").as(outTs))
      val v = ev.filter(col("event_type") === "view")
        .groupBy("user_id").agg(min("ts").as("t1"))
      val c = firstAfter("click", v, "t1", "t2")
      val p = firstAfter("purchase", c, "t2", "t3")
      v.agg(count(lit(1)).as("n_view"))
        .crossJoin(c.agg(count(lit(1)).as("n_click")))
        .crossJoin(p.agg(count(lit(1)).as("n_purchase")))
    }),

    // Weekly cohort retention: cohort = week of first activity;
    // retention(k) = distinct active users k weeks later / cohort size.
    // Both week keys are Monday-truncated so the day-difference is an
    // exact multiple of 7 — k stays integer arithmetic cross-engine.
    "w10_retention" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val f = ev.groupBy("user_id")
        .agg(date_trunc("week", min("ts")).as("cohort"))
      val a = ev.select(col("user_id"), date_trunc("week", col("ts")).as("wk")).distinct()
      val j = a.join(f, Seq("user_id"))
        .groupBy(col("cohort"),
          (datediff(col("wk"), col("cohort")) / 7).cast("long").as("k"))
        .agg(countDistinct("user_id").as("active"))
      val sz = f.groupBy("cohort").agg(count(lit(1)).as("cohort_size"))
      j.join(sz, Seq("cohort"))
        .select(col("cohort"), col("k"), col("active"), col("cohort_size"),
          (col("active").cast("double") / col("cohort_size")).as("retention"))
    }),

    // Last-touch attribution (batch twin of the streaming interval
    // join Windows.attributionJoin): each purchase attributes to the
    // user's most recent click within the trailing hour. The self-join
    // shuffles both sides on user_id once; the row_number pick rides
    // the same partitioning.
    "j10_attribution" -> ((s, dir) => {
      val ev = Tables.events(s, dir)
      val clicks = ev.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts").as("click_ts"), col("event_id").as("click_id"))
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts").as("purchase_ts"), col("event_id").as("purchase_id"))
      val w = Window.partitionBy("purchase_id")
        .orderBy(col("click_ts").desc, col("click_id").desc)
      purchases.join(clicks, Seq("user_id"))
        .filter(col("click_ts") <= col("purchase_ts") &&
          col("click_ts") >= col("purchase_ts") - expr("INTERVAL 1 HOUR"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("purchase_id", "user_id", "purchase_ts", "click_id", "click_ts")
    }),

    // SCD-2 interval build over the events stream: collapse each user's
    // event sequence to state-change rows with [valid_from, valid_to)
    // validity and an is_current flag — the standard
    // slowly-changing-dimension type-2 shape for replaying "what was the
    // state at time T" joins. Two windows, both partitioned by user_id,
    // so the whole operator is one shuffle; change-point filtering
    // happens between them on the already-partitioned data.
    "w8_scd2" -> ((s, dir) => {
      val byUser = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables.events(s, dir)
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("prev", lag("event_type", 1).over(byUser))
        .filter(col("prev").isNull || col("prev") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead("ts", 1).over(byUser))
        .select(
          col("user_id"), col("event_type").as("state"),
          col("ts").as("valid_from"), col("valid_to"),
          col("valid_to").isNull.as("is_current"))
    })
  )

  override def oracleSql = Map(
    "t_repetition" ->
      """WITH words AS (
        |  SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
        |base AS (
        |  SELECT doc_id, len(ws) AS n_words, len(list_distinct(ws)) AS n_distinct FROM words),
        |bg AS (
        |  SELECT doc_id, ws[i + 1] || ' ' || ws[i + 2] AS s
        |  FROM (SELECT doc_id, ws, unnest(range(len(ws) - 1)) AS i FROM words)),
        |cnt AS (SELECT doc_id, s, count(*) AS c FROM bg GROUP BY 1, 2),
        |agg AS (SELECT doc_id, max(c) AS top, sum(c) AS tot FROM cnt GROUP BY 1)
        |SELECT b.doc_id AS doc_id,
        |  CAST(n_words AS BIGINT) AS n_words,
        |  1.0 - CAST(n_distinct AS DOUBLE) / n_words AS dup_word_frac,
        |  coalesce(CAST(top AS DOUBLE) / tot, 0.0) AS top_bigram_frac
        |FROM base b LEFT JOIN agg USING (doc_id)""".stripMargin,
    "t_curriculum" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS na,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS np,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS BIGINT) AS ns
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, least(1.0, greatest(0.0,
        |    0.25 + CAST(ns AS DOUBLE) / nw * 2.0
        |         - CAST(np AS DOUBLE) / nc * 3.0
        |         + CAST(na AS DOUBLE) / nc * 0.5)) AS quality
        |  FROM c)
        |SELECT doc_id, quality,
        |  CAST(row_number() OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS rank
        |FROM q""".stripMargin,
    "t_pack_sequences" ->
      """WITH t AS (
        |  SELECT source, doc_id,
        |    len(string_split_regex(trim(lower(text)), '\s+')) AS tokens
        |  FROM documents),
        |c AS (
        |  SELECT source, doc_id, tokens,
        |    sum(tokens) OVER (PARTITION BY source ORDER BY doc_id) AS cum
        |  FROM t)
        |SELECT source,
        |  CAST(floor((cum - tokens) / 2048.0) AS BIGINT) AS bin,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM c GROUP BY 1, 2""".stripMargin,
    "t_tfidf_topk" ->
      """WITH words AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |  FROM documents),
        |tf AS (SELECT doc_id, w, count(*) AS tf FROM words GROUP BY 1, 2),
        |df AS (SELECT w, count(DISTINCT doc_id) AS df FROM words GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT doc_id, tf.w AS term,
        |    CAST(tf * n AS DOUBLE) / df AS score
        |  FROM tf JOIN df ON tf.w = df.w CROSS JOIN n)
        |SELECT doc_id, term, score, rank FROM (
        |  SELECT doc_id, term, score,
        |    CAST(row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term ASC) AS INT) AS rank
        |  FROM scored) t
        |WHERE rank <= 3""".stripMargin,
    "a20_cube" ->
      """SELECT event_type, year(ts) AS yr, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY CUBE (event_type, year(ts))""".stripMargin,
    "a21_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error
        |FROM events GROUP BY 1""".stripMargin,
    "w9_funnel" ->
      """WITH v AS (
        |  SELECT user_id, min(ts) AS t1 FROM events
        |  WHERE event_type = 'view' GROUP BY 1),
        |c AS (
        |  SELECT e.user_id, min(ts) AS t2 FROM events e
        |  JOIN v ON e.user_id = v.user_id AND e.ts > v.t1
        |  WHERE event_type = 'click' GROUP BY 1),
        |p AS (
        |  SELECT e.user_id, min(ts) AS t3 FROM events e
        |  JOIN c ON e.user_id = c.user_id AND e.ts > c.t2
        |  WHERE event_type = 'purchase' GROUP BY 1)
        |SELECT (SELECT count(*) FROM v) AS n_view,
        |       (SELECT count(*) FROM c) AS n_click,
        |       (SELECT count(*) FROM p) AS n_purchase""".stripMargin,
    "w10_retention" ->
      """WITH f AS (
        |  SELECT user_id, date_trunc('week', min(ts)) AS cohort
        |  FROM events GROUP BY 1),
        |a AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS wk FROM events),
        |j AS (
        |  SELECT cohort, CAST(date_diff('day', cohort, wk) / 7 AS BIGINT) AS k,
        |    count(DISTINCT a.user_id) AS active
        |  FROM a JOIN f USING (user_id) GROUP BY 1, 2),
        |s AS (SELECT cohort, count(*) AS cohort_size FROM f GROUP BY 1)
        |SELECT j.cohort AS cohort, k, active, cohort_size,
        |  CAST(active AS DOUBLE) / cohort_size AS retention
        |FROM j JOIN s USING (cohort)""".stripMargin,
    "j10_attribution" ->
      """WITH c AS (
        |  SELECT user_id, ts AS click_ts, event_id AS click_id
        |  FROM events WHERE event_type = 'click'),
        |p AS (
        |  SELECT user_id, ts AS purchase_ts, event_id AS purchase_id
        |  FROM events WHERE event_type = 'purchase'),
        |j AS (
        |  SELECT purchase_id, p.user_id AS user_id, purchase_ts, click_id, click_ts,
        |    row_number() OVER (PARTITION BY purchase_id
        |                       ORDER BY click_ts DESC, click_id DESC) AS rn
        |  FROM p JOIN c ON p.user_id = c.user_id
        |    AND click_ts <= purchase_ts
        |    AND click_ts >= purchase_ts - INTERVAL 1 HOUR)
        |SELECT purchase_id, user_id, purchase_ts, click_id, click_ts
        |FROM j WHERE rn = 1""".stripMargin,
    "w8_scd2" ->
      """WITH ordered AS (
        |  SELECT user_id, ts, event_id, event_type,
        |    lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
        |  FROM events),
        |changes AS (
        |  SELECT user_id, ts, event_id, event_type FROM ordered
        |  WHERE prev IS NULL OR prev != event_type)
        |SELECT user_id, event_type AS state, ts AS valid_from,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS valid_to,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL AS is_current
        |FROM changes""".stripMargin,
    "t_token_budget" ->
      """WITH c AS (
        |  SELECT doc_id,
        |    CAST(length(text) AS BIGINT) AS nc,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS nw,
        |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS na,
        |    CAST(len(regexp_extract_all(text, '[.,;:!?]')) AS BIGINT) AS np,
        |    CAST(len(regexp_extract_all(lower(text), '\b(the|and|of|to|in|is|that|for)\b')) AS BIGINT) AS ns,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS tokens
        |  FROM documents),
        |q AS (
        |  SELECT doc_id, least(1.0, greatest(0.0,
        |    0.25 + CAST(ns AS DOUBLE) / nw * 2.0
        |         - CAST(np AS DOUBLE) / nc * 3.0
        |         + CAST(na AS DOUBLE) / nc * 0.5)) AS quality,
        |    tokens
        |  FROM c)
        |SELECT doc_id, quality, tokens,
        |  CAST(sum(tokens) OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) AS cum_tokens,
        |  CAST(sum(tokens) OVER (ORDER BY quality DESC, doc_id ASC) AS BIGINT) <= 50000 AS keep
        |FROM q""".stripMargin,
    "t_shard_assign" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(string_split_regex(trim(lower(text)), '\s+')) AS BIGINT) AS tokens
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, tokens,
        |    row_number() OVER (ORDER BY tokens DESC, doc_id ASC) AS rank
        |  FROM t)
        |SELECT CAST((rank - 1) % 16 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(tokens) AS BIGINT) AS n_tokens,
        |  min(tokens) AS min_tokens, max(tokens) AS max_tokens
        |FROM r GROUP BY 1""".stripMargin,
    "t_quality_lr" ->
      s"""WITH wt(w, wt) AS (SELECT * FROM (VALUES ${QualityLrModel.sqlValues}) v(w, wt)),
        |words AS (
        |  SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\\s+')) AS w
        |  FROM documents),
        |dot AS (
        |  SELECT doc_id, CAST(sum(wt) AS BIGINT) AS dot
        |  FROM words JOIN wt USING (w) GROUP BY 1)
        |SELECT d.doc_id AS doc_id,
        |  CAST(coalesce(dot, 0) + ${QualityLrModel.biasCents} AS DOUBLE) / 100.0 AS margin,
        |  (coalesce(dot, 0) + ${QualityLrModel.biasCents}) > 0 AS keep
        |FROM documents d LEFT JOIN dot USING (doc_id)""".stripMargin
  )
}

/** Trained-model artifact for `t_quality_lr` — a linear classifier's
  * vocabulary weights in integer centi-units (config scale: a real
  * fastText-style quality model is a few MB of weights, broadcast like
  * the IVF centroids / PQ codebooks). Positive weight = signal of
  * useful content; negative = boilerplate/noise markers. */
private[llm] object QualityLrModel {
  val weights: Seq[(String, Long)] = Seq(
    "spark" -> 20L, "vector" -> 18L, "data" -> 15L, "query" -> 12L,
    "join" -> 10L, "fast" -> 8L, "merge" -> 5L, "scan" -> -6L,
    "slow" -> -25L, "error" -> -30L, "the" -> -2L, "a" -> -1L)
  val biasCents: Long = -400L

  /** The same model as a DuckDB VALUES list for the oracle. */
  def sqlValues: String =
    weights.map { case (w, c) => s"('$w', $c)" }.mkString(", ")
}
