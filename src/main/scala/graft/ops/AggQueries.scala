package graft.ops

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified queries for the aggregation + join surface (SURVEY §2.3/2.4),
  * exercised over the driver tables with the Exact numeric discipline so
  * Spark's partial/final aggregation hash-matches a single-node engine.
  */
object AggQueries extends QueryModule {

  override def queries = Map(
    // A1 — per-group stats: NaN/NULL-aware min/max/mean/std (pixel-stats
    // shape; ref ingestion/utils.py:82-99). Quantity is integer-valued so
    // sums are exact; stddev is derived from exact power sums.
    "a1_pixel_stats" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          min(col("l_quantity")).as("vmin"),
          max(col("l_quantity")).as("vmax"),
          (sum(col("l_quantity")).cast("double") / count(col("l_quantity"))).as("vmean"),
          Exact.stddevPopExact(col("l_quantity")).as("vstd"),
          count(col("l_quantity")).as("n"))
    }),

    // A3 — temporal_aggregate: calendar-bucket resample (month) + how.
    // Ref geoprocessing/temporal.py:52-74.
    "a3_temporal_aggregate" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_trunc("month", col("ts")).as("bucket"), col("event_type"))
        .agg(
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0
            / count(col("value"))).as("mean_value"),
          count(col("value")).as("n"))
    }),

    // A4 — climatology: collapse all years onto the month-of-year slot.
    // Ref geoprocessing/temporal.py:77-87.
    "a4_climatology" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(Algebra.monthSlot(col("l_shipdate")).as("m"))
        .agg((sum(col("l_quantity")).cast("double") / count(lit(1))).as("clim"),
             count(lit(1)).as("n_contrib"))
    }),

    // A6/J2 — anomaly: each (year,month) value joined to its calendar-slot
    // climatology; absolute + relative anomaly with safe_divide.
    // Ref geoprocessing/temporal.py:107-124, docs/adr/0007.
    "a6_anomaly" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir)
      val monthly = li.groupBy(
          year(col("l_shipdate")).cast("int").as("yr"),
          Algebra.monthSlot(col("l_shipdate")).as("m"))
        .agg((sum(col("l_quantity")).cast("double") / count(lit(1))).as("v"))
      val clim = li.groupBy(Algebra.monthSlot(col("l_shipdate")).as("m"))
        .agg((sum(col("l_quantity")).cast("double") / count(lit(1))).as("clim"))
      monthly.join(broadcast(clim), Seq("m"))
        .select(col("yr"), col("m"), col("v"), col("clim"),
          (col("v") - col("clim")).as("anom"),
          Algebra.safeDivide(col("v") - col("clim"), col("clim")).as("rel_anom"))
    }),

    // A5 — trend: degree-1 least-squares slope of yearly totals vs year,
    // from exact integer sums (ref geoprocessing/temporal.py:90-104).
    "a5_trend" -> ((s, dir) => {
      val yearly = Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), year(col("l_shipdate")).cast("long").as("x"))
        .agg(sum(col("l_quantity")).cast("long").as("y"))
      yearly.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
             sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
        .select(col("l_returnflag"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
            / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")).as("slope"))
    }),

    // A7 — raster_combine weighted mean with NULL-masked weight
    // renormalization (ref geoprocessing/algebra.py:33-74): weights of
    // NULL cells are excluded from the denominator.
    "a7_weighted_combine" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("w", (col("event_id") % 5).cast("long"))
        .withColumn("v100",
          when(col("event_type") === "error", lit(null))
            .otherwise(round(col("value") * 100).cast("long")))
      e.groupBy("user_id")
        .agg(
          (sum(col("w") * col("v100")).cast("double") / 100.0).as("wsum"),
          Algebra.safeDivide(
            sum(col("w") * col("v100")).cast("double") / 100.0,
            sum(when(col("v100").isNotNull, col("w")).otherwise(0L)).cast("double")).as("wmean"),
          count(lit(1)).as("n"))
    }),

    // A7b — raster_combine 'how' variants: N aligned grids stacked,
    // NaN-aware sum/min/max/mean per cell (cell NULL only if absent in
    // ALL inputs — union semantics give nansum for free).
    "a7b_raster_combine_ops" -> ((s, dir) => {
      val g = graft.grid.Grid.fromLineitem(s, dir)
      // the three yearly inputs are disjoint slices of ONE cube, so
      // union-of-three-filters is a single filtered scan (the r8 form
      // scanned the cube three times for the same rows)
      g.filter(year(col("t")).isin(1996, 1997, 1998))
        .select(month(col("t")).cast("int").as("m"), col("y"), col("x"), col("v"))
        .groupBy("m", "y", "x")
        .agg(sum(col("v").cast("long")).cast("double").as("csum"),
          min(col("v")).as("cmin"), max(col("v")).as("cmax"),
          (sum(col("v").cast("long")).cast("double") / count(lit(1))).as("cmean"),
          count(lit(1)).as("n_inputs"))
    }),

    // A9 — slot climatology with min-count guard: dekad-of-year mean,
    // slots with too few contributing steps dropped (docs/adr/0007).
    "a9_slot_climatology" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(Algebra.dekadSlot(col("l_shipdate")).as("dekad"))
        .agg((sum(col("l_quantity")).cast("double") / count(lit(1))).as("clim"),
             count(lit(1)).as("n_contrib"))
        .filter(col("n_contrib") >= 20)
    }),

    // A10 — extent expand: running temporal + spatial extent per group.
    // Ref ingestion/handlers/extent_handler.py:13-64.
    "a10_extent_agg" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderstatus"), col("o_orderdate"),
          (col("o_orderkey") % 340 - 170).cast("double").as("w"),
          (col("o_orderkey") % 160 - 80).cast("double").as("s"))
        .groupBy("o_orderstatus")
        .agg(min(col("o_orderdate")).as("t_min"), max(col("o_orderdate")).as("t_max"),
             min(col("w")).as("ext_w"), max(col("w") + 12.0).as("ext_e"),
             min(col("s")).as("ext_s"), max(col("s") + 9.0).as("ext_n"))
    }),

    // A11 — run-status rollup (ref processing/engine.py:249-284).
    "a11_status_rollup" -> ((s, dir) => {
      Tables.orders(s, dir)
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n"))
    }),

    // J3 — star join: fact ⋈ broadcast dimensions, exact-integer revenue.
    "j3_star_join" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .join(Tables.orders(s, dir), col("l_orderkey") === col("o_orderkey"))
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_lines"),
             sum(col("l_quantity")).cast("double").as("sum_qty"),
             (sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100).cast("long"))
               .cast("double") / 100.0).as("revenue"))
    }),

    // J5 — input-resolution readiness: required input absent ⇒ unit not
    // ready (anti-join emptiness; ref processing/recipe.py:62-103).
    "j5_readiness_antijoin" -> ((s, dir) => {
      Tables.customer(s, dir)
        .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name")
    }),

    // A14 — distinct counts (exact; the sketch variant is spec-tested —
    // HLL registers aren't cross-engine comparable).
    "a14_distinct_counts" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy("event_type")
        .agg(countDistinct(col("user_id")).as("n_users"),
          countDistinct(date_trunc("day", col("ts"))).as("n_days"),
          count(lit(1)).as("n_events"))
    }),

    // W3 — rolling anomaly (ADR 0007): each pixel's deviation from its
    // own trailing 3-timestep mean. Exact integer sums inside the frame;
    // one window, partitioned per pixel — at scale the shuffle is by
    // (y, x), the same partitioning every per-pixel temporal op shares.
    "w3_rolling_anomaly" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy("y", "x").orderBy(col("t").asc).rowsBetween(-2, 0)
      graft.grid.Grid.fromLineitem(s, dir)
        .withColumn("roll_mean",
          sum(col("v").cast("long")).over(w).cast("double") / count(lit(1)).over(w))
        .withColumn("roll_anom", col("v") - col("roll_mean"))
        .select("t", "y", "x", "v", "roll_mean", "roll_anom")
    }),

    // A15 — KMV distinct sketch: bounded-memory approximate distinct.
    // The k minimum md5-derived hash values per group estimate
    // n_distinct ≈ (k−1)·H/u_k (H = 16^15, the hash range). md5 makes
    // the sketch DETERMINISTIC — mergeable across partitions with no
    // random state, same estimate on any engine — so it oracles exactly
    // alongside the exact count it approximates. Groups smaller than k
    // fall back to the exact count (the KMV rule). u_k comes from the
    // native KmvKthMin aggregate (k longs of state per group, ordinary
    // partial+final aggregation) — the previous row_number() window
    // sorted the whole distinct corpus through #groups (= 3) tasks,
    // the textbook skewed-window scale-killer. The k-th smallest
    // multiset value is tie-break independent, so the heap matches the
    // oracle's (u, l_partkey)-ordered row_number exactly.
    "a15_kmv_distinct" -> ((s, dir) => {
      val k = 32
      val d = Tables.lineitem(s, dir).select("l_returnflag", "l_partkey").distinct()
        .withColumn("u",
          expr("CAST(conv(substring(md5(CAST(l_partkey AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      d.groupBy("l_returnflag")
        .agg(count(lit(1)).as("n_exact"),
          graft.functions.KmvSketch.kthMin(col("u"), k).as("uk"))
        .select(col("l_returnflag"), col("n_exact"),
          when(col("uk").isNull, col("n_exact"))
            .otherwise(floor(lit((k - 1).toDouble) * math.pow(16, 15)
              / col("uk").cast("double")).cast("long")).as("kmv_estimate"))
    }),

    // J8 — as-of join (latest-state): each click joined to the user's
    // most recent view at-or-before it. Spark lacks the operator; the
    // engine's union+window implementation (plans/AsofJoin.scala) is
    // verified against DuckDB's native ASOF JOIN.
    "j8_asof_join" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("value")).as("view_value"))
      graft.plans.AsofJoin.asof(clicks, views, "user_id", "ts", "vts",
        Seq("view_value"))
        .select("event_id", "user_id", "ts", "asof_view_value")
    }),

    // J8b — the same as-of semantics through the NATIVE operator
    // (custom LogicalPlan -> AsofJoinStrategy -> streaming-merge
    // SparkPlan, preference order (c)): each side shuffles only itself
    // on user_id, no union, no window state.
    "j8b_asof_native" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val clicks = e.filter(col("event_type") === "click")
        .select("event_id", "user_id", "ts")
      val views = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("vts"))
        .agg(max(col("value")).as("view_value"))
      graft.plans.AsofJoinNative.asof(clicks, views, "user_id", "ts", "vts",
        Seq("view_value"))
        .select("event_id", "user_id", "ts", "asof_view_value")
    }),

    // J11 — point-in-time feature join (the feature-store primitive for
    // training-data assembly): each label row picks up, leakage-free,
    // the latest value of EVERY feature stream as of its own timestamp.
    // Chained native as-of joins; with small feature tables each link
    // plans as a broadcast index probe and the label side is never
    // shuffled at all.
    "j11_pit_features" -> ((s, dir) => {
      val e = Tables.events(s, dir)
      val labels = e.filter(col("event_type") === "purchase")
        .select("event_id", "user_id", "ts")
      val fClicks = e.filter(col("event_type") === "click")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("f_click"))
      val fViews = e.filter(col("event_type") === "view")
        .groupBy(col("user_id"), col("ts").as("fts"))
        .agg(max(col("value")).as("f_view"))
      val step1 = graft.plans.AsofJoinNative.asof(
        labels, fClicks, "user_id", "ts", "fts", Seq("f_click"))
      graft.plans.AsofJoinNative.asof(
        step1, fViews, "user_id", "ts", "fts", Seq("f_view"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("asof_f_click"), col("asof_f_view"))
    }),

    // J6 — multi-source band combine: u/v sources paired per (user, day),
    // combined pointwise into magnitude (ref ingestion/extractor.py:203-237).
    "j6_uv_combine" -> ((s, dir) => {
      val e = Tables.events(s, dir)
        .withColumn("day", date_trunc("day", col("ts")))
        .withColumn("v100", round(col("value") * 100).cast("long"))
      val u = e.filter(col("event_type") === "click").groupBy("user_id", "day")
        .agg((sum(col("v100")).cast("double") / 100.0).as("u"))
      val v = e.filter(col("event_type") === "view").groupBy("user_id", "day")
        .agg((sum(col("v100")).cast("double") / 100.0).as("v"))
      u.join(v, Seq("user_id", "day"))
        .select(col("user_id"), col("day"),
          Algebra.vectorMagnitude(col("u"), col("v")).as("mag"))
    })
  )

  override def oracleSql = Map(
    "a1_pixel_stats" ->
      """SELECT l_returnflag, l_linestatus,
        |  min(l_quantity) AS vmin, max(l_quantity) AS vmax,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(l_quantity) AS vmean,
        |  sqrt(count(l_quantity) * CAST(sum(CAST(l_quantity AS BIGINT)*CAST(l_quantity AS BIGINT)) AS DOUBLE)
        |       - CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE)*CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE))
        |    / count(l_quantity) AS vstd,
        |  count(l_quantity) AS n
        |FROM lineitem GROUP BY 1, 2""".stripMargin,
    "a3_temporal_aggregate" ->
      """SELECT date_trunc('month', ts) AS bucket, event_type,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS DOUBLE) / 100.0 / count(value) AS mean_value,
        |  count(value) AS n
        |FROM events GROUP BY 1, 2""".stripMargin,
    "a4_climatology" ->
      """SELECT CAST(month(l_shipdate) AS INT) AS m,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS clim,
        |  count(*) AS n_contrib
        |FROM lineitem GROUP BY 1""".stripMargin,
    "a6_anomaly" ->
      """WITH monthly AS (
        |  SELECT CAST(year(l_shipdate) AS INT) AS yr, CAST(month(l_shipdate) AS INT) AS m,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS v
        |  FROM lineitem GROUP BY 1, 2),
        |clim AS (
        |  SELECT CAST(month(l_shipdate) AS INT) AS m,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS clim
        |  FROM lineitem GROUP BY 1)
        |SELECT yr, monthly.m AS m, v, clim, v - clim AS anom,
        |  CASE WHEN clim = 0 THEN NULL ELSE (v - clim) / clim END AS rel_anom
        |FROM monthly JOIN clim ON monthly.m = clim.m""".stripMargin,
    "a5_trend" ->
      """WITH yearly AS (
        |  SELECT l_returnflag, CAST(year(l_shipdate) AS BIGINT) AS x,
        |         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS y
        |  FROM lineitem GROUP BY 1, 2)
        |SELECT l_returnflag,
        |  CAST(count(*) * CAST(sum(x*y) AS BIGINT) - CAST(sum(x) AS BIGINT) * CAST(sum(y) AS BIGINT) AS DOUBLE)
        |  / CAST(count(*) * CAST(sum(x*x) AS BIGINT) - CAST(sum(x) AS BIGINT) * CAST(sum(x) AS BIGINT) AS DOUBLE) AS slope
        |FROM yearly GROUP BY 1""".stripMargin,
    "a7_weighted_combine" ->
      """WITH e AS (
        |  SELECT user_id, CAST(event_id % 5 AS BIGINT) AS w,
        |    CASE WHEN event_type = 'error' THEN NULL
        |         ELSE CAST(round(value*100) AS BIGINT) END AS v100
        |  FROM events)
        |SELECT user_id,
        |  CAST(sum(w * v100) AS DOUBLE) / 100.0 AS wsum,
        |  CASE WHEN CAST(sum(CASE WHEN v100 IS NOT NULL THEN w ELSE 0 END) AS DOUBLE) = 0 THEN NULL
        |       ELSE (CAST(sum(w * v100) AS DOUBLE) / 100.0)
        |            / CAST(sum(CASE WHEN v100 IS NOT NULL THEN w ELSE 0 END) AS DOUBLE) END AS wmean,
        |  count(*) AS n
        |FROM e GROUP BY 1""".stripMargin,
    "a7b_raster_combine_ops" -> (
      s"WITH ${graft.grid.Grid.sqlCte}\n" +
      """SELECT CAST(month(t) AS INT) AS m, y, x,
        |  CAST(sum(CAST(v AS BIGINT)) AS DOUBLE) AS csum,
        |  min(v) AS cmin, max(v) AS cmax,
        |  CAST(sum(CAST(v AS BIGINT)) AS DOUBLE) / count(*) AS cmean,
        |  count(*) AS n_inputs
        |FROM grid WHERE year(t) IN (1996, 1997, 1998)
        |GROUP BY 1, 2, 3""".stripMargin),
    "a9_slot_climatology" ->
      """SELECT CAST((month(l_shipdate) - 1) * 3 + least(2, (day(l_shipdate) - 1) // 10) + 1 AS INT) AS dekad,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS clim,
        |  count(*) AS n_contrib
        |FROM lineitem GROUP BY 1 HAVING count(*) >= 20""".stripMargin,
    "a10_extent_agg" ->
      """SELECT o_orderstatus,
        |  min(o_orderdate) AS t_min, max(o_orderdate) AS t_max,
        |  min(CAST(o_orderkey % 340 - 170 AS DOUBLE)) AS ext_w,
        |  max(CAST(o_orderkey % 340 - 170 AS DOUBLE) + 12.0) AS ext_e,
        |  min(CAST(o_orderkey % 160 - 80 AS DOUBLE)) AS ext_s,
        |  max(CAST(o_orderkey % 160 - 80 AS DOUBLE) + 9.0) AS ext_n
        |FROM orders GROUP BY 1""".stripMargin,
    "a11_status_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY 1, 2""".stripMargin,
    "j3_star_join" ->
      """SELECT r_name, count(*) AS n_lines,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1""".stripMargin,
    "j5_readiness_antijoin" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "a14_distinct_counts" ->
      """SELECT event_type,
        |  count(DISTINCT user_id) AS n_users,
        |  count(DISTINCT date_trunc('day', ts)) AS n_days,
        |  count(*) AS n_events
        |FROM events GROUP BY 1""".stripMargin,
    "w3_rolling_anomaly" -> (
      s"WITH ${graft.grid.Grid.sqlCte}\n" +
      """SELECT t, y, x, v,
        |  CAST(sum(CAST(v AS BIGINT)) OVER w AS DOUBLE) / count(*) OVER w AS roll_mean,
        |  v - CAST(sum(CAST(v AS BIGINT)) OVER w AS DOUBLE) / count(*) OVER w AS roll_anom
        |FROM grid
        |WINDOW w AS (PARTITION BY y, x ORDER BY t ASC ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)""".stripMargin),
    "a15_kmv_distinct" ->
      """WITH d AS (
        |  SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
        |h AS (
        |  SELECT l_returnflag, l_partkey,
        |    CAST(concat('0x', substring(md5(CAST(l_partkey AS VARCHAR)), 1, 15)) AS BIGINT) AS u
        |  FROM d),
        |kth AS (
        |  SELECT l_returnflag, u AS uk FROM (
        |    SELECT l_returnflag, u,
        |      row_number() OVER (PARTITION BY l_returnflag ORDER BY u ASC, l_partkey ASC) AS rn
        |    FROM h) t WHERE rn = 32),
        |n AS (SELECT l_returnflag, count(*) AS n_exact FROM d GROUP BY 1)
        |SELECT n.l_returnflag AS l_returnflag, n_exact,
        |  CASE WHEN uk IS NULL THEN n_exact
        |       ELSE CAST(floor(31.0 * power(16.0, 15.0) / CAST(uk AS DOUBLE)) AS BIGINT)
        |  END AS kmv_estimate
        |FROM n LEFT JOIN kth ON n.l_returnflag = kth.l_returnflag""".stripMargin,
    "j8_asof_join" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts AS vts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
        |       v.view_value AS asof_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.ts""".stripMargin,
    "j11_pit_features" ->
      """WITH labels AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'),
        |f_clicks AS (
        |  SELECT user_id, ts AS fts, max(value) AS f_click
        |  FROM events WHERE event_type = 'click' GROUP BY 1, 2),
        |f_views AS (
        |  SELECT user_id, ts AS fts, max(value) AS f_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2),
        |s1 AS (
        |  SELECT l.event_id, l.user_id, l.ts, c.f_click
        |  FROM labels l ASOF LEFT JOIN f_clicks c
        |    ON l.user_id = c.user_id AND c.fts <= l.ts)
        |SELECT s1.event_id AS event_id, s1.user_id AS user_id, s1.ts AS ts,
        |       s1.f_click AS asof_f_click, v.f_view AS asof_f_view
        |FROM s1 ASOF LEFT JOIN f_views v
        |  ON s1.user_id = v.user_id AND v.fts <= s1.ts""".stripMargin,
    "j8b_asof_native" ->
      """WITH clicks AS (
        |  SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
        |views AS (
        |  SELECT user_id, ts AS vts, max(value) AS view_value
        |  FROM events WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT c.event_id AS event_id, c.user_id AS user_id, c.ts AS ts,
        |       v.view_value AS asof_view_value
        |FROM clicks c ASOF LEFT JOIN views v
        |  ON c.user_id = v.user_id AND v.vts <= c.ts""".stripMargin,
    "j6_uv_combine" ->
      """WITH e AS (
        |  SELECT user_id, date_trunc('day', ts) AS day, event_type,
        |         CAST(round(value*100) AS BIGINT) AS v100
        |  FROM events),
        |u AS (SELECT user_id, day, CAST(sum(v100) AS DOUBLE) / 100.0 AS u
        |      FROM e WHERE event_type = 'click' GROUP BY 1, 2),
        |v AS (SELECT user_id, day, CAST(sum(v100) AS DOUBLE) / 100.0 AS v
        |      FROM e WHERE event_type = 'view' GROUP BY 1, 2)
        |SELECT u.user_id AS user_id, u.day AS day, sqrt(u.u*u.u + v.v*v.v) AS mag
        |FROM u JOIN v ON u.user_id = v.user_id AND u.day = v.day""".stripMargin
  )
}
