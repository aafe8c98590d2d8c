package graft.catalog

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Catalog / STAC-style metadata search operators.
  *
  * Reference semantics (wmo-raf/georiva):
  *  - time-range filter, inclusive ends, open-ended accepted
  *    (`stac/views.py:398-420`)
  *  - bbox intersection on item bounds (`stac/views.py:422-435`)
  *  - id equality filters (`stac/views.py:498-537`)
  *  - scoping/tenancy: unresolvable scope => empty, never unfiltered
  *    (`stac/views.py:635-689`)
  *  - forecast visibility: hide future-valid items (`stac/views.py:345-348`)
  *  - keyset pagination ordered by -time (`stac/views.py:437-444,608-620`)
  *  - latest item / latest run windows (`core/models/item.py:279-313`)
  *
  * Mapped onto the driver tables: `orders` plays the item fact table
  * (time = o_orderdate) with deterministic synthetic bounds derived from
  * keys by exact modular arithmetic (so the DuckDB oracle reproduces them
  * bit-for-bit). All filters are sargable: at scale they push down to
  * parquet row-group min/max and partition pruning on date(time).
  */
object Search extends QueryModule {

  /** Deterministic synthetic bounds for an "item": exact double arithmetic
    * on integer keys (identical in any engine). Spans are small boxes
    * scattered over a [-180,180]x[-90,90] world. */
  private val boundsCols = Seq(
    (col("o_orderkey") % 340 - 170).cast("double").as("w"),
    (col("o_orderkey") % 160 - 80).cast("double").as("s"),
    (col("o_orderkey") % 340 - 170 + 12).cast("double").as("e"),
    (col("o_orderkey") % 160 - 80 + 9).cast("double").as("n")
  )
  private val boundsSqlW = "CAST(o_orderkey % 340 - 170 AS DOUBLE)"
  private val boundsSqlS = "CAST(o_orderkey % 160 - 80 AS DOUBLE)"
  private val boundsSqlE = s"$boundsSqlW + 12"
  private val boundsSqlN = s"$boundsSqlS + 9"

  override def queries = Map(
    // P1 — inclusive time-range filter (partition-prunable at scale).
    "p1_time_filter" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp") &&
                col("o_orderdate") <= lit("1998-12-31").cast("timestamp"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    }),

    // P2 — bbox intersection filter on item bounds.
    "p2_bbox_filter" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select((col("o_orderkey") +: boundsCols): _*)
        .filter(col("w") <= 40.0 && col("e") >= -10.0 &&
                col("s") <= 30.0 && col("n") >= -20.0)
    }),

    // P5 — season select: keep DJF timesteps (months read from the data).
    "p5_season_select" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(month(col("o_orderdate")).isin(12, 1, 2))
        .select(col("o_orderkey"), col("o_orderdate"),
                month(col("o_orderdate")).cast("int").as("m"))
    }),

    // P6 — year-window slice.
    "p6_year_window" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(year(col("o_orderdate")).between(1996, 1999))
        .groupBy(year(col("o_orderdate")).cast("int").as("yr"))
        .agg(count(lit(1)).as("n_items"))
    }),

    // P7 — id parse: {yyyyMMdd} item ids resolved back to equality filters.
    "p7_ids_filter" -> ((s, dir) => {
      val ids = Seq("19980315", "19990701", "20000101")
      val wanted = ids.map(i => to_timestamp(lit(i), "yyyyMMdd"))
      Tables.orders(s, dir)
        .filter(col("o_orderdate").isin(wanted: _*))
        .select("o_orderkey", "o_orderdate", "o_orderstatus")
    }),

    // P8 — scoping: catalog/collection slug resolution via dimension join;
    // unresolvable scope yields empty (fail-closed), never unfiltered.
    "p8_scoping" -> ((s, dir) => {
      val nat = Tables.nation(s, dir).filter(col("n_name") === "NATION_7")
      Tables.customer(s, dir)
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name")
    }),

    // P9 — forecast visibility: public plane hides future-valid items.
    "p9_forecast_visibility" -> ((s, dir) => {
      Tables.orders(s, dir)
        .filter(col("o_orderdate") <= lit("2000-06-30").cast("timestamp"))
        .groupBy("o_orderstatus").agg(count(lit(1)).as("n_visible"))
    }),

    // P10 — active/visibility dimension predicates.
    "p10_active_filter" -> ((s, dir) => {
      Tables.part(s, dir)
        .filter(col("p_type").startsWith("STANDARD") && col("p_size") >= 10)
        .select("p_partkey", "p_name", "p_type", "p_size")
    }),

    // W1 — latest item per collection (newest time wins).
    "w1_latest_item" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("o_custkey", "o_orderkey", "o_orderdate")
    }),

    // W2 — keyset pagination: order -time, token = last item, next page
    // strictly after the token (deterministic via orderkey tiebreak).
    "w2_keyset_pagination" -> ((s, dir) => {
      val tokT = lit("1999-06-01").cast("timestamp")
      Tables.orders(s, dir)
        .filter(col("o_orderdate") < tokT)
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
        .limit(101)
        .select("o_orderkey", "o_orderdate")
    }),

    // J7 — latest-run-wins (as-of) selection: newest ts per user.
    "j7_latest_run" -> ((s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select("user_id", "event_id", "ts", "event_type")
    }),

    // W5 — gap-based sessionization as a batch window plan: session
    // starts where the gap from the previous event exceeds 10 minutes;
    // session id = running count of starts (lag + cumulative sum —
    // the batch twin of streaming/Windows.sessionize).
    "w5_sessionize" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val byUser = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").asc, col("event_id").asc)
      val e = Tables.events(s, dir)
        .withColumn("prev_ts", lag(col("ts"), 1).over(byUser))
        .withColumn("is_start",
          when(col("prev_ts").isNull ||
            col("ts").cast("long") - col("prev_ts").cast("long") > 600, 1L).otherwise(0L))
        .withColumn("session_id", sum(col("is_start")).over(
          byUser.rowsBetween(Window.unboundedPreceding, 0)))
      e.groupBy("user_id", "session_id")
        .agg(count(lit(1)).as("n_events"),
          min(col("ts")).as("session_start"),
          (max(col("ts")).cast("long") - min(col("ts")).cast("long")).as("duration_sec"))
    }),

    // W6 — tumbling-window counts/sums: the batch twin of
    // streaming/Windows.tumblingCounts (same grouping and exact-sum
    // arithmetic; the streaming variant adds only the watermark).
    "w6_tumbling" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // W7 — sliding-window counts/sums (1 h window every 15 min): each
    // event lands in exactly window/slide = 4 windows; Spark's window()
    // enumerates them map-side, so the plan is one hash aggregation —
    // no self-join against a window dimension.
    "w7_sliding" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(window(col("ts"), "1 hour", "15 minutes"), col("event_type"))
        .agg(count(lit(1)).as("n"),
          (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
        .select(col("window.start").as("ws"), col("window.end").as("we"),
          col("event_type"), col("n"), col("sum_value"))
    }),

    // A13 — exact percentiles over integer-valued measures (dyadic
    // quantiles interpolate exactly, so they hash-match cross-engine).
    "a13_percentiles" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy("l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("q25"),
          expr("percentile(l_quantity, 0.5)").as("q50"),
          expr("percentile(l_quantity, 0.75)").as("q75"))
    }),

    // §2.6 — top-k: order by -value with limit (TakeOrderedAndProject).
    "sort_topk" -> ((s, dir) => {
      Tables.orders(s, dir)
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    }),

    // §2.7 — set op: union of two time slices + sort by time.
    "set_union" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val a = o.filter(year(col("o_orderdate")) === 1996)
      val b = o.filter(year(col("o_orderdate")) === 1998)
      a.unionByName(b).select("o_orderkey", "o_orderdate")
    }),

    // Composite STAC search: time range + bbox + scope + keyset page in
    // one plan (stac/views.py:539-700 end-to-end shape).
    "stac_search_combined" -> ((s, dir) => {
      Tables.orders(s, dir)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .filter(col("c_mktsegment") === "BUILDING")
        .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
                col("o_orderdate") <= lit("1999-12-31").cast("timestamp"))
        .select((col("o_orderkey") +: boundsCols): _*)
        .filter(col("w") <= 60.0 && col("e") >= -60.0 &&
                col("s") <= 40.0 && col("n") >= -40.0)
        .orderBy(col("o_orderkey").desc)
        .limit(101)
    }),

    // J4b — latest-reference selection: explicit reference_time wins,
    // else the newest run for that valid time (Martin's
    // COALESCE(ref_time, MAX(ref_time) OVER …), create_martin_function
    // .py:150-170).
    "j4b_latest_reference" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val fc = Tables.orders(s, dir).select(
        col("o_orderkey"), col("o_orderstatus").as("variable"),
        col("o_orderdate").as("valid_time"),
        date_trunc("month", col("o_orderdate")).as("reference_time"),
        col("o_totalprice"))
      val w = Window.partitionBy(col("variable"), col("valid_time"))
      fc.withColumn("chosen_ref", max(col("reference_time")).over(w))
        .filter(col("reference_time") === col("chosen_ref"))
        .groupBy("variable", "valid_time", "chosen_ref")
        .agg(count(lit(1)).as("n_assets"), max(col("o_totalprice")).as("vmax"))
    }),

    // P11 — servable collections: active AND has items (collection.py:
    // 63-117 `servable()`): dimension predicate + semi-join existence.
    "p11_servable" -> ((s, dir) => {
      val collections = Tables.customer(s, dir)
        .select(col("c_custkey").as("collection_id"), col("c_mktsegment"),
          (col("c_acctbal") > 0).as("is_active"))
      collections.filter(col("is_active"))
        .join(Tables.orders(s, dir).select(col("o_custkey").as("collection_id")).distinct(),
          Seq("collection_id"), "left_semi")
        .select("collection_id", "c_mktsegment")
    }),

    // §2.10 — variable transform dispatch: per-variable config rows
    // select the ingest column expression (PASSTHROUGH vs
    // VECTOR_MAGNITUDE; VECTOR_DIRECTION is spec-tested — atan2 ULPs
    // differ across engines) + affine unit conversion from the dimension
    // row (ingestion/extractor.py:73-84, utils.py:11-15).
    "v_transform_dispatch" -> ((s, dir) => {
      import s.implicits._
      val vars = Seq(
        ("precip", "PASSTHROUGH", 1.0, 0.0),
        ("precip_in", "PASSTHROUGH", 0.03937007874015748, 0.0),
        ("wind", "VECTOR_MAGNITUDE", 1.0, 0.0),
        ("temp_c", "PASSTHROUGH", 1.0, -273.15)
      ).toDF("variable", "transform_type", "unit_factor", "unit_offset")
      val src = graft.Tables.events(s, dir)
        .select(col("event_id"), col("value").as("u"),
          (col("event_id") % 100 - 50).cast("double").as("v"))
      src.crossJoin(broadcast(vars))
        .select(col("event_id"), col("variable"),
          Variables.convert(
            Variables.transform(col("transform_type"), col("u"), col("v")),
            col("unit_factor"), col("unit_offset")).as("out"))
    }),

    // A12 — distinct sorted timesteps + per-run valid-time rollup
    // (collect_list rendered as a canonical sorted string).
    "a12_timesteps" -> ((s, dir) => {
      Tables.events(s, dir)
        .groupBy(date_trunc("day", col("ts")).as("run"))
        .agg(count(lit(1)).as("n"),
             array_join(sort_array(collect_list(col("event_type"))), ",").as("types"))
    })
  )

  override def oracleSql = Map(
    "p1_time_filter" ->
      """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1998-01-01' AND o_orderdate <= TIMESTAMP '1998-12-31'""".stripMargin,
    "p2_bbox_filter" ->
      s"""SELECT o_orderkey, $boundsSqlW AS w, $boundsSqlS AS s, $boundsSqlE AS e, $boundsSqlN AS n
         |FROM orders
         |WHERE $boundsSqlW <= 40.0 AND $boundsSqlE >= -10.0 AND $boundsSqlS <= 30.0 AND $boundsSqlN >= -20.0""".stripMargin,
    "p5_season_select" ->
      """SELECT o_orderkey, o_orderdate, CAST(month(o_orderdate) AS INT) AS m FROM orders
        |WHERE month(o_orderdate) IN (12, 1, 2)""".stripMargin,
    "p6_year_window" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr, count(*) AS n_items FROM orders
        |WHERE year(o_orderdate) BETWEEN 1996 AND 1999 GROUP BY 1""".stripMargin,
    "p7_ids_filter" ->
      """SELECT o_orderkey, o_orderdate, o_orderstatus FROM orders
        |WHERE o_orderdate IN (TIMESTAMP '1998-03-15', TIMESTAMP '1999-07-01', TIMESTAMP '2000-01-01')""".stripMargin,
    "p8_scoping" ->
      """SELECT c_custkey, c_name, n_name FROM customer
        |JOIN nation ON c_nationkey = n_nationkey WHERE n_name = 'NATION_7'""".stripMargin,
    "p9_forecast_visibility" ->
      """SELECT o_orderstatus, count(*) AS n_visible FROM orders
        |WHERE o_orderdate <= TIMESTAMP '2000-06-30' GROUP BY 1""".stripMargin,
    "p10_active_filter" ->
      """SELECT p_partkey, p_name, p_type, p_size FROM part
        |WHERE p_type LIKE 'STANDARD%' AND p_size >= 10""".stripMargin,
    "w1_latest_item" ->
      """SELECT o_custkey, o_orderkey, o_orderdate FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |         row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) t WHERE rn = 1""".stripMargin,
    "w2_keyset_pagination" ->
      """SELECT o_orderkey, o_orderdate FROM orders
        |WHERE o_orderdate < TIMESTAMP '1999-06-01'
        |ORDER BY o_orderdate DESC, o_orderkey DESC LIMIT 101""".stripMargin,
    "j7_latest_run" ->
      """SELECT user_id, event_id, ts, event_type FROM (
        |  SELECT user_id, event_id, ts, event_type,
        |         row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events) t WHERE rn = 1""".stripMargin,
    "w6_tumbling" ->
      """SELECT date_trunc('hour', ts) AS ws,
        |  date_trunc('hour', ts) + INTERVAL 1 HOUR AS we,
        |  event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM events GROUP BY 1, 2, 3""".stripMargin,
    "w5_sessionize" ->
      """WITH e AS (
        |  SELECT user_id, event_id, ts,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev_ts
        |  FROM events),
        |st AS (
        |  SELECT user_id, event_id, ts,
        |    CASE WHEN prev_ts IS NULL OR CAST(floor(epoch(ts)) AS BIGINT) - CAST(floor(epoch(prev_ts)) AS BIGINT) > 600
        |         THEN 1::BIGINT ELSE 0::BIGINT END AS is_start
        |  FROM e),
        |sess AS (
        |  SELECT user_id, ts,
        |    CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
        |                             ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
        |  FROM st)
        |SELECT user_id, session_id, count(*) AS n_events,
        |  min(ts) AS session_start,
        |  CAST(floor(epoch(max(ts))) AS BIGINT) - CAST(floor(epoch(min(ts))) AS BIGINT) AS duration_sec
        |FROM sess GROUP BY 1, 2""".stripMargin,
    "w7_sliding" ->
      """WITH wins AS (
        |  SELECT make_timestamp(
        |      (CAST(floor(epoch(ts) / 900) AS BIGINT) - k) * 900 * 1000000) AS ws,
        |    event_type, value
        |  FROM events CROSS JOIN range(4) t(k))
        |SELECT ws, ws + INTERVAL 1 HOUR AS we, event_type, count(*) AS n,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
        |FROM wins GROUP BY 1, 2, 3""".stripMargin,
    "a13_percentiles" ->
      """SELECT l_returnflag,
        |  quantile_cont(l_quantity, 0.25) AS q25,
        |  quantile_cont(l_quantity, 0.5) AS q50,
        |  quantile_cont(l_quantity, 0.75) AS q75
        |FROM lineitem GROUP BY 1""".stripMargin,
    "sort_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100""".stripMargin,
    "set_union" ->
      """SELECT o_orderkey, o_orderdate FROM orders WHERE year(o_orderdate) = 1996
        |UNION ALL
        |SELECT o_orderkey, o_orderdate FROM orders WHERE year(o_orderdate) = 1998""".stripMargin,
    "stac_search_combined" ->
      s"""SELECT o_orderkey, $boundsSqlW AS w, $boundsSqlS AS s, $boundsSqlE AS e, $boundsSqlN AS n
         |FROM orders JOIN customer ON o_custkey = c_custkey
         |WHERE c_mktsegment = 'BUILDING'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate <= TIMESTAMP '1999-12-31'
         |  AND $boundsSqlW <= 60.0 AND $boundsSqlE >= -60.0
         |  AND $boundsSqlS <= 40.0 AND $boundsSqlN >= -40.0
         |ORDER BY o_orderkey DESC LIMIT 101""".stripMargin,
    "j4b_latest_reference" ->
      """WITH fc AS (
        |  SELECT o_orderkey, o_orderstatus AS variable, o_orderdate AS valid_time,
        |         date_trunc('month', o_orderdate) AS reference_time, o_totalprice
        |  FROM orders),
        |m AS (
        |  SELECT *, max(reference_time) OVER (PARTITION BY variable, valid_time) AS chosen_ref
        |  FROM fc)
        |SELECT variable, valid_time, chosen_ref,
        |       count(*) AS n_assets, max(o_totalprice) AS vmax
        |FROM m WHERE reference_time = chosen_ref
        |GROUP BY 1, 2, 3""".stripMargin,
    "p11_servable" ->
      """SELECT c_custkey AS collection_id, c_mktsegment
        |FROM customer
        |WHERE c_acctbal > 0
        |  AND EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin,
    "v_transform_dispatch" ->
      """WITH vars(variable, transform_type, unit_factor, unit_offset) AS (
        |  VALUES ('precip', 'PASSTHROUGH', 1.0, 0.0),
        |         ('precip_in', 'PASSTHROUGH', 0.03937007874015748, 0.0),
        |         ('wind', 'VECTOR_MAGNITUDE', 1.0, 0.0),
        |         ('temp_c', 'PASSTHROUGH', 1.0, -273.15)),
        |src AS (
        |  SELECT event_id, value AS u, CAST(event_id % 100 - 50 AS DOUBLE) AS v
        |  FROM events)
        |SELECT event_id, variable,
        |  (CASE WHEN transform_type = 'VECTOR_MAGNITUDE' THEN sqrt(u*u + v*v)
        |        ELSE u END) * unit_factor + unit_offset AS out
        |FROM src CROSS JOIN vars""".stripMargin,
    "a12_timesteps" ->
      """SELECT date_trunc('day', ts) AS run, count(*) AS n,
        |       string_agg(event_type, ',' ORDER BY event_type) AS types
        |FROM events GROUP BY 1""".stripMargin
  )
}
