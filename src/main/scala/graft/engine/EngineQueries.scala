package graft.engine

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified derivation-engine queries: idempotent hash-guarded merge and
  * transitive staleness invalidation, plus the J4 serving-layer join. */
object EngineQueries extends QueryModule {

  override def queries = Map(
    // X2 — idempotent MERGE: prior state = runs over orders ≤1997; new
    // batch = ≤1998 with a deterministic subset of inputs "changed"
    // (URGENT orders get a different content hash) ⇒ skip / overwrite /
    // insert / keep classification.
    "x2_idempotent_merge" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val existing = o.filter(year(col("o_orderdate")) <= 1997)
        .select(col("o_orderkey").as("unit_id"),
          md5(concat_ws("|", col("o_orderkey"), col("o_totalprice"))).as("h"))
      val incoming = o.filter(year(col("o_orderdate")) <= 1998)
        .select(col("o_orderkey").as("unit_id"),
          md5(concat_ws("|", col("o_orderkey"),
            when(col("o_orderpriority") === "1-URGENT", col("o_totalprice") + 1.0)
              .otherwise(col("o_totalprice")))).as("h"))
      Derivation.idempotentMerge(existing, incoming, "unit_id", "h")
    }),

    // X5 — staleness cascade: lineage DAG u → u/10 → u/100 (3 levels);
    // seeds = units whose input changed; output = every downstream unit
    // with its minimal re-derivation depth.
    "x5_staleness_cascade" -> ((s, dir) => {
      val o = Tables.orders(s, dir)
      val units = o.select((col("o_orderkey") % 1000).as("u")).distinct()
      val edges = units.select(col("u").as("src"), (col("u") / 10).cast("long").as("dst"))
        .filter(col("src") =!= col("dst")).distinct()
      val seeds = o.filter(col("o_orderkey") % 97 === 0)
        .select((col("o_orderkey") % 1000).as("unit_id")).distinct()
      Derivation.transitiveDownstream(edges, seeds, 3)
    }),

    // X1 — event-driven trigger fan-out: each arriving granule (an event
    // row) maps through the recipe-subscription config to the derivation
    // units it feeds; irrelevant recipes contribute nothing
    // (processing/invocation.py:25-61).
    "x1_trigger_fanout" -> ((s, dir) => {
      import s.implicits._
      val subs = Seq(
        ("climatology", "click"), ("climatology", "view"),
        ("anomaly", "click"), ("rollup", "purchase")
      ).toDF("recipe", "event_type")
      Tables.events(s, dir)
        .join(broadcast(subs), Seq("event_type"))
        .select(col("recipe"),
          concat_ws(":", col("recipe"), col("event_type"),
            month(col("ts")).cast("string")).as("unit_key"))
        .distinct()
    }),

    // J4 — serving-layer multiway join + latest-time window: newest order
    // per customer enriched with the full dimension chain.
    "j4_serving_join" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
      Tables.orders(s, dir)
        .withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
        .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
          col("c_name"), col("n_name"), col("r_name"))
    })
  )

  override def oracleSql = Map(
    "x2_idempotent_merge" ->
      """WITH existing AS (
        |  SELECT o_orderkey AS unit_id, md5(o_orderkey || '|' || o_totalprice) AS old_hash
        |  FROM orders WHERE year(o_orderdate) <= 1997),
        |incoming AS (
        |  SELECT o_orderkey AS unit_id,
        |    md5(o_orderkey || '|' ||
        |        CASE WHEN o_orderpriority = '1-URGENT' THEN o_totalprice + 1.0 ELSE o_totalprice END) AS new_hash
        |  FROM orders WHERE year(o_orderdate) <= 1998)
        |SELECT coalesce(existing.unit_id, incoming.unit_id) AS unit_id,
        |  coalesce(new_hash, old_hash) AS input_hash,
        |  CASE WHEN old_hash IS NULL THEN 'insert'
        |       WHEN new_hash IS NULL THEN 'keep'
        |       WHEN old_hash = new_hash THEN 'skip'
        |       ELSE 'overwrite' END AS action
        |FROM existing FULL OUTER JOIN incoming ON existing.unit_id = incoming.unit_id""".stripMargin,
    "x5_staleness_cascade" ->
      """WITH units AS (SELECT DISTINCT o_orderkey % 1000 AS u FROM orders),
        |edges AS (
        |  SELECT u AS src, CAST(u // 10 AS BIGINT) AS dst FROM units WHERE u != u // 10),
        |seeds AS (
        |  SELECT DISTINCT o_orderkey % 1000 AS unit_id, 0 AS depth
        |  FROM orders WHERE o_orderkey % 97 = 0),
        |d1 AS (SELECT DISTINCT dst AS unit_id, 1 AS depth FROM seeds JOIN edges ON unit_id = src),
        |d2 AS (SELECT DISTINCT dst AS unit_id, 2 AS depth FROM d1 JOIN edges ON unit_id = src),
        |d3 AS (SELECT DISTINCT dst AS unit_id, 3 AS depth FROM d2 JOIN edges ON unit_id = src),
        |allu AS (SELECT * FROM seeds UNION ALL SELECT * FROM d1
        |         UNION ALL SELECT * FROM d2 UNION ALL SELECT * FROM d3)
        |SELECT unit_id, CAST(min(depth) AS INT) AS depth FROM allu GROUP BY 1""".stripMargin,
    "x1_trigger_fanout" ->
      """WITH subs(recipe, event_type) AS (
        |  VALUES ('climatology', 'click'), ('climatology', 'view'),
        |         ('anomaly', 'click'), ('rollup', 'purchase'))
        |SELECT DISTINCT recipe,
        |  recipe || ':' || subs.event_type || ':' || month(ts) AS unit_key
        |FROM events JOIN subs ON events.event_type = subs.event_type""".stripMargin,
    "j4_serving_join" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, c_name, n_name, r_name
        |FROM (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders) o
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE rn = 1""".stripMargin
  )
}
