package graft.ops

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Verified queries for the scalar/elementwise surface (SURVEY §2.8),
  * exercised over the driver tables. Each query's DuckDB oracle mirrors
  * the exact arithmetic so results are bit-identical.
  */
object ScalarQueries extends QueryModule {

  override def queries = Map(
    // F1 — safe_divide: zero denominator → NULL (NaN-nodata discipline).
    "f1_safe_divide" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"),
          Algebra.safeDivide(col("l_extendedprice"), col("l_quantity") - 25.0).as("ratio"))
    }),

    // F2 — vector magnitude (wind speed from u/v).
    "f2_vector_magnitude" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          Algebra.vectorMagnitude(col("value"),
            (col("event_id") % 100 - 50).cast("double")).as("mag"))
    }),

    // F4 — unit conversion as affine transform (°C→°F, °C→K).
    "f4_unit_conversion" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          Algebra.convertUnits(col("value"), 1.8, 32.0).as("fahrenheit"),
          Algebra.convertUnits(col("value"), 1.0, 273.15).as("kelvin"))
    }),

    // F5 — normalize 0..360 lon to −180..180, clamp lat to WGS84.
    "f5_normalize_bounds" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          Algebra.normalizeLon((col("o_orderkey") % 360).cast("double")).as("lon"),
          Algebra.clampLat((col("o_orderkey") % 200 - 100).cast("double") * 1.1).as("lat"))
    }),

    // F6/S10 — encoded-texture rescale to 0..255.
    "f6_rescale_encode" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(col("event_id"),
          Algebra.rescaleEncode(col("value"), 0.0, 300.0).as("encoded"))
    }),

    // F9 — timestamp-from-filename: build `precip_YYYYMMDD.tif` names,
    // parse them back via regex + to_timestamp (the ingest-side chain).
    "f9_timestamp_parse" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          concat(lit("precip_"), date_format(col("o_orderdate"), "yyyyMMdd"), lit(".tif")).as("fname"))
        .withColumn("parsed",
          to_timestamp(regexp_extract(col("fname"), "precip_(\\d{8})", 1), "yyyyMMdd"))
    }),

    // F10 — calendar slots: month/dekad/pentad of year.
    "f10_date_slots" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"),
          year(col("o_orderdate")).cast("int").as("yr"),
          Algebra.monthSlot(col("o_orderdate")).as("m"),
          Algebra.dekadSlot(col("o_orderdate")).as("dekad"),
          Algebra.pentadSlot(col("o_orderdate")).as("pentad"))
    }),

    // F7 — color-ramp interpolation: evenly-spread stops, linear sample
    // between segment colors (core/models/visualization.py:19-158).
    "f7_color_ramp" -> ((s, dir) => {
      // ramp: navy → green → yellow → red over [0, 300]
      val t = least(greatest(col("value") / 300.0, lit(0.0)), lit(1.0))
      val seg = least(lit(2), floor(t * 3).cast("int"))
      val frac = t * 3 - seg
      def ch(c0: Column, c1: Column, c2: Column, c3: Column): Column = {
        val a = when(seg === 0, c0).when(seg === 1, c1).otherwise(c2)
        val b = when(seg === 0, c1).when(seg === 1, c2).otherwise(c3)
        floor(a + (b - a) * frac + 0.5).cast("int")
      }
      Tables.events(s, dir).select(col("event_id"),
        ch(lit(0), lit(0), lit(255), lit(255)).as("r"),
        ch(lit(0), lit(255), lit(255), lit(0)).as("g"),
        ch(lit(128), lit(0), lit(0), lit(0)).as("b"))
    }),

    // F15 — JSON/metadata projection: STAC-item-shaped documents built
    // deterministically (stac/serializers.py shaping).
    "f15_json_projection" -> ((s, dir) => {
      Tables.orders(s, dir).select(col("o_orderkey"),
        concat(lit("{\"id\":\""), date_format(col("o_orderdate"), "yyyyMMdd"),
          lit("\",\"properties\":{\"status\":\""), col("o_orderstatus"),
          lit("\",\"priority\":\""), col("o_orderpriority"),
          lit("\"}}")).as("doc"))
    }),

    // F11 — identity hashing: input_hash = sha256 over sorted member
    // checksums (recipe idempotency key).
    "f11_input_hash" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(Algebra.inputHash(sort_array(collect_list(col("checksum")))).as("input_hash"))
    })
  )

  override def oracleSql = Map(
    "f1_safe_divide" ->
      """SELECT l_orderkey, l_linenumber,
        |  CASE WHEN l_quantity - 25.0 = 0 THEN NULL ELSE l_extendedprice / (l_quantity - 25.0) END AS ratio
        |FROM lineitem""".stripMargin,
    "f2_vector_magnitude" ->
      """SELECT event_id, sqrt(value*value + u2.v*u2.v) AS mag
        |FROM (SELECT event_id, value, CAST(event_id % 100 - 50 AS DOUBLE) AS v FROM events) u2""".stripMargin,
    "f4_unit_conversion" ->
      """SELECT event_id, value * 1.8 + 32.0 AS fahrenheit, value * 1.0 + 273.15 AS kelvin FROM events""".stripMargin,
    "f5_normalize_bounds" ->
      """SELECT o_orderkey,
        |  ((CAST(o_orderkey % 360 AS DOUBLE) + 180.0) % 360.0 + 360.0) % 360.0 - 180.0 AS lon,
        |  least(greatest(CAST(o_orderkey % 200 - 100 AS DOUBLE) * 1.1, -90.0), 90.0) AS lat
        |FROM orders""".stripMargin,
    "f6_rescale_encode" ->
      """SELECT event_id,
        |  CAST(floor((least(greatest(value, 0.0), 300.0) - 0.0) / 300.0 * 255.0 + 0.5) AS INT) AS encoded
        |FROM events""".stripMargin,
    "f9_timestamp_parse" ->
      """SELECT o_orderkey,
        |  'precip_' || strftime(o_orderdate, '%Y%m%d') || '.tif' AS fname,
        |  strptime(regexp_extract('precip_' || strftime(o_orderdate, '%Y%m%d') || '.tif', 'precip_(\d{8})', 1), '%Y%m%d') AS parsed
        |FROM orders""".stripMargin,
    "f10_date_slots" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST((month(o_orderdate) - 1) * 3 + least(2, (day(o_orderdate) - 1) // 10) + 1 AS INT) AS dekad,
        |  CAST((month(o_orderdate) - 1) * 6 + least(5, (day(o_orderdate) - 1) // 5) + 1 AS INT) AS pentad
        |FROM orders""".stripMargin,
    "f7_color_ramp" ->
      """WITH n AS (
        |  SELECT event_id,
        |    least(greatest(value / 300.0, 0.0), 1.0) AS t
        |  FROM events),
        |s AS (
        |  SELECT event_id, t,
        |    least(2, CAST(floor(t * 3) AS INT)) AS seg,
        |    t * 3 - least(2, CAST(floor(t * 3) AS INT)) AS frac
        |  FROM n)
        |SELECT event_id,
        |  CAST(floor((CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 0 ELSE 255 END)
        |    + ((CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 255 ELSE 255 END)
        |       - (CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 0 ELSE 255 END)) * frac + 0.5) AS INT) AS r,
        |  CAST(floor((CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 255 ELSE 255 END)
        |    + ((CASE WHEN seg=0 THEN 255 WHEN seg=1 THEN 255 ELSE 0 END)
        |       - (CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 255 ELSE 255 END)) * frac + 0.5) AS INT) AS g,
        |  CAST(floor((CASE WHEN seg=0 THEN 128 WHEN seg=1 THEN 0 ELSE 0 END)
        |    + ((CASE WHEN seg=0 THEN 0 WHEN seg=1 THEN 0 ELSE 0 END)
        |       - (CASE WHEN seg=0 THEN 128 WHEN seg=1 THEN 0 ELSE 0 END)) * frac + 0.5) AS INT) AS b
        |FROM s""".stripMargin,
    "f15_json_projection" ->
      """SELECT o_orderkey,
        |  '{"id":"' || strftime(o_orderdate, '%Y%m%d') ||
        |  '","properties":{"status":"' || o_orderstatus ||
        |  '","priority":"' || o_orderpriority || '"}}' AS doc
        |FROM orders""".stripMargin,
    "f11_input_hash" ->
      """SELECT l_orderkey,
        |  sha256(string_agg(cs, '|' ORDER BY cs)) AS input_hash
        |FROM (SELECT l_orderkey, md5(l_orderkey || '_' || l_linenumber) AS cs FROM lineitem) t
        |GROUP BY l_orderkey""".stripMargin
  )
}
