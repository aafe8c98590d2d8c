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

  /** Configured ramp dimension (core/models/visualization.py:19-158):
    * hex forms (full / shorthand / alpha), uneven + partially-declared
    * positions, out-of-order declarations (clamped non-decreasing), and
    * a qualitative ramp whose colors never blend. */
  val configuredRamps: Seq[Ramps.Ramp] = Seq(
    Ramps.Ramp("precip", "sequential", Seq(
      Ramps.Stop("#000080"),                     // even spread → 0
      Ramps.Stop("#00ff00", Some(0.1)),          // declared, uneven
      Ramps.Stop("#ff0"),                        // shorthand → even 2/3
      Ramps.Stop("#ff0000cc", Some(1.0)))),      // alpha stop
    Ramps.Ramp("anom", "sequential", Seq(
      Ramps.Stop("#0000ff", Some(0.0)),
      Ramps.Stop("#ffffff", Some(0.6)),
      Ramps.Stop("#f80", Some(0.4)),             // out of order → clamped 0.6
      Ramps.Stop("#800000", Some(1.0)))),
    Ramps.Ramp("classes", "qualitative", Seq(
      Ramps.Stop("#e41a1c"), Ramps.Stop("#377eb8"), Ramps.Stop("#4daf4a"))))

  /** The segment table as DuckDB VALUES — generated from the SAME parsed
    * config the Spark side uses, so literals cannot drift. */
  private def segsValuesSql: String = {
    val rows = configuredRamps.flatMap { ramp =>
      val pos = Ramps.spreadPositions(ramp.stops)
      val rgba = ramp.stops.map(s => Ramps.hexToRgba(s.hex))
      (0 until ramp.stops.size - 1).map { j =>
        val (r0, g0, b0, a0) = rgba(j); val (r1, g1, b1, a1) = rgba(j + 1)
        s"('${ramp.id}', $j, ${pos(j)}, ${pos(j + 1)}, $r0, $g0, $b0, $a0, " +
          s"$r1, $g1, $b1, $a1, ${pos.head}, ${pos.last})"
      }
    }
    s"segs(ramp_id, j, p0, p1, r0, g0, b0, a0, r1, g1, b1, a1, plo, phi) AS (VALUES\n  " +
      rows.mkString(",\n  ") + ")"
  }

  /** Non-qualitative ramp ids as a SQL IN-list — derived from the same
    * config the Spark side filters on, so adding/renaming a ramp cannot
    * desynchronize the oracle from the engine query. */
  private def sequentialIdsInList: String =
    configuredRamps.filter(_.rampType != "qualitative")
      .map(r => s"'${r.id}'").mkString(", ")

  /** Qualitative stepped classes as VALUES (colors cycle verbatim). */
  private def qualClassesSql(steps: Int): String = {
    val rows = configuredRamps.filter(_.rampType == "qualitative").flatMap { ramp =>
      val rgba = ramp.stops.map(s => Ramps.hexToRgba(s.hex))
      (0 until steps).map { i =>
        val (r, g, b, a) = rgba(i % rgba.size)
        s"('${ramp.id}', $i, $r, $g, $b, $a)"
      }
    }
    s"qual(ramp_id, i, r, g, b, a) AS (VALUES\n  " + rows.mkString(",\n  ") + ")"
  }

  override def queries = Map(
    // F7 — configured ramps applied through the 8-bit LUT: every ramp
    // in the dimension table is sampled once per 256-grid bucket at
    // config time (hex parse + position spreading driver-side, exactly
    // like the reference's models), and application is ONE broadcast
    // equi-join on the quantized bucket — the texture-grid form every
    // tile renderer quantizes to anyway, and 7.8× cheaper than per-row
    // interpolation arithmetic (which stays available as
    // Ramps.sampleContinuous for arbitrary-precision consumers).
    "f7b_ramp_configured" -> ((s, dir) => {
      Ramps.sampleQuantized(
        Tables.events(s, dir).select(col("event_id"), col("value")),
        least(greatest(col("value") / 300.0, lit(0.0)), lit(1.0)),
        configuredRamps, Seq("event_id"))
    }),

    // F7 — generate_stops stepped mode over [0, 300] in 5 classes:
    // qualitative colors cycle verbatim with hard class edges (two
    // stops per boundary); sequential ramps sample at i/(steps-1).
    "f7c_ramp_stepped" -> ((s, dir) => {
      Ramps.generateStopsStepped(s, configuredRamps, 0.0, 300.0, 5)
    }),
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
    // checksums (recipe idempotency key). The sort makes the digest
    // order-canonical, which forces materializing the group — so the
    // collection is the BOUNDED aggregate (loud failure past the cap),
    // never collect_list, whose buffer an adversarial million-member
    // unit would grow until an executor OOMs mid-aggregation.
    // Plan shape (r15, ProfF11 same-JVM rotated A/B: med 0.82 vs 0.92 s,
    // min 0.68 vs 0.83): the ONE exchange carries the narrow pre-md5
    // columns — 12 B/row vs 33 B checksums or ~130 B serialized partial
    // buffers (a collect-style aggregate reduces row COUNT, never
    // bytes, so partial aggregation before the exchange was pure
    // serialize/deserialize overhead) — and md5 + the bounded aggregate
    // run post-exchange at full width instead of at the scan's task
    // count (guide §2.3 project before the exchange; §2.5 input
    // spread). repartition(key) + groupBy(key) share the one exchange
    // (§2.4), so partial and final aggregation collapse into the same
    // stage.
    "f11_input_hash" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_orderkey"))
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(Algebra.inputHash(col("checksum")).as("input_hash"))
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
    "f7b_ramp_configured" ->
      s"""WITH $segsValuesSql,
         |pts AS (SELECT CAST(x AS INT) AS k, CAST(x AS DOUBLE) / 255.0 AS t FROM range(256) t(x)),
         |m AS (
         |  SELECT k, ramp_id, j,
         |    least(greatest(t, plo), phi) AS tc, p0, p1,
         |    r0, g0, b0, a0, r1, g1, b1, a1,
         |    row_number() OVER (PARTITION BY k, ramp_id ORDER BY j) AS rn
         |  FROM pts JOIN segs ON least(greatest(t, plo), phi) BETWEEN p0 AND p1),
         |lut AS (
         |  SELECT k, ramp_id,
         |    CAST(floor(r0 + (r1 - r0) * frac + 0.5) AS INT) AS r,
         |    CAST(floor(g0 + (g1 - g0) * frac + 0.5) AS INT) AS g,
         |    CAST(floor(b0 + (b1 - b0) * frac + 0.5) AS INT) AS b,
         |    CAST(floor(a0 + (a1 - a0) * frac + 0.5) AS INT) AS a
         |  FROM (SELECT *,
         |    CASE WHEN p1 > p0 THEN (tc - p0) / (p1 - p0) ELSE 0.0 END AS frac
         |    FROM m WHERE rn = 1) q),
         |n AS (SELECT event_id,
         |  CAST(floor(least(greatest(value / 300.0, 0.0), 1.0) * 255.0 + 0.5) AS INT) AS k
         |FROM events)
         |SELECT event_id, ramp_id, r, g, b, a FROM n JOIN lut USING (k)""".stripMargin,
    "f7c_ramp_stepped" ->
      s"""WITH $segsValuesSql,
         |${qualClassesSql(5)},
         |pts AS (SELECT CAST(r AS INT) AS i, CAST(r AS DOUBLE) / 4 AS t FROM range(5) t(r)),
         |m AS (
         |  SELECT i, ramp_id, j,
         |    least(greatest(t, plo), phi) AS tc, p0, p1,
         |    r0, g0, b0, a0, r1, g1, b1, a1,
         |    row_number() OVER (PARTITION BY i, ramp_id ORDER BY j) AS rn
         |  FROM pts JOIN segs ON least(greatest(t, plo), phi) BETWEEN p0 AND p1
         |  WHERE ramp_id IN ($sequentialIdsInList)),
         |seqc AS (
         |  SELECT ramp_id, i,
         |    CAST(floor(r0 + (r1 - r0) * (CASE WHEN p1 > p0 THEN (tc - p0) / (p1 - p0) ELSE 0.0 END) + 0.5) AS INT) AS r,
         |    CAST(floor(g0 + (g1 - g0) * (CASE WHEN p1 > p0 THEN (tc - p0) / (p1 - p0) ELSE 0.0 END) + 0.5) AS INT) AS g,
         |    CAST(floor(b0 + (b1 - b0) * (CASE WHEN p1 > p0 THEN (tc - p0) / (p1 - p0) ELSE 0.0 END) + 0.5) AS INT) AS b,
         |    CAST(floor(a0 + (a1 - a0) * (CASE WHEN p1 > p0 THEN (tc - p0) / (p1 - p0) ELSE 0.0 END) + 0.5) AS INT) AS a
         |  FROM m WHERE rn = 1),
         |classes AS (
         |  SELECT ramp_id, i, r, g, b, a FROM qual
         |  UNION ALL SELECT ramp_id, i, r, g, b, a FROM seqc)
         |SELECT ramp_id,
         |  CAST(i * 2 + edge AS INT) AS stop_seq,
         |  0.0 + (i + edge) * 300.0 / 5 AS value,
         |  '#' || printf('%02x%02x%02x', r, g, b) ||
         |    CASE WHEN a != 255 THEN printf('%02x', a) ELSE '' END AS color
         |FROM classes CROSS JOIN (VALUES (0), (1)) e(edge)""".stripMargin,
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
