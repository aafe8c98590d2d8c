package graft.ops

import graft.Tables
import graft.grid.Grid
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Shared noleap month-table SQL fragments — identical text runs in
  * Spark and DuckDB so both engines derive the same mapping. */
object GeoCal {
  /** Cumulative days before each month in a noleap year. */
  val cum = Seq(0, 31, 59, 90, 120, 151, 181, 212, 243, 273, 304, 334)

  /** Month (1-12) of a noleap day-of-year expression. */
  def noleapMonthOf(doy: String): String =
    "(CASE " + cum.tail.zipWithIndex.map { case (c, i) =>
      s"WHEN $doy <= $c THEN ${i + 1} " }.mkString + "ELSE 12 END)"

  /** Days before the month containing noleap day-of-year `doy`. */
  def noleapCumBefore(doy: String): String =
    "(CASE " + cum.tail.zipWithIndex.map { case (c, i) =>
      s"WHEN $doy <= $c THEN ${cum(i)} " }.mkString + "ELSE 334 END)"

  /** Days before month `m` in a noleap year. */
  def noleapCumByMonth(m: String): String =
    "(CASE " + cum.zipWithIndex.map { case (c, i) =>
      s"WHEN $m = ${i + 1} THEN $c " }.mkString + "ELSE NULL END)"
}

/** Verified geometry + calendar queries (P4 intersects, F13 clip window,
  * F8 non-Gregorian calendar conversion). */
object GeoCalQueries extends QueryModule {

  private val tri = ((-30.0, -20.0), (40.0, -10.0), (0.0, 35.0))

  override def queries = Map(
    // P4/F12 — geometry intersects: pixels whose center falls inside a
    // triangle (half-plane arithmetic; the general-WKT path uses JTS and
    // is spec-tested against this same triangle).
    "p4_intersects" -> ((s, dir) => {
      Grid.fromLineitem(s, dir)
        .withColumn("lon", Grid.lonOf(col("x")))
        .withColumn("lat", Grid.latOf(col("y")))
        .filter(Geo.inTriangle(col("lon"), col("lat"), tri._1, tri._2, tri._3))
        .filter(col("t") === lit("1997-06-01").cast("timestamp"))
        .select("t", "y", "x", "v", "lon", "lat")
    }),

    // F13 — clip-window arithmetic: each boundary bbox → integer pixel
    // window into the 64×48 global grid + exact re-derived bounds.
    "f13_clip_window" -> ((s, dir) => {
      val b = Tables.region(s, dir).select(
        col("r_regionkey").cast("int").as("boundary_id"),
        (lit(-171.5) + col("r_regionkey") * 70.0).as("bw"),
        (lit(-80.25) + col("r_regionkey") * 33.0).as("bs"),
        (lit(-95.0) + col("r_regionkey") * 70.0).as("be"),
        (lit(-41.0) + col("r_regionkey") * 33.0).as("bn"))
      val win = Geo.clipWindow(col("bw"), col("bs"), col("be"), col("bn"),
        Grid.W, Grid.H, -180.0, 90.0, Grid.PX, Grid.PY)
      b.select((Seq(col("boundary_id")) ++ win): _*)
        .withColumn("exact_w", lit(-180.0) + col("col_off") * Grid.PX)
        .withColumn("exact_n", lit(90.0) - col("row_off") * Grid.PY)
    }),

    // F12 — transform_geom (zonal.py:30-38 reprojects geometries between
    // CRS): boundary corner coordinates project 4326 → Web-Mercator.
    // Outputs quantize to integer meters — the transcendental forward
    // (log·tan) is deterministic per engine but not bit-identical across
    // engines, and a ULP at 10^7 m scale cannot flip an integer floor.
    "f12_transform_geom" -> ((s, dir) => {
      val b = Tables.region(s, dir).select(
        col("r_regionkey").cast("int").as("boundary_id"),
        (lit(-171.5) + col("r_regionkey") * 70.0).as("bw"),
        (lit(-80.25) + col("r_regionkey") * 31.0).as("bs"),
        (lit(-95.0) + col("r_regionkey") * 70.0).as("be"),
        (lit(-41.0) + col("r_regionkey") * 31.0).as("bn"))
      b.select(col("boundary_id"),
        floor(Geo.lonToMercX(col("bw"))).cast("long").as("mx_w"),
        floor(Geo.lonToMercX(col("be"))).cast("long").as("mx_e"),
        floor(Geo.latToMercY(col("bs"))).cast("long").as("my_s"),
        floor(Geo.latToMercY(col("bn"))).cast("long").as("my_n"))
    }),

    // F8 — 360-day calendar decode + align to the standard calendar with
    // day clamping (CMIP-style sources; geoprocessing/calendar.py:12-30).
    "f8_calendar_360day" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), (col("o_orderkey") % 7200).as("ord"))
        .withColumn("yr", (col("ord") / 360).cast("int") + 1990)
        .withColumn("m", ((col("ord") % 360) / 30).cast("int") + 1)
        .withColumn("d", (col("ord") % 30).cast("int") + 1)
        .withColumn("std_date",
          expr("CAST(make_date(yr, m, least(d, day(last_day(make_date(yr, m, 1))))) AS TIMESTAMP)"))
    }),

    // F8 — noleap (365-day) calendar, both directions (calendar.py:
    // 12-30 convert_calendar("noleap")): noleap ordinals decode through
    // the fixed month table to standard dates (every noleap date exists
    // in Gregorian), and standard dates map to a noleap day-of-year with
    // Feb 29 going to the `missing` fill (NULL here) since it has no
    // noleap image.
    "f8_calendar_noleap" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"), col("o_orderdate"))
        .withColumn("ord", expr("CAST(o_orderkey % 3650 AS INT)"))
        .withColumn("yr", expr("CAST(ord DIV 365 AS INT) + 1990"))
        .withColumn("doy", expr("CAST(ord % 365 AS INT) + 1"))
        .withColumn("m", expr(s"CAST(${GeoCal.noleapMonthOf("doy")} AS INT)"))
        .withColumn("d", expr(s"CAST(doy - ${GeoCal.noleapCumBefore("doy")} AS INT)"))
        .withColumn("std_date", expr("CAST(make_date(yr, m, d) AS TIMESTAMP)"))
        .withColumn("od", col("o_orderdate").cast("timestamp"))
        .withColumn("nl_doy", expr(
          "CASE WHEN month(o_orderdate) = 2 AND day(o_orderdate) = 29 THEN NULL ELSE " +
            s"CAST(${GeoCal.noleapCumByMonth("month(o_orderdate)")} + day(o_orderdate) AS INT) END"))
        .drop("o_orderdate")
    }),

    // F8 — noleap → standard with the `missing` FILL policy
    // (calendar.py:24-28 / xarray convert_calendar(missing=...)): the
    // output carries the FULL standard target axis; dates with no
    // noleap image (Feb 29) are inserted with the fill value (NULL
    // here) and flagged, instead of being dropped. The drop variant is
    // `WHERE filled = 0` on the same frame.
    "f8_calendar_fill" -> ((s, dir) => {
      // deterministic noleap daily series: (yr 1999-2001, nl_doy 1..365, v)
      val src = s.range(1095).select(
        (expr("CAST(id DIV 365 AS INT)") + 1999).as("yr"),
        (expr("CAST(id % 365 AS INT)") + 1).as("nl_doy"),
        expr("CAST((id DIV 365 + 1999) * 1000 + id % 365 + 1 AS BIGINT)").as("v"))
      val axis = s.range(1).select(explode(expr(
          "sequence(DATE'1999-01-01', DATE'2001-12-31', interval 1 day)")).as("d"))
        .select(col("d"),
          expr("CAST(year(d) AS INT)").as("yr"),
          expr("CASE WHEN month(d) = 2 AND day(d) = 29 THEN NULL ELSE CAST(" +
            GeoCal.noleapCumByMonth("month(d)") + " + day(d) AS INT) END").as("nl_doy"))
      axis.join(src, Seq("yr", "nl_doy"), "left")
        .select(col("d").cast("timestamp").as("std_date"), col("yr"),
          col("nl_doy"), col("v"), col("v").isNull.cast("int").as("filled"))
    }),

    // F8 — 360-day → standard with align_on="year" (calendar.py:23-26):
    // the 360 source days distribute proportionally over the target
    // year's actual length (leap-aware), instead of the day-clamped
    // same-date mapping above.
    "f8_calendar_align_year" -> ((s, dir) => {
      Tables.orders(s, dir)
        .select(col("o_orderkey"))
        .withColumn("ord", expr("CAST(o_orderkey % 720 AS INT)"))
        .withColumn("yr", expr("CAST(ord DIV 360 AS INT) + 1999"))
        .withColumn("doy360", expr("CAST(ord % 360 AS INT) + 1"))
        .withColumn("ylen", expr("CASE WHEN yr = 2000 THEN 366 ELSE 365 END"))
        .withColumn("tgt_doy", expr("CAST((doy360 - 1) * ylen DIV 360 AS INT) + 1"))
        .withColumn("aligned_date",
          expr("CAST(date_add(make_date(yr, 1, 1), tgt_doy - 1) AS TIMESTAMP)"))
    })
  )

  override def oracleSql = Map(
    "p4_intersects" -> (
      s"WITH ${Grid.sqlCte}, px AS (SELECT t, y, x, v, ${Grid.lonSql} AS lon, ${Grid.latSql} AS lat FROM grid)\n" +
      """SELECT t, y, x, v, lon, lat FROM px
        |WHERE (40.0 - -30.0) * (lat - -20.0) - (-10.0 - -20.0) * (lon - -30.0) >= 0
        |  AND (0.0 - 40.0) * (lat - -10.0) - (35.0 - -10.0) * (lon - 40.0) >= 0
        |  AND (-30.0 - 0.0) * (lat - 35.0) - (-20.0 - 35.0) * (lon - 0.0) >= 0
        |  AND t = TIMESTAMP '1997-06-01'""".stripMargin),
    "f13_clip_window" ->
      """WITH b AS (
        |  SELECT CAST(r_regionkey AS INT) AS boundary_id,
        |    -171.5 + r_regionkey * 70.0 AS bw,
        |    -80.25 + r_regionkey * 33.0 AS bs,
        |    -95.0 + r_regionkey * 70.0 AS be,
        |    -41.0 + r_regionkey * 33.0 AS bn
        |  FROM region),
        |w AS (
        |  SELECT boundary_id,
        |    least(64, greatest(0, CAST(floor((bw - -180.0) / 5.625) AS INT))) AS col_off,
        |    least(64, greatest(0, CAST(ceil((be - -180.0) / 5.625) AS INT))) AS col_end,
        |    least(48, greatest(0, CAST(floor((90.0 - bn) / 3.75) AS INT))) AS row_off,
        |    least(48, greatest(0, CAST(ceil((90.0 - bs) / 3.75) AS INT))) AS row_end
        |  FROM b)
        |SELECT boundary_id, col_off, row_off,
        |  CASE WHEN greatest(0, col_end - col_off) = 0 OR greatest(0, row_end - row_off) = 0
        |       THEN 0 ELSE greatest(0, col_end - col_off) END AS width,
        |  CASE WHEN greatest(0, col_end - col_off) = 0 OR greatest(0, row_end - row_off) = 0
        |       THEN 0 ELSE greatest(0, row_end - row_off) END AS height,
        |  -180.0 + col_off * 5.625 AS exact_w,
        |  90.0 - row_off * 3.75 AS exact_n
        |FROM w""".stripMargin,
    "f12_transform_geom" ->
      """WITH b AS (
        |  SELECT CAST(r_regionkey AS INT) AS boundary_id,
        |    -171.5 + r_regionkey * 70.0 AS bw,
        |    -80.25 + r_regionkey * 31.0 AS bs,
        |    -95.0 + r_regionkey * 70.0 AS be,
        |    -41.0 + r_regionkey * 31.0 AS bn
        |  FROM region)
        |SELECT boundary_id,
        |  CAST(floor(bw * (6378137.0 * pi() / 180.0)) AS BIGINT) AS mx_w,
        |  CAST(floor(be * (6378137.0 * pi() / 180.0)) AS BIGINT) AS mx_e,
        |  CAST(floor(ln(tan(pi() / 4 + radians(bs) / 2)) * 6378137.0) AS BIGINT) AS my_s,
        |  CAST(floor(ln(tan(pi() / 4 + radians(bn) / 2)) * 6378137.0) AS BIGINT) AS my_n
        |FROM b""".stripMargin,
    "f8_calendar_noleap" ->
      s"""WITH base AS (
         |  SELECT o_orderkey, o_orderdate,
         |    CAST(o_orderkey % 3650 AS INT) AS ord
         |  FROM orders),
         |dec AS (
         |  SELECT o_orderkey, o_orderdate, ord,
         |    CAST(ord // 365 AS INT) + 1990 AS yr,
         |    CAST(ord % 365 AS INT) + 1 AS doy
         |  FROM base)
         |SELECT o_orderkey, ord, yr, doy,
         |  CAST(${GeoCal.noleapMonthOf("doy")} AS INT) AS m,
         |  CAST(doy - ${GeoCal.noleapCumBefore("doy")} AS INT) AS d,
         |  CAST(make_date(yr, CAST(${GeoCal.noleapMonthOf("doy")} AS INT),
         |       CAST(doy - ${GeoCal.noleapCumBefore("doy")} AS INT)) AS TIMESTAMP) AS std_date,
         |  CAST(o_orderdate AS TIMESTAMP) AS od,
         |  CASE WHEN month(o_orderdate) = 2 AND day(o_orderdate) = 29 THEN NULL
         |       ELSE CAST(${GeoCal.noleapCumByMonth("month(o_orderdate)")}
         |            + day(o_orderdate) AS INT) END AS nl_doy
         |FROM dec""".stripMargin,
    "f8_calendar_fill" ->
      s"""WITH src AS (
         |  SELECT CAST(i // 365 AS INT) + 1999 AS yr,
         |         CAST(i % 365 AS INT) + 1 AS nl_doy,
         |         CAST((i // 365 + 1999) * 1000 + i % 365 + 1 AS BIGINT) AS v
         |  FROM range(1095) t(i)),
         |axis AS (
         |  SELECT CAST(d AS DATE) AS d
         |  FROM generate_series(DATE '1999-01-01', DATE '2001-12-31', INTERVAL 1 DAY) g(d)),
         |ax AS (
         |  SELECT d, CAST(year(d) AS INT) AS yr,
         |    CASE WHEN month(d) = 2 AND day(d) = 29 THEN NULL
         |         ELSE CAST(${GeoCal.noleapCumByMonth("month(d)")} + day(d) AS INT) END AS nl_doy
         |  FROM axis)
         |SELECT CAST(ax.d AS TIMESTAMP) AS std_date, ax.yr AS yr, ax.nl_doy AS nl_doy,
         |  src.v AS v, CAST(src.v IS NULL AS INT) AS filled
         |FROM ax LEFT JOIN src ON ax.yr = src.yr AND ax.nl_doy = src.nl_doy""".stripMargin,
    "f8_calendar_align_year" ->
      """WITH base AS (
        |  SELECT o_orderkey, CAST(o_orderkey % 720 AS INT) AS ord FROM orders),
        |dec AS (
        |  SELECT o_orderkey, ord,
        |    CAST(ord // 360 AS INT) + 1999 AS yr,
        |    CAST(ord % 360 AS INT) + 1 AS doy360
        |  FROM base),
        |al AS (
        |  SELECT o_orderkey, ord, yr, doy360,
        |    CASE WHEN yr = 2000 THEN 366 ELSE 365 END AS ylen,
        |    CAST((doy360 - 1) * (CASE WHEN yr = 2000 THEN 366 ELSE 365 END) // 360 AS INT) + 1 AS tgt_doy
        |  FROM dec)
        |SELECT o_orderkey, ord, yr, doy360, ylen, tgt_doy,
        |  CAST(make_date(yr, 1, 1) + (tgt_doy - 1) AS TIMESTAMP) AS aligned_date
        |FROM al""".stripMargin,
    "f8_calendar_360day" ->
      """SELECT o_orderkey, o_orderkey % 7200 AS ord,
        |  CAST((o_orderkey % 7200) // 360 AS INT) + 1990 AS yr,
        |  CAST(((o_orderkey % 7200) % 360) // 30 AS INT) + 1 AS m,
        |  CAST((o_orderkey % 7200) % 30 AS INT) + 1 AS d,
        |  CAST(make_date(CAST((o_orderkey % 7200) // 360 AS INT) + 1990,
        |            CAST(((o_orderkey % 7200) % 360) // 30 AS INT) + 1,
        |            least(CAST((o_orderkey % 7200) % 30 AS INT) + 1,
        |                  CAST(day(last_day(make_date(CAST((o_orderkey % 7200) // 360 AS INT) + 1990,
        |                       CAST(((o_orderkey % 7200) % 360) // 30 AS INT) + 1, 1))) AS INT))) AS TIMESTAMP) AS std_date
        |FROM orders""".stripMargin
  )
}
