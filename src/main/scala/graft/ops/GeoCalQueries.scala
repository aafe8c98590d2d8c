package graft.ops

import graft.Tables
import graft.grid.Grid
import graft.model.QueryModule
import org.apache.spark.sql.functions._

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
