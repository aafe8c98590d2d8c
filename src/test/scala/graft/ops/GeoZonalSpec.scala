package graft.ops

import graft.SparkSpec
import graft.grid.Grid
import org.apache.spark.sql.functions._

class GeoZonalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val pixels = Grid.fromLineitem(spark, sf0001)
    .withColumn("lon", Grid.lonOf(col("x")))
    .withColumn("lat", Grid.latOf(col("y")))
    .cache()

  test("JTS containment agrees with the arithmetic triangle test") {
    val tri = ((-30.0, -20.0), (40.0, -10.0), (0.0, 35.0))
    val wkt = "POLYGON ((-30 -20, 40 -10, 0 35, -30 -20))"
    val cmp = pixels.limit(5000).select(
      Geo.inTriangle(col("lon"), col("lat"), tri._1, tri._2, tri._3).as("arith"),
      Zonal.containsPoint(lit(wkt), col("lon"), col("lat")).as("jts"))
    assert(cmp.filter(col("arith") =!= col("jts")).isEmpty)
  }

  test("zonal stats over WKT boxes match the arithmetic path; disjoint ⇒ NULL row") {
    val boundaries = Seq(
      (0, "POLYGON ((-60 -30, 60 -30, 60 30, -60 30, -60 -30))", -60.0, -30.0, 60.0, 30.0),
      (1, "POLYGON ((200 0, 210 0, 210 10, 200 10, 200 0))", 200.0, 0.0, 210.0, 10.0),
      (2, "not valid wkt", -180.0, -90.0, 180.0, 90.0)
    ).toDF("boundary_id", "geom_wkt", "bw", "bs", "be", "bn")
    val z = Zonal.zonalStats(pixels, boundaries).cache()
    val nT = pixels.select("t").distinct().count()
    assert(z.count() == 3 * nT)
    // box 0 matches a direct filtered aggregate
    val direct = pixels
      .filter(col("lon") >= -60 && col("lon") < 60 && col("lat") >= -30 && col("lat") < 30)
      .groupBy("t").agg(avg("v").as("m"), count(lit(1)).as("c"))
    val joined = z.filter(col("boundary_id") === 0).join(direct, "t")
    assert(joined.filter(col("zcount") =!= col("c") ||
      abs(col("zmean") - col("m")) > 1e-9).isEmpty)
    // disjoint + invalid geometries keep all-NULL rows
    for (bid <- Seq(1, 2))
      assert(z.filter(col("boundary_id") === bid && col("zcount").isNotNull).isEmpty)
  }

  test("Web-Mercator reprojection round-trips and hits known values") {
    val df = Seq((0.0, 0.0), (180.0, 85.0511287798066), (-90.0, -45.0))
      .toDF("lon", "lat")
      .select(col("lon"), col("lat"),
        Geo.lonToMercX(col("lon")).as("x"), Geo.latToMercY(col("lat")).as("y"))
      .select(col("lon"), col("lat"), col("x"), col("y"),
        Geo.mercXToLon(col("x")).as("lon2"), Geo.mercYToLat(col("y")).as("lat2"))
    val rows = df.collect()
    // known: lon 180 → 20037508.34...; lat ~85.05113 → same magnitude
    assert(math.abs(rows(1).getDouble(2) - 20037508.342789244) < 1e-6)
    assert(math.abs(rows(1).getDouble(3) - 20037508.34) < 1.0)
    rows.foreach { r =>
      assert(math.abs(r.getDouble(4) - r.getDouble(0)) < 1e-9)
      assert(math.abs(r.getDouble(5) - r.getDouble(1)) < 1e-9)
    }
  }

  test("clipWindow computes clamped pixel windows with exact bounds") {
    val df = Seq((0, -60.0, -30.0, 60.0, 30.0), (1, -500.0, -30.0, -181.0, 30.0))
      .toDF("id", "bw", "bs", "be", "bn")
    val win = Geo.clipWindow(col("bw"), col("bs"), col("be"), col("bn"),
      Grid.W, Grid.H, -180.0, 90.0, Grid.PX, Grid.PY)
    val rows = df.select((Seq(col("id")) ++ win): _*).orderBy("id").collect()
    // box 0: lon -60..60 → cols floor(120/5.625)=21 .. ceil(240/5.625)=43
    assert(rows(0).getInt(1) == 21 && rows(0).getInt(3) == 43 - 21)
    // lat 30..-30 → rows floor(60/3.75)=16 .. ceil(120/3.75)=32
    assert(rows(0).getInt(2) == 16 && rows(0).getInt(4) == 32 - 16)
    // box 1 entirely west of the grid → zero-size window
    assert(rows(1).getInt(3) == 0 && rows(1).getInt(4) == 0)
  }
}
