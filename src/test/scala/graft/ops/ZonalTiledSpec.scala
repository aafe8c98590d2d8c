package graft.ops

import graft.SparkSpec
import graft.grid.{Grid, Tile}
import org.apache.spark.sql.functions._

/** The tile-level zonal path must agree with the long-form path. */
class ZonalTiledSpec extends SparkSpec {
  import spark.implicits._

  test("tiled zonal (mask tiles + fused kernel) matches long-form zonal") {
    val long = Grid.fromLineitem(spark, sf0001)
      .withColumn("lon", Grid.lonOf(col("x")))
      .withColumn("lat", Grid.latOf(col("y")))
      .cache()
    val boundaries = Seq(
      (0, "POLYGON ((-60 -30, 60 -30, 60 30, -60 30, -60 -30))", -60.0, -30.0, 60.0, 30.0),
      (1, "POLYGON ((100 10, 170 10, 170 80, 100 80, 100 10))", 100.0, 10.0, 170.0, 80.0)
    ).toDF("boundary_id", "geom_wkt", "bw", "bs", "be", "bn")

    val fromLong = Zonal.zonalStats(long, boundaries)
      .filter(col("zcount").isNotNull)

    val tiles = Tile.chip(long.select("t", "y", "x", "v"), 16, 16).cache()
    val tilesYX = tiles.select("tile_y", "tile_x").distinct()
    val masks = Zonal.maskTiles(boundaries, tilesYX, 16, 16,
      -180.0, 90.0, Grid.PX, Grid.PY)
    val fromTiles = Zonal.zonalStatsTiled(tiles, masks)

    val j = fromLong.as("a").join(fromTiles.as("b"), Seq("boundary_id", "t"))
    assert(j.count() == fromLong.count() && fromLong.count() > 0)
    val bad = j.filter(
      col("a.zcount") =!= col("b.zcount") ||
      abs(col("a.zmean") - col("b.zmean")) > 1e-9 ||
      abs(col("a.zstd") - col("b.zstd")) > 1e-9 ||
      col("a.zmin") =!= col("b.zmin") || col("a.zmax") =!= col("b.zmax"))
    assert(bad.isEmpty)
  }
}
