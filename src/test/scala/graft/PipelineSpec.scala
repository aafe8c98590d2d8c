package graft

import graft.grid.{GridStore, Tile}
import graft.ops.Zonal
import graft.sources.{Formats, GeoTiff}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** End-to-end integration: GeoTIFF drop files → format-sniffed decode →
  * long-form pixels → tiled partitioned store → zonal stats gold table.
  * The full §3.1 write path + §3.3 read path in one flow. */
class PipelineSpec extends SparkSpec {
  import spark.implicits._

  test("tiff drop → ingest → tile store → zonal stats") {
    val dropDir = Files.createTempDirectory("graft-pipe-drop-").toString
    val storeDir = Files.createTempDirectory("graft-pipe-store-").toString

    // three monthly granules, 8×6 global grid, deterministic values
    for (m <- 1 to 3) {
      val data = Array.tabulate(48) { i =>
        if (i % 13 == 0) Float.NaN else (m * 100 + i).toFloat
      }
      Files.write(Paths.get(f"$dropDir/precip_2024${m}%02d01.tif"),
        GeoTiff.write(GeoTiff.Raster(8, 6, data, -180.0, 90.0, 45.0, 30.0)))
    }

    // ingest: decode + chip
    val pixels = Formats.ingestDir(spark, dropDir)
      .withColumnRenamed("time", "t")
    assert(pixels.select("t").distinct().count() == 3)
    assert(pixels.count() == 3 * (48 - 4)) // 4 NaN cells per granule dropped

    // store tiled + partitioned, read back with pruning
    val tiles = Tile.chip(pixels.select("t", "y", "x", "v"), 4, 4)
      .withColumn("collection", lit("precip"))
    GridStore.write(tiles, storeDir)
    val back = Tile.unchip(
      GridStore.read(spark, storeDir).filter(col("p_date") === "2024-02-01"), 4, 4)
    assert(back.count() == 44)
    // pixel identity survived the round trip
    val v0 = back.filter(col("y") === 0 && col("x") === 1).select("v").as[Double].head()
    assert(v0 == 201.0)

    // zonal gold table over the ingested cube (northern vs southern box)
    val boundaries = Seq(
      (0, "POLYGON ((-180 0, 180 0, 180 90, -180 90, -180 0))", -180.0, 0.0, 180.0, 90.0),
      (1, "POLYGON ((-180 -90, 180 -90, 180 0, -180 0, -180 -90))", -180.0, -90.0, 180.0, 0.0)
    ).toDF("boundary_id", "geom_wkt", "bw", "bs", "be", "bn")
    val z = Zonal.zonalStats(pixels.select("t", "y", "x", "v", "lon", "lat"), boundaries)
    assert(z.count() == 6) // 2 boundaries × 3 timesteps
    // hemispheres partition the valid pixels exactly
    val counts = z.groupBy("t").agg(sum("zcount").as("c")).select("c").as[Long].collect()
    assert(counts.forall(_ == 44L))
  }
}
