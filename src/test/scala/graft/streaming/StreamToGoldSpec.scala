package graft.streaming

import graft.SparkSpec
import graft.grid.{GridStore, Tile}
import graft.ops.Zonal
import graft.sources.{Formats, GeoTiff}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import java.nio.file.{Files, Paths}

/** Full §3.1 write path on Structured Streaming: raster files land in
  * the dropzone → stream discovers them → foreachBatch decodes, chips
  * into the partitioned tile store, AND chains the zonal gold table in
  * the same batch (the reference's post-write hook X7). */
class StreamToGoldSpec extends SparkSpec {
  import spark.implicits._

  test("streamed tiffs land in the tile store with chained zonal gold rows") {
    val dz = Files.createTempDirectory("graft-sg-dz-").toString
    val store = Files.createTempDirectory("graft-sg-store-").toString + "/tiles"
    val gold = Files.createTempDirectory("graft-sg-gold-").toString + "/zonal"
    val cp = Files.createTempDirectory("graft-sg-cp-").toString

    def dropTiff(m: Int): Unit = {
      val data = Array.tabulate(48)(i => (m * 100 + i).toFloat)
      Files.write(Paths.get(f"$dz/precip_2024${m}%02d01.tif"),
        GeoTiff.write(GeoTiff.Raster(8, 6, data, -180.0, 90.0, 45.0, 30.0)))
    }
    dropTiff(1); dropTiff(2)

    val boundaries = Seq(
      (0, "POLYGON ((-180 -90, 180 -90, 180 90, -180 90, -180 -90))",
        -180.0, -90.0, 180.0, 180.0)).toDF("boundary_id", "geom_wkt", "bw", "bs", "be", "bn")

    def runStream(): Unit = {
      val files = spark.readStream.format("binaryFile")
        .schema("path STRING, modificationTime TIMESTAMP, length LONG, content BINARY")
        .option("pathGlobFilter", "*.tif").load(dz)
        .select(col("path"))
      files.writeStream
        .option("checkpointLocation", cp)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          if (!batch.isEmpty) {
            // decode every granule in this batch through the chipper
            val pixels = Formats.ingestDir(spark, dz)
              .withColumnRenamed("time", "t")
            val tiles = Tile.chip(pixels.select("t", "y", "x", "v"), 4, 4)
              .withColumn("collection", lit("precip"))
            GridStore.write(tiles, store)
            // chained post-write hook: zonal gold table
            Zonal.zonalStats(pixels.select("t", "y", "x", "v", "lon", "lat"),
                boundaries)
              .write.mode("overwrite").parquet(gold)
          }
          ()
        }
        .start().awaitTermination()
    }
    runStream()
    assert(spark.read.parquet(store).count() > 0)
    assert(spark.read.parquet(gold).count() == 2) // 1 boundary × 2 timesteps

    // a third granule arrives: incremental batch re-derives the gold table
    dropTiff(3)
    runStream()
    val g = spark.read.parquet(gold)
    assert(g.count() == 3)
    assert(g.filter(col("zcount") === 48).count() == 3)
  }
}
