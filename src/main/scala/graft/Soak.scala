package graft

import graft.grid.Tile
import org.apache.spark.sql.functions._

/** Scale soak (not part of the driver bench): pushes ~200M pixels of
  * synthetic tiled grid through the engine's aggregation paths and
  * prints throughput, demonstrating the tile-partial design the 100 TB
  * deployment relies on. Run: sbt "runMain graft.Soak [timesteps]".
  */
object Soak {
  def main(args: Array[String]): Unit = {
    val nT = if (args.nonEmpty) args(0).toInt else 24
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    import spark.implicits._

    val tilesX = 16; val tilesY = 8; val th = 256; val tw = 256
    val pxPerT = tilesX * tilesY * th * tw
    println(s"[soak] grid ${tilesX * tw}x${tilesY * th}, $nT timesteps, " +
      f"${nT.toLong * pxPerT / 1e6}%.0fM pixels")

    // deterministic tiled cube, generated distributed (no driver arrays):
    // v = ((y*31 + x*17 + t*7) % 1000) / 10, ~2% nodata holes.
    val tiles = spark.range(nT.toLong * tilesY * tilesX).select(
        (col("id") % nT).cast("int").as("ti"),
        ((col("id") / nT) % tilesY).cast("int").as("tile_y"),
        (col("id") / nT / tilesY).cast("int").as("tile_x"))
      .withColumn("t", expr("timestamp_micros(CAST(ti AS BIGINT) * 86400000000)"))
      .withColumn("tile", expr(
        s"""transform(sequence(0, ${th * tw - 1}), i ->
           |  CASE WHEN (i + ti) % 50 = 0 THEN CAST(NULL AS DOUBLE)
           |  ELSE CAST(((tile_y * $th + i DIV $tw) * 31 + (tile_x * $tw + i % $tw) * 17 + ti * 7) % 1000 AS DOUBLE) / 10.0 END)""".stripMargin))
      .drop("ti").cache()
    tiles.count() // materialize: measure operator cost, not generation

    def time[T](name: String, px: Long)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[soak] $name%-28s ${dt}%8.2f s  ${px / dt / 1e6}%8.1f Mpx/s")
      r
    }

    val totalPx = nT.toLong * pxPerT
    // 1. tile-partial global stats (map-side combine, no pixel explode)
    time("stats via tile partials", totalPx) {
      Tile.finalizeStats(tiles.withColumn("p", Tile.tilePartials(col("tile"))), Seq("t"))
        .collect()
    }
    // 2. the same stats through the long-form explode (the naive plan)
    time("stats via pixel explode", totalPx) {
      Tile.unchip(tiles, th, tw).groupBy("t")
        .agg(count(lit(1)), avg("v"), min("v"), max("v")).collect()
    }
    // 3. elementwise tile algebra: anomaly against a broadcast baseline
    time("tile anomaly (native sub)", totalPx) {
      val clim = tiles.filter(col("t") === expr("timestamp_micros(0)"))
        .select(col("tile_y"), col("tile_x"), col("tile").as("base"))
      tiles.join(broadcast(clim), Seq("tile_y", "tile_x"))
        .select(Tile.subTiles(col("tile"), col("base")).as("anom"))
        .select(expr("aggregate(filter(anom, x -> x IS NOT NULL), 0.0D, (a, x) -> a + x)").as("s"))
        .agg(sum("s")).collect()
    }
    // 4. zonal: pixel-center containment in 8 horizontal bands
    time("zonal 8 bands (explode)", totalPx) {
      Tile.unchip(tiles, th, tw)
        .groupBy((col("y") / (tilesY * th / 8)).cast("int").as("band"), col("t"))
        .agg(avg("v"), count(lit(1))).collect()
    }
    // 5. overview pyramid level-2: shuffle plan (explode + groupBy) ...
    time("overview 2x (explode+shuffle)", totalPx) {
      Tile.unchip(tiles, th, tw)
        .groupBy(col("t"), (col("y") / 2).cast("int").as("yt"),
          (col("x") / 2).cast("int").as("xt"))
        .agg((sum(col("v")) / count(lit(1))).as("v"))
        .select(sum(col("v"))).collect()
    }
    // ... vs the shuffle-free per-tile native kernel
    time("overview 2x (tile, no shuffle)", totalPx) {
      tiles.select(graft.functions.TileDownsample2x
          .downsample2x(col("tile"), th, tw).as("o"))
        .select(expr("aggregate(filter(o, x -> x IS NOT NULL), 0.0D, (a, x) -> a + x)").as("s"))
        .agg(sum(col("s"))).collect()
    }
    spark.stop()
  }
}
