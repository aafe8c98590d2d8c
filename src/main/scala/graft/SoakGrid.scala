package graft

import graft.sources.GeoTiff
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Raster-plane decade soak: the full serving pipeline — GeoTIFF
  * ingest → z-ordered base store → persisted overview pyramid → zonal
  * stats → routed overview serve — at two granule volumes a decade
  * apart, with per-stage scaling ratios. The LLM half (dedup, ANN,
  * streaming) has measured 10× curves in SCALE.md; this gives the
  * geospatial half the same evidence standard. Every stage is the
  * PRODUCTION operator (Formats.ingestDir, GridStore.writeZOrdered,
  * OverviewServe.writeOverviews/readBbox, the j1 broadcast-containment
  * zonal shape) so the soak cannot drift from what the bench rows run.
  * Run: SPARK_DRIVER_MEM=48g sbt "runMain graft.SoakGrid [sizes,csv [edge]]".
  *
  * `--fused` switches to decode-straight-into-the-z-ordered-store
  * (one logical decode, nothing held), and zonal reads the STORE with
  * lon/lat derived from tile indices + the collection's
  * georeferencing — exactly how the engine answers j1 after ingest.
  * Caveat measured by the arm itself: writeZOrdered's range
  * partitioner SAMPLES its input, so z-order-at-ingest re-runs the
  * decode — `--append` is the engine's real production path for
  * expensive sources: ingest → plain partitioned write (hash
  * repartition, no sampling, single decode) → compact ZORDER reading
  * cheap parquet (GridStore.compact, the OPTIMIZE cadence). The
  * default (staged) shape holds the decode in a serialized
  * localCheckpoint so s2/s4 can share it, which is a HARNESS device
  * to time decode separately from the store write; at 1 Gpx that hold
  * crosses the block-manager memory pool into disk blocks, a boundary
  * the other shapes never pay. */
object SoakGrid {
  def main(args: Array[String]): Unit = {
    val append = args.contains("--append")
    val fused = args.contains("--fused") || append
    val posArgs = args.filterNot(_.startsWith("--"))
    val sizes = posArgs.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(40, 400))
    val edge = if (posArgs.length > 1) posArgs(1).toInt else 512
    // the held decode (see s1) is the soak's biggest transient: at
    // 4,000 granules it is ~1 Gpx of long-form rows. Deserialized
    // disk-store blocks Java-serialize to ~300 B/row (>300 GB — the
    // first 4,000-granule attempt filled the scratch disk); serialized
    // + lz4-compressed blocks of the same rows are ~20x smaller.
    // rdd.compress is a core conf, so it must be set before the
    // SparkContext exists — SparkConf picks it up from system props.
    System.setProperty("spark.rdd.compress", "true")
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val stages = scala.collection.mutable.LinkedHashMap[String,
      scala.collection.mutable.Buffer[(Int, Double)]]()
    def record(size: Int, name: String, dt: Double): Unit = {
      println(f"[soak-grid] g=$size%6d  $name%-26s $dt%8.3f s")
      stages.getOrElseUpdate(name, scala.collection.mutable.Buffer()) += ((size, dt))
    }

    // 12 boundary boxes tiling the granule extent (the j1 shape's
    // broadcast side at its production scale: boundaries are config)
    import spark.implicits._
    val west = -30.0; val north = 40.0; val pxDeg = 0.1
    val span = edge * pxDeg
    val boundaries = (0 until 12).map { i =>
      val r = i / 4; val c = i % 4
      (i.toLong, west + c * span / 4, west + (c + 1) * span / 4,
        north - (r + 1) * span / 3, north - r * span / 3)
    }.toDF("boundary_id", "bw", "be", "bs", "bn")

    for (g <- sizes; pass <- 1 to 2) { // pass 1 warms JIT/codegen
      val dir = java.nio.file.Files.createTempDirectory(s"graft-soakgrid-$g-")
      val day0 = java.time.LocalDate.of(2020, 1, 1)
      val tGen0 = System.nanoTime()
      // generation is untimed scaffolding — parallelize so the 4,000-
      // granule decade doesn't spend minutes in a single-thread loop
      import scala.collection.parallel.CollectionConverters._
      (0 until g).par.foreach { k =>
        val data = Array.tabulate(edge * edge)(i =>
          if ((i + k) % 41 == 0) Float.NaN else ((k * 131 + i) % 1000) * 0.1f)
        java.nio.file.Files.write(
          dir.resolve(f"precip_${day0.plusDays(k).format(
            java.time.format.DateTimeFormatter.BASIC_ISO_DATE)}%s.tif"),
          GeoTiff.write(GeoTiff.Raster(edge, edge, data, west, north, pxDeg, pxDeg)))
      }
      if (pass == 2)
        println(f"[soak-grid] g=$g%6d  generated ${g}x${edge}x$edge " +
          f"(${g.toLong * edge * edge / 1000000.0}%.1f Mpx) in " +
          f"${(System.nanoTime() - tGen0) / 1e9}%.1f s (untimed)")

      def stage[T](name: String)(f: => T): T = {
        val t0 = System.nanoTime()
        val r = f
        if (pass == 2) record(g, name, (System.nanoTime() - t0) / 1e9)
        r
      }
      val total0 = System.nanoTime()

      val base = s"$dir/store/base"
      val px: DataFrame = if (append) {
        // production append path: plain partitioned write (hash
        // repartition — no sampling, the decode runs ONCE), then the
        // OPTIMIZE ZORDER compaction over cheap parquet
        val decoded = graft.sources.Formats.ingestDir(spark, dir.toString)
          .select(lit("precip").as("collection"), col("time").as("t"),
            col("y").cast("int").as("tile_y"),
            col("x").cast("int").as("tile_x"), col("v"))
        stage("s1+2a ingest→store (plain)") {
          grid.GridStore.write(decoded, base)
        }
        stage("s2b compact ZORDER") {
          grid.GridStore.compact(spark, base, zOrdered = true)
        }
        null
      } else if (fused) {
        // ONE logical decode streaming straight into the z-ordered
        // store — no held pixels, no storage-pool boundary (but see
        // the header: the range sampler recomputes the decode)
        stage("s1+2 ingest→store (fused)") {
          grid.GridStore.writeZOrdered(
            graft.sources.Formats.ingestDir(spark, dir.toString)
              .select(lit("precip").as("collection"), col("time").as("t"),
                col("y").cast("int").as("tile_y"),
                col("x").cast("int").as("tile_x"), col("v")),
            base)
        }
        null
      } else {
        // 1. ingest: production directory path (binaryFile → sniff →
        // decode → long-form pixels with filename-derived time)
        val p = stage("s1 ingest (decode+explode)") {
          graft.sources.Formats.ingestDir(spark, dir.toString)
            .select(lit("precip").as("collection"), col("time").as("t"),
              col("y").cast("int").as("tile_y"), col("x").cast("int").as("tile_x"),
              col("v"), col("lon"), col("lat"))
            .localCheckpoint(eager = true,
              org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
        }

        // 2. base store: z-ordered parquet (2-D row-group pruning layout)
        stage("s2 base store (zorder write)") {
          grid.GridStore.writeZOrdered(
            p.select("collection", "t", "tile_y", "tile_x", "v"), base)
        }
        p
      }

      // 3. overview pyramid: persisted cascade (levels 2, 4)
      stage("s3 overview pyramid") {
        serve.OverviewServe.writeOverviews(spark, base, Seq(2, 4))
      }

      // 4. zonal stats: the j1 broadcast-containment shape, per
      // (boundary, day). Staged shape joins the held decode; fused
      // shape reads the STORE and derives cell-center lon/lat from
      // tile indices + the collection georeferencing (the engine's
      // post-ingest j1 path — same convention as the decoder:
      // lon = west + (x + 0.5) px)
      stage(if (fused) "s4 zonal from store (12 z)" else "s4 zonal stats (12 zones)") {
        val pixels =
          if (fused)
            grid.GridStore.read(spark, base)
              .withColumn("lon", lit(west) + (col("tile_x") + 0.5) * pxDeg)
              .withColumn("lat", lit(north) - (col("tile_y") + 0.5) * pxDeg)
          else px
        pixels.join(broadcast(boundaries),
            col("lon") >= col("bw") && col("lon") < col("be") &&
            col("lat") >= col("bs") && col("lat") < col("bn"))
          .groupBy("boundary_id", "t")
          .agg((sum(col("v").cast("long")).cast("double") / count(lit(1))).as("zmean"),
            min("v").as("zmin"), max("v").as("zmax"), count(lit(1)).as("zcount"))
          .write.mode("overwrite").format("noop").save()
      }

      // 5. serve: routed coarse read (whole extent, resolution that
      // selects the _ov4 table) across the full time range — the tile
      // server's zoomed-out scan, paying 1/16 of the base rows
      stage("s5 served overview read") {
        serve.OverviewServe.readBbox(spark, base, Seq(1, 2, 4),
            basePxDeg = pxDeg, requestedPxDeg = pxDeg * 5,
            from = "2019-01-01", to = "2030-12-31",
            tx0 = 0, tx1 = edge - 1, ty0 = 0, ty1 = edge - 1)
          .write.mode("overwrite").format("noop").save()
      }

      if (pass == 2) {
        val total = (System.nanoTime() - total0) / 1e9
        val npx = g.toLong * edge * edge
        println(f"[soak-grid] g=$g%6d  TOTAL $total%8.3f s  ${npx / total / 1e6}%6.2f Mpx/s")
        stages.getOrElseUpdate("TOTAL",
          scala.collection.mutable.Buffer()) += ((g, total))
      }
      // free the checkpoint blocks and on-disk scaffolding between
      // passes — at 4,000 granules each pass leaves ~4 GB of tiffs
      // plus a ~1 Gpx parquet store, which would otherwise accumulate
      // across 2 passes x 3 sizes and exhaust the scratch disk
      if (px != null) px.unpersist(blocking = true)
      spark.sharedState.cacheManager.clearCache()
      def rmTree(p: java.nio.file.Path): Unit = {
        import scala.jdk.CollectionConverters._
        java.nio.file.Files.walk(p).iterator().asScala.toSeq
          .sortBy(-_.getNameCount).foreach(java.nio.file.Files.deleteIfExists(_))
      }
      rmTree(dir)
    }

    println("[soak-grid] ---- per-stage scaling (largest/smallest size) ----")
    val span10 = sizes.max.toDouble / sizes.min
    stages.foreach { case (name, xs) =>
      val lo = xs.minBy(_._1)._2; val hi = xs.maxBy(_._1)._2
      println(f"[soak-grid] $name%-26s ${hi / lo}%6.1fx time over $span10%4.0fx granules" +
        f"  (${xs.map { case (s, d) => f"$s%d:$d%.2fs" }.mkString("  ")})")
    }
    spark.stop()
  }
}
