package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class GeoTiffSpec extends SparkSpec {

  private def sampleRaster = {
    val w = 8; val h = 6
    val data = Array.tabulate(w * h) { i =>
      if (i % 11 == 0) Float.NaN else (i * 0.5f)
    }
    GeoTiff.Raster(w, h, data, -180.0, 90.0, 45.0, 30.0)
  }

  test("write → read round-trips pixels, NaN nodata, and georeferencing") {
    val r = sampleRaster
    val bytes = GeoTiff.write(r)
    assert(GeoTiff.canHandle(bytes))
    val back = GeoTiff.read(bytes)
    assert(back.width == r.width && back.height == r.height)
    assert(back.west == r.west && back.north == r.north &&
      back.px == r.px && back.py == r.py)
    assert(back.data.zip(r.data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
    assert(back.bounds == ((-180.0, -90.0, 180.0, 90.0)))
  }

  test("BigTIFF (version 43, 8-byte offsets) round-trips and sniffs") {
    val r = sampleRaster
    val bytes = GeoTiff.writeBig(r)
    // header: II + 43 + offset-size 8 + reserved 0
    assert(bytes(2) == 43 && bytes(3) == 0 && bytes(4) == 8)
    assert(GeoTiff.canHandle(bytes), "sniffer must accept BigTIFF")
    assert(Formats.sniff(bytes).map(_.name).contains("geotiff"))
    val back = GeoTiff.read(bytes)
    assert(back.width == r.width && back.height == r.height)
    assert(back.west == r.west && back.north == r.north &&
      back.px == r.px && back.py == r.py)
    assert(back.data.zip(r.data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
    assert(GeoTiff.bandCount(bytes) == 1)
    // a classic-TIFF byte stream with version 43 but a wrong offset
    // size must NOT sniff as TIFF (reserved fields are load-bearing)
    val bad = bytes.clone(); bad(4) = 4
    assert(!GeoTiff.canHandle(bad))
  }

  test("per-file variable discovery across formats") {
    assert(Formats.GeoTiffDecoder.listVariables(GeoTiff.write(sampleRaster)) == Seq("band_1"))
    val g = Grib2.write(Grib2.Message(sampleRaster, 0, 1, 8,
      java.time.LocalDateTime.of(2024, 1, 1, 0, 0), 0))
    assert(Formats.Grib2Decoder.listVariables(g) == Seq("d0_c1_p8"))
    val nc = NetCdf.write(Seq("lat" -> 2, "lon" -> 2), Seq(
      NetCdf.Variable("lat", Seq("lat"), Array(10f, -10f), None),
      NetCdf.Variable("lon", Seq("lon"), Array(-10f, 10f), None),
      NetCdf.Variable("t2m", Seq("lat", "lon"), Array(1f, 2f, 3f, 4f), None)))
    assert(Formats.NetCdfDecoder.listVariables(nc) == Seq("t2m"))
  }

  test("registry sniffs formats by magic bytes") {
    assert(Formats.sniff(GeoTiff.write(sampleRaster)).map(_.name).contains("geotiff"))
    // GRIB sniffs on magic + the edition octet (octet 8)
    def gribPrefix(edition: Int) = "GRIBxxx".getBytes ++ Array(edition.toByte, 0.toByte)
    assert(Formats.sniff(gribPrefix(2)).map(_.name).contains("grib2"))
    assert(Formats.sniff(gribPrefix(1)).map(_.name).contains("grib1"))
    assert(Formats.sniff(gribPrefix(3)).isEmpty) // unknown edition
    assert(Formats.sniff("CDFxx".getBytes).map(_.name).contains("netcdf"))
    assert(Formats.sniff(Array[Byte](0x89.toByte, 'H', 'D', 'F')).map(_.name).contains("netcdf"))
    assert(Formats.sniff("not-a-raster".getBytes).isEmpty)
  }

  test("binaryFile ingest decodes a dropped GeoTIFF to long-form pixels") {
    val dir = Files.createTempDirectory("graft-tif-").toString
    val r = sampleRaster
    Files.write(Paths.get(s"$dir/precip_20240115.tif"), GeoTiff.write(r))
    val df = Formats.ingestDir(spark, dir)
    val n = df.count()
    assert(n == r.data.count(!_.isNaN)) // NaN cells dropped at decode
    val row = df.filter(col("y") === 0 && col("x") === 1)
      .select("v", "lon", "lat", "time").collect()(0)
    assert(row.getDouble(0) == 0.5)
    // pixel-center georeferencing: x=1 → -180 + 1.5·45; y=0 → 90 − 0.5·30
    assert(row.getDouble(1) == -112.5 && row.getDouble(2) == 75.0)
    assert(row.getTimestamp(3).toString == "2024-01-15 00:00:00.0")
  }

  test("reference-profile COG round-trips: 256² tiles, deflate, predictor 3, float32, NaN nodata") {
    // 300×300 → 2×2 tile grid with ragged right/bottom edges, exactly
    // the reference COG sink's profile (asset_writer.py:46-148:
    // deflate + blocksize + predictor-by-dtype)
    val w = 300; val h = 300
    // a gradient + small texture: few distinct mantissa patterns, so
    // the float predictor's byte planes give deflate long runs — the
    // compressible shape real continuous fields have
    val data = Array.tabulate(w * h) { i =>
      if (i % 97 == 13) Float.NaN
      else (i / w) * 0.5f + (i % 7) * 0.125f
    }
    val bytes = GeoTiff.writeCog(Seq(data), w, h, -30.0, 60.0, 0.1, 0.1)
    assert(GeoTiff.canHandle(bytes))
    // deflate + predictor must actually compress a smooth field
    assert(bytes.length < w * h * 4 / 2,
      s"COG should compress: ${bytes.length} vs raw ${w * h * 4}")
    val back = GeoTiff.read(bytes)
    assert(back.width == w && back.height == h)
    assert(back.west == -30.0 && back.north == 60.0 &&
      back.px == 0.1 && back.py == 0.1)
    assert(back.data.zip(data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
  }

  test("multi-band COG: band_N discovery and per-band decode") {
    val w = 40; val h = 30
    val bands = Seq.tabulate(3)(b =>
      Array.tabulate(w * h)(i => (b * 1000 + i).toFloat))
    val bytes = GeoTiff.writeCog(bands, w, h, 0.0, 10.0, 0.25, 0.25,
      tileSize = 16)
    assert(GeoTiff.bandCount(bytes) == 3)
    assert(Formats.GeoTiffDecoder.listVariables(bytes) ==
      Seq("band_1", "band_2", "band_3"))
    for (b <- 1 to 3) {
      val r = GeoTiff.readBand(bytes, b)
      assert(r.data.sameElements(bands(b - 1)), s"band $b mismatch")
    }
    // band 1 is what the single-band decode path sees
    assert(GeoTiff.read(bytes).data.sameElements(bands.head))
  }

  test("int16 + predictor 2 + declared nodata round-trips with NaN restored") {
    val w = 70; val h = 50
    val data = Array.tabulate(w * h) { i =>
      if (i % 53 == 7) Float.NaN else ((i % 2001) - 1000).toFloat
    }
    val bytes = GeoTiff.writeCog(Seq(data), w, h, 5.0, 45.0, 0.5, 0.5,
      tileSize = 32, dtype = "int16", nodata = Some(-32768.0))
    val back = GeoTiff.read(bytes)
    assert(back.data.zip(data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
  }

  test("uint8 + predictor 2 round-trips (categorical rasters)") {
    val w = 33; val h = 17
    val data = Array.tabulate(w * h)(i => (i % 251).toFloat)
    val bytes = GeoTiff.writeCog(Seq(data), w, h, 0.0, 0.0, 1.0, 1.0,
      tileSize = 16, dtype = "uint8")
    assert(GeoTiff.read(bytes).data.sameElements(data))
  }

  test("float64 + predictor 3 round-trips (scientific DEM shape; engine narrows to f32)") {
    val w = 70; val h = 40
    // values chosen exactly representable in float32 so the declared
    // narrowing at decode is lossless for the fixture
    val data = Array.tabulate(w * h) { i =>
      if (i % 47 == 3) Float.NaN else (i * 0.25f - 500.0f)
    }
    val bytes = GeoTiff.writeCog(Seq(data), w, h, 5.0, 45.0, 0.5, 0.5,
      tileSize = 32, dtype = "float64")
    val back = GeoTiff.read(bytes)
    assert(back.data.zip(data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
    // and through LZW as well (predictor-3 byte planes are 8 deep)
    val lzw = GeoTiff.writeCog(Seq(data), w, h, 5.0, 45.0, 0.5, 0.5,
      tileSize = 32, dtype = "float64", compression = 5)
    assert(GeoTiff.read(lzw).data.zip(data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
  }

  test("uint32 + predictor 2 round-trips (large-count rasters above int32)") {
    val w = 40; val h = 25
    // exercise values past Int.MaxValue (unsigned range), f32-exact
    val data = Array.tabulate(w * h)(i =>
      if (i % 3 == 0) 3.0e9f else (i * 1024).toFloat)
    val bytes = GeoTiff.writeCog(Seq(data), w, h, 0.0, 10.0, 1.0, 1.0,
      tileSize = 16, dtype = "uint32")
    assert(GeoTiff.read(bytes).data.sameElements(data))
  }

  test("planar (band-sequential) multi-band layout decodes") {
    val w = 20; val h = 20
    val bands = Seq.tabulate(2)(b =>
      Array.tabulate(w * h)(i => (b * 500 + i * 3).toFloat))
    val bytes = GeoTiff.writeCog(bands, w, h, 0.0, 20.0, 1.0, 1.0,
      tileSize = 16, planar = true)
    assert(GeoTiff.bandCount(bytes) == 2)
    for (b <- 1 to 2)
      assert(GeoTiff.readBand(bytes, b).data.sameElements(bands(b - 1)))
  }

  test("LZW compression round-trips (predictor 3 float32 and predictor 2 int16)") {
    val w = 150; val h = 90
    val f = Array.tabulate(w * h) { i =>
      if (i % 89 == 3) Float.NaN else (i / w) * 0.5f + (i % 11) * 0.125f
    }
    val fb = GeoTiff.writeCog(Seq(f), w, h, -5.0, 55.0, 0.2, 0.2,
      tileSize = 64, compression = 5)
    assert(fb.length < w * h * 4, "LZW should compress the gradient")
    assert(GeoTiff.read(fb).data.zip(f).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
    val iv = Array.tabulate(w * h)(i => ((i * 31) % 1999 - 999).toFloat)
    val ib = GeoTiff.writeCog(Seq(iv), w, h, 0.0, 0.0, 1.0, 1.0,
      tileSize = 64, dtype = "int16", nodata = Some(-32768.0), compression = 5)
    assert(GeoTiff.read(ib).data.sameElements(iv))
    // a stream long enough to force the 10-, 11- and 12-bit code
    // widths plus a mid-stream table reset exercises the early-change
    // logic on both sides
    val noisy = Array.tabulate(60000)(i =>
      (((i * 2654435761L) >>> 7) % 251).toByte)
    val dec = GeoTiff.lzwDecode(GeoTiff.lzwEncode(noisy), noisy.length)
    assert(dec.sameElements(noisy), "raw LZW kernel round-trip")
  }

  test("PackBits compression round-trips (legacy/scanned GeoTIFF RLE)") {
    val w = 150; val h = 90
    // flat regions (long runs) + noise stripes (literal stretches)
    val v = Array.tabulate(w * h) { i =>
      if ((i / w) % 3 == 0) 7f else ((i * 31) % 13).toFloat
    }
    val b = GeoTiff.writeCog(Seq(v), w, h, -5.0, 55.0, 0.2, 0.2,
      tileSize = 64, dtype = "uint8", compression = 32773)
    assert(GeoTiff.read(b).data.sameElements(v))
    // float32 with predictor 3 rides the same per-row restart
    val f = Array.tabulate(w * h)(i => (i / w) * 0.5f + (i % 7) * 0.125f)
    val fb = GeoTiff.writeCog(Seq(f), w, h, -5.0, 55.0, 0.2, 0.2,
      tileSize = 64, compression = 32773)
    assert(GeoTiff.read(fb).data.sameElements(f))
    // raw kernel: every control-byte case (runs ≥128 split, literal
    // caps, single trailing byte) against a pathological stream
    val noisy = Array.tabulate(10000) { i =>
      if (i % 400 < 300) 42.toByte else (((i * 2654435761L) >>> 5) % 251).toByte
    }
    val enc = GeoTiff.packbitsEncode(noisy, 997) // deliberately odd row size
    assert(GeoTiff.packbitsDecode(enc, noisy.length).sameElements(noisy))
    assert(enc.length < noisy.length, "runs should compress")
    val ex = intercept[IllegalArgumentException](
      GeoTiff.packbitsDecode(Array[Byte](5, 1, 2), 10))
    assert(ex.getMessage.contains("PackBits"))
  }

  test("stripped organization (GDAL's small-raster default): deflate and LZW, short last strip") {
    // 100×37 with rowsPerStrip 8 → 5 strips, the last short (5 rows) —
    // strips are NOT padded, unlike tiles
    val w = 100; val h = 37
    val data = Array.tabulate(w * h) { i =>
      if (i % 71 == 9) Float.NaN else (i / w) * 0.25f + (i % 13) * 0.5f
    }
    for (comp <- Seq(1, 5, 8)) {
      val bytes = GeoTiff.writeCog(Seq(data), w, h, -20.0, 30.0, 0.5, 0.5,
        tileSize = 8, compression = comp, stripped = true)
      val back = GeoTiff.read(bytes)
      assert(back.width == w && back.height == h, s"comp=$comp dims")
      assert(back.west == -20.0 && back.north == 30.0)
      assert(back.data.zip(data).forall { case (a, b) =>
        (a.isNaN && b.isNaN) || a == b }, s"comp=$comp pixels")
    }
    // multi-band chunky strips decode per band too
    val bands = Seq.tabulate(2)(b => Array.tabulate(w * h)(i => (b * 10000 + i).toFloat))
    val mb = GeoTiff.writeCog(bands, w, h, 0.0, 0.0, 1.0, 1.0,
      tileSize = 16, stripped = true)
    for (b <- 1 to 2)
      assert(GeoTiff.readBand(mb, b).data.sameElements(bands(b - 1)), s"band $b")
  }

  test("COG overview pyramid: chained IFDs, NaN-aware average decimation, derived georef") {
    val w = 64; val h = 48
    // quadrant-constant field with one all-NaN 2×2 block and one
    // half-NaN block, so every averaging mode is asserted exactly
    val data = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      if (y < 2 && x < 2) Float.NaN                   // all-NaN window
      else if (y < 2 && x >= 2 && x < 4 && x % 2 == 0) Float.NaN // half-NaN
      else (10 * (y / 24) + (x / 32)).toFloat         // quadrant value
    }
    val bytes = GeoTiff.writeCog(Seq(data), w, h, -10.0, 40.0, 0.25, 0.25,
      tileSize = 32, overviewLevels = 2)
    assert(GeoTiff.levels(bytes) == Seq((64, 48), (32, 24), (16, 12)))
    // full-res page is untouched by the pyramid
    assert(GeoTiff.read(bytes).data.zip(data).forall { case (a, b) =>
      (a.isNaN && b.isNaN) || a == b })
    val o1 = GeoTiff.readBand(bytes, 1, level = 1)
    assert(o1.width == 32 && o1.height == 24)
    // derived georef: affine scaled by the dimension ratio
    assert(o1.west == -10.0 && o1.north == 40.0 && o1.px == 0.5 && o1.py == 0.5)
    assert(o1.data(0).isNaN)                   // all-NaN window stays NaN
    assert(o1.data(1) == 0f)                   // half-NaN window averages the valid half
    assert(o1.data(23 * 32 + 31) == 11f)       // deep quadrant average = constant
    val o2 = GeoTiff.readBand(bytes, 1, level = 2)
    assert(o2.width == 16 && o2.height == 12 && o2.data(11 * 16 + 15) == 11f)
  }

  test("writeCogAuto follows the reference blocksize/overview rules") {
    // reference examples (asset_writer.py:168-211): 300×229 → 128-px
    // blocks, 1 level; 800×700 → 256-px blocks... min_dim 700 ≥ 512 →
    // 256, and 700//2 ≥ 512? no → max(0,1) = 1 level
    assert(GeoTiff.blocksizeFor(300, 229) == 128)
    assert(GeoTiff.overviewLevelsFor(300, 229, 128) == 1)
    assert(GeoTiff.blocksizeFor(7200, 3600) == 512)
    assert(GeoTiff.overviewLevelsFor(7200, 3600, 512) == 1)
    assert(GeoTiff.overviewLevelsFor(7200, 3600, 128) == 3)
    val w = 300; val h = 229
    val data = Array.tabulate(w * h)(i => (i % 97).toFloat)
    val bytes = GeoTiff.writeCogAuto(Seq(data), w, h, 0.0, 20.0, 0.1, 0.1)
    assert(GeoTiff.levels(bytes) == Seq((300, 229), (150, 115)))
    assert(GeoTiff.read(bytes).data.sameElements(data))
  }

  test("binaryFile ingest decodes a dropped reference-profile COG end-to-end") {
    val dir = Files.createTempDirectory("graft-cog-").toString
    val w = 64; val h = 48
    val data = Array.tabulate(w * h)(i =>
      if (i % 31 == 5) Float.NaN else (i * 0.25f))
    Files.write(Paths.get(s"$dir/tmax_20240301.tif"),
      GeoTiff.writeCog(Seq(data), w, h, -10.0, 50.0, 0.5, 0.5, tileSize = 32))
    val df = Formats.ingestDir(spark, dir)
    assert(df.count() == data.count(!_.isNaN))
    val row = df.filter(col("y") === 1 && col("x") === 2)
      .select("v", "lon", "lat", "time").collect()(0)
    assert(row.getDouble(0) == (w + 2) * 0.25)
    assert(row.getDouble(1) == -10.0 + 2.5 * 0.5 && row.getDouble(2) == 50.0 - 1.5 * 0.5)
    assert(row.getTimestamp(3).toString == "2024-03-01 00:00:00.0")
  }

  test("south-up rasters are normalized north-up at read") {
    val w = 2; val h = 2
    // south-up: row 0 is the SOUTH edge; py < 0, origin at south.
    val bytes = GeoTiff.write(
      GeoTiff.Raster(w, h, Array(1f, 2f, 3f, 4f), 0.0, 0.0, 1.0, -1.0))
    val back = GeoTiff.read(bytes)
    assert(back.py == 1.0)
    assert(back.data.toSeq == Seq(3f, 4f, 1f, 2f)) // flipped to north-up
  }

  test("JPEG compression (7): tiled uint8 decodes within lossy tolerance, tables in tag 347") {
    val w = 40; val h = 28
    val band = Array.tabulate(w * h)(i => (((i % w) * 3 + (i / w) * 5) % 256).toFloat)
    val bytes = GeoTiff.writeCog(Seq(band), w, h, -180.0, 90.0, 360.0 / w, 180.0 / h,
      tileSize = 16, dtype = "uint8", compression = 7)
    val back = GeoTiff.read(bytes)
    assert(back.width == w && back.height == h)
    assert(back.west == -180.0 && back.north == 90.0)
    val maxErr = back.data.zip(band).map { case (a, b) => math.abs(a - b) }.max
    assert(maxErr <= 2, s"lossy error $maxErr beyond q=1 tolerance")
  }

  test("JPEG 3-band chunky writes photometric YCbCr and decodes per band") {
    val w = 24; val h = 16
    val r = Array.tabulate(w * h)(i => ((i % w) * 10 % 256).toFloat)
    val g = Array.tabulate(w * h)(i => ((i / w) * 12 % 256).toFloat)
    val b = Array.tabulate(w * h)(_ => 128f)
    val bytes = GeoTiff.writeCog(Seq(r, g, b), w, h, 0.0, 0.0, 1.0, 1.0,
      tileSize = 16, dtype = "uint8", compression = 7)
    assert(GeoTiff.bandCount(bytes) == 3)
    for ((src, bandNo) <- Seq(r, g, b).zipWithIndex) {
      val back = GeoTiff.readBand(bytes, bandNo + 1, 0)
      val maxErr = back.data.zip(src).map { case (a, x) => math.abs(a - x) }.max
      assert(maxErr <= 4, s"band ${bandNo + 1} error $maxErr") // YCbCr double rounding
    }
  }

  test("JPEG stripped layout with a short last strip decodes") {
    val w = 20; val h = 26 // 16-row strips: last strip is 10 rows
    val band = Array.tabulate(w * h)(i => ((i * 7) % 256).toFloat)
    val bytes = GeoTiff.writeCog(Seq(band), w, h, 0.0, 0.0, 1.0, 1.0,
      tileSize = 16, dtype = "uint8", compression = 7, stripped = true)
    val back = GeoTiff.read(bytes)
    assert(back.width == w && back.height == h)
    val maxErr = back.data.zip(band).map { case (a, x) => math.abs(a - x) }.max
    assert(maxErr <= 2)
  }

  test("JPEG compression rejects non-uint8 dtypes loudly") {
    val e = intercept[IllegalArgumentException] {
      GeoTiff.writeCog(Seq(Array.fill(16)(1f)), 4, 4, 0, 0, 1, 1,
        dtype = "float32", compression = 7)
    }
    assert(e.getMessage.contains("uint8"))
  }

  test("channel-backed reads decode identically to in-memory reads") {
    val w = 24; val h = 16
    val data = Array.tabulate(w * h)(i => if (i % 19 == 0) Float.NaN else i * 0.5f)
    val dataU8 = Array.tabulate(w * h)(i => ((i * 7) % 256).toFloat)
    val fixtures: Seq[Array[Byte]] = Seq(
      GeoTiff.write(GeoTiff.Raster(w, h, data, -180.0, 90.0, 15.0, 11.25)),
      GeoTiff.writeBig(GeoTiff.Raster(w, h, data, -180.0, 90.0, 15.0, 11.25)),
      GeoTiff.writeCog(Seq(data), w, h, -180.0, 90.0, 15.0, 11.25, tileSize = 16),
      GeoTiff.writeCog(Seq(data), w, h, -180.0, 90.0, 15.0, 11.25, compression = 32773),
      GeoTiff.writeCog(Seq(dataU8), w, h, -180.0, 90.0, 15.0, 11.25,
        tileSize = 16, dtype = "uint8", compression = 7))
    for ((bytes, i) <- fixtures.zipWithIndex) {
      val tmp = java.nio.file.Files.createTempFile("graft-tif-ch-", ".tif")
      java.nio.file.Files.write(tmp, bytes)
      val viaArr = GeoTiff.read(bytes)
      val in = ByteIn.fromPath(tmp.toString)
      val viaCh = try GeoTiff.readBand(in, 1, 0) finally in.close()
      assert(viaCh.width == viaArr.width && viaCh.height == viaArr.height, s"fixture $i")
      viaCh.data.zip(viaArr.data).foreach { case (a, b) =>
        assert((a.isNaN && b.isNaN) || a == b, s"fixture $i")
      }
      java.nio.file.Files.delete(tmp)
    }
  }

  test("a BigTIFF strip beyond 2 GiB decodes through the channel path") {
    // hand-built BigTIFF whose single uncompressed strip lives at
    // 2.5 GiB in a SPARSE file — the >4 GiB aerial-COG shape no JVM
    // byte array can hold. Holes cost nothing; only the header and
    // data pages are touched.
    val w = 6; val h = 4
    val data = Array.tabulate(w * h)(i => i * 1.5f)
    val dataAddr = 0xA0000000L // 2.5 GiB
    val nTags = 9
    val head = java.nio.ByteBuffer.allocate(16 + 8 + nTags * 20 + 8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    head.put('I'.toByte).put('I'.toByte).putShort(43)
    head.putShort(8).putShort(0).putLong(16L) // IFD0 right after header
    head.putLong(nTags.toLong)
    def tag(id: Int, typ: Int, count: Long, value: Long): Unit = {
      head.putShort(id.toShort).putShort(typ.toShort).putLong(count).putLong(value)
    }
    tag(256, 3, 1, w); tag(257, 3, 1, h); tag(258, 3, 1, 32)
    tag(259, 3, 1, 1); tag(262, 3, 1, 1)
    tag(273, 16, 1, dataAddr)        // StripOffsets LONG8 beyond 2 GiB
    tag(278, 3, 1, h)
    tag(279, 16, 1, data.length * 4L)
    tag(339, 3, 1, 3)
    head.putLong(0L) // next IFD
    val fileLen = dataAddr + data.length * 4L
    val tmp = java.nio.file.Files.createTempFile("graft-tif-big-", ".tif")
    val raf = new java.io.RandomAccessFile(tmp.toFile, "rw")
    try {
      raf.write(head.array())
      raf.seek(dataAddr)
      val db = java.nio.ByteBuffer.allocate(data.length * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      data.foreach(db.putFloat)
      raf.write(db.array())
    } finally raf.close()
    assert(java.nio.file.Files.size(tmp) == fileLen)
    val in = ByteIn.fromPath(tmp.toString)
    val r = try GeoTiff.readBand(in, 1, 0) finally in.close()
    assert(r.width == w && r.height == h)
    assert(r.data.sameElements(data))
    java.nio.file.Files.delete(tmp)
  }

  test("ingestLargePaths routes a TIFF granule row-for-row like ingestDir") {
    val w = 10; val h = 6
    val data = Array.tabulate(w * h)(i => if (i % 7 == 0) Float.NaN else i * 0.25f)
    val dir = java.nio.file.Files.createTempDirectory("graft-tif-lg-").toString
    val p = java.nio.file.Paths.get(s"$dir/ndvi_20240301.tif")
    java.nio.file.Files.write(p,
      GeoTiff.writeCog(Seq(data), w, h, -10.0, 50.0, 0.5, 0.5, tileSize = 8))
    val sel = Seq("time", "step", "y", "x", "v", "lon", "lat")
    val viaDir = Formats.ingestDir(spark, dir)
      .selectExpr(sel: _*).orderBy("y", "x").collect().toSeq
    val viaPaths = Formats.ingestLargePaths(spark, Seq(p.toString))
      .selectExpr(sel: _*).orderBy("y", "x").collect().toSeq
    assert(viaPaths == viaDir && viaPaths.nonEmpty)
  }

  test("sparse (GDAL SPARSE_OK) tiles decode as nodata, never as header bytes") {
    // 32x32 raster in 16px tiles: tile (0,0) all-NaN -> written sparse
    // (offset 0, bytecount 0); the other three tiles carry data
    val w = 32; val h = 32
    val data = Array.tabulate(w * h) { i =>
      val y = i / w; val x = i % w
      if (y < 16 && x < 16) Float.NaN else (y * 100 + x).toFloat
    }
    val bytes = GeoTiff.writeCog(Seq(data), w, h, -180.0, 90.0, 1.0, 1.0,
      tileSize = 16, sparse = true)
    // the wire really is sparse: smaller than the dense form
    val dense = GeoTiff.writeCog(Seq(data), w, h, -180.0, 90.0, 1.0, 1.0,
      tileSize = 16)
    assert(bytes.length < dense.length,
      s"sparse form (${bytes.length}) not smaller than dense (${dense.length})")
    val r = GeoTiff.read(bytes)
    for (i <- 0 until w * h) {
      if (data(i).isNaN) assert(r.data(i).isNaN, s"pixel $i should be nodata")
      else assert(r.data(i) == data(i), s"pixel $i")
    }
    // a fully-sparse raster (every tile empty) also round-trips
    val allNaN = GeoTiff.read(GeoTiff.writeCog(
      Seq(Array.fill(w * h)(Float.NaN)), w, h, -180.0, 90.0, 1.0, 1.0,
      tileSize = 16, sparse = true))
    assert(allNaN.data.forall(_.isNaN))
  }
}
