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
    assert(Formats.sniff("GRIBxxxx".getBytes).map(_.name).contains("grib2"))
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

  test("south-up rasters are normalized north-up at read") {
    val w = 2; val h = 2
    // south-up: row 0 is the SOUTH edge; py < 0, origin at south.
    val bytes = GeoTiff.write(
      GeoTiff.Raster(w, h, Array(1f, 2f, 3f, 4f), 0.0, 0.0, 1.0, -1.0))
    val back = GeoTiff.read(bytes)
    assert(back.py == 1.0)
    assert(back.data.toSeq == Seq(3f, 4f, 1f, 2f)) // flipped to north-up
  }
}
