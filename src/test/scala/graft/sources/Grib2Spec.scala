package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

class Grib2Spec extends SparkSpec {

  private def sampleMessage = {
    val w = 8; val h = 6
    val data = Array.tabulate(w * h) { i =>
      if (i % 11 == 0) Float.NaN else (i * 0.25f - 3.0f)
    }
    Grib2.Message(
      GeoTiff.Raster(w, h, data, -180.0, 90.0, 45.0, 30.0),
      discipline = 0, category = 1, parameter = 8,
      refTime = java.time.LocalDateTime.of(2024, 1, 1, 6, 0, 0),
      forecastHours = 12)
  }

  test("write → read round-trips grid, nodata bitmap, identity and times") {
    val m = sampleMessage
    val bytes = Grib2.write(m)
    assert(Grib2.canHandle(bytes))
    val back = Grib2.read(bytes)
    assert(back.raster.width == 8 && back.raster.height == 6)
    assert(back.raster.west == -180.0 && back.raster.north == 90.0 &&
      back.raster.px == 45.0 && back.raster.py == 30.0)
    assert(back.discipline == 0 && back.category == 1 && back.parameter == 8)
    assert(back.refTime == m.refTime && back.forecastHours == 12)
    // simple packing with D=2 preserves values to 1/100
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("complex packing (5.2) round-trips values and nodata") {
    val m = sampleMessage
    val back = Grib2.read(Grib2.write(m, packing = 2))
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("complex packing + 2nd-order spatial differencing (5.3) round-trips") {
    // a smooth field is where spatial differencing earns its keep
    val w = 30; val h = 20
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if ((x, y) == (5, 5)) Float.NaN
      else (100.0 + 3.0 * x + 2.0 * y + 0.05 * x * y).toFloat
    }
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, smooth, -180.0, 90.0, 12.0, 9.0))
    val bytes = Grib2.write(m, packing = 3)
    val back = Grib2.read(bytes)
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
    // and it actually compresses vs simple packing on a smooth field
    assert(bytes.length < Grib2.write(m, packing = 0).length)
  }

  test("+j and -i scanning modes normalize back to north-up/west-east") {
    val m = sampleMessage
    for (scan <- Seq(0x40, 0x80, 0xC0); packing <- Seq(0, 2)) {
      val back = Grib2.read(Grib2.write(m, packing = packing, scanMode = scan))
      assert(back.raster.west == m.raster.west &&
        back.raster.north == m.raster.north, s"bounds wrong for scan=$scan")
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        if (b.isNaN) assert(a.isNaN, s"scan=$scan")
        else assert(math.abs(a - b) < 0.005, s"scan=$scan: $a vs $b")
      }
    }
  }

  test("unsupported scanning modes fail loudly, not silently mis-georeference") {
    val m = sampleMessage
    intercept[IllegalArgumentException] {
      Grib2.write(m, scanMode = 0x20)
    }
    // hand-corrupt the scanning octet of a valid message to 0x20:
    // section 3 starts at byte 16+21; octet 72 of it = 16+21+71
    val bytes = Grib2.write(m)
    bytes(16 + 21 + 71) = 0x20.toByte
    intercept[IllegalArgumentException] { Grib2.read(bytes) }
  }

  test("negative first-point latitudes survive sign-magnitude encoding") {
    val m = sampleMessage.copy(raster = sampleMessage.raster.copy(
      west = -10.0, north = -5.0, px = 1.0, py = 1.0))
    val back = Grib2.read(Grib2.write(m))
    assert(back.raster.west == -10.0 && back.raster.north == -5.0)
  }

  test("concatenated multi-message files split and decode per forecast step") {
    val m = sampleMessage
    val bytes = Grib2.write(m) ++ Grib2.write(m.copy(forecastHours = 18)) ++
      Grib2.write(m.copy(category = 2, parameter = 3, forecastHours = 24))
    val all = Grib2.readAll(bytes)
    assert(all.map(_.forecastHours) == Seq(12, 18, 24))
    assert(Formats.Grib2Decoder.listVariables(bytes) == Seq("d0_c1_p8", "d0_c2_p3"))
    assert(Formats.Grib2Decoder.decodeMulti(bytes).map(_._1) == Seq(12, 18, 24))
  }

  test("mixed-format directory ingests tiff and grib2 together") {
    val dir = Files.createTempDirectory("graft-mixed-").toString
    val m = sampleMessage
    Files.write(Paths.get(s"$dir/t2m_20240101_0600.grib2"), Grib2.write(m))
    Files.write(Paths.get(s"$dir/precip_20240102.tif"),
      GeoTiff.write(m.raster))
    val df = Formats.ingestDir(spark, dir)
    val n = m.raster.data.count(!_.isNaN)
    assert(df.count() == 2L * n)
    assert(df.select("time").distinct().count() == 2)
  }
}
