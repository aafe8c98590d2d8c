package graft.sources

import graft.SparkSpec
import scala.util.Random

class Grib1Spec extends SparkSpec {

  private def sampleMessage = {
    val w = 24; val h = 16
    val data = Array.tabulate(w * h) { i =>
      if (i % 19 == 0) Float.NaN else (250.0f + (i % 31) * 0.5f)
    }
    Grib2.Message(GeoTiff.Raster(w, h, data, -180.0, 90.0, 15.0, 11.25),
      discipline = 255, category = 128, parameter = 11,
      refTime = java.time.LocalDateTime.of(1987, 6, 15, 12, 0),
      forecastHours = 6)
  }

  test("IBM System/370 float codec round-trips the reference-value domain") {
    for (v <- Seq(0.0, 1.0, -1.0, 0.5, 100.25, -9999.0, 24000.0, 1e-6, 6.1e5, -0.125)) {
      val back = Grib1.ibm32(Grib1.toIbm32(v))
      assert(math.abs(back - v) <= math.abs(v) * 1e-6 + 1e-12, s"$v -> $back")
    }
    // known encoding: 1.0 = 16^(65-64) x 0x100000/2^24
    assert(Grib1.ibm32(0x41100000L) == 1.0)
    assert(Grib1.ibm32(0xc1100000L) == -1.0)
  }

  test("edition-1 write → read round-trips pixels, bitmap NaN, georeferencing, time") {
    val m = sampleMessage
    val bytes = Grib1.write(m)
    assert(Grib1.canHandle(bytes))
    assert(!Grib2.canHandle(bytes), "edition byte must route editions apart")
    assert(Formats.sniff(bytes).map(_.name).contains("grib1"))
    val back = Grib1.read(bytes)
    assert(back.raster.width == 24 && back.raster.height == 16)
    assert(back.raster.west == -180.0 && back.raster.north == 90.0)
    assert(back.category == 128 && back.parameter == 11 && back.discipline == 255)
    assert(back.refTime == m.refTime && back.forecastHours == 6)
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("predefined (GDS-less) grid 2 round-trips; unknown grid numbers are loud") {
    // NCEP ON388 grid 2: global 2.5°, 144x73, first point 90°/0° —
    // the GDS-less form pre-2000 NCEP archives shipped
    val w = 144; val h = 73; val d = 2.5
    val data = Array.tabulate(w * h) { i =>
      if (i % 53 == 0) Float.NaN else (220.0f + (i % 101) * 0.25f)
    }
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -d / 2, 90.0 + d / 2, d, d),
      discipline = 255, category = 3, parameter = 11,
      refTime = java.time.LocalDateTime.of(1979, 1, 1, 0, 0),
      forecastHours = 0)
    val bytes = Grib1.write(m, predefinedGrid = Some(2))
    // the wire form really is GDS-less: PDS octet 8 has no GDS bit
    assert(Formats.sniff(bytes).map(_.name).contains("grib1"))
    val back = Grib1.read(bytes)
    assert(back.raster.width == w && back.raster.height == h)
    assert(math.abs(back.raster.west - (-d / 2)) < 1e-9)
    assert(math.abs(back.raster.north - (90.0 + d / 2)) < 1e-9)
    assert(back.raster.px == d && back.raster.py == d)
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN) else assert(math.abs(a - b) < 0.005)
    }
    // an unknown predefined grid number dead-letters by name
    val unknown = bytes.clone()
    // PDS starts at offset 8; octet 7 (grid id) is at 8 + 6
    unknown(8 + 6) = 21
    val e = intercept[IllegalArgumentException] { Grib1.read(unknown) }
    assert(e.getMessage.contains("predefined GRIB1 grid 21"))
    // geometry that doesn't match the table is a writer error
    val bad = intercept[IllegalArgumentException] {
      Grib1.write(sampleMessage, predefinedGrid = Some(2))
    }
    assert(bad.getMessage.contains("does not match predefined grid"))
  }

  test("multi-message files index by forecast hour through the decoder registry") {
    val m = sampleMessage
    val both = Grib1.write(m) ++ Grib1.write(m.copy(forecastHours = 12))
    val steps = Formats.Grib1Decoder.decodeMulti(both).map(_._1)
    assert(steps == Seq(6, 12))
    assert(Formats.Grib1Decoder.listVariables(both) == Seq("d255_c128_p11"))
  }

  test("edition-1 scan modes (±i, ±j, column-major) normalize to north-up") {
    val m = sampleMessage
    for (mode <- Seq(0x80, 0x40, 0x20, 0xc0, 0xe0)) {
      val back = Grib1.read(Grib1.write(m, scanMode = mode))
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        assert((a.isNaN && b.isNaN) || math.abs(a - b) < 0.005,
          f"scan 0x$mode%02x: $a vs $b")
      }
      // georeferencing must survive too: the writer's first/last GDS
      // points are the SCAN corners, so a writer pinning NW->SE would
      // shift west/north for every mirrored mode (caught 2026-08)
      assert(math.abs(back.raster.west - m.raster.west) < 1e-6,
        f"scan 0x$mode%02x west: ${back.raster.west} vs ${m.raster.west}")
      assert(math.abs(back.raster.north - m.raster.north) < 1e-6,
        f"scan 0x$mode%02x north: ${back.raster.north} vs ${m.raster.north}")
    }
  }

  test("Gaussian grid (type 4) resolves latitudes from the Gaussian table") {
    // patch a lat/lon message into the type-4 form: same GDS octet
    // layout, octets 26-27 carry N instead of Dj
    val nPar = 8
    val w = 20; val h = 2 * nPar
    val data = Array.tabulate(w * h)(i => 270.0f + (i % 13) * 0.25f)
    val m = Grib2.Message(GeoTiff.Raster(w, h, data, 0.0, 90.0, 18.0, 11.25),
      discipline = 255, category = 128, parameter = 11,
      refTime = java.time.LocalDateTime.of(1987, 6, 15, 12, 0), forecastHours = 0)
    val bytes = Grib1.write(m)
    val gds = 8 + 28 // after IS + PDS
    bytes(gds + 5) = 4 // grid type: Gaussian
    bytes(gds + 25) = 0; bytes(gds + 26) = nPar.toByte // N
    val back = Grib1.read(bytes)
    assert(back.proj.contains(Grib2.GaussianGrid(nPar)))
    assert(back.raster.height == 2 * nPar)
    // first Gaussian parallel for N=8 is ~84.0°N (table, not linear)
    assert(back.raster.north > 84.0 && back.raster.north < 90.0)
    assert(back.raster.data.sameElements(data))
  }

  test("ingestDir decodes a dropped GRIB1 granule end-to-end") {
    val dir = java.nio.file.Files.createTempDirectory("graft-g1-").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/t2m_19870615.grib"), Grib1.write(sampleMessage))
    val df = Formats.ingestDir(spark, dir)
    assert(df.count() == sampleMessage.raster.data.count(!_.isNaN))
  }

  test("unsupported edition-1 forms fail loudly") {
    val good = Grib1.write(sampleMessage)
    // spherical harmonics flag in the BDS
    val bds = {
      // walk sections: IS(8) + PDS(28) + GDS + BMS to find the BDS
      var o = 8 + 28
      val gdsLen = ((good(o) & 0xff) << 16) | ((good(o + 1) & 0xff) << 8) | (good(o + 2) & 0xff)
      o += gdsLen
      val bmsLen = ((good(o) & 0xff) << 16) | ((good(o + 1) & 0xff) << 8) | (good(o + 2) & 0xff)
      o + bmsLen
    }
    // WMO Table 11 nibble: 0x8 spherical, 0x4 complex, 0x2 integer, 0x1 extras
    val sph = good.clone(); sph(bds + 3) = (sph(bds + 3) | 0x80).toByte
    val e1 = intercept[IllegalArgumentException](Grib1.read(sph))
    assert(e1.getMessage.contains("spherical-harmonic"))
    val second = good.clone(); second(bds + 3) = (second(bds + 3) | 0x40).toByte
    val e2 = intercept[IllegalArgumentException](Grib1.read(second))
    assert(e2.getMessage.contains("second-order"))
    // the INTEGER-original-type flag changes nothing about simple
    // unpacking — several centres set it and the message must decode
    val intType = good.clone(); intType(bds + 3) = (intType(bds + 3) | 0x20).toByte
    val viaInt = Grib1.read(intType)
    Grib1.read(good).raster.data.zip(viaInt.raster.data).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || a == b)
    }
    // unknown grid type
    val badGrid = good.clone(); badGrid(8 + 28 + 5) = 3
    val e3 = intercept[IllegalArgumentException](Grib1.read(badGrid))
    assert(e3.getMessage.contains("unsupported GRIB1 grid type"))
  }

  test("grids crossing the 0°/360° wrap georeference from the scan start") {
    // patch a written message's GDS to lo1=350.5, lo2=9.5 with Di "not
    // given" — a 20°-wide regional grid across Greenwich. min/max of
    // the corners would declare a 340° span; the span must be measured
    // ALONG the scan direction modulo 360.
    val w = 20; val h = 16
    val data = Array.tabulate(w * h)(i => 100.0f + (i % 7))
    val m = Grib2.Message(GeoTiff.Raster(w, h, data, -10.0, 90.0, 1.0, 11.25),
      discipline = 255, category = 128, parameter = 11,
      refTime = java.time.LocalDateTime.of(1987, 6, 15, 12, 0), forecastHours = 0)
    val bytes = Grib1.write(m)
    val gds = 8 + 28
    def w24(at: Int, v: Int): Unit = {
      bytes(at) = (v >> 16).toByte; bytes(at + 1) = (v >> 8).toByte; bytes(at + 2) = v.toByte
    }
    w24(gds + 13, 350500) // lo1 = 350.5 (was −9.5)
    w24(gds + 20, 9500)   // lo2 = 9.5
    bytes(gds + 23) = 0xff.toByte; bytes(gds + 24) = 0xff.toByte // Di not given
    val back = Grib1.read(bytes)
    assert(math.abs(back.raster.px - 1.0) < 1e-9, s"px=${back.raster.px}")
    assert(math.abs(back.raster.west - (-10.0)) < 1e-9, s"west=${back.raster.west}")
    assert(back.raster.data.sameElements(data))
  }

  // BDS offset walk shared by the second-order tests
  private def bdsAt(bytes: Array[Byte]): Int = {
    var o = 8 + 28
    val gdsLen = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
    o += gdsLen
    val flags = bytes(8 + 7) & 0xff
    if ((flags & 0x40) != 0) {
      val bmsLen = ((bytes(o) & 0xff) << 16) | ((bytes(o + 1) & 0xff) << 8) | (bytes(o + 2) & 0xff)
      o += bmsLen
    }
    o
  }

  test("second-order packing (secondary-bitmap groups, per-group widths) decodes " +
       "identically to simple packing") {
    val m = sampleMessage
    val viaSimple = Grib1.read(Grib1.write(m)).raster.data
    val bytes = Grib1.writeSecondOrder(m, differentWidths = true, groupLen = 13)
    // wire form really is second-order: complex + extended-flag bits set
    val bds = bdsAt(bytes)
    assert(((bytes(bds + 3) & 0xff) >> 4) == 0x5, "flag nibble: complex + octet-14")
    assert((bytes(bds + 13) & 0xff) == 0x60, "ext flags: secondary bitmap + widths")
    val back = Grib1.read(bytes).raster.data
    back.zip(viaSimple).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || a == b, s"$a vs $b")
    }
  }

  test("second-order row-by-row with one shared width decodes identically") {
    val m = sampleMessage
    val viaSimple = Grib1.read(Grib1.write(m)).raster.data
    val bytes = Grib1.writeSecondOrder(m, rowByRow = true, differentWidths = false)
    val bds = bdsAt(bytes)
    assert((bytes(bds + 13) & 0xff) == 0x00, "ext flags: row-by-row, constant width")
    val back = Grib1.read(bytes).raster.data
    back.zip(viaSimple).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || a == b, s"$a vs $b")
    }
  }

  test("second-order width-0 groups: row-constant fields carry no second-order data") {
    val w = 16; val h = 8
    val data = Array.tabulate(w * h)(i => 100f + (i / w) * 2f) // constant per row
    val m = sampleMessage.copy(raster = GeoTiff.Raster(w, h, data, -180.0, 90.0, 22.5, 22.5))
    val bytes = Grib1.writeSecondOrder(m, rowByRow = true, differentWidths = true)
    val back = Grib1.read(bytes).raster.data
    back.zip(data).foreach { case (a, b) => assert(a == b, s"$a vs $b") }
  }

  test("second-order singleton groups (groupLen=1) reduce to pure first-order") {
    val m = sampleMessage
    val viaSimple = Grib1.read(Grib1.write(m)).raster.data
    val back = Grib1.read(Grib1.writeSecondOrder(m, groupLen = 1)).raster.data
    back.zip(viaSimple).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || a == b)
    }
  }

  test("general-extended / boustrophedonic / spatial-difference second order fail loudly") {
    val good = Grib1.writeSecondOrder(sampleMessage)
    val bds = bdsAt(good)
    for ((bit, msg) <- Seq(0x10 -> "general extended", 0x08 -> "boustrophedonic",
                           0x02 -> "spatial differencing", 0x80 -> "matrix")) {
      val bad = good.clone(); bad(bds + 13) = (bad(bds + 13) | bit).toByte
      val e = intercept[IllegalArgumentException](Grib1.read(bad))
      assert(e.getMessage.contains(msg), s"bit $bit -> ${e.getMessage}")
    }
  }

  test("byte-flipped second-order granules decode or throw — never hang") {
    val good = Grib1.writeSecondOrder(sampleMessage, groupLen = 7)
    val rnd = new Random(83)
    var decoded = 0; var threw = 0
    for (trial <- 0 until 150) {
      val bad = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      val t0 = System.nanoTime()
      try { Grib1.readAll(bad); decoded += 1 }
      catch { case _: Exception => threw += 1 }
      assert((System.nanoTime() - t0) / 1e9 < 30.0, s"trial $trial must terminate")
    }
    info(s"$decoded decoded, $threw dead-lettered of 150 corruptions")
    assert(decoded + threw == 150)
  }

  test("byte-flipped edition-1 granules decode or throw — never hang") {
    val good = Grib1.write(sampleMessage)
    val rnd = new Random(31)
    var decoded = 0; var threw = 0
    for (trial <- 0 until 150) {
      val bad = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      val t0 = System.nanoTime()
      try { Grib1.readAll(bad); decoded += 1 }
      catch { case _: Exception => threw += 1 }
      assert((System.nanoTime() - t0) / 1e9 < 30.0, s"trial $trial must terminate")
    }
    info(s"$decoded decoded, $threw dead-lettered of 150 corruptions")
    assert(decoded + threw == 150)
  }

  test("byte-flipped GDS-less granules decode or throw — never hang") {
    // the predefined-grid path has its own offsets (no GDS section), so
    // it gets its own corruption sweep
    val w = 144; val h = 73; val d = 2.5
    val m = Grib2.Message(
      GeoTiff.Raster(w, h,
        Array.tabulate(w * h)(i => 250.0f + (i % 37) * 0.5f),
        -d / 2, 90.0 + d / 2, d, d),
      discipline = 255, category = 3, parameter = 11,
      refTime = java.time.LocalDateTime.of(1979, 1, 1, 0, 0),
      forecastHours = 0)
    val good = Grib1.write(m, predefinedGrid = Some(2))
    val rnd = new Random(47)
    var decoded = 0; var threw = 0
    for (trial <- 0 until 150) {
      val bad = good.clone()
      for (_ <- 0 to rnd.nextInt(4))
        bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      val t0 = System.nanoTime()
      try { Grib1.readAll(bad); decoded += 1 }
      catch { case _: Exception => threw += 1 }
      assert((System.nanoTime() - t0) / 1e9 < 30.0, s"trial $trial must terminate")
    }
    info(s"$decoded decoded, $threw dead-lettered of 150 corruptions")
    assert(decoded + threw == 150)
  }

  test("thinned (quasi-regular) grids expand rows nearest-neighbour and flag lossy") {
    // 4 parallels, widest 8 points; row values encode (row, point)
    val pl = Seq(8, 6, 4, 8)
    val rows = pl.zipWithIndex.map { case (n, r) =>
      Array.tabulate(n)(k => (r * 100 + k * 2).toFloat)
    }
    val t0 = java.time.LocalDateTime.of(1992, 3, 1, 0, 0)
    val bytes = Grib1.writeThinned(rows, west = -180.0, north = 90.0,
      px = 45.0, py = 45.0, table = 128, param = 11, refTime = t0,
      forecastHours = 12)
    val m = Grib1.read(bytes)
    assert(m.raster.width == 8 && m.raster.height == 4)
    assert(m.lossy, "row expansion is a resample and must flag lossy")
    assert(m.refTime == t0 && m.forecastHours == 12)
    // expansion formula: out(x) = row(floor((x + 0.5) * nij / ni))
    for (r <- 0 until 4; x <- 0 until 8) {
      val nij = pl(r)
      val expect = rows(r)(math.min(nij - 1, (x + 0.5).toInt * nij / 8))
      val got = m.raster.data(r * 8 + x)
      assert(got == rows(r)(math.min(nij - 1, ((x + 0.5) * nij / 8).toInt)),
        s"row $r col $x: got $got")
    }
    // full rows pass through untouched
    for (x <- 0 until 8) assert(m.raster.data(x) == rows(0)(x))
  }

  test("thinned grids carry bitmap NaN per thinned point and ingest end-to-end") {
    val pl = Seq(6, 3, 6)
    val rows = pl.zipWithIndex.map { case (n, r) =>
      Array.tabulate(n)(k => if ((r + k) % 5 == 0) Float.NaN
                             else (200 + r * 10 + k).toFloat)
    }
    val t0 = java.time.LocalDateTime.of(1992, 3, 1, 6, 0)
    val bytes = Grib1.writeThinned(rows, west = 0.0, north = 45.0,
      px = 60.0, py = 15.0, table = 128, param = 61, refTime = t0,
      forecastHours = 0)
    val m = Grib1.read(bytes)
    // a NaN thinned point expands to NaN output columns
    assert(m.raster.data(0).isNaN, "row 0 point 0 is NaN")
    assert(!m.raster.data(2).isNaN && m.raster.data(2) == 202f)
    // production ingest: dropped granule decodes through the registry
    val dir = java.nio.file.Files.createTempDirectory("g1thin")
    java.nio.file.Files.write(dir.resolve("precip_19920301T06.grib"), bytes)
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.count() > 0)
    assert(df.filter(org.apache.spark.sql.functions.col("lossy")).count() == df.count(),
      "every thinned-grid pixel must carry the lossy flag")
  }

  test("thinned-grid guards: missing PL list and bad scan modes are loud") {
    val rows = Seq(Array(1f, 2f, 3f, 4f), Array(5f, 6f))
    val good = Grib1.writeThinned(rows, 0.0, 45.0, 90.0, 45.0, 128, 11,
      java.time.LocalDateTime.of(1992, 1, 1, 0, 0), 0)
    // PL pointer (GDS octet 5) zapped to 255 -> "no PL list"
    val gdsAt = {
      // PDS is the first section after the 8-byte IS
      val pdsLen = ((good(8) & 0xff) << 16) | ((good(9) & 0xff) << 8) | (good(10) & 0xff)
      8 + pdsLen
    }
    val noPl = good.clone()
    noPl(gdsAt + 4) = 255.toByte
    val e = intercept[IllegalArgumentException] { Grib1.read(noPl) }
    assert(e.getMessage.contains("no PL list"), e.getMessage)
    // a westward (-i) scan on a thinned grid is refused
    val badScan = good.clone()
    badScan(gdsAt + 27) = 0x80.toByte
    val e2 = intercept[IllegalArgumentException] { Grib1.read(badScan) }
    assert(e2.getMessage.contains("thinned grids decode eastward"), e2.getMessage)
  }

  // ---- spherical harmonics (GDS type 50) ---------------------------

  private def shCoefs(j: Int)(set: (Int, Int) => (Double, Double)): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    for (mm <- 0 to j; nn <- mm to j) {
      val (re, im) = set(nn, mm)
      out += re += im
    }
    out.toArray
  }

  test("spherical harmonics decode through the shared synthesis (vs GRIB2 5.50)") {
    val j = 8
    val t0 = java.time.LocalDateTime.of(1994, 3, 1, 12, 0)
    val coefs = shCoefs(j) { (n, m) =>
      if (n == 0 && m == 0) (252.0, 0.0)
      else (1.0 / ((n + 1) * (n + 1)), 0.3 / (n + m + 2))
    }
    val g1 = Grib1.read(Grib1.writeSpectral(coefs, j, j, 128, 11, t0, 6,
      decimals = 4))
    val g2 = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 6,
      decimals = 4))
    assert(g1.raster.width == 2 * (j + 1) && g1.raster.height == j + 1)
    assert(g1.refTime == t0 && g1.forecastHours == 6 && !g1.lossy)
    assert(g1.category == 128 && g1.parameter == 11 && g1.discipline == 255)
    // IBM-float reference + independent quantization: a slightly wider
    // band than the 5.50-vs-5.51 IEEE comparison
    for (i <- g1.raster.data.indices)
      assert(math.abs(g1.raster.data(i) - g2.raster.data(i)) < 5e-3,
        s"pixel $i: GRIB1 ${g1.raster.data(i)} vs GRIB2 ${g2.raster.data(i)}")
  }

  test("spectral GRIB1 ingests end-to-end; complex SH and bad GDS are loud") {
    val j = 6
    val t0 = java.time.LocalDateTime.of(1994, 3, 1, 0, 0)
    val coefs = shCoefs(j)((n, m) =>
      (if (n == 0 && m == 0) 100.0 else 0.5 / (n + 1), 0.02 * m))
    val good = Grib1.writeSpectral(coefs, j, j, 128, 11, t0, 0)
    assert(Formats.sniff(good).map(_.name).contains("grib1"))
    val dir = java.nio.file.Files.createTempDirectory("g1sh")
    java.nio.file.Files.write(dir.resolve("z500_19940301T00.grib"), good)
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.count() == 14 * 7)
    // a type-50 GDS with a grid-point BDS (SH flag cleared) is loud
    val bdsAt = {
      var o = 8 + 28
      val gdsLen = ((good(o) & 0xff) << 16) | ((good(o + 1) & 0xff) << 8) | (good(o + 2) & 0xff)
      o + gdsLen
    }
    val gp = good.clone(); gp(bdsAt + 3) = (gp(bdsAt + 3) & 0x7f).toByte
    val e2 = intercept[IllegalArgumentException](Grib1.read(gp))
    assert(e2.getMessage.contains("type-50 GDS with a grid-point BDS"), e2.getMessage)
    // K < J (GDS octets 9-10) is outside any pentagonal resolution
    val pent = good.clone(); pent(8 + 28 + 9) = (j - 1).toByte
    val e3 = intercept[IllegalArgumentException](Grib1.read(pent))
    assert(e3.getMessage.contains("pentagonal"), e3.getMessage)
  }

  test("rhomboidal truncation (K = J + M) round-trips against GRIB2") {
    // the classic rhomboidal form of the pre-triangular archives
    // (R15/R30-era global models): K = J + M, each zonal wavenumber
    // carrying J + 1 degrees
    val (j, k) = (5, 10)
    val t0 = java.time.LocalDateTime.of(1979, 1, 1, 0, 0)
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    for (mm <- 0 to j; nn <- mm to math.min(j + mm, k)) {
      out += (if (nn == 0 && mm == 0) 510.0 else 2.0 / ((nn + 1) * (nn + 1)))
      out += (if (nn > j) 0.15 else 0.05) * mm // weight beyond-J band
    }
    val coefs = out.toArray
    val g1 = Grib1.read(Grib1.writeSpectral(coefs, j, j, 128, 11, t0, 0,
      decimals = 4, k = k))
    val g2 = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0,
      decimals = 4, k = k))
    assert(g1.raster.width == 2 * (k + 1) && g1.raster.height == k + 1)
    assert(g2.raster.width == g1.raster.width && g2.raster.height == g1.raster.height)
    for (i <- g1.raster.data.indices)
      assert(math.abs(g1.raster.data(i) - g2.raster.data(i)) < 5e-3,
        s"pixel $i: GRIB1 ${g1.raster.data(i)} vs GRIB2 ${g2.raster.data(i)}")
  }

  // ---- complex (GRIBEX sub-spectrum) spherical harmonics ------------

  test("complex-packed SH decodes to the same raster as simple SH and GRIB2 5.51") {
    val j = 10
    val t0 = java.time.LocalDateTime.of(1989, 7, 15, 12, 0)
    val coefs = shCoefs(j) { (n, m) =>
      if (n == 0 && m == 0) (287.6, 0.0)
      else (1.2 / ((n + 1) * (n + 1)) - 0.01 * m, 0.4 / (n + m + 2))
    }
    val cplx = Grib1.read(Grib1.writeSpectralComplex(coefs, j, j, subJ = 3,
      p = 0.5, 128, 130, t0, 12, decimals = 4))
    val simple = Grib1.read(Grib1.writeSpectral(coefs, j, j, 128, 130, t0, 12,
      decimals = 4))
    val g2 = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 130, t0, 12,
      decimals = 4, complexSubJ = 3, laplacianP = 0.5))
    assert(cplx.raster.width == 2 * (j + 1) && cplx.raster.height == j + 1)
    assert(cplx.refTime == t0 && cplx.forecastHours == 12 && !cplx.lossy)
    assert(cplx.category == 128 && cplx.parameter == 130 && cplx.discipline == 255)
    for (i <- cplx.raster.data.indices) {
      assert(math.abs(cplx.raster.data(i) - simple.raster.data(i)) < 5e-3,
        s"pixel $i: complex ${cplx.raster.data(i)} vs simple ${simple.raster.data(i)}")
      assert(math.abs(cplx.raster.data(i) - g2.raster.data(i)) < 5e-3,
        s"pixel $i: GRIB1 complex ${cplx.raster.data(i)} vs 5.51 ${g2.raster.data(i)}")
    }
  }

  test("complex SH Laplacian scaling actually applies (negative P round-trips)") {
    val j = 7
    val t0 = java.time.LocalDateTime.of(1989, 7, 15, 0, 0)
    val coefs = shCoefs(j)((n, m) =>
      (if (n == 0 && m == 0) 55.0 else 0.8 / (n + 1), 0.05 * m))
    val neg = Grib1.read(Grib1.writeSpectralComplex(coefs, j, j, subJ = 2,
      p = -0.5, 128, 130, t0, 0, decimals = 4))
    val simple = Grib1.read(Grib1.writeSpectral(coefs, j, j, 128, 130, t0, 0,
      decimals = 4))
    // negative P DIVIDES by (n(n+1))^0.5 before quantization, so the
    // quantization step widens by up to sqrt(J(J+1)) on descale — the
    // band is about amplification (a missing descale would be off by
    // orders of magnitude), not bit-exactness
    for (i <- neg.raster.data.indices)
      assert(math.abs(neg.raster.data(i) - simple.raster.data(i)) < 2e-2,
        s"pixel $i: P=-0.5 ${neg.raster.data(i)} vs simple ${simple.raster.data(i)}")
  }

  test("complex SH corrupt sub-spectrum octets are loud, not silently mis-decoded") {
    val j = 6
    val t0 = java.time.LocalDateTime.of(1989, 7, 15, 0, 0)
    val coefs = shCoefs(j)((n, m) =>
      (if (n == 0 && m == 0) 55.0 else 0.8 / (n + 1), 0.05 * m))
    val good = Grib1.writeSpectralComplex(coefs, j, j, subJ = 2, p = 0.5,
      128, 130, t0, 0)
    val bdsAt = {
      var o = 8 + 28
      val gdsLen = ((good(o) & 0xff) << 16) | ((good(o + 1) & 0xff) << 8) | (good(o + 2) & 0xff)
      o + gdsLen
    }
    assert(Grib1.read(good).raster.width == 2 * (j + 1)) // the offsets are right
    // pentagonal subset (KS != JS, BDS octet 17)
    val pent = good.clone(); pent(bdsAt + 16) = 3.toByte
    val e1 = intercept[IllegalArgumentException](Grib1.read(pent))
    assert(e1.getMessage.contains("triangular subsets"), e1.getMessage)
    // subset exceeding the field truncation
    val big = good.clone()
    big(bdsAt + 15) = (j + 1).toByte; big(bdsAt + 16) = (j + 1).toByte
    big(bdsAt + 17) = (j + 1).toByte
    val e2 = intercept[IllegalArgumentException](Grib1.read(big))
    assert(e2.getMessage.contains("exceeds field truncation"), e2.getMessage)
    // packed-data pointer N overlapping the unpacked block (octets 12-13)
    val ovl = good.clone(); ovl(bdsAt + 11) = 0.toByte; ovl(bdsAt + 12) = 19.toByte
    val e3 = intercept[IllegalArgumentException](Grib1.read(ovl))
    assert(e3.getMessage.contains("overlaps"), e3.getMessage)
    // a pentagonal FIELD truncation (valid in the GDS) combined with
    // complex packing dead-letters by name: the public GRIBEX/eccodes
    // complex path rejects pen_j != pen_k, so there is no producer
    // layout to pin the walk against (K at GDS octets 9-10)
    val pf = good.clone(); pf(8 + 28 + 9) = (j + 1).toByte
    val e4 = intercept[IllegalArgumentException](Grib1.read(pf))
    assert(e4.getMessage.contains("triangular fields only"), e4.getMessage)
  }

  test("complex SH ingests through the production registry") {
    val j = 8
    val t0 = java.time.LocalDateTime.of(1989, 7, 15, 6, 0)
    val coefs = shCoefs(j)((n, m) =>
      (if (n == 0 && m == 0) 500.0 else 2.0 / ((n + 1) * (m + 1)), -0.1 / (n + 1)))
    val bytes = Grib1.writeSpectralComplex(coefs, j, j, subJ = 4, p = 0.5,
      128, 129, t0, 6)
    assert(Formats.sniff(bytes).map(_.name).contains("grib1"))
    val dir = java.nio.file.Files.createTempDirectory("g1shc")
    java.nio.file.Files.write(dir.resolve("z500_19890715T06.grib"), bytes)
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.count() == 2 * (j + 1) * (j + 1))
  }
}
