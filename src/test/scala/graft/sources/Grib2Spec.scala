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

  test("rotated lat/lon grids (3.1) round-trip with exact unrotated coordinates") {
    // COSMO-EU-like: south pole of projection at (-39.25, -162); a
    // 10x8 rotated-degree grid around the rotated origin
    val w = 10; val h = 8
    val spLat = -39.25; val spLon = -162.0
    val data = Array.tabulate(w * h)(i => if (i % 13 == 0) Float.NaN else i * 0.5f)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -5.0, 4.0, 1.0, 1.0), // rotated degrees
      discipline = 0, category = 0, parameter = 0,
      refTime = java.time.LocalDateTime.of(2024, 3, 1, 0, 0, 0),
      forecastHours = 6, proj = Some(Grib2.RotatedLatLonProj(spLat, spLon)))
    val back = Grib2.read(Grib2.write(m, decimals = 1))
    val Some(p: Grib2.RotatedLatLonProj) = back.proj
    assert(p.spLat == spLat && p.spLon == spLon)
    assert(back.raster.west == -5.0 && back.raster.north == 4.0)
    back.raster.data.zip(data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN) else assert(math.abs(a - b) < 0.05)
    }
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    val fwd = graft.ops.Geo.fwdRotatedPole(spLat, spLon) _
    val inv = graft.ops.Geo.invRotatedPole(spLat, spLon) _
    // fwd∘inv identity at every pixel, in rotated coordinates
    for (j <- 0 until h; i <- 0 until w) {
      val k = j * w + i
      val (lr, pr) = fwd(lons(k), lats(k))
      assert(math.abs(lr - (-5.0 + (i + 0.5))) < 1e-9 &&
        math.abs(pr - (4.0 - (j + 0.5))) < 1e-9, s"pixel ($i,$j)")
    }
    // the rotated NORTH pole maps to true (-spLat, spLon+180)
    val (plon, plat) = inv(0.0, 90.0)
    assert(math.abs(plat - 39.25) < 1e-9 && math.abs(plon - 18.0) < 1e-9)
    // rotation preserves great-circle distances (pure rotation test)
    def gc(lo1: Double, la1: Double, lo2: Double, la2: Double): Double = {
      def r(d: Double) = math.toRadians(d)
      math.acos(math.min(1.0, math.sin(r(la1)) * math.sin(r(la2)) +
        math.cos(r(la1)) * math.cos(r(la2)) * math.cos(r(lo1 - lo2))))
    }
    val dTrue = gc(lons(0), lats(0), lons(w * h - 1), lats(w * h - 1))
    val dRot = gc(-4.5, 3.5, -5.0 + (w - 0.5), 4.0 - (h - 0.5))
    assert(math.abs(dTrue - dRot) < 1e-9)
    // identity pole: rotated coordinates ARE true coordinates
    val (l0, p0) = graft.ops.Geo.invRotatedPole(-90.0, 0.0)(12.5, -33.25)
    assert(math.abs(l0 - 12.5) < 1e-9 && math.abs(p0 - (-33.25)) < 1e-9)
  }

  test("space-view grids (3.90) round-trip with exact geostationary lon/lat") {
    // Meteosat-like full disc: sphere, satellite ~6.62 radii from the
    // earth center over 9.5°E, disc spanning 18 grid lengths of a
    // 20×20 grid, sub-satellite point Xp=Yp=10 — a pixel-CENTER
    // coordinate (eccodes/CGMS: center_i = (i − Xp)·rx), the integer
    // value every operational product carries, so pixel (10, 10)'s
    // CENTER is exactly the zero scan angle
    val w = 20; val h = 20
    val re = 6367470.0
    val nr = 6.621936 // chosen so nr·1e6 is integral (exact round-trip)
    val lop = 9.5
    val rx = 2.0 * math.asin(1.0 / nr) / 18
    val ry = rx
    val inv = graft.ops.Geo.invGeostationary(re, re, lop, nr * re) _
    val data = Array.tabulate(w * h) { k =>
      val i = k % w; val j = k / w
      val x = (i - 10) * rx; val y = (10 - j) * ry
      val (lon, _) = inv(x, y)
      if (lon.isNaN) Float.NaN else (i + j).toFloat // off-disc = missing
    }
    assert(data.count(_.isNaN) > 0 && data.count(!_.isNaN) > 200,
      "fixture should mix disc and space pixels")
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -10.5 * rx, 10.5 * ry, rx, ry),
      discipline = 0, category = 6, parameter = 1,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0),
      forecastHours = 0, proj = Some(Grib2.SpaceViewProj(re, re, lop, nr)))
    val back = Grib2.read(Grib2.write(m, decimals = 0))
    val Some(p: Grib2.SpaceViewProj) = back.proj
    assert(p.re == re && p.lop == lop && math.abs(p.nr - nr) < 1e-12)
    back.raster.data.zip(data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN) else assert(a == b)
    }
    // exact per-pixel lon/lat: the sub-satellite pixel reads (lop, 0)
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    assert(math.abs(lons(10 * w + 10) - lop) < 1e-9)
    assert(math.abs(lats(10 * w + 10)) < 1e-9)
    // fwd∘inv is the identity on the disc
    val fwd = graft.ops.Geo.fwdGeostationary(re, re, lop, nr * re) _
    for (j <- 5 until 15; i <- 5 until 15) {
      val x0 = (i - 10) * rx; val y0 = (10 - j) * ry
      val k = j * w + i
      if (!lons(k).isNaN) {
        val (x1, y1) = fwd(lons(k), lats(k))
        assert(math.abs(x1 - x0) < 1e-12 && math.abs(y1 - y0) < 1e-12)
      }
    }
    // space pixels carry NaN coordinates (and are bitmap-missing)
    assert(lons(0).isNaN && lats(0).isNaN)
  }

  test("run-length packing (5.200) round-trips a radar-like field exactly") {
    // radar/nowcast shape: mostly-zero field with a few intensity
    // levels and LONG zero runs — a 600-point run forces multi-digit
    // base-(2^nbits−1−MV) run lengths, and the scattered NaNs ride the
    // bitmap like every other packing
    val w = 40; val h = 20
    val data = Array.tabulate(w * h) { i =>
      if (i % 173 == 0) Float.NaN
      else if (i < 100) (i % 5) * 2.5f
      else if (i >= 700) 12.5f
      else 0f
    }
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -180.0, 90.0, 9.0, 9.0),
      discipline = 0, category = 15, parameter = 195,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0),
      forecastHours = 0)
    val bytes = Grib2.write(m, decimals = 1, packing = 200)
    val back = Grib2.read(bytes)
    back.raster.data.zip(data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(a == b, s"$a vs $b — the level table holds exact scaled values")
    }
    // the RLE stream should be far smaller than 8-bit simple packing
    assert(bytes.length < Grib2.write(m, decimals = 1, packing = 0).length)
  }

  test("run-length granules (5.200) decode through the production ingest path") {
    val w = 16; val h = 8
    val data = Array.tabulate(w * h)(i => if (i % 7 == 0) 5.5f else 0f)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -180.0, 90.0, 22.5, 22.5),
      0, 15, 195, java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0), 0)
    val dir = Files.createTempDirectory("graft-rle-ingest-").toString
    Files.write(Paths.get(s"$dir/radar_20240601_1200.grib2"),
      Grib2.write(m, decimals = 1, packing = 200))
    val df = Formats.ingestDir(spark, dir)
    assert(df.count() == w * h)
    val v = df.filter(col("y") === 0 && col("x") === 7).select("v").head().getDouble(0)
    assert(v == 5.5)
  }

  test("PNG packing (5.41) round-trips with a bitmap (nPresent×1 image)") {
    val m = sampleMessage
    val back = Grib2.read(Grib2.write(m, packing = 41))
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("PNG packing (5.41) full grid uses a W×H 16-bit image") {
    // range > 255 at D=2 forces the 16-bit grayscale path; no NaN ⇒ no
    // bitmap ⇒ image is the full grid shape
    val w = 12; val h = 9
    val data = Array.tabulate(w * h)(i => 10.0f + i * 3.7f)
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, data, -180.0, 90.0, 30.0, 20.0))
    val back = Grib2.read(Grib2.write(m, packing = 41))
    back.raster.data.zip(data).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("PNG decode reconstructs filtered rows (none/sub/up/average/paeth)") {
    // 4×5 8-bit grayscale PNG hand-encoded with one row per filter type
    val w = 4; val h = 5
    val pixels = Array(
      10, 20, 30, 40,    // row 0: filter 0 (none):    [10,20,30,40]
      50, 55, 60, 65,    // row 1: filter 1 (sub):     [50,5,5,5]
      60, 66, 72, 78,    // row 2: filter 2 (up):      [10,11,12,13]
      70, 80, 90, 100,   // row 3: filter 4 (paeth):   [10,10,10,10]
      80, 90, 100, 110)  // row 4: filter 3 (average): [45,10,10,10]
    val filtered = Array(
      0, 10, 20, 30, 40,
      1, 50, 5, 5, 5,
      2, 10, 11, 12, 13,
      4, 10, 10, 10, 10,
      3, 45, 10, 10, 10).map(_.toByte)
    val defl = new java.util.zip.Deflater()
    defl.setInput(filtered); defl.finish()
    val buf = new Array[Byte](filtered.length + 64)
    val nz = defl.deflate(buf); defl.end()
    val out = new java.io.ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte))
    def chunk(typ: String, payload: Array[Byte]): Unit = {
      def u32(v: Long): Unit = (24 to 0 by -8).foreach(s => out.write((v >> s).toInt & 0xff))
      u32(payload.length.toLong); out.write(typ.getBytes); out.write(payload)
      val crc = new java.util.zip.CRC32(); crc.update(typ.getBytes); crc.update(payload)
      u32(crc.getValue)
    }
    chunk("IHDR", java.nio.ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(8.toByte).put(0.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte).array())
    chunk("IDAT", java.util.Arrays.copyOf(buf, nz))
    chunk("IEND", Array.emptyByteArray)

    // a filter-0 5.41 message over the same pixels round-trips exactly…
    val mBytes = Grib2.write(sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, pixels.map(_.toFloat), -180.0, 90.0, 90.0, 36.0)),
      decimals = 0, packing = 41)
    assert(Grib2.read(mBytes).raster.data.map(_.toInt).sameElements(pixels))

    // …and splicing the hand-filtered PNG over its data section decodes
    // the same pixel lattice (X offsets shift by the reference, so
    // compare deltas, which are reference-independent)
    val got = Grib2.read(spliceDataSection(mBytes, out.toByteArray)).raster.data
    val gd = got.map(v => v - got(0))
    val pd = pixels.map(v => (v - pixels(0)).toFloat)
    assert(gd.zip(pd).forall { case (a, b) => math.abs(a - b) < 1e-3 },
      gd.take(8).mkString(","))
  }

  /** Replace a GRIB2 message's section-7 payload with `payload`. */
  private def spliceDataSection(msg: Array[Byte], payload: Array[Byte]): Array[Byte] = {
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var pos = 16
    while (pos < msg.length - 4) {
      val len = u32(msg, pos); val num = msg(pos + 4) & 0xff
      if (num == 7) {
        val out = new java.io.ByteArrayOutputStream()
        out.write(msg, 0, pos)
        val nb = java.nio.ByteBuffer.allocate(5 + payload.length)
          .putInt(5 + payload.length).put(7.toByte).put(payload)
        out.write(nb.array())
        out.write(msg, pos + len, msg.length - pos - len)
        val res = out.toByteArray
        // patch total length in the indicator section (octets 8-15)
        val tot = java.nio.ByteBuffer.allocate(8).putLong(res.length.toLong).array()
        System.arraycopy(tot, 0, res, 8, 8)
        return res
      }
      pos += len
    }
    throw new IllegalStateException("no data section")
  }

  test("thinned/quasi-regular grids fail loudly, never a misplaced raster") {
    val bytes = Grib2.write(sampleMessage)
    // patch section 3's point count below width*height
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var pos = 16
    var patched = false
    while (pos < bytes.length - 4 && !patched) {
      val len = u32(bytes, pos); val num = bytes(pos + 4) & 0xff
      if (num == 3) {
        val o = pos + 5 + 1 // template octet layout: nPts at offset 1
        bytes(o) = 0; bytes(o + 1) = 0; bytes(o + 2) = 0; bytes(o + 3) = 40 // 40 < 48
        patched = true
      } else pos += len
    }
    assert(patched)
    val e = intercept[IllegalArgumentException](Grib2.read(bytes))
    assert(e.getMessage.contains("thinned"))
  }

  test("JPEG2000 packing (5.40) round-trips with a bitmap (nPresent×1 stream)") {
    val m = sampleMessage
    val back = Grib2.read(Grib2.write(m, packing = 40))
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("JPEG2000 packing (5.40) full grid compresses a smooth field") {
    // no NaN ⇒ no bitmap ⇒ the codestream is the full W×H raster; a
    // smooth field is where the wavelet earns its keep vs bit packing
    val w = 60; val h = 40
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (250.0 + 12.0 * math.sin(x * 0.2) + 8.0 * math.cos(y * 0.25)).toFloat
    }
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, smooth, -180.0, 90.0, 6.0, 4.5))
    val bytes = Grib2.write(m, packing = 40)
    val back = Grib2.read(bytes)
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      // 0.00501: D=2 quantization is ±0.005 and this field lands values
      // exactly on the half-cent tie (240.345), where float32 noise
      // crosses the strict bound
      assert(math.abs(a - b) < 0.00501, s"$a vs $b")
    }
    assert(bytes.length < Grib2.write(m, packing = 0).length,
      "lossless JPEG2000 should out-compress simple packing on a smooth field")
  }

  test("CCSDS/AEC packing (5.42) round-trips with a bitmap") {
    val m = sampleMessage
    val back = Grib2.read(Grib2.write(m, packing = 42))
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) < 0.005, s"$a vs $b")
    }
  }

  test("CCSDS/AEC packing (5.42) compresses a smooth field below simple packing") {
    val w = 60; val h = 40
    val smooth = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (250.0 + 12.0 * math.sin(x * 0.2) + 8.0 * math.cos(y * 0.25)).toFloat
    }
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, smooth, -180.0, 90.0, 6.0, 4.5))
    val bytes = Grib2.write(m, packing = 42)
    val back = Grib2.read(bytes)
    back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      assert(math.abs(a - b) < 0.00501, s"$a vs $b")
    }
    assert(bytes.length < Grib2.write(m, packing = 0).length,
      "the Rice coder should out-compress simple packing on a smooth field")
  }

  test("LOSSY JPEG2000 (5.40 compression type 1): decodes approximately, Message.lossy set") {
    // real lossy round-trip: irreversible 9/7 at Δ = 2^2 — values come
    // back within the quantization tolerance scaled by the packing
    // factor, and the message is flagged so exactness-sensitive
    // consumers can filter
    val bytes = Grib2.write(sampleMessage, packing = 40,
      j2kQuantShift = Some(2))
    val m = Grib2.read(bytes)
    assert(m.lossy, "compression type 1 must set Message.lossy")
    // D=2 decimals → packing factor 10^-2; X error ≤ 3·Δ (spec bound)
    val tol = (3 << 2) / 100.0 + 1e-6
    m.raster.data.zip(sampleMessage.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN)
      else assert(math.abs(a - b) <= tol, s"$a vs $b (tol $tol)")
    }
    // lossless stays exact and unflagged
    assert(!Grib2.read(Grib2.write(sampleMessage, packing = 40)).lossy)

    // a LOSSLESS stream whose ORIGINAL FIELD TYPE is integer
    // (octet 21 = 1) is legal — it must decode, not be mislabeled lossy
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    val intOrig = Grib2.write(sampleMessage, packing = 40)
    var pos = 16
    var patched = false
    while (pos < intOrig.length - 4 && !patched) {
      val len = u32(intOrig, pos); val num = intOrig(pos + 4) & 0xff
      if (num == 5) { intOrig(pos + 5 + 15) = 1.toByte; patched = true }
      else pos += len
    }
    assert(patched)
    val m2 = Grib2.read(intOrig)
    assert(!m2.lossy, "octet 21 (original field type) must not flag lossy")
    assert(m2.raster.data.count(!_.isNaN) == sampleMessage.raster.data.count(!_.isNaN))
  }

  private def lccMessage = {
    // an HRRR-shaped Lambert grid: sphere 6371229 m, parallels 38.5/38.5,
    // LoV -97.5, 3 km steps — small raster, real parameters
    val w = 40; val h = 30
    val data = Array.tabulate(w * h) { i =>
      if (i % 13 == 0) Float.NaN else (280.0 + (i % 50) * 0.25).toFloat
    }
    val proj = Grib2.LccProj(radius = 6371229.0, lov = -97.5,
      latin1 = 38.5, latin2 = 38.5, lad = 38.5)
    // anchor: projected coords of the CONUS interior (origin near KS)
    val (x0, y0) = graft.ops.Geo.fwdLambertConformalConicSph(
      proj.radius, proj.latin1, proj.latin2, proj.lad, proj.lov)(-105.0, 35.0)
    Grib2.Message(
      GeoTiff.Raster(w, h, data, x0, y0 + 30 * 3000.0, 3000.0, 3000.0),
      discipline = 0, category = 0, parameter = 0,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 12, 0, 0),
      forecastHours = 6, proj = Some(proj))
  }

  private def mercMessage = {
    // a tropical-band Mercator sector (the NWS Caribbean shape): sphere
    // 6371229 m, true scale at 20N, 10 km steps, anchored west of 60W
    val w = 36; val h = 24
    val data = Array.tabulate(w * h) { i =>
      if (i % 17 == 0) Float.NaN else (297.0 + (i % 30) * 0.1).toFloat
    }
    val proj = Grib2.MercProj(radius = 6371229.0, lon0 = -75.0, lad = 20.0)
    val (x0, y0) = graft.ops.Geo.fwdMercatorSph(
      proj.radius, proj.lon0, proj.lad)(-75.0, 12.0)
    Grib2.Message(
      GeoTiff.Raster(w, h, data, x0, y0 + h * 10000.0, 10000.0, 10000.0),
      discipline = 0, category = 0, parameter = 0,
      refTime = java.time.LocalDateTime.of(2024, 9, 1, 6, 0, 0),
      forecastHours = 12, proj = Some(proj))
  }

  test("Mercator grids (3.10) round-trip values and exact per-pixel lon/lat") {
    val m = mercMessage
    val Some((lons0, lats0)) = Grib2.lonLatArrays(m)
    for (scan <- Seq(0, 0x40)) {
      val back = Grib2.read(Grib2.write(m, scanMode = scan))
      assert(back.proj.exists(_.isInstanceOf[Grib2.MercProj]),
        s"projection lost at scan=$scan")
      assert(back.raster.px == 10000.0 && back.raster.py == 10000.0)
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        if (b.isNaN) assert(a.isNaN)
        else assert(math.abs(a - b) < 0.005, s"$a vs $b at scan=$scan")
      }
      // the reader re-anchors the frame at the first point's meridian,
      // so geographic identity is asserted on the per-pixel arrays (the
      // microdegree header rounding bounds the drift)
      val Some((lons, lats)) = Grib2.lonLatArrays(back)
      lons.zip(lons0).zip(lats.zip(lats0)).foreach { case ((a, b), (c, d)) =>
        assert(math.abs(a - b) < 5e-4, s"lon drift $a vs $b at scan=$scan")
        assert(math.abs(c - d) < 5e-4, s"lat drift $c vs $d at scan=$scan")
      }
    }
    // the decoder hook surfaces the curvilinear coordinates
    assert(Formats.Grib2Decoder.pixelLonLat(Grib2.write(m)).isDefined)
  }

  test("Lambert conformal grids (3.30) round-trip values, frame and projection") {
    val m = lccMessage
    for (scan <- Seq(0, 0x40)) { // north-first and the NCEP south-first order
      val back = Grib2.read(Grib2.write(m, scanMode = scan))
      assert(back.proj.contains(m.proj.get), s"proj params drifted at scan=$scan")
      // the frame survives the microdegree round-trip to sub-meter
      assert(math.abs(back.raster.west - m.raster.west) < 1.0)
      assert(math.abs(back.raster.north - m.raster.north) < 1.0)
      assert(back.raster.px == 3000.0 && back.raster.py == 3000.0)
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        if (b.isNaN) assert(a.isNaN)
        else assert(math.abs(a - b) < 0.005, s"$a vs $b at scan=$scan")
      }
    }
  }

  test("Lambert grids expose exact per-pixel lon/lat through the decoder hook") {
    val m = lccMessage
    val bytes = Grib2.write(m)
    val back = Grib2.read(bytes)
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    // cross-check one interior pixel against the inverse directly
    val r = back.raster
    val Some(p: Grib2.LccProj) = back.proj
    val (x, y) = (r.west + 10.5 * r.px, r.north - 7.5 * r.py)
    val (lonRef, latRef) = graft.ops.Geo.invLambertConformalConicSph(
      p.radius, p.latin1, p.latin2, p.lad, p.lov)(x, y)
    assert(math.abs(lons(7 * r.width + 10) - lonRef) < 1e-9)
    assert(math.abs(lats(7 * r.width + 10) - latRef) < 1e-9)
    // the grid straddles the anchor: lon/lat vary in BOTH directions
    // along a row (conic rotation), unlike an affine lat/lon grid
    assert(lats(0) != lats(r.width - 1),
      "top-row latitudes must vary on a conic grid")
    // lat/lon grids keep the affine path (no arrays)
    assert(Grib2.lonLatArrays(Grib2.read(Grib2.write(sampleMessage))).isEmpty)
    // and the Formats decoder surfaces the same hook
    assert(Formats.Grib2Decoder.pixelLonLat(bytes).isDefined)
  }

  test("lossy provenance reaches the ingest column: 9/7 granules flag true, 5/3 false") {
    val dir = Files.createTempDirectory("graft-lossy-ingest-").toString
    Files.write(Paths.get(s"$dir/t2m_20240101_0000.grib2"),
      Grib2.write(sampleMessage, packing = 40))
    Files.write(Paths.get(s"$dir/t2m_20240101_0600.grib2"),
      Grib2.write(sampleMessage, packing = 40, j2kQuantShift = Some(0)))
    val flags = Formats.ingestDir(spark, dir)
      .groupBy("fname").agg(collect_set(col("lossy")).as("ls"))
      .collect().map(r => r.getString(0) -> r.getSeq[Boolean](1).toSet).toMap
    assert(flags("t2m_20240101_0000.grib2") == Set(false))
    assert(flags("t2m_20240101_0600.grib2") == Set(true),
      "irreversible-9/7 pixels must carry lossy = true so exact-integer consumers can filter")
  }

  test("Lambert granules ingest with projected lon/lat, not affine degrees") {
    val dir = Files.createTempDirectory("graft-lcc-ingest-").toString
    Files.write(Paths.get(s"$dir/refl_20240601_1200.grib2"), Grib2.write(lccMessage))
    val df = Formats.ingestDir(spark, dir)
    val row = df.filter(col("y") === 7 && col("x") === 10).select("lon", "lat").head()
    val m = Grib2.read(Grib2.write(lccMessage))
    val Some(p: Grib2.LccProj) = m.proj
    val (lonRef, latRef) = graft.ops.Geo.invLambertConformalConicSph(
      p.radius, p.latin1, p.latin2, p.lad, p.lov)(
      m.raster.west + 10.5 * m.raster.px, m.raster.north - 7.5 * m.raster.py)
    assert(math.abs(row.getDouble(0) - lonRef) < 1e-9 &&
      math.abs(row.getDouble(1) - latRef) < 1e-9,
      s"ingested lon/lat ${row} should come from the LCC inverse ($lonRef, $latRef)")
  }

  test("polar stereographic grids (3.20) round-trip with exact lon/lat") {
    // the NCEP Alaska shape: sphere 6371200 m, true scale 60°N, LoV 210°E
    val w = 25; val h = 20
    val data = Array.tabulate(w * h)(i => (260.0 + i * 0.1).toFloat)
    val proj = Grib2.PsProj(radius = 6371200.0, lov = -150.0, lad = 60.0)
    val (x0, y0) = graft.ops.Geo.fwdPolarStereographicSph(
      proj.radius, proj.lov, proj.lad)(-160.0, 55.0)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, x0, y0 + 20 * 11250.0, 11250.0, 11250.0),
      discipline = 0, category = 2, parameter = 2,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0, 0),
      forecastHours = 3, proj = Some(proj))
    for (scan <- Seq(0, 0x40)) {
      val back = Grib2.read(Grib2.write(m, scanMode = scan))
      assert(back.proj.contains(proj), s"proj params drifted at scan=$scan")
      assert(math.abs(back.raster.west - m.raster.west) < 1.0)
      assert(math.abs(back.raster.north - m.raster.north) < 1.0)
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        assert(math.abs(a - b) < 0.005, s"$a vs $b at scan=$scan")
      }
    }
    // per-pixel lon/lat from the declared sphere's inverse
    val back = Grib2.read(Grib2.write(m))
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    val (lonRef, latRef) = graft.ops.Geo.invPolarStereographicSph(
      proj.radius, proj.lov, proj.lad)(
      back.raster.west + 3.5 * back.raster.px, back.raster.north - 2.5 * back.raster.py)
    assert(math.abs(lons(2 * w + 3) - lonRef) < 1e-9 &&
      math.abs(lats(2 * w + 3) - latRef) < 1e-9)
  }

  test("azimuthal equidistant grids (3.110) round-trip with exact lon/lat") {
    // a radar-centric shape: sphere 6371229 m tangent at (47°N, 8°E),
    // 2 km bins — the WMO template for radar composites
    val w = 30; val h = 25
    val data = Array.tabulate(w * h)(i => ((i % 60) * 0.5).toFloat)
    val proj = Grib2.AeqdProj(radius = 6371229.0, latC = 47.0, lonC = 8.0)
    // frame centered on the tangency point (odd half-pixel offsets)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, -w / 2 * 2000.0, h / 2 * 2000.0, 2000.0, 2000.0),
      discipline = 0, category = 15, parameter = 1,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0, 0),
      forecastHours = 0, proj = Some(proj))
    for (scan <- Seq(0, 0x40, 0x80)) {
      val back = Grib2.read(Grib2.write(m, scanMode = scan))
      assert(back.proj.contains(proj), s"proj params drifted at scan=$scan")
      assert(math.abs(back.raster.west - m.raster.west) < 1.0)
      assert(math.abs(back.raster.north - m.raster.north) < 1.0)
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        assert(math.abs(a - b) < 0.005, s"$a vs $b at scan=$scan")
      }
    }
    val back = Grib2.read(Grib2.write(m))
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    // the projection's defining property: radial distance from the
    // tangency point is TRUE — rho = R * (great-circle angle)
    val i = 7 * w + 11
    val x = back.raster.west + 11.5 * back.raster.px
    val y = back.raster.north - 7.5 * back.raster.py
    val rho = math.sqrt(x * x + y * y)
    val c = { // great-circle angle center → recovered pixel coordinate
      val p1 = math.toRadians(proj.latC); val p2 = math.toRadians(lats(i))
      val dl = math.toRadians(lons(i) - proj.lonC)
      math.acos(math.sin(p1) * math.sin(p2) +
        math.cos(p1) * math.cos(p2) * math.cos(dl))
    }
    assert(math.abs(rho - proj.radius * c) < 1e-3,
      s"radial distance not true: rho=$rho vs R*c=${proj.radius * c}")
    // forward(inverse) closes
    val (fx, fy) = graft.ops.Geo.fwdAzimuthalEquidistantSph(
      proj.radius, proj.latC, proj.lonC)(lons(i), lats(i))
    assert(math.abs(fx - x) < 1e-6 && math.abs(fy - y) < 1e-6)
    // exact center pixel recovers the tangency point itself
    val (cLon, cLat) = graft.ops.Geo.invAzimuthalEquidistantSph(
      proj.radius, proj.latC, proj.lonC)(0.0, 0.0)
    assert(cLon == proj.lonC && cLat == proj.latC)
  }

  test("product templates: accumulation form (4.8) reads, unknown forms fail") {
    def patchTmpl4(bytes: Array[Byte], v: Int): Boolean = {
      def u32(b: Array[Byte], o: Int): Int =
        ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
      var pos = 16
      while (pos < bytes.length - 4) {
        val len = u32(bytes, pos); val num = bytes(pos + 4) & 0xff
        if (num == 4) { bytes(pos + 5 + 3) = v.toByte; return true }
        pos += len
      }
      false
    }
    // 4.8 shares the 4.0 prefix: identity fields survive
    val ok = Grib2.write(sampleMessage)
    assert(patchTmpl4(ok, 8))
    val back = Grib2.read(ok)
    assert(back.category == 1 && back.parameter == 8 && back.forecastHours == 12)
    // 4.30 (satellite) does NOT share the prefix: loud failure
    val bad = Grib2.write(sampleMessage)
    assert(patchTmpl4(bad, 30))
    val e = intercept[IllegalArgumentException](Grib2.read(bad))
    assert(e.getMessage.contains("template 4.30"))
  }

  test("Gaussian latitudes are the Legendre roots (analytic + property checks)") {
    // n=2: P_2(x) = (3x^2-1)/2, root 1/sqrt(3) → asin = 35.2644°
    val l2 = graft.ops.Geo.gaussianLatitudes(2)
    assert(math.abs(l2(0) - math.toDegrees(math.asin(1 / math.sqrt(3)))) < 1e-12)
    assert(l2(1) == -l2(0))
    // larger grid: descending, antisymmetric, and every sin(lat) is a
    // root of P_n to the double floor
    val n = 64
    val lats = graft.ops.Geo.gaussianLatitudes(n)
    assert(lats.sliding(2).forall(p => p(0) > p(1)), "latitudes must descend")
    assert(lats.zip(lats.reverse).forall { case (a, b) => math.abs(a + b) < 1e-12 })
    for (lat <- lats.take(5)) {
      val x = math.sin(math.toRadians(lat))
      var p0 = 1.0; var p1 = x
      for (k <- 2 to n) { val p2 = ((2 * k - 1) * x * p1 - (k - 1) * p0) / k; p0 = p1; p1 = p2 }
      assert(math.abs(p1) < 1e-12, s"sin($lat) is not a P_$n root (P=$p1)")
    }
  }

  test("Gaussian grids (3.40) round-trip and expose exact non-uniform latitudes") {
    val nPar = 16 // an F16 grid: 64x32
    val w = 64; val h = 2 * nPar
    val data = Array.tabulate(w * h)(i => (270.0 + (i % 40) * 0.2).toFloat)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, 0.0, 90.0, 360.0 / w, 0.0 /* nominal */),
      discipline = 0, category = 3, parameter = 0,
      refTime = java.time.LocalDateTime.of(2024, 6, 1, 0, 0, 0),
      forecastHours = 0, proj = Some(Grib2.GaussianGrid(nPar)))
    for (scan <- Seq(0, 0x40)) {
      val back = Grib2.read(Grib2.write(m, scanMode = scan))
      assert(back.proj.contains(Grib2.GaussianGrid(nPar)))
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        assert(math.abs(a - b) < 0.005, s"$a vs $b at scan=$scan")
      }
      val Some((lons, lats)) = Grib2.lonLatArrays(back)
      val glats = graft.ops.Geo.gaussianLatitudes(h)
      // row latitudes match the table exactly; lon is affine
      assert((0 until h).forall(y => lats(y * w) == glats(y)))
      assert(math.abs(lons(5) - (0.0 + 5.5 * 360.0 / w)) < 1e-12)
      // Gaussian rows are NEARLY uniform in latitude but not affine:
      // equator spacing is slightly wider than pole spacing, and the
      // rows sit visibly off the uniform-grid centers — the thing an
      // affine frame cannot express
      val dPole = glats(0) - glats(1)
      val dEq = glats(h / 2 - 1) - glats(h / 2)
      assert(dEq > dPole, s"equator spacing should exceed pole spacing ($dPole vs $dEq)")
      val maxDevFromUniform = (0 until h).map(y =>
        math.abs(glats(y) - (90.0 - (y + 0.5) * 180.0 / h))).max
      assert(maxDevFromUniform > 0.1,
        s"Gaussian rows should sit off the uniform centers, max dev $maxDevFromUniform")
    }
    // a patched row count (subset) fails loudly
    val bytes = Grib2.write(m)
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var pos = 16
    var patched = false
    while (pos < bytes.length - 4 && !patched) {
      val len = u32(bytes, pos); val num = bytes(pos + 4) & 0xff
      if (num == 3) { bytes(pos + 5 + 9 + 53) = (nPar / 2).toByte; patched = true } // N octets 68-71
      else pos += len
    }
    assert(patched)
    intercept[IllegalArgumentException](Grib2.read(bytes))
  }

  test("reduced Gaussian grids (octahedral family) round-trip ragged rows exactly") {
    // an O8-style grid: 16 rows, 4j+16 points per row from each pole
    val nPar = 8
    val half = (1 to nPar).map(j => 4 * j + 16)
    val pl = half ++ half.reverse
    val h = 2 * nPar; val w = pl.max
    val data = Array.fill(w * h)(Float.NaN)
    for (j <- 0 until h; x <- 0 until pl(j))
      data(j * w + x) = if ((j, x) == (3, 5)) Float.NaN // a REAL nodata hole
                        else (270.0f + j * 2.0f + x * 0.25f)
    val m = Grib2.Message(
      GeoTiff.Raster(w, h, data, 0.0, 90.0, 360.0 / w, 0.0),
      discipline = 0, category = 3, parameter = 1,
      refTime = java.time.LocalDateTime.of(2024, 6, 2, 0, 0, 0),
      forecastHours = 0, proj = Some(Grib2.ReducedGaussianGrid(nPar, pl)))
    val bytes = Grib2.write(m, packing = 42) // the real ECMWF pairing
    val back = Grib2.read(bytes)
    assert(back.proj.contains(Grib2.ReducedGaussianGrid(nPar, pl)))
    assert(back.raster.width == w && back.raster.height == h)
    for (j <- 0 until h; x <- 0 until w) {
      val (a, b) = (back.raster.data(j * w + x), m.raster.data(j * w + x))
      if (b.isNaN) assert(a.isNaN, s"($j,$x): expected NaN, got $a")
      else assert(math.abs(a - b) < 0.005, s"($j,$x): $a vs $b")
    }
    // exact per-row coordinates: lon spacing varies by row
    val Some((lons, lats)) = Grib2.lonLatArrays(back)
    val glats = graft.ops.Geo.gaussianLatitudes(h)
    assert(lats(0) == glats(0) && lats((h - 1) * w) == glats(h - 1))
    assert(math.abs(lons(0 * w + 3) - 3 * 360.0 / pl(0)) < 1e-12)
    assert(math.abs(lons(7 * w + 3) - 3 * 360.0 / pl(7)) < 1e-12)
    assert(lons(0 * w + 3) != lons(7 * w + 3), "row spacing must differ")
    // ingest drops the padding: one row per REAL non-NaN point
    val dir = Files.createTempDirectory("graft-ogrid-").toString
    Files.write(Paths.get(s"$dir/t_20240602_0000.grib2"), bytes)
    assert(Formats.ingestDir(spark, dir).count() == pl.sum - 1L)
  }

  test("unknown grid templates fail loudly, never a silent mis-georeference") {
    val bytes = Grib2.write(sampleMessage)
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var pos = 16
    var patched = false
    while (pos < bytes.length - 4 && !patched) {
      val len = u32(bytes, pos); val num = bytes(pos + 4) & 0xff
      if (num == 3) { bytes(pos + 5 + 8) = 140.toByte; patched = true } // 3.140 Lambert azimuthal equal area
      else pos += len
    }
    assert(patched)
    val e = intercept[IllegalArgumentException](Grib2.read(bytes))
    assert(e.getMessage.contains("template 3.140"))
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

  test("first-order spatial differencing (5.3, order 1) round-trips, with and without mvm") {
    val w = 24; val h = 16
    val f = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (i < 2 || (x == 9 && y % 4 == 1)) Float.NaN
      else (80.0 + 1.75 * x + 0.9 * y).toFloat
    }
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, f, -180.0, 90.0, 15.0, 11.25))
    for (mvm <- Seq(0, 1)) {
      val back = Grib2.read(Grib2.write(m, packing = 3, sdOrder = 1, missingMgmt = mvm))
      back.raster.data.zip(m.raster.data).zipWithIndex.foreach { case ((a, b), i) =>
        if (b.isNaN) assert(a.isNaN, s"order-1 mvm=$mvm point $i")
        else assert(math.abs(a - b) < 0.005, s"order-1 mvm=$mvm point $i: $a vs $b")
      }
    }
  }

  test("mvm reserves the all-ones marker in EVERY group, not just missing ones") {
    // a group whose legitimate offsets span exactly 0..2^w−1 collides
    // with the missing marker unless the writer widens it — decoders
    // (ours and g2lib's) check the marker unconditionally, so without
    // the reservation a real maximum decodes as NaN
    val w = 40; val h = 1
    val f = Array.tabulate(w * h)(i => (i % 4).toFloat) // offsets 0..3 per group
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, f, -180.0, 90.0, 9.0, 9.0))
    val back = Grib2.read(Grib2.write(m, decimals = 0, packing = 2, missingMgmt = 1))
    back.raster.data.zip(f).zipWithIndex.foreach { case ((a, b), i) =>
      assert(!a.isNaN && a == b, s"point $i: $a vs $b (marker collision?)")
    }
  }

  test("complex-packing missing-value management (octet 23 = 1) round-trips") {
    // the wgrib2/NCEP shape: nodata travels as in-group all-ones
    // markers (no bitmap). Scattered NaNs, NaN runs (whole groups
    // missing), and NaNs BEFORE the first data point — the case that
    // stresses the non-missing differencing chain.
    val w = 30; val h = 20
    val f = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if (i < 3 || (y == 7) || (x == 11 && y % 3 == 0)) Float.NaN
      else (250.0 + 2.5 * x + 1.5 * y + 0.04 * x * y).toFloat
    }
    val m = sampleMessage.copy(raster =
      GeoTiff.Raster(w, h, f, -180.0, 90.0, 12.0, 9.0))
    for (packing <- Seq(2, 3)) {
      val bytes = Grib2.write(m, packing = packing, missingMgmt = 1)
      // the message declares mvm 1 and carries NO bitmap section data
      val back = Grib2.read(bytes)
      back.raster.data.zip(m.raster.data).zipWithIndex.foreach { case ((a, b), i) =>
        if (b.isNaN) assert(a.isNaN, s"5.$packing mvm point $i: $a should be NaN")
        else assert(math.abs(a - b) < 0.005, s"5.$packing mvm point $i: $a vs $b")
      }
    }
    // bitmap-free: an mvm message is smaller than the bitmap form
    // plus the w*h/8 bitmap only when markers are cheap — just assert
    // both decode identically rather than a size relation
    val viaBitmap = Grib2.read(Grib2.write(m, packing = 3))
    val viaMvm = Grib2.read(Grib2.write(m, packing = 3, missingMgmt = 1))
    viaBitmap.raster.data.zip(viaMvm.raster.data).foreach { case (a, b) =>
      assert((a.isNaN && b.isNaN) || a == b)
    }
  }

  test("all 16 scanning-mode flag combinations normalize back to north-up/west-east") {
    val m = sampleMessage
    // ±i (0x80), ±j (0x40), consecutive-j column-major (0x20) and
    // boustrophedon alternating lines (0x10), in every combination —
    // the 6×8 grid is non-square, so a wrong column-major transpose
    // or a mis-phased alternation cannot cancel out
    for (scan <- (0 until 16).map(_ << 4); packing <- Seq(0, 2)) {
      val back = Grib2.read(Grib2.write(m, packing = packing, scanMode = scan))
      assert(back.raster.west == m.raster.west &&
        back.raster.north == m.raster.north, s"bounds wrong for scan=$scan")
      back.raster.data.zip(m.raster.data).foreach { case (a, b) =>
        if (b.isNaN) assert(a.isNaN, s"scan=$scan")
        else assert(math.abs(a - b) < 0.005, s"scan=$scan: $a vs $b")
      }
    }
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

  test("probability (4.9) and spatially-processed (4.15) products decode as distinct variables") {
    val m = sampleMessage
    // P(param > threshold) is NOT the deterministic parameter — the
    // same (discipline, category, parameter) octets must surface as a
    // different variable, or a probability field silently overwrites
    // its base field in the catalog
    val prob = Grib2.write(m, productTemplate = 9)
    val backP = Grib2.read(prob)
    assert(backP.variant == "_prob")
    assert(Formats.Grib2Decoder.listVariables(prob) == Seq("d0_c1_p8_prob"))
    backP.raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN) else assert(math.abs(a - b) < 0.005)
    }
    assert(backP.forecastHours == m.forecastHours)

    val sp = Grib2.write(m, productTemplate = 15)
    assert(Grib2.read(sp).variant == "_sp")
    assert(Formats.Grib2Decoder.listVariables(sp) == Seq("d0_c1_p8_sp"))
    // point-in-time probability (4.5) and percentile (4.10) route too
    assert(Grib2.read(Grib2.write(m, productTemplate = 5)).variant == "_prob")
    val pct = Grib2.write(m, productTemplate = 10)
    assert(Grib2.read(pct).variant == "_pct")
    assert(Formats.Grib2Decoder.listVariables(pct) == Seq("d0_c1_p8_pct"))
    Grib2.read(pct).raster.data.zip(m.raster.data).foreach { case (a, b) =>
      if (b.isNaN) assert(a.isNaN) else assert(math.abs(a - b) < 0.005)
    }

    // a 4.0 + 4.9 pair of the same parameter is TWO variables in the
    // catalog — and because the pixel frame has no variant column, the
    // MIXED granule dead-letters at decode instead of merging two
    // different quantities into one silently conflicting stream
    val both = Grib2.write(m) ++ prob
    assert(Formats.Grib2Decoder.listVariables(both) ==
      Seq("d0_c1_p8", "d0_c1_p8_prob"))
    val eMix = intercept[IllegalArgumentException] {
      Formats.Grib2Decoder.decodeMulti(both)
    }
    assert(eMix.getMessage.contains("mixes statistical-product variants"),
      eMix.getMessage)
    // same-variant multi-message files still decode per step
    val onlyProb = prob ++ Grib2.write(m.copy(forecastHours = 18), productTemplate = 9)
    assert(Formats.Grib2Decoder.decodeMulti(onlyProb).map(_._1) == Seq(12, 18))

    // ensemble members are distinct variables (a 50-member GEFS file
    // would otherwise merge 50 rasters into one per-step stream), and
    // a multi-member granule dead-letters like any mixed-variant one
    val m3 = Grib2.write(m, productTemplate = 1, ensMember = 3)
    assert(Grib2.read(m3).variant == "_m3")
    assert(Formats.Grib2Decoder.listVariables(m3) == Seq("d0_c1_p8_m3"))
    val twoMembers = m3 ++ Grib2.write(m, productTemplate = 1, ensMember = 4)
    val eEns = intercept[IllegalArgumentException] {
      Formats.Grib2Decoder.decodeMulti(twoMembers)
    }
    assert(eEns.getMessage.contains("mixes statistical-product variants"))
    // derived-ensemble mean and spread are distinct too
    assert(Grib2.read(Grib2.write(m, productTemplate = 2, ensDerived = 0)).variant == "_d0")
    assert(Grib2.read(Grib2.write(m, productTemplate = 2, ensDerived = 4)).variant == "_d4")
    // one member's multi-step file decodes normally
    val m3steps = m3 ++ Grib2.write(m.copy(forecastHours = 18),
      productTemplate = 1, ensMember = 3)
    assert(Formats.Grib2Decoder.decodeMulti(m3steps).map(_._1) == Seq(12, 18))

    // unknown statistical templates still dead-letter by number
    val bad = prob.clone()
    // walk sections from the end of the 16-octet indicator to find
    // section 4, then overwrite its template number (octets 8-9)
    var o = 16
    def u32(p: Int) = ((bad(p) & 0xffL) << 24) | ((bad(p + 1) & 0xffL) << 16) |
      ((bad(p + 2) & 0xffL) << 8) | (bad(p + 3) & 0xffL)
    while ((bad(o + 4) & 0xff) != 4) o += u32(o).toInt
    bad(o + 7) = 0; bad(o + 8) = 30 // template 4.30 (satellite product)
    val e = intercept[IllegalArgumentException] { Grib2.read(bad) }
    assert(e.getMessage.contains("4.30"))
  }

  test("mixed-grid multi-message files fail loudly instead of mis-georeferencing") {
    val m = sampleMessage
    val shifted = m.copy(forecastHours = 18,
      raster = m.raster.copy(west = m.raster.west + 10.0))
    val bytes = Grib2.write(m) ++ Grib2.write(shifted)
    val e = intercept[IllegalArgumentException] {
      Formats.Grib2Decoder.decodeMulti(bytes)
    }
    assert(e.getMessage.contains("different grid"), e.getMessage)
    intercept[IllegalArgumentException] {
      Formats.Grib2Decoder.pixelLonLat(bytes)
    }
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

  test("quarantining ingest: undecodable granules dead-letter with reason, lossy 5.40 decodes") {
    val dir = Files.createTempDirectory("graft-quarantine-").toString
    val m = sampleMessage
    Files.write(Paths.get(s"$dir/t2m_20240101_0000.grib2"), Grib2.write(m))
    // LOSSY 5.40 now DECODES — it belongs with the good granules
    Files.write(Paths.get(s"$dir/t2m_20240101_0600.grib2"),
      Grib2.write(m, packing = 40, j2kQuantShift = Some(0)))
    // an UNSUPPORTED packing template (patch 5.40 → 5.1 matrix —
    // 5.50 spectral decodes since round 10): undecodable
    val bad = Grib2.write(m, packing = 40)
    def u32(b: Array[Byte], o: Int): Int =
      ((b(o) & 0xff) << 24) | ((b(o + 1) & 0xff) << 16) | ((b(o + 2) & 0xff) << 8) | (b(o + 3) & 0xff)
    var pos = 16
    var patched = false
    while (pos < bad.length - 4 && !patched) {
      val len = u32(bad, pos); val num = bad(pos + 4) & 0xff
      if (num == 5) { bad(pos + 5 + 5) = 1.toByte; patched = true } // template lo byte
      else pos += len
    }
    assert(patched)
    Files.write(Paths.get(s"$dir/t2m_20240101_1200.grib2"), bad)

    // default batch ingest still fails loudly on the bad granule …
    intercept[org.apache.spark.SparkException] {
      Formats.ingestDir(spark, dir).count()
    }
    // … but the quarantine path ingests 2 of 3 and dead-letters the third
    val (pixels, dead) = Formats.ingestDirQuarantine(spark, dir)
    val n = m.raster.data.count(!_.isNaN)
    assert(pixels.count() == 2L * n)
    assert(pixels.select("time").distinct().count() == 2)
    val dl = dead.collect()
    assert(dl.length == 1)
    assert(dl(0).getString(0) == "t2m_20240101_1200.grib2")
    assert(dl(0).getString(1).contains("unsupported packing template"))
  }
}
