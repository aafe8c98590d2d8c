package graft.sources

import graft.SparkSpec

/** GRIB2 spectral fields (grid template 3.50 + DRS 5.50): coefficient
  * decode + spherical-harmonic synthesis onto the truncation-sized
  * lat/lon raster. The synthesis convention (fully normalized ALFs,
  * no Condon–Shortley, factor 2 for m > 0) is pinned against ANALYTIC
  * harmonics, not just round-trips. */
class Grib2SpectralSpec extends SparkSpec {

  private val t0 = java.time.LocalDateTime.of(2001, 7, 1, 12, 0)

  private def coefArray(j: Int, m: Int)(set: (Int, Int) => (Double, Double)): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    for (mm <- 0 to m; nn <- mm to j) {
      val (re, im) = set(nn, mm)
      out += re += im
    }
    out.toArray
  }

  test("normalized associated Legendre seeds match the documented convention") {
    assert(SphericalHarmonics.alfs(0, 0, 0.37).head == 1.0) // P00 = 1
    val mu = 0.6
    val p0 = SphericalHarmonics.alfs(0, 1, mu)
    assert(math.abs(p0(1) - math.sqrt(3.0) * mu) < 1e-12) // P10 = sqrt(3) mu
    val p1 = SphericalHarmonics.alfs(1, 1, mu)
    assert(math.abs(p1(0) - math.sqrt(1.5) * math.sqrt(1 - mu * mu)) < 1e-12)
  }

  test("a constant field round-trips: only the (0,0) real coefficient") {
    val j = 5
    val coefs = coefArray(j, j)((n, m) => if (n == 0 && m == 0) (42.5, 0.0) else (0.0, 0.0))
    val bytes = Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 6)
    assert(Grib2.canHandle(bytes))
    val msg = Grib2.read(bytes)
    assert(msg.raster.width == 2 * (j + 1) && msg.raster.height == j + 1)
    assert(msg.raster.west == -180.0 && msg.raster.north == 90.0)
    assert(msg.refTime == t0 && msg.forecastHours == 6)
    msg.raster.data.foreach(v => assert(math.abs(v - 42.5f) < 1e-3, s"got $v"))
  }

  test("zonal harmonic (1,0) synthesizes sqrt(3) sin(lat) exactly") {
    val j = 7
    val a = 3.25
    val coefs = coefArray(j, j)((n, m) => if (n == 1 && m == 0) (a, 0.0) else (0.0, 0.0))
    val msg = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0))
    val r = msg.raster
    for (row <- 0 until r.height) {
      val lat = 90.0 - (row + 0.5) * (180.0 / r.height)
      val expect = a * math.sqrt(3.0) * math.sin(math.toRadians(lat))
      for (x <- 0 until r.width)
        assert(math.abs(r.data(row * r.width + x) - expect) < 2e-3,
          s"row $row col $x: ${r.data(row * r.width + x)} vs $expect")
    }
  }

  test("sectoral harmonic (1,1) carries the complex pair through cos/sin") {
    val j = 4
    val (a, b) = (1.5, -0.75)
    val coefs = coefArray(j, j)((n, m) => if (n == 1 && m == 1) (a, b) else (0.0, 0.0))
    val msg = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0))
    val r = msg.raster
    for (row <- 0 until r.height; x <- 0 until r.width) {
      val lat = math.toRadians(90.0 - (row + 0.5) * (180.0 / r.height))
      val lon = math.toRadians(-180.0 + (x + 0.5) * (360.0 / r.width))
      val p11 = math.sqrt(1.5) * math.cos(lat)
      val expect = 2.0 * (a * math.cos(lon) - b * math.sin(lon)) * p11
      assert(math.abs(r.data(row * r.width + x) - expect) < 2e-3,
        s"($row,$x): ${r.data(row * r.width + x)} vs $expect")
    }
  }

  test("a band-limited mixture ingests through the production registry") {
    val j = 10
    val coefs = coefArray(j, j) { (n, m) =>
      if (n == 0 && m == 0) (280.0, 0.0)
      else if (n <= 3 && m <= n) (1.0 / (n + 1), 0.1 * m)
      else (0.0, 0.0)
    }
    val bytes = Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 12)
    assert(Formats.sniff(bytes).map(_.name).contains("grib2"))
    val dir = java.nio.file.Files.createTempDirectory("g2spec")
    java.nio.file.Files.write(dir.resolve("t850_20010701T12.grib2"), bytes)
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.count() == 22 * 11)
    // lon/lat columns follow the declared affine frame
    val row = df.filter("y = 0 AND x = 0").collect().head
    assert(math.abs(row.getDouble(5) - (-180.0 + 0.5 * (360.0 / 22))) < 1e-9)
    assert(math.abs(row.getDouble(6) - (90.0 - 0.5 * (180.0 / 11))) < 1e-9)
  }

  test("5.51 spectral complex packing and pentagonal truncations are loud") {
    val j = 4
    val coefs = coefArray(j, j)((n, m) => if (n == 0 && m == 0) (1.0, 0.0) else (0.0, 0.0))
    val good = Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0)
    /** Patch one byte inside the first section numbered `num`:
      * `off` is relative to the section start (0 = length octet 1). */
    def patched(num: Int, off: Int, v: Byte): Array[Byte] = {
      val c = good.clone()
      var p = 16
      while (p < c.length - 4) {
        val len = java.nio.ByteBuffer.wrap(c, p, 4).getInt
        if ((c(p + 4) & 0xff) == num) { c(p + off) = v; return c }
        p += len
      }
      fail(s"section $num not found")
    }
    // DRS template number: section 5 octets 10-11 → low byte at p+10
    val e1 = intercept[IllegalArgumentException] {
      Grib2.read(patched(5, 10, 51.toByte))
    }
    assert(e1.getMessage.contains("5.51"), e1.getMessage)
    // pentagonal (K != J) truncation: K's low byte = octet 21-24 end
    // (section 3: 5 header + 9 body prefix + J(4) → K at p+18..21)
    val e2 = intercept[IllegalArgumentException] {
      Grib2.read(patched(3, 21, (j + 1).toByte))
    }
    assert(e2.getMessage.contains("triangular"), e2.getMessage)
  }
}
