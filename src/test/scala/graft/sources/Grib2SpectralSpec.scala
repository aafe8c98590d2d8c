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

  /** Coefficient array over the general pentagonal region:
    * m = 0..M, n = m..min(J + m, K) — the GRIB transmission order. */
  private def coefArrayP(j: Int, k: Int, m: Int)(
      set: (Int, Int) => (Double, Double)): Array[Double] = {
    val out = scala.collection.mutable.ArrayBuffer[Double]()
    for (mm <- 0 to m; nn <- mm to SphericalHarmonics.nMaxAt(j, k, mm)) {
      val (re, im) = set(nn, mm)
      out += re += im
    }
    out.toArray
  }

  test("rhomboidal truncation (K = J + M) walks and synthesizes the extended band") {
    // J=4, K=8, M=4: the harmonic (n=6, m=3) lies OUTSIDE any
    // triangular/trapezoidal region (n > J) and is retained only by
    // the pentagonal bounds n <= min(J+m, K) = 7 — so this pins both
    // the coefficient walk order over the extended region and the
    // per-m band limit in the synthesis.
    val (j, k, mT) = (4, 8, 4)
    val (a, b) = (1.25, -0.5)
    val coefs = coefArrayP(j, k, mT)((n, m) =>
      if (n == 6 && m == 3) (a, b) else (0.0, 0.0))
    val msg = Grib2.read(Grib2.writeSpectral(coefs, j, mT, 0, 0, 11, t0, 0, k = k))
    val r = msg.raster
    assert(r.width == 2 * (k + 1) && r.height == k + 1)
    for (row <- 0 until r.height; x <- 0 until r.width) {
      val mu = math.sin(math.toRadians(90.0 - (row + 0.5) * (180.0 / r.height)))
      val lon = math.toRadians(-180.0 + (x + 0.5) * (360.0 / r.width))
      val p63 = SphericalHarmonics.alfs(3, 6, mu).last
      val expect = 2.0 * (a * math.cos(3 * lon) - b * math.sin(3 * lon)) * p63
      assert(math.abs(r.data(row * r.width + x) - expect) < 2e-3,
        s"($row,$x): ${r.data(row * r.width + x)} vs $expect")
    }
  }

  test("implausible truncations are loud") {
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
    // K < J is outside any pentagonal resolution: K's low byte =
    // section 3: 5 header + 9 body prefix + J(4) → K at p+18..21
    val e2 = intercept[IllegalArgumentException] {
      Grib2.read(patched(3, 21, (j - 1).toByte))
    }
    assert(e2.getMessage.contains("pentagonal"), e2.getMessage)
    // K > J + M adds no representable coefficient — equally loud
    val e3 = intercept[IllegalArgumentException] {
      Grib2.read(patched(3, 21, (2 * j + 1).toByte))
    }
    assert(e3.getMessage.contains("pentagonal"), e3.getMessage)
    // a valid pentagonal K over data sized for the triangular walk
    // dead-letters on the point-count cross-check, not a bad decode
    val e4 = intercept[IllegalArgumentException] {
      Grib2.read(patched(3, 21, (j + 1).toByte))
    }
    assert(e4.getMessage.contains("does not match"), e4.getMessage)
  }

  // ---- DRS 5.51 spectral complex packing ---------------------------

  test("5.51 complex packing decodes to the same raster as 5.50 simple packing") {
    val j = 10
    // a realistic red spectrum: power falls off with n, all coefficients
    // non-zero so both the IEEE subset and the packed remainder carry data
    val coefs = coefArray(j, j) { (n, m) =>
      if (n == 0 && m == 0) (280.0, 0.0)
      else (2.0 / ((n + 1) * (n + 1)) * (if (m % 2 == 0) 1 else -1),
        1.0 / ((n + 1) * (m + 2)))
    }
    val simple = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 6,
      decimals = 4))
    val complex = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 6,
      decimals = 4, complexSubJ = 3, laplacianP = 0.5))
    assert(complex.raster.width == simple.raster.width &&
      complex.raster.height == simple.raster.height)
    assert(complex.refTime == t0 && complex.forecastHours == 6)
    for (i <- simple.raster.data.indices)
      assert(math.abs(complex.raster.data(i) - simple.raster.data(i)) < 2e-3,
        s"pixel $i: 5.51 ${complex.raster.data(i)} vs 5.50 ${simple.raster.data(i)}")
  }

  test("5.51 Laplacian scaling actually applies (a negative-P fixture decodes too)") {
    val j = 6
    val coefs = coefArray(j, j) { (n, m) =>
      if (n == 0 && m == 0) (10.0, 0.0) else (0.5 / (n + 1), 0.25 / (n + m + 1))
    }
    // P < 0 AMPLIFIES high wavenumbers at pack time; decode must invert it
    val msg = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0,
      decimals = 4, complexSubJ = 1, laplacianP = -0.25))
    val ref = Grib2.read(Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0,
      decimals = 4))
    // two independently quantized encodings (and P < 0 costs the packed
    // stream ~1 bit of resolution), so the band is wider than 5.50-only
    for (i <- ref.raster.data.indices)
      assert(math.abs(msg.raster.data(i) - ref.raster.data(i)) < 5e-3,
        s"pixel $i: ${msg.raster.data(i)} vs ${ref.raster.data(i)}")
  }

  test("5.51 corrupt-subset octets are loud, not silently mis-decoded") {
    val j = 6
    val coefs = coefArray(j, j)((n, m) => (1.0 / (n + 1), 0.1 * m))
    val good = Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 0,
      complexSubJ = 2, laplacianP = 0.5)
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
    // section 5 template body: octets 21-24 P, 25-26 Js, 27-28 Ks,
    // 29-30 Ms, 31-34 Ts, 35 precision → section-relative offsets
    // Js low byte = 25, precision = 34 (0-based from section start)
    val ePent = intercept[IllegalArgumentException] {
      Grib2.read(patched(5, 25, 5.toByte)) // Js != Ks: non-triangular subset
    }
    assert(ePent.getMessage.contains("triangular subsets"), ePent.getMessage)
    val ePrec = intercept[IllegalArgumentException] {
      Grib2.read(patched(5, 34, 7.toByte)) // precision outside table 5.7
    }
    assert(ePrec.getMessage.contains("precision"), ePrec.getMessage)
    // Ts low byte: a wrong unpacked count would desynchronize the two
    // streams and corrupt every coefficient after the subset
    val eTs = intercept[IllegalArgumentException] {
      Grib2.read(patched(5, 33, 99.toByte))
    }
    assert(eTs.getMessage.contains("does not match subset"), eTs.getMessage)
  }

  test("5.51 ingests through the production registry") {
    val j = 8
    val coefs = coefArray(j, j) { (n, m) =>
      if (n == 0 && m == 0) (281.5, 0.0)
      else if (n <= 4) (0.8 / (n + 1), 0.05 * m) else (0.0, 0.0)
    }
    val bytes = Grib2.writeSpectral(coefs, j, j, 0, 0, 11, t0, 12,
      complexSubJ = 2, laplacianP = 0.5)
    assert(Formats.sniff(bytes).map(_.name).contains("grib2"))
    val dir = java.nio.file.Files.createTempDirectory("g2spec51")
    java.nio.file.Files.write(dir.resolve("t850sc_20010701T12.grib2"), bytes)
    val df = Formats.ingestDir(spark, dir.toString)
    assert(df.count() == 18 * 9)
    // the constant component survives the wire: global mean ~ 281.5/..
    val mean = df.agg(org.apache.spark.sql.functions.avg("v"))
      .collect().head.getDouble(0)
    assert(math.abs(mean - 281.5) < 1.0, mean.toString)
  }
}
