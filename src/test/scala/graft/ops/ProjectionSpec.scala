package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Round-trip validation of the inverse projections behind the
  * arbitrary-CRS regrid probes: forward-project with the textbook
  * formulas (Snyder 1987), invert with the engine's functions, recover
  * the original coordinates to sub-centimeter tolerance. */
class ProjectionSpec extends AnyFunSuite {
  private val R = Geo.EarthR
  private val tol = 1e-9 // degrees ≈ 0.1 mm

  test("inverse LCC round-trips the forward projection over CONUS") {
    val (lat1, lat2, lat0, lon0) = (33.0, 45.0, 39.0, -96.0)
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    def t(phi: Double) = math.tan(math.Pi / 4 + phi / 2)
    val n = math.log(math.cos(phi1) / math.cos(phi2)) / math.log(t(phi2) / t(phi1))
    val bigF = math.cos(phi1) * math.pow(t(phi1), n) / n
    val rho0 = R * bigF / math.pow(t(math.toRadians(lat0)), n)
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * bigF / math.pow(t(math.toRadians(latDeg)), n)
      val theta = math.toRadians(n * (lonDeg - lon0))
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }
    val inv = Geo.invLambertConformalConic(lat1, lat2, lat0, lon0) _
    for (lon <- Seq(-125.0, -96.0, -70.5); lat <- Seq(25.0, 39.0, 52.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"LCC round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
  }

  test("southern-parallel LCC (n < 0) round-trips; symmetric parallels refuse") {
    // a southern-hemisphere cone (e.g. an Australian/Antarctic forecast
    // grid): n < 0, rho flips sign, the atan2 arguments flip — the
    // Snyder p.107 sign rules must recover exact coordinates, not NaN
    val (lat1, lat2, lat0, lon0) = (-18.0, -36.0, -25.0, 135.0)
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    def t(phi: Double) = math.tan(math.Pi / 4 + phi / 2)
    val n = math.log(math.cos(phi1) / math.cos(phi2)) / math.log(t(phi2) / t(phi1))
    assert(n < 0, s"southern cone should give n < 0, got $n")
    val bigF = math.cos(phi1) * math.pow(t(phi1), n) / n
    val rho0 = R * bigF / math.pow(t(math.toRadians(lat0)), n)
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * bigF / math.pow(t(math.toRadians(latDeg)), n)
      val theta = math.toRadians(n * (lonDeg - lon0))
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }
    val inv = Geo.invLambertConformalConic(lat1, lat2, lat0, lon0) _
    for (lon <- Seq(113.0, 135.0, 153.5); lat <- Seq(-44.0, -25.0, -11.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(!latB.isNaN && !lonB.isNaN, s"southern LCC gave NaN at ($lon,$lat)")
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"southern LCC round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // output longitude is wrapped, not left outside (-180, 180]
    val (lonFar, _) = inv(fwd(178.0, -25.0)._1, fwd(178.0, -25.0)._2)
    assert(lonFar > -180.0 && lonFar <= 180.0)
    // symmetric parallels (lat1 = -lat2): n = 0, the cone degenerates to
    // a cylinder — must refuse loudly, never divide by zero into NaN
    assertThrows[IllegalArgumentException] {
      Geo.invLambertConformalConic(-30.0, 30.0, 0.0, 0.0)(1.0, 1.0)
    }
    assertThrows[IllegalArgumentException] {
      Geo.invLambertConformalConicSph(6371229.0, -30.0, 30.0, 0.0, 0.0)(1.0, 1.0)
    }
  }

  test("inverse ellipsoidal Mercator round-trips the forward projection") {
    val e = Geo.WGS84E
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val con = e * math.sin(phi)
      val y = R * math.log(math.tan(math.Pi / 4 + phi / 2) *
        math.pow((1 - con) / (1 + con), e / 2))
      (R * math.toRadians(lonDeg), y)
    }
    val inv = Geo.invEllipsoidalMercator(0.0) _
    for (lon <- Seq(-27.0, 0.0, 26.5); lat <- Seq(-70.0, -9.5, 0.0, 53.0, 80.0)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"ellipsoidal mercator round-trip drifted: ($lon,$lat) -> ($lonB,$latB)")
    }
    // the ellipsoidal inverse must NOT equal the spherical one — the
    // datum correction is the point (≈0.19° at 53°N)
    val (_, y53) = fwd(0.0, 53.0)
    val sphericalLat = math.toDegrees(2 * math.atan(math.exp(y53 / R)) - math.Pi / 2)
    assert(math.abs(sphericalLat - 53.0) > 0.1,
      "ellipsoidal and spherical Mercator should disagree visibly at mid-latitudes")
  }

  test("inverse polar stereographic round-trips the forward projection") {
    val (lon0, latTs) = (-45.0, 70.0)
    val k0 = (1.0 + math.sin(math.toRadians(latTs))) / 2.0
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = 2 * R * k0 * math.tan(math.Pi / 4 - math.toRadians(latDeg) / 2)
      val theta = math.toRadians(lonDeg - lon0)
      (rho * math.sin(theta), -rho * math.cos(theta))
    }
    val inv = Geo.invPolarStereographic(lon0, latTs) _
    for (lon <- Seq(-170.0, -45.0, 0.0, 134.5); lat <- Seq(45.0, 70.0, 88.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"polar stereo round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // the pole is a removable singularity: longitude pins to lon0
    assert(inv(0.0, 0.0) == (lon0, 90.0))
    // scale is true at latTs: a small arc along 70°N maps 1:1
    val (x1, y1) = fwd(-45.0, latTs); val (x2, y2) = fwd(-44.9, latTs)
    val ground = math.toRadians(0.1) * R * math.cos(math.toRadians(latTs))
    val planar = math.hypot(x2 - x1, y2 - y1)
    assert(math.abs(planar / ground - 1.0) < 1e-5,
      s"scale at the true-scale parallel should be 1, got ${planar / ground}")
  }

  test("inverse ELLIPSOIDAL polar stereographic round-trips the forward projection") {
    val (lon0, latTs) = (-45.0, 70.0)
    val e = Geo.WGS84E
    def tOf(latDeg: Double) = {
      val phi = math.toRadians(latDeg); val s = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - s) / (1 + s), e / 2)
    }
    val phiC = math.toRadians(latTs)
    val mC = math.cos(phiC) / math.sqrt(1 - e * e * math.sin(phiC) * math.sin(phiC))
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // Snyder eq. 21-33/21-34: rho = a · m_c · t / t_c
      val rho = R * mC * tOf(latDeg) / tOf(latTs)
      val theta = math.toRadians(lonDeg - lon0)
      (rho * math.sin(theta), -rho * math.cos(theta))
    }
    val inv = Geo.invPolarStereographicEll(lon0, latTs) _
    for (lon <- Seq(-170.0, -45.0, 0.0, 134.5); lat <- Seq(45.0, 70.0, 88.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"ellipsoidal polar stereo round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    assert(inv(0.0, 0.0) == (lon0, 90.0)) // pole pins longitude
    // the datum correction is visible: same projected point, spherical
    // vs ellipsoidal inverse latitudes disagree by ~0.1°+
    val (x70, y70) = fwd(-45.0, 70.0)
    val (_, latSph) = Geo.invPolarStereographic(lon0, latTs)(x70, y70)
    assert(math.abs(latSph - 70.0) > 0.05,
      s"spherical inverse should visibly disagree on an ellipsoidal point, got $latSph")
  }

  test("inverse ELLIPSOIDAL Albers equal-area round-trips the forward projection") {
    val (lat1, lat2, lat0, lon0) = (29.5, 45.5, 23.0, -96.0)
    val e = Geo.WGS84E; val e2 = e * e
    def qOf(latDeg: Double) = {
      val s = math.sin(math.toRadians(latDeg))
      (1 - e2) * (s / (1 - e2 * s * s) -
        (1 / (2 * e)) * math.log((1 - e * s) / (1 + e * s)))
    }
    def mOf(latDeg: Double) = {
      val phi = math.toRadians(latDeg); val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e2 * s * s)
    }
    val n = (mOf(lat1) * mOf(lat1) - mOf(lat2) * mOf(lat2)) / (qOf(lat2) - qOf(lat1))
    val c = mOf(lat1) * mOf(lat1) + n * qOf(lat1)
    val rho0 = R * math.sqrt(c - n * qOf(lat0)) / n
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      // Snyder eq. 14-3 (ellipsoidal): rho = a sqrt(C − n q) / n
      val rho = R * math.sqrt(c - n * qOf(latDeg)) / n
      val theta = math.toRadians(n * (lonDeg - lon0))
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }
    val inv = Geo.invAlbersEqualAreaEll(lat1, lat2, lat0, lon0) _
    for (lon <- Seq(-124.7, -96.0, -67.0); lat <- Seq(24.5, 37.0, 49.4)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"ellipsoidal Albers round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // q beyond the pole value short-circuits to exactly ±90°
    val (xp, yp) = fwd(-96.0, 90.0)
    assert(inv(xp, yp)._2 == 90.0)
    // datum correction visible vs the spherical inverse
    val (x37, y37) = fwd(-96.0, 37.0)
    val (_, latSph) = Geo.invAlbersEqualArea(lat1, lat2, lat0, lon0)(x37, y37)
    assert(math.abs(latSph - 37.0) > 0.05,
      s"spherical inverse should visibly disagree on an ellipsoidal point, got $latSph")
  }

  test("inverse ELLIPSOIDAL LCC round-trips the forward projection") {
    val (lat1, lat2, lat0, lon0) = (33.0, 45.0, 39.0, -96.0)
    val e = Geo.WGS84E
    def tOf(latDeg: Double) = {
      val phi = math.toRadians(latDeg); val s = e * math.sin(phi)
      math.tan(math.Pi / 4 - phi / 2) / math.pow((1 - s) / (1 + s), e / 2)
    }
    def mOf(latDeg: Double) = {
      val phi = math.toRadians(latDeg); val s = math.sin(phi)
      math.cos(phi) / math.sqrt(1 - e * e * s * s)
    }
    // Snyder eq. 15-8/15-10/15-7a forward
    val n = math.log(mOf(lat1) / mOf(lat2)) / math.log(tOf(lat1) / tOf(lat2))
    val bigF = mOf(lat1) / (n * math.pow(tOf(lat1), n))
    val rho0 = R * bigF * math.pow(tOf(lat0), n)
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * bigF * math.pow(tOf(latDeg), n)
      val theta = math.toRadians(n * (lonDeg - lon0))
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }
    val inv = Geo.invLambertConformalConicEll(lat1, lat2, lat0, lon0) _
    for (lon <- Seq(-125.0, -96.0, -70.5); lat <- Seq(25.0, 39.0, 52.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"ellipsoidal LCC round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // datum correction visible vs the spherical inverse on the same
    // point — a conformal cone PINNED at two parallels minimizes the
    // spherical/ellipsoidal gap between them, so the disagreement at
    // 37°N is ~0.006° (≈640 m), far above round-trip noise but an
    // order below the polar-stereo case
    val (x37, y37) = fwd(-96.0, 37.0)
    val (_, latSph) = Geo.invLambertConformalConic(lat1, lat2, lat0, lon0)(x37, y37)
    assert(math.abs(latSph - 37.0) > 0.003,
      s"spherical inverse should visibly disagree on an ellipsoidal point, got $latSph")
    // symmetric parallels must refuse (cone degenerates), like the others
    assertThrows[IllegalArgumentException] {
      Geo.invLambertConformalConicEll(-30.0, 30.0, 0.0, 0.0)(1.0, 1.0)
    }
  }

  test("inverse ELLIPSOIDAL transverse Mercator round-trips the forward projection") {
    val (lon0, k0) = (15.0, 0.9996)
    val e = Geo.WGS84E; val e2 = e * e
    val e4 = e2 * e2; val e6 = e4 * e2
    val ep2 = e2 / (1 - e2)
    // meridional arc (Snyder eq. 3-21)
    def arcM(latDeg: Double) = {
      val phi = math.toRadians(latDeg)
      R * ((1 - e2 / 4 - 3 * e4 / 64 - 5 * e6 / 256) * phi -
        (3 * e2 / 8 + 3 * e4 / 32 + 45 * e6 / 1024) * math.sin(2 * phi) +
        (15 * e4 / 256 + 45 * e6 / 1024) * math.sin(4 * phi) -
        (35 * e6 / 3072) * math.sin(6 * phi))
    }
    // Snyder eq. 8-9..8-15 forward
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val phi = math.toRadians(latDeg)
      val sinP = math.sin(phi); val cosP = math.cos(phi); val tanP = math.tan(phi)
      val nBig = R / math.sqrt(1 - e2 * sinP * sinP)
      val t = tanP * tanP
      val c = ep2 * cosP * cosP
      val aSmall = math.toRadians(lonDeg - lon0) * cosP
      val x = k0 * nBig * (aSmall +
        (1 - t + c) * math.pow(aSmall, 3) / 6 +
        (5 - 18 * t + t * t + 72 * c - 58 * ep2) * math.pow(aSmall, 5) / 120)
      val y = k0 * (arcM(latDeg) + nBig * tanP * (aSmall * aSmall / 2 +
        (5 - t + 9 * c + 4 * c * c) * math.pow(aSmall, 4) / 24 +
        (61 - 58 * t + t * t + 600 * c - 330 * ep2) * math.pow(aSmall, 6) / 720))
      (x, y)
    }
    val inv = Geo.invTransverseMercatorEll(lon0, k0) _
    // series accuracy holds within a few degrees of the central meridian
    // (the UTM zone-width contract); 1e-9° would demand the exact Krüger
    // form, so the tolerance here matches the series' published accuracy
    val tolTm = 1e-7 // degrees ≈ 1 cm
    for (lon <- Seq(12.0, 15.0, 18.0); lat <- Seq(-35.0, 0.0, 37.0, 68.5)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tolTm && math.abs(latB - lat) < tolTm,
        s"ellipsoidal TM round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // datum + k0 corrections visible vs the spherical inverse
    val (x37, y37) = fwd(16.0, 37.0)
    val (_, latSph) = Geo.invTransverseMercator(lon0)(x37, y37)
    assert(math.abs(latSph - 37.0) > 0.05,
      s"spherical inverse should visibly disagree on an ellipsoidal point, got $latSph")
  }

  test("inverse Albers equal-area round-trips the forward projection") {
    val (lat1, lat2, lat0, lon0) = (29.5, 45.5, 23.0, -96.0)
    val phi1 = math.toRadians(lat1); val phi2 = math.toRadians(lat2)
    val n = (math.sin(phi1) + math.sin(phi2)) / 2.0
    val c = math.cos(phi1) * math.cos(phi1) + 2 * n * math.sin(phi1)
    val rho0 = R * math.sqrt(c - 2 * n * math.sin(math.toRadians(lat0))) / n
    def fwd(lonDeg: Double, latDeg: Double): (Double, Double) = {
      val rho = R * math.sqrt(c - 2 * n * math.sin(math.toRadians(latDeg))) / n
      val theta = math.toRadians(n * (lonDeg - lon0))
      (rho * math.sin(theta), rho0 - rho * math.cos(theta))
    }
    val inv = Geo.invAlbersEqualArea(lat1, lat2, lat0, lon0) _
    for (lon <- Seq(-124.7, -96.0, -67.0); lat <- Seq(24.5, 37.0, 49.4)) {
      val (x, y) = fwd(lon, lat)
      val (lonB, latB) = inv(x, y)
      assert(math.abs(lonB - lon) < tol && math.abs(latB - lat) < tol,
        s"Albers round-trip drifted: ($lon,$lat) -> ($x,$y) -> ($lonB,$latB)")
    }
    // equal-area, not conformal: it must disagree with the LCC inverse
    // at the same point (different property, different cone constant)
    val (x, y) = fwd(-80.0, 30.0)
    val (lonL, latL) = Geo.invLambertConformalConic(lat1, lat2, lat0, lon0)(x, y)
    assert(math.abs(latL - 30.0) > 0.01 || math.abs(lonL - -80.0) > 0.01,
      "Albers and LCC inverses should differ on the same projected point")
  }
}
