package graft

import graft.sources._
import scala.util.Random

/** One-off deep fuzz sweep (not part of `sbt test` — the specs carry
  * seeded 120-150-trial versions): thousands of byte flips per format
  * against the full decode surface, asserting the quarantine contract
  * the hard way — every corruption either decodes or throws an
  * EXCEPTION promptly; an Error (StackOverflow, OOM) or a hang is a
  * finding. Run: sbt "runMain graft.FuzzSweep [trialsPerCorpus]".
  */
object FuzzSweep {
  def main(args: Array[String]): Unit = {
    val trials = if (args.nonEmpty) args(0).toInt else 2000
    val w = 24; val h = 16
    val data = Array.tabulate(w * h)(i => if (i % 19 == 0) Float.NaN else 250f + (i % 31) * 0.5f)
    val lat5 = Array(40f, 30f, 20f, 10f, 0f)
    val lon7 = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val d357 = Array.tabulate(3 * 5 * 7)(i => i * 0.25f)
    val msg = Grib2.Message(GeoTiff.Raster(w, h, data, -180.0, 90.0, 15.0, 11.25),
      discipline = 0, category = 1, parameter = 8,
      refTime = java.time.LocalDateTime.of(2000, 1, 1, 0, 0), forecastHours = 12)
    val g1msg = msg.copy(discipline = 255, category = 128, parameter = 11)

    val corpus: Seq[(String, Array[Byte], Array[Byte] => Unit)] = Seq(
      ("grib2-simple", Grib2.write(msg), b => { Grib2.readAll(b); () }),
      ("grib2-prob-4.9", Grib2.write(msg, productTemplate = 9), b => { Grib2.readAll(b); () }),
      ("grib2-pct-4.10", Grib2.write(msg, productTemplate = 10), b => { Grib2.readAll(b); () }),
      ("grib2-ens-4.1", Grib2.write(msg, productTemplate = 1, ensMember = 7),
        b => { Grib2.readAll(b); () }),
      ("grib2-complex-mvm", Grib2.write(msg, packing = 3, missingMgmt = 1), b => { Grib2.readAll(b); () }),
      ("grib2-rle-5.200",
        Grib2.write(msg.copy(raster = msg.raster.copy(
          data = data.map(v => if (v.isNaN) v else (v % 8).floor))), packing = 200),
        b => { Grib2.readAll(b); () }),
      ("grib1-simple", Grib1.write(g1msg), b => { Grib1.readAll(b); () }),
      ("grib1-secondorder", Grib1.writeSecondOrder(g1msg), b => { Grib1.readAll(b); () }),
      ("grib1-predefined", {
        val d = 2.5; val gw = 144; val gh = 73
        Grib1.write(g1msg.copy(raster = GeoTiff.Raster(gw, gh,
          Array.tabulate(gw * gh)(i => 220f + (i % 101) * 0.25f),
          -d / 2, 90 + d / 2, d, d)), predefinedGrid = Some(2))
      }, b => { Grib1.readAll(b); () }),
      ("grib1-spectral-complex", {
        val j = 8
        val coefs = new Array[Double](2 * SphericalHarmonics.nCoefficients(j, j))
        var ci = 0
        for (mm <- 0 to j; nn <- mm to j) {
          coefs(ci) = if (nn == 0 && mm == 0) 250.0 else 1.0 / ((nn + 1) * (nn + 1))
          coefs(ci + 1) = 0.2 / (nn + mm + 2)
          ci += 2
        }
        Grib1.writeSpectralComplex(coefs, j, j, subJ = 3, p = 0.5, 128, 130,
          java.time.LocalDateTime.of(1989, 7, 15, 0, 0), 0)
      }, b => { Grib1.readAll(b); () }),
      ("hdf5-vds", Hdf5.write(
        Seq("time" -> 3, "lat" -> 5, "lon" -> 7),
        Seq(NetCdf.Variable("lat", Seq("lat"), lat5, None),
          NetCdf.Variable("lon", Seq("lon"), lon7, None),
          NetCdf.Variable("precip", Seq("time", "lat", "lon"), d357, Some(-9999f))),
        virtualStack = true), b => {
          val f = NetCdf.readAny(b)
          f.gridVars.headOption.foreach(v => f.rasters(v.name))
        }),
      ("hdf5-enum", Hdf5.write(
        Seq("lat" -> 5, "lon" -> 7),
        Seq(NetCdf.Variable("lat", Seq("lat"), lat5, None),
          NetCdf.Variable("lon", Seq("lon"), lon7, None),
          NetCdf.Variable("mask", Seq("lat", "lon"),
            Array.tabulate(5 * 7)(i => (i % 3).toFloat), Some(3f))),
        enumVars = Map("mask" -> Seq("clear", "cloudy", "snow", "missing"))), b => {
          val f = NetCdf.readAny(b)
          f.gridVars.headOption.foreach(v => f.rasters(v.name))
        }),
      ("hdf5-layoutv4-ea", Hdf5.write(
        Seq("time" -> 3, "lat" -> 5, "lon" -> 7),
        Seq(NetCdf.Variable("lat", Seq("lat"), lat5, None),
          NetCdf.Variable("lon", Seq("lon"), lon7, None),
          NetCdf.Variable("precip", Seq("time", "lat", "lon"), d357, Some(-9999f))),
        layoutV4 = Some(4)), b => {
          val f = NetCdf.readAny(b)
          f.gridVars.headOption.foreach(v => f.rasters(v.name))
        }))

    var findings = 0
    for ((label, good, decode) <- corpus) {
      val rnd = new Random(label.hashCode)
      var ok = 0; var dead = 0
      for (trial <- 0 until trials) {
        val bad = good.clone()
        for (_ <- 0 to rnd.nextInt(5))
          bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
        val t0 = System.nanoTime()
        try { decode(bad); ok += 1 }
        catch {
          case _: Exception => dead += 1
          case e: Throwable =>
            findings += 1
            println(s"[FINDING] $label trial $trial threw ${e.getClass.getName}: ${e.getMessage}")
        }
        val secs = (System.nanoTime() - t0) / 1e9
        if (secs > 20) { findings += 1; println(f"[FINDING] $label trial $trial took $secs%.1f s") }
      }
      println(f"[fuzz] $label%-22s $ok%5d decoded $dead%5d dead-lettered of $trials")
    }
    if (findings > 0) { println(s"[fuzz] $findings FINDINGS"); sys.exit(1) }
    println("[fuzz] clean sweep — every corruption decoded or threw an Exception promptly")
  }
}
