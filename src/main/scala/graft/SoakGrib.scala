package graft

import graft.sources.{GeoTiff, Grib2}
import java.nio.file.{Files, Paths}

/** GRIB2 ingest soak (not part of the driver bench): writes a feed of
  * granules in each packing the codec supports — including the new
  * JPEG2000 template 5.40 — and measures the distributed decode rate
  * through the SAME `Formats.ingestDir` path production uses. The
  * point on record: a 5.40 feed parallelizes by granule exactly like
  * the bit-packed templates (one task per file in the binaryFile
  * chipper), so ingest scale is file count × single-core decode rate;
  * the JPEG2000 constant is the price of reading what the feed
  * actually ships, not a new scaling term.
  * Run: sbt "runMain graft.SoakGrib [granules-per-packing]".
  */
object SoakGrib {
  def main(args: Array[String]): Unit = {
    val nPer = if (args.nonEmpty) args(0).toInt else 64
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val w = 360 // 1° global grid; height varies by grid family below
    def granule(step: Int, proj: Option[Grib2.GridProj] = None): Grib2.Message = {
      val h = proj match {
        case Some(g: Grib2.GaussianGrid) => 2 * g.n
        case _ => 181
      }
      val data = Array.tabulate(w * h) { i =>
        val x = i % w; val y = i / w
        if ((x + y + step) % 97 == 0) Float.NaN
        else (250.0 + 25.0 * math.sin(x * 0.05 + step * 0.3) *
          math.cos(y * 0.07)).toFloat
      }
      val raster = proj match {
        case None => GeoTiff.Raster(w, h, data, -180.0, 90.5, 1.0, 1.0)
        case Some(p: Grib2.LccProj) =>
          // an HRRR-like frame: 3 km steps anchored over the CONUS
          val (x0, y0) = graft.ops.Geo.fwdLambertConformalConicSph(
            p.radius, p.latin1, p.latin2, p.lad, p.lov)(-105.0, 35.0)
          GeoTiff.Raster(w, h, data, x0, y0 + h * 3000.0, 3000.0, 3000.0)
        case Some(_: Grib2.GaussianGrid) =>
          GeoTiff.Raster(w, h, data, 0.0, 90.0, 360.0 / w, 0.0 /* nominal */)
        case Some(_) => throw new IllegalStateException("unused in this soak")
      }
      Grib2.Message(raster, discipline = 0, category = 0, parameter = 0,
        refTime = java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0),
        forecastHours = step, proj = proj)
    }

    val hrrrProj: Option[Grib2.GridProj] = Some(Grib2.LccProj(
      radius = 6371229.0, lov = -97.5, latin1 = 38.5, latin2 = 38.5, lad = 38.5))
    for ((packing, proj, label) <- Seq(
           (0, None, "simple 5.0"), (3, None, "complex+diff 5.3"),
           (40, None, "jpeg2000 5.40"), (41, None, "png 5.41"),
           (42, None, "ccsds/aec 5.42"),
           // the actual HRRR wire shape: Lambert grid + JPEG2000 packing
           (40, hrrrProj, "lcc3.30 + 5.40"),
           // the actual ECMWF wire shape: Gaussian grid + Rice packing
           (42, Some(Grib2.GaussianGrid(90)): Option[Grib2.GridProj],
             "gauss3.40 + 5.42"))) {
      val dir = Files.createTempDirectory(s"soak-grib-$packing-").toString
      var bytes = 0L
      (0 until nPer).foreach { i =>
        val b = Grib2.write(granule(i, proj), packing = packing)
        bytes += b.length
        Files.write(Paths.get(f"$dir/g_$i%04d.grib2"), b)
      }
      val t0 = System.nanoTime()
      val n = graft.sources.Formats.ingestDir(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val gh = proj match {
        case Some(g: Grib2.GaussianGrid) => 2 * g.n
        case _ => 181
      }
      val px = nPer.toLong * w * gh
      println(f"[soak-grib] $label%-18s $nPer granules  ${bytes / 1024}%6d KiB  " +
        f"$dt%6.2f s  ${nPer / dt}%6.1f granules/s  ${px / dt / 1e6}%6.1f Mpx/s  rows=$n")
    }

    // production-sized single granules, decoded in-process (no Spark):
    // the per-file cost the chipper pays on REAL operational dimensions
    def single(label: String, m: Grib2.Message, packing: Int,
               j2kQuantShift: Option[Int] = None): Unit = {
      val b = Grib2.write(m, packing = packing, j2kQuantShift = j2kQuantShift)
      val t0 = System.nanoTime()
      val back = Grib2.read(b)
      val ll = Grib2.lonLatArrays(back)
      val dt = (System.nanoTime() - t0) / 1e9
      val npx = back.raster.width.toLong * back.raster.height
      println(f"[soak-grib-1] $label%-22s ${b.length / 1024}%6d KiB  " +
        f"$dt%6.2f s  ${npx / dt / 1e6}%6.1f Mpx/s  ll=${ll.isDefined}")
    }
    locally { // HRRR CONUS dimensions: 1799x1059 on the Lambert grid
      val (hw, hh) = (1799, 1059)
      val p = Grib2.LccProj(6371229.0, -97.5, 38.5, 38.5, 38.5)
      val (x0, y0) = graft.ops.Geo.fwdLambertConformalConicSph(
        p.radius, p.latin1, p.latin2, p.lad, p.lov)(-105.0, 25.0)
      val data = Array.tabulate(hw * hh)(i =>
        (250.0 + 25.0 * math.sin((i % hw) * 0.01) * math.cos((i / hw) * 0.013)).toFloat)
      val msg = Grib2.Message(
        GeoTiff.Raster(hw, hh, data, x0, y0 + hh * 3000.0, 3000.0, 3000.0),
        0, 0, 0, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0), 0,
        Some(p))
      single("hrrr 1799x1059 lcc+j2k", msg, packing = 40)
      // the MRMS wire shape: same frame, irreversible 9/7 (float DWT +
      // dequantization replace the integer 5/3 path)
      single("hrrr 1799x1059 lossy97", msg, packing = 40,
        j2kQuantShift = Some(2))
    }
    locally { // an O320-scale reduced Gaussian (N=320, 640 ragged rows)
      val nPar = 320
      val half = (1 to nPar).map(jj => 4 * jj + 16)
      val pl = half ++ half.reverse
      val w = pl.max; val h = 2 * nPar
      val data = Array.fill(w * h)(Float.NaN)
      for (jj <- 0 until h; x <- 0 until pl(jj))
        data(jj * w + x) = (260.0 + 20.0 * math.sin(x * 0.02) * math.cos(jj * 0.01)).toFloat
      single(s"o$nPar ${pl.sum}pts gauss+aec", Grib2.Message(
        GeoTiff.Raster(w, h, data, 0.0, 90.0, 360.0 / w, 0.0),
        0, 0, 0, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0), 0,
        Some(Grib2.ReducedGaussianGrid(nPar, pl))), packing = 42)
    }
    spark.stop()
  }
}
