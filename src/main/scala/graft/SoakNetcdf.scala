package graft

import graft.sources.{Hdf5, NetCdf}
import java.nio.file.{Files, Paths}

/** NetCDF ingest soak (not part of the driver bench): writes a feed of
  * granules in each container/packing shape the codec supports — the
  * ERA5-style packed-short CDF-2, plain-float CDF-1/CDF-5, and
  * NetCDF-4/HDF5 chunked+deflate(+shuffle) — and measures the
  * distributed decode rate through the SAME `Formats.ingestDir` path
  * production uses. The point on record: CF unpacking and the typed
  * decode are map-side per-granule constants; a packed-short feed
  * parallelizes by granule exactly like the float feeds.
  * Run: sbt "runMain graft.SoakNetcdf [granules-per-shape]".
  */
object SoakNetcdf {
  def main(args: Array[String]): Unit = {
    val nPer = if (args.nonEmpty) args(0).toInt else 48
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val w = 360; val h = 181
    val lat = Array.tabulate(h)(j => 90f - j)
    val lon = Array.tabulate(w)(i => -180f + i)
    def field(step: Int): Array[Float] = Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      if ((x + y + step) % 97 == 0) Float.NaN
      else (250.0 + 25.0 * math.sin(x * 0.05 + step * 0.3) *
        math.cos(y * 0.07)).toFloat
    }
    def dims = Seq("lat" -> h, "lon" -> w)
    def coords = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None))

    def floatGranule(step: Int, version: Int): Array[Byte] =
      NetCdf.write(dims, coords :+
        NetCdf.Variable("t2m", Seq("lat", "lon"),
          field(step).map(v => if (v.isNaN) -9999f else v), Some(-9999f)),
        version = version)
    def packedGranule(step: Int): Array[Byte] = {
      // raw shorts + scale/offset, NaN cells as the sentinel
      val scale = 0.0016653; val offset = 266.53
      val raw = field(step).map(v =>
        if (v.isNaN) -32767f else ((v - offset) / scale).toInt.toShort.toFloat)
      NetCdf.write(dims, coords :+
        NetCdf.Variable("t2m", Seq("lat", "lon"), raw, Some(-32767f),
          numAttrs = Map("scale_factor" -> scale, "add_offset" -> offset),
          ncType = 3),
        version = 2)
    }
    def hdf5Granule(step: Int, shuffle: Boolean): Array[Byte] =
      Hdf5.write(dims, coords :+
        NetCdf.Variable("t2m", Seq("lat", "lon"),
          field(step).map(v => if (v.isNaN) -9999f else v), Some(-9999f)),
        shuffle = shuffle)
    def szipGranule(step: Int): Array[Byte] =
      // szip stores int16 samples; quantize the field into 15-bit range
      Hdf5.write(dims, coords :+
        NetCdf.Variable("t2m", Seq("lat", "lon"),
          field(step).map(v => if (v.isNaN) 0f else (v * 10).toInt.toFloat), None),
        szip = true)

    for ((label, gen) <- Seq[(String, Int => Array[Byte])](
           ("cdf1 float", floatGranule(_, 1)),
           ("cdf5 float", floatGranule(_, 5)),
           ("cdf2 packed-short", packedGranule),
           ("nc4 deflate", hdf5Granule(_, false)),
           ("nc4 shuffle+deflate", hdf5Granule(_, true)),
           ("nc4 szip int16", szipGranule))) {
      val dir = Files.createTempDirectory("soak-nc-").toString
      var bytes = 0L
      (0 until nPer).foreach { i =>
        val b = gen(i)
        bytes += b.length
        Files.write(Paths.get(f"$dir/t2m_2024010${i % 9 + 1}.nc"), b)
      }
      val t0 = System.nanoTime()
      val n = graft.sources.Formats.ingestDir(spark, dir).count()
      val dt = (System.nanoTime() - t0) / 1e9
      val px = nPer.toLong * w * h
      println(f"[soak-nc] $label%-20s $nPer granules  ${bytes / 1024}%6d KiB  " +
        f"$dt%6.2f s  ${nPer / dt}%6.1f granules/s  ${px / dt / 1e6}%6.1f Mpx/s  rows=$n")
    }
    spark.stop()
  }
}
