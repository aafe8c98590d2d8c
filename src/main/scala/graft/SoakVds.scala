package graft

import graft.sources.{Formats, Hdf5, NetCdf}

/** Cross-file virtual-dataset ingest at volume — the NWP member-file
  * aggregation scenario the round-10 VDS support exists for: C cubes,
  * each a virtual .nc whose T timesteps map onto T sibling member
  * files, ingested through the PRODUCTION directory path (binaryFile →
  * sniff → decode with the directory-rooted sibling resolver). Prints
  * granule and pixel throughput; the claim under test is that member
  * resolution stays per-granule work (each task opens only ITS cube's
  * members — nothing global, nothing driver-side).
  * Run: sbt "runMain graft.SoakVds [cubes] [timesteps] [edge]". */
object SoakVds {
  def main(args: Array[String]): Unit = {
    val cubes = args.headOption.map(_.toInt).getOrElse(10)
    val steps = if (args.length > 1) args(1).toInt else 12
    val edge = if (args.length > 2) args(2).toInt else 96
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val dir = java.nio.file.Files.createTempDirectory("graft-soakvds-")
    val lat = Array.tabulate(edge)(i => 60f - i * 0.5f)
    val lon = Array.tabulate(edge)(i => -30f + i * 0.5f)
    val t0 = System.nanoTime()
    for (c <- 0 until cubes) {
      val memberNames = (0 until steps).map(k => f"c${c}%02d_m$k%02d.h5")
      for (k <- 0 until steps) {
        val slice = Array.tabulate(edge * edge)(i =>
          if ((i + k) % 29 == 0) -9999f else (c * 100 + k + i % 37 * 0.25f))
        java.nio.file.Files.write(dir.resolve(memberNames(k)),
          Hdf5.write(Seq("lat" -> edge, "lon" -> edge),
            Seq(NetCdf.Variable("lat", Seq("lat"), lat, None),
              NetCdf.Variable("lon", Seq("lon"), lon, None),
              NetCdf.Variable("precip", Seq("lat", "lon"), slice, Some(-9999f)))))
      }
      val virt = Hdf5.write(
        Seq("time" -> steps, "lat" -> edge, "lon" -> edge),
        Seq(NetCdf.Variable("lat", Seq("lat"), lat, None),
          NetCdf.Variable("lon", Seq("lon"), lon, None),
          NetCdf.Variable("precip", Seq("time", "lat", "lon"),
            new Array[Float](steps * edge * edge), Some(-9999f))),
        virtualStack = true,
        virtualCrossFiles = memberNames.map(n => (n, "/precip")))
      java.nio.file.Files.write(
        dir.resolve(f"precip_c$c%02d_20240102T00.nc"), virt)
    }
    val tGen = (System.nanoTime() - t0) / 1e9
    println(f"[soak-vds] generated $cubes cubes x $steps members " +
      f"(${edge}x$edge) in $tGen%.1f s")

    val t1 = System.nanoTime()
    val df = Formats.ingestDir(spark, dir.toString)
    val rows = df.count()
    val dt = (System.nanoTime() - t1) / 1e9
    val totalPx = cubes.toLong * steps * edge * edge
    println(f"[soak-vds] ingested $rows%d pixel rows of $totalPx " +
      f"($cubes virtual granules, ${cubes * steps} member files) " +
      f"in $dt%.2f s  ${rows / dt}%.0f px/s  ${cubes / dt}%.1f granules/s")
    require(rows > totalPx * 9 / 10 && rows < totalPx,
      s"expected ~${totalPx} minus the seeded nodata, got $rows")
    // distinct granules = the virtual cubes only (members feed them)
    val ng = df.select("fname").distinct().count()
    require(ng == cubes, s"$ng granules surfaced for $cubes cubes")
    spark.stop()
  }
}
