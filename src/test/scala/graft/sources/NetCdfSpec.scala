package graft.sources

import graft.SparkSpec

class NetCdfSpec extends SparkSpec {

  private def sampleFile = {
    val w = 6; val h = 4; val nT = 3
    val lat = Array(75f, 45f, 15f, -15f) // descending = north-up
    val lon = Array(-150f, -90f, -30f, 30f, 90f, 150f)
    val data = Array.tabulate(nT * h * w) { i =>
      if (i % 17 == 0) -9999f else i * 0.5f
    }
    NetCdf.write(
      Seq("time" -> nT, "lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("time", "lat", "lon"), data, Some(-9999f))))
  }

  test("write → read round-trips dims, variables, and _FillValue") {
    val bytes = sampleFile
    assert(NetCdf.canHandle(bytes))
    assert(Formats.sniff(bytes).map(_.name).contains("netcdf"))
    val f = NetCdf.read(bytes)
    assert(f.dims == Seq("time" -> 3, "lat" -> 4, "lon" -> 6))
    assert(f.vars.map(_.name) == Seq("lat", "lon", "precip"))
    assert(f.vars.last.fill.contains(-9999f))
  }

  test("netcdf files ingest through the chipper with step-offset times") {
    val dir = java.nio.file.Files.createTempDirectory("graft-nc-").toString
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/precip_20240101.nc"), sampleFile)
    val df = Formats.ingestDir(spark, dir)
    assert(df.select("time").distinct().count() == 3) // 3 timesteps
    val t2 = df.filter(org.apache.spark.sql.functions.col("step") === 2)
      .select("time").distinct().collect()(0).getTimestamp(0)
    assert(t2.toString == "2024-01-01 02:00:00.0")
  }

  test("multi-timestep variable explodes to north-up rasters with NaN fill") {
    val f = NetCdf.read(sampleFile)
    val rs = f.rasters("precip")
    assert(rs.size == 3)
    val (t0, r0) = rs.head
    assert(t0 == 0 && r0.width == 6 && r0.height == 4)
    // georeferencing from coordinate variables: px=60, py=30, centers
    assert(r0.px == 60.0 && r0.py == 30.0)
    assert(r0.west == -180.0 && r0.north == 90.0)
    // fill → NaN; index 0 was a fill cell
    assert(r0.data(0).isNaN)
    assert(r0.data(1) == 0.5f)
    // timestep 2 values offset by t*h*w
    assert(rs(2)._2.data(1) == (2 * 24 + 1) * 0.5f)
  }
}
