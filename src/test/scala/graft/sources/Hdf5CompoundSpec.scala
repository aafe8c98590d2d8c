package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Compound datatypes (class 6 — HDF-EOS tables, netcdf-4
  * NC_COMPOUND): each numeric member flattens to its own variable
  * named `<dataset>.<member>`, preserving the dataset's shape. */
class Hdf5CompoundSpec extends AnyFunSuite {

  private val h = 3; private val w = 4

  private def fixture: Array[Byte] = {
    val lat = Array(30f, 20f, 10f)
    val lon = Array(0f, 10f, 20f, 30f)
    // members: (count i16, id i32, mean f32, exact f64), interleaved
    val k = 4
    val data = new Array[Float](h * w * k)
    for (i <- 0 until h * w) {
      data(i * k) = (i * 3 - 5).toFloat
      data(i * k + 1) = (100000 + i).toFloat
      data(i * k + 2) = i * 0.25f
      data(i * k + 3) = (i * 7).toFloat
    }
    Hdf5.write(
      Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("obs", Seq("lat", "lon"), data, None)),
      compoundVars = Map("obs" -> Seq(
        "count" -> "i16", "id" -> "i32", "mean" -> "f32", "exact" -> "f64")))
  }

  test("compound members flatten to one variable each, values exact") {
    val f = Hdf5.read(fixture)
    val names = f.datasets.map(_.name)
    assert(Seq("obs.count", "obs.id", "obs.mean", "obs.exact").forall(names.contains),
      s"members missing from $names")
    assert(!names.contains("obs"), "the raw compound must not surface whole")
    val count = f.datasets.find(_.name == "obs.count").get
    val id = f.datasets.find(_.name == "obs.id").get
    val mean = f.datasets.find(_.name == "obs.mean").get
    val exact = f.datasets.find(_.name == "obs.exact").get
    assert(count.shape == Seq(h, w) && mean.shape == Seq(h, w))
    for (i <- 0 until h * w) {
      assert(count.data(i) == (i * 3 - 5).toFloat, s"count at $i")
      assert(id.data(i) == (100000 + i).toFloat, s"id at $i")
      assert(mean.data(i) == i * 0.25f, s"mean at $i")
      assert(exact.data(i) == (i * 7).toFloat, s"exact at $i")
    }
  }

  test("compound members assemble through the NetCDF model with dims intact") {
    val f = NetCdf.readAny(fixture)
    val mean = f.vars.find(_.name == "obs.mean").get
    assert(mean.dims == Seq("lat", "lon"))
    assert(mean.data(5) == 1.25f)
  }

  test("array-valued members (v1 dimensionality) append their dims to the shape") {
    val lat = Array(30f, 20f, 10f)
    val lon = Array(0f, 10f, 20f, 30f)
    // members: scalar id + a per-row coordinate TRIPLE (HDF-EOS shape)
    val vals = 1 + 3
    val data = new Array[Float](h * w * vals)
    for (i <- 0 until h * w) {
      data(i * vals) = (500 + i).toFloat
      for (c <- 0 until 3) data(i * vals + 1 + c) = i * 10f + c
    }
    val bytes = Hdf5.write(
      Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("trk", Seq("lat", "lon"), data, None)),
      compoundVars = Map("trk" -> Seq("id" -> "i32", "xyz" -> "f32x3")))
    val f = Hdf5.read(bytes)
    val id = f.datasets.find(_.name == "trk.id").get
    val xyz = f.datasets.find(_.name == "trk.xyz").get
    assert(id.shape == Seq(h, w))
    assert(xyz.shape == Seq(h, w, 3), xyz.shape.toString)
    for (i <- 0 until h * w) {
      assert(id.data(i) == (500 + i).toFloat)
      for (c <- 0 until 3)
        assert(xyz.data(i * 3 + c) == i * 10f + c, s"xyz at ($i, $c)")
    }
    // and the NetCDF model synthesizes a name for the trailing axis
    val nf = NetCdf.readAny(bytes)
    val v = nf.vars.find(_.name == "trk.xyz").get
    assert(v.dims.take(2) == Seq("lat", "lon") && v.dims.size == 3,
      v.dims.toString)
    assert(nf.dims.toMap.get(v.dims(2)).contains(3))
  }

  test("a string-member compound fails loudly") {
    // hand-patch a member datatype class to string (3): reader must
    // refuse rather than reinterpret bytes as numbers
    val bytes = fixture
    // locate the compound dt: version|class byte 0x16 followed by the
    // member count 4
    var at = -1
    for (i <- bytes.indices.dropRight(8) if at < 0)
      if (bytes(i) == 0x16.toByte && bytes(i + 1) == 4.toByte && bytes(i + 2) == 0.toByte &&
          bytes(i + 8) == 'c'.toByte && bytes(i + 9) == 'o'.toByte) at = i
    assert(at > 0, "compound datatype message not found")
    // LAST member's dt (patching an earlier one would misalign the
    // members that follow it): header 8, then per member 8 padded name
    // + 32 props + dt (i16 12, i32 12, f32 20)
    val mdt = at + 8 + (8 + 32) * 4 + 12 + 12 + 20
    assert((bytes(mdt) & 0x0f) == 1, "expected the f64 member datatype")
    bytes(mdt) = 0x13.toByte // v1, class 3 (string)
    val e = intercept[IllegalArgumentException] { Hdf5.read(bytes) }
    assert(e.getMessage.contains("numeric-member compound"), e.getMessage)
  }
}
