package graft.sources

import graft.SparkSpec

/** Opaque (class 5) and reference (class 7) datasets are
  * metadata-adjacent — HDF-EOS runtime blobs, region-reference tables —
  * and carry no raster values, so the reader SKIPS them with a stderr
  * diagnostic instead of failing the granule; all other unsupported
  * datatype classes still dead-letter loudly. */
class Hdf5OpaqueSpec extends SparkSpec {

  private val h = 3; private val w = 4

  private def fixture: Array[Byte] =
    Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), Array(30f, 20f, 10f), None),
        NetCdf.Variable("lon", Seq("lon"), Array(0f, 10f, 20f, 30f), None),
        NetCdf.Variable("precip", Seq("lat", "lon"),
          Array.tabulate(h * w)(_.toFloat), None)),
      opaqueExtra = true)

  test("an opaque-typed dataset skips with a diagnostic; the granule still decodes") {
    val f = Hdf5.read(fixture)
    val names = f.datasets.map(_.name)
    assert(!names.contains("runtime_meta"),
      s"opaque dataset must be skipped, surfaced: $names")
    assert(names.toSet == Set("lat", "lon", "precip"), names.toString)
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(h, w))
    assert(precip.data.sameElements(Array.tabulate(h * w)(_.toFloat)))
    // and the production variable discovery agrees
    assert(Formats.NetCdfDecoder.listVariables(fixture) == Seq("precip"))
  }

  test("other unsupported dataset classes still fail loudly") {
    // patch the opaque dataset's class nibble (5) to 11 (not a real
    // HDF5 datatype class) — any unknown class must dead-letter, never
    // be mis-decoded as pixels
    val good = fixture
    // datatype message body starts 0x15 (v1 | class 5), tag-len 8,
    // zeros, size 8, "metatag\0" — a 16-byte needle unique to the blob
    val needle = Array[Byte](0x15, 8, 0, 0, 8, 0, 0, 0) ++
      "metatag".getBytes("UTF-8") :+ 0.toByte
    var at = -1
    var i = 0
    while (at < 0 && i + needle.length <= good.length) {
      var j = 0
      while (j < needle.length && good(i + j) == needle(j)) j += 1
      if (j == needle.length) at = i
      i += 1
    }
    assert(at >= 0, "opaque datatype message not found in fixture bytes")
    val bad = good.clone()
    bad(at) = 0x1b.toByte // v1 | class 11 (no such class)
    val e = intercept[IllegalArgumentException] { Hdf5.read(bad) }
    assert(e.getMessage.contains("datatype class"), e.getMessage)
  }
}
