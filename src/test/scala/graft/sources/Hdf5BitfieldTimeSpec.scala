package graft.sources

import graft.SparkSpec

/** Bitfield (class 4) and time (class 2) dataset decode — the last two
  * real HDF5 datatype classes that were behind loud guards. Both are
  * fixed-layout integer reads per the public HDF5 File Format Spec v3:
  * bitfield = the fixed-point layout minus the sign flag (2-byte bit
  * offset + 2-byte precision, UNSIGNED field, padding undefined);
  * time = byte order + 2-byte precision, decoded as signed time_t
  * epoch seconds (the H5T_UNIX_D32/64 family). */
class Hdf5BitfieldTimeSpec extends SparkSpec {

  private val h = 3; private val w = 4

  private def fixture(bitfield: Boolean = false, time: Boolean = false): Array[Byte] =
    Hdf5.write(Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), Array(30f, 20f, 10f), None),
        NetCdf.Variable("lon", Seq("lon"), Array(0f, 10f, 20f, 30f), None),
        NetCdf.Variable("precip", Seq("lat", "lon"),
          Array.tabulate(h * w)(_.toFloat), None)),
      bitfieldExtra = bitfield, timeExtra = time)

  test("bitfield dataset: unsigned field masked out of dirty padding bits") {
    val f = Hdf5.read(fixture(bitfield = true))
    val flags = f.datasets.find(_.name == "flags").get
    assert(flags.shape == Seq(4))
    // the writer sets EVERY padding bit; only the 5-bit field at
    // offset 2 may surface, never sign-extended
    assert(flags.data.toSeq == Seq(0f, 5f, 17f, 31f),
      flags.data.mkString(","))
    // the rest of the granule is untouched
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.data.sameElements(Array.tabulate(h * w)(_.toFloat)))
  }

  test("time dataset: signed epoch seconds, pre-epoch values keep their sign") {
    val f = Hdf5.read(fixture(time = true))
    val stamps = f.datasets.find(_.name == "stamps").get
    assert(stamps.shape == Seq(2))
    assert(stamps.data.toSeq == Seq(1700000000f, -86400f),
      stamps.data.mkString(","))
  }

  test("corrupt bitfield extents dead-letter loudly") {
    val good = fixture(bitfield = true)
    // the bitfield datatype message body: 0x14, 3 zero bytes, size=2
    // (u32 LE), offset=2 (u16), precision=5 (u16)
    val needle = Array[Byte](0x14, 0, 0, 0, 2, 0, 0, 0, 2, 0, 5, 0)
    var at = -1
    var i = 0
    while (at < 0 && i + needle.length <= good.length) {
      var j = 0
      while (j < needle.length && good(i + j) == needle(j)) j += 1
      if (j == needle.length) at = i
      i += 1
    }
    assert(at >= 0, "bitfield datatype message not found in fixture bytes")
    val bad = good.clone()
    bad(at + 10) = 60.toByte // precision 60 bits inside a 2-byte element
    val e = intercept[IllegalArgumentException] { Hdf5.read(bad) }
    assert(e.getMessage.contains("bitfield"), e.getMessage)
  }
}
