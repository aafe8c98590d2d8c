package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** N-bit (filter 5) and scale+offset (filter 6) — the two stock
  * netcdf-c/h5py packed-bit compression options (`H5Znbit.c`,
  * `H5Zscaleoffset.c`). The bitstream layout is pinned against
  * hand-worked examples of libhdf5's MSB-first packing, then each
  * filter decodes end-to-end through the production reader and the
  * directory ingest path.
  */
class Hdf5PackedSpec extends AnyFunSuite {

  private val h = 5; private val w = 7

  private def intVars(lo: Int, hi: Int, fill: Option[Float]) = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val span = hi - lo + 1
    val data = Array.tabulate(h * w)(i =>
      if (fill.isDefined && i % 11 == 0) fill.get else (lo + i % span).toFloat)
    (Seq("lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("t2m", Seq("lat", "lon"), data, fill)),
      data)
  }

  // ---- bitstream pinned against hand-worked libhdf5 packing ------

  test("nbit packs precision-12 little-endian shorts MSB-first") {
    // libhdf5 walks bytes begin_i..0: top byte contributes
    // 8-(16-12)%8 = 4 bits, low byte 8 — i.e. each element is its
    // 12-bit value MSB-first. 0xABC ++ 0x123 -> AB C1 23.
    val cd = Array(8, 1, 2, 1, 2, 0, 12, 0)
    val raw = Array[Byte](0xBC.toByte, 0x0A, 0x23, 0x01) // LE shorts 0x0ABC, 0x0123
    val packed = H5Packed.nbitEncode(raw, cd)
    assert(packed.toSeq == Seq(0xAB.toByte, 0xC1.toByte, 0x23.toByte))
    assert(H5Packed.nbitDecode(packed, cd).toSeq == raw.toSeq)
  }

  test("nbit honors a nonzero bit offset") {
    // precision 12 at offset 3: significant bits 3..14 of each short
    val cd = Array(8, 1, 1, 1, 2, 0, 12, 3)
    val value = 0xABC
    val raw = new Array[Byte](2)
    raw(0) = ((value << 3) & 0xff).toByte
    raw(1) = ((value << 3) >> 8).toByte
    val packed = H5Packed.nbitEncode(raw, cd)
    // one element: 12 bits AB C? -> AB C0
    assert(packed.toSeq == Seq(0xAB.toByte, 0xC0.toByte))
    assert(H5Packed.nbitDecode(packed, cd).toSeq == raw.toSeq)
  }

  test("scaleoffset header is minbits(4) + width byte + minval, data at 21") {
    // ints [5, 7, 6]: minval 5, span 3, no fill -> minbits 2;
    // stored 0,2,1 -> bitstream 00 10 01 -> 0x24
    val cd = Array(2, 0, 3, 0, 2, 1, 0, 0)
    val raw = Array[Byte](5, 0, 7, 0, 6, 0)
    val chunk = H5Packed.scaleoffsetEncode(raw, cd)
    assert(chunk.length == 22)
    assert(chunk(0) == 2 && chunk(1) == 0 && chunk(2) == 0 && chunk(3) == 0)
    assert(chunk(4) == 8) // sizeof(unsigned long long)
    assert(chunk(5) == 5 && (6 until 13).forall(chunk(_) == 0))
    assert(chunk(21) == 0x24)
    assert(H5Packed.scaleoffsetDecode(chunk, cd).toSeq == raw.toSeq)
  }

  test("scaleoffset encodes the fill value as the all-ones sentinel") {
    // ints [5, FILL(-9999), 7]: span 3 + sentinel -> minbits 2,
    // stored 0, 3(sentinel), 2
    val cd = Array(2, 0, 3, 0, 2, 1, 0, 1, -9999 & 0xffff)
    val raw = Array[Byte](5, 0, 0xF1.toByte, 0xD8.toByte, 7, 0) // -9999 LE = 0xD8F1
    val chunk = H5Packed.scaleoffsetEncode(raw, cd)
    assert((chunk(21) & 0xff) == ((0 << 6) | (3 << 4) | (2 << 2)))
    assert(H5Packed.scaleoffsetDecode(chunk, cd).toSeq == raw.toSeq)
  }

  test("scaleoffset round-trips negative ints and full-width chunks") {
    val cd = Array(2, 0, 4, 0, 2, 1, 0, 0)
    val raw = java.nio.ByteBuffer.allocate(8)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    Seq(-32768, 32767, -1, 0).foreach(v => raw.putShort(v.toShort))
    val chunk = H5Packed.scaleoffsetEncode(raw.array(), cd)
    // span 65536 -> minbits 16 = full width: raw copy after header
    assert(chunk.length == 21 + 8)
    assert(H5Packed.scaleoffsetDecode(chunk, cd).toSeq == raw.array().toSeq)
  }

  test("scaleoffset D-scaling round-trips floats at the declared factor") {
    val cd = Array(0, 2, 4, 1, 4, 0, 0, 1, java.lang.Float.floatToIntBits(-9999f))
    val vals = Array(1.25f, -0.75f, -9999f, 3.5f)
    val raw = java.nio.ByteBuffer.allocate(16)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(raw.putFloat)
    val out = H5Packed.scaleoffsetDecode(H5Packed.scaleoffsetEncode(raw.array(), cd), cd)
    val bb = java.nio.ByteBuffer.wrap(out).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vals.foreach(v => assert(bb.getFloat == v))
  }

  // ---- end-to-end through the production reader ------------------

  test("an nbit-filtered dataset reads identically to its unfiltered form") {
    val (dims, vs, data) = intVars(-1000, 1000, None) // needs 11 bits + sign
    val bytes = Hdf5.write(dims, vs, nbitPrecision = Some(12))
    val f = Hdf5.read(bytes)
    val t2m = f.datasets.find(_.name == "t2m").get
    assert(t2m.shape == Seq(h, w))
    assert(t2m.data.sameElements(data), "nbit decode diverged")
  }

  test("a scaleoffset-int dataset with fill reads through the NetCDF path") {
    val (dims, vs, data) = intVars(-500, 500, Some(-9999f))
    val bytes = Hdf5.write(dims, vs, scaleOffsetInt = true)
    val f = NetCdf.readAny(bytes)
    val v = f.vars.find(_.name == "t2m").get
    assert(v.fill.contains(-9999f), "int16 _FillValue attribute must survive assembly")
    assert(v.data.toSeq == data.toSeq)
    // the raster path applies the sentinel as NaN
    val r = Formats.NetCdfDecoder.decode(bytes)
    for (i <- 0 until h * w) {
      if (data(i) == -9999f) assert(r.data(i).isNaN, s"fill at $i must be NaN")
      else assert(r.data(i) == data(i), s"at $i")
    }
  }

  test("a scaleoffset D-scaled float dataset ingests end-to-end") {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(h * w)(i => if (i % 11 == 0) -9999f else i * 0.25f)
    val dims = Seq("lat" -> h, "lon" -> w)
    val vs = Seq(
      NetCdf.Variable("lat", Seq("lat"), lat, None),
      NetCdf.Variable("lon", Seq("lon"), lon, None),
      NetCdf.Variable("precip", Seq("lat", "lon"), data, Some(-9999f)))
    val bytes = Hdf5.write(dims, vs, scaleOffsetDScale = Some(2))
    val r = Formats.NetCdfDecoder.decode(bytes)
    assert(r.width == w && r.height == h)
    for (i <- 0 until h * w) {
      if (data(i) == -9999f) assert(r.data(i).isNaN)
      else assert(r.data(i) == data(i))
    }
  }
}
