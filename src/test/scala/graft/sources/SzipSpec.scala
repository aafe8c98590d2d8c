package graft.sources

import graft.SparkSpec

/** HDF5 szip filter (id 4) — decoded through the self-contained CCSDS
  * extended-Rice coder. Fixtures are writer-emitted (the established
  * byte-crafted discipline: no szip-capable C library exists in this
  * environment), so the spec proves the full file path — filter
  * pipeline client data → per-chunk Rice decode → int16 samples —
  * round-trips bit-exactly, and that every unsupported szip variant
  * fails loudly by name. */
class SzipSpec extends SparkSpec {

  private val w = 7; private val h = 5; private val nT = 3

  /** Integer-valued field with zero-runs (exercises zero-block coding),
    * ramps (k-split) and jumps (uncompressed blocks). */
  private def field(i: Int): Float = (i % 97) match {
    case m if m < 20 => 100f                // constant run → zero blocks
    case m if m < 60 => (m * 13 % 512).toFloat // small deltas → k-split
    case m => (m * 517 % 32768).toFloat     // wild jumps → uncompressed
  }

  private def fixture(): Array[Byte] = {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(nT * h * w)(field)
    Hdf5.write(
      Seq("time" -> nT, "lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("precip", Seq("time", "lat", "lon"), data, None)),
      szip = true)
  }

  test("szip-filtered int16 chunks round-trip bit-exactly through the file path") {
    val f = Hdf5.read(fixture())
    val precip = f.datasets.find(_.name == "precip").get
    assert(precip.shape == Seq(nT, h, w))
    val expected = Array.tabulate(nT * h * w)(field)
    assert(precip.data.sameElements(expected))
    // the sibling coordinate variables stay plain f32
    assert(f.datasets.find(_.name == "lat").get.data.sameElements(
      Array(40f, 30f, 20f, 10f, 0f)))
  }

  test("raw-buffer round-trip across modes, block sizes and byte orders") {
    val rnd = new scala.util.Random(42)
    for {
      nn <- Seq(0, Szip.MaskNn)
      msb <- Seq(Szip.MaskLsb, Szip.MaskMsb)
      ppb <- Seq(8, 16, 32)
      count <- Seq(ppb, 64, 97) // whole block, whole scanlines, ragged tail
    } {
      val cd = Array(Szip.MaskRaw | nn | msb, 16, ppb, ppb * 2)
      val raw = new Array[Byte](count * 2)
      val samples = Array.tabulate(count)(i =>
        if (i % 13 < 5) 7 else rnd.nextInt(0x8000))
      samples.zipWithIndex.foreach { case (v, i) =>
        if (msb == Szip.MaskMsb) {
          raw(2 * i) = (v >> 8).toByte; raw(2 * i + 1) = v.toByte
        } else {
          raw(2 * i) = v.toByte; raw(2 * i + 1) = (v >> 8).toByte
        }
      }
      val enc = Szip.encode(raw, cd, 2)
      val dec = Szip.decode(enc, cd, raw.length, 2)
      assert(dec.sameElements(raw), s"nn=$nn msb=$msb ppb=$ppb count=$count")
    }
  }

  test("8-bit samples round-trip") {
    val cd = Array(Szip.MaskRaw | Szip.MaskNn | Szip.MaskMsb, 8, 8, 16)
    val raw = Array.tabulate(50)(i => ((i * 7) % 256).toByte)
    assert(Szip.decode(Szip.encode(raw, cd, 1), cd, raw.length, 1)
      .sameElements(raw))
  }

  test("24-bit samples round-trip") {
    val cd = Array(Szip.MaskRaw | Szip.MaskNn | Szip.MaskLsb, 24, 16, 32)
    val rnd = new scala.util.Random(7)
    val raw = new Array[Byte](70 * 3)
    (0 until 70).foreach { i =>
      val v = if (i % 9 < 4) 0x123456 else rnd.nextInt(1 << 24)
      raw(3 * i) = v.toByte; raw(3 * i + 1) = (v >> 8).toByte
      raw(3 * i + 2) = (v >> 16).toByte
    }
    assert(Szip.decode(Szip.encode(raw, cd, 3), cd, raw.length, 3)
      .sameElements(raw))
  }

  test("32-bit samples round-trip through the byte-plane recode") {
    // float bit patterns (smooth field + NaNs + negatives): the recode
    // must restore the raw bytes verbatim whatever they encode
    val rnd = new scala.util.Random(11)
    for (nn <- Seq(0, Szip.MaskNn); msb <- Seq(Szip.MaskLsb, Szip.MaskMsb);
         count <- Seq(16, 64, 97)) {
      val cd = Array(Szip.MaskRaw | nn | msb, 32, 16, 32)
      val bb = java.nio.ByteBuffer.allocate(count * 4)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      (0 until count).foreach { i =>
        bb.putFloat(if (i % 17 == 3) Float.NaN
          else if (i % 5 == 0) -273.15f + i
          else (math.sin(i * 0.3) * 1e4).toFloat + rnd.nextFloat())
      }
      val raw = bb.array()
      val enc = Szip.encode(raw, cd, 4)
      assert(Szip.decode(enc, cd, raw.length, 4).sameElements(raw),
        s"nn=$nn msb=$msb count=$count")
    }
  }

  test("szip-filtered FLOAT chunks (32 bpp) round-trip through the file path") {
    val lat = Array(40f, 30f, 20f, 10f, 0f)
    val lon = Array(-30f, -20f, -10f, 0f, 10f, 20f, 30f)
    val data = Array.tabulate(nT * h * w)(i =>
      (math.cos(i * 0.07) * 50.0 - 3.25).toFloat) // fractional, negative
    val f = Hdf5.read(Hdf5.write(
      Seq("time" -> nT, "lat" -> h, "lon" -> w),
      Seq(
        NetCdf.Variable("lat", Seq("lat"), lat, None),
        NetCdf.Variable("lon", Seq("lon"), lon, None),
        NetCdf.Variable("sst", Seq("time", "lat", "lon"), data, None)),
      szip32 = true))
    val sst = f.datasets.find(_.name == "sst").get
    assert(sst.shape == Seq(nT, h, w))
    assert(sst.data.sameElements(data))
    assert(f.datasets.find(_.name == "lat").get.data.sameElements(lat))
  }

  test("corrupt szip streams decode or throw — never hang, never huge allocs") {
    val cd = Array(Szip.MaskRaw | Szip.MaskNn | Szip.MaskMsb, 16, 16, 32)
    val raw = Array.tabulate(128)(i => ((i * 31) % 256).toByte)
    val enc = Szip.encode(raw, cd, 2)
    val rnd = new scala.util.Random(3)
    var threw = 0
    for (_ <- 1 to 60) {
      val bad = enc.clone()
      bad(rnd.nextInt(bad.length)) = rnd.nextInt(256).toByte
      try { Szip.decode(bad, cd, raw.length, 2); () }
      catch { case _: IllegalArgumentException | _: IllegalStateException => threw += 1 }
    }
    // truncation must also be loud
    intercept[IllegalArgumentException](
      Szip.decode(enc.take(enc.length / 3), cd, raw.length, 2))
    assert(threw >= 0) // completion without hangs/OOM is the property
  }

  test("unsupported szip variants fail loudly by name") {
    def err(cd: Array[Int], elemSize: Int = 2): String =
      intercept[IllegalArgumentException](
        Szip.decode(Array[Byte](0), cd, 64, elemSize)).getMessage
    assert(err(Array(Szip.MaskRaw | Szip.MaskEc | Szip.MaskMsb, 12, 16, 32))
      .contains("bits-per-pixel 12"))
    // 32 bpp demands a 4-byte datatype (the byte-plane recode)
    assert(err(Array(Szip.MaskRaw | Szip.MaskEc | Szip.MaskMsb, 32, 16, 32), 2)
      .contains("2-byte datatype"))
    assert(err(Array(Szip.MaskRaw | Szip.MaskChip | Szip.MaskMsb, 16, 16, 32))
      .contains("CHIP"))
    assert(err(Array(Szip.MaskRaw | Szip.MaskMsb, 16, 10, 32))
      .contains("pixels-per-block"))
    assert(err(Array(Szip.MaskRaw | Szip.MaskMsb, 16, 16, 40))
      .contains("pixels-per-scanline"))
    // heap blocks pass no raw size — szip there is a loud no
    assert(intercept[IllegalArgumentException](
      Szip.decode(Array[Byte](0), Array(Szip.MaskRaw | Szip.MaskMsb, 16, 16, 32),
        -1, 2)).getMessage.contains("unfiltered chunk size"))
  }
}
