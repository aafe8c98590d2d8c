package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JpegCodec.Image

/** Baseline JPEG codec (T.81): round-trips at the near-lossless q=1
  * setting, chroma subsampling, restart-marker resync, abbreviated
  * (JPEGTables-style) streams, and the fail-loud guards. */
class JpegCodecSpec extends AnyFunSuite {

  private def grayImage(w: Int, h: Int, f: (Int, Int) => Int): Image =
    Image(w, h, 1, Array.tabulate(w * h)(i => f(i % w, i / w).toByte))

  private def rgbImage(w: Int, h: Int, f: (Int, Int) => (Int, Int, Int)): Image = {
    val d = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val (r, g, b) = f(x, y)
      d((y * w + x) * 3) = r.toByte; d((y * w + x) * 3 + 1) = g.toByte
      d((y * w + x) * 3 + 2) = b.toByte
    }
    Image(w, h, 3, d)
  }

  private def maxErr(a: Array[Byte], b: Array[Byte]): Int = {
    require(a.length == b.length, s"length ${a.length} != ${b.length}")
    a.zip(b).map { case (x, y) => math.abs((x & 0xff) - (y & 0xff)) }.max
  }

  test("grayscale round-trip is near-lossless at q=1") {
    val img = grayImage(37, 23, (x, y) => (x * 7 + y * 13 + (x * y) % 31) % 256)
    val out = JpegCodec.decode(JpegCodec.encode(img))
    assert(out.width == 37 && out.height == 23 && out.comps == 1)
    assert(maxErr(img.data, out.data) <= 1)
  }

  test("smooth RGB 4:4:4 round-trip stays within color-transform rounding") {
    val img = rgbImage(32, 16, (x, y) => (x * 4, 128 + y * 4, 255 - x * 4))
    val out = JpegCodec.decode(JpegCodec.encode(img))
    assert(out.comps == 3)
    assert(maxErr(img.data, out.data) <= 3) // RGB<->YCbCr double rounding
  }

  test("4:2:0 subsampling decodes with bounded chroma error on smooth fields") {
    val img = rgbImage(48, 32, (x, y) => (x * 2, y * 3, 128))
    val out = JpegCodec.decode(JpegCodec.encode(img, subsample420 = true))
    assert(out.width == 48 && out.height == 32)
    assert(maxErr(img.data, out.data) <= 8) // box downsample on a gradient
  }

  test("restart markers resync and round-trip") {
    val img = grayImage(64, 40, (x, y) => (x * 11 + y * 5) % 256)
    val enc = JpegCodec.encode(img, restartInterval = 3)
    // the stream actually contains RST markers
    val hasRst = enc.sliding(2).exists(p =>
      (p(0) & 0xff) == 0xff && (p(1) & 0xff) >= 0xd0 && (p(1) & 0xff) <= 0xd7)
    assert(hasRst, "encoder emitted no RST markers")
    assert(maxErr(img.data, JpegCodec.decode(enc).data) <= 1)
  }

  test("abbreviated streams: tables stream seeds the scan decode") {
    val img = grayImage(20, 20, (x, y) => (x * x + y * 17) % 256)
    val (tables, scan) = JpegCodec.encodeStreams(img, abbreviated = true)
    // the scan alone has no DQT/DHT and must fail loudly
    val e = intercept[Exception](JpegCodec.decode(scan))
    assert(e.getMessage.contains("undefined table"))
    val t = new JpegCodec.Tables
    JpegCodec.parseTables(tables, t)
    assert(maxErr(img.data, JpegCodec.decode(scan, pre = Some(t)).data) <= 1)
  }

  test("byte stuffing survives blocks that encode 0xFF bytes") {
    // a harsh checkerboard maximizes large coefficients and stuffing odds
    val img = grayImage(32, 32, (x, y) => if ((x + y) % 2 == 0) 255 else 0)
    val enc = JpegCodec.encode(img)
    val dec = JpegCodec.decode(enc)
    assert(maxErr(img.data, dec.data) <= 2)
  }

  test("odd dimensions pad to MCU and crop back") {
    for ((w, h) <- Seq((1, 1), (7, 9), (9, 7), (17, 15))) {
      val img = grayImage(w, h, (x, y) => (x * 31 + y * 67) % 256)
      val out = JpegCodec.decode(JpegCodec.encode(img))
      assert(out.width == w && out.height == h, s"dims for ${w}x$h")
      assert(maxErr(img.data, out.data) <= 1, s"error for ${w}x$h")
    }
  }

  test("coarser quantization degrades gracefully, still decodes") {
    val img = grayImage(24, 24, (x, y) => (x * 9 + y * 4) % 256)
    val out = JpegCodec.decode(JpegCodec.encode(img, quant = 8))
    assert(maxErr(img.data, out.data) <= 24) // lossy but sane
  }

  test("colorTransform=false returns raw components (TIFF photometric-2 RGB)") {
    val img = rgbImage(16, 8, (x, y) => (x * 10, 100, y * 20))
    val enc = JpegCodec.encode(img) // encoder forward-transforms to YCbCr
    val raw = JpegCodec.decode(enc, colorTransform = false)
    val rgb = JpegCodec.decode(enc)
    // raw differs from rgb (it is YCbCr), and manual conversion matches
    val o = 3 * 5
    val yv = raw.data(o) & 0xff; val cb = raw.data(o + 1) & 0xff; val cr = raw.data(o + 2) & 0xff
    val r = math.max(0, math.min(255, math.round(yv + 1.402 * (cr - 128)).toInt))
    assert(math.abs(r - (rgb.data(o) & 0xff)) <= 1)
  }

  test("progressive and multi-scan inputs fail loudly") {
    val img = grayImage(8, 8, (x, y) => x * 8 + y)
    val enc = JpegCodec.encode(img)
    // flip SOF0 (0xFFC0) to SOF2 (progressive)
    val prog = enc.clone()
    val sofAt = prog.indices.find(i =>
      (prog(i) & 0xff) == 0xff && (prog(i + 1) & 0xff) == 0xc0).get
    prog(sofAt + 1) = 0xc2.toByte
    val e = intercept[IllegalArgumentException](JpegCodec.decode(prog))
    assert(e.getMessage.contains("progressive"))
  }

  test("truncated scan data fails loudly") {
    val img = grayImage(16, 16, (x, y) => (x * 3 + y) % 256)
    val enc = JpegCodec.encode(img)
    val cut = java.util.Arrays.copyOfRange(enc, 0, enc.length - 12)
    val e = intercept[Exception](JpegCodec.decode(cut))
    assert(e.getMessage.toLowerCase.contains("truncated"))
  }

  test("DC gradient across blocks proves the differential predictor") {
    // constant-per-block values stress DC diffs exclusively
    val img = grayImage(64, 8, (x, _) => (x / 8) * 30)
    assert(maxErr(img.data, JpegCodec.decode(JpegCodec.encode(img)).data) <= 1)
  }
}
