package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** The JPEG2000 codec is validated the same way GeoTiffSpec validates
  * COGs: the spec builds real codestreams itself and round-trips them
  * bit-exactly (lossless 5/3 means decode(encode(x)) == x, no
  * tolerance). Shapes cover the partition edge cases — non-multiples
  * of the code-block size, odd dims (ceil/floor subband splits),
  * single row/column (degenerate DWT), and multi-level pyramids. */
class Jpeg2000Spec extends AnyFunSuite {

  private def roundTrip(w: Int, h: Int, depth: Int, gen: (Int, Int) => Int): Unit = {
    val samples = Array.tabulate(w * h)(i => gen(i % w, i / w))
    val bytes = Jpeg2000.encode(samples, w, h, depth)
    val img = Jpeg2000.decode(bytes, 0, bytes.length)
    assert(img.width == w && img.height == h && img.depth == depth)
    assert(!img.signed)
    samples.indices.find(i => img.samples(i) != samples(i)).foreach(i =>
      fail(s"${w}x$h depth=$depth: first mismatch at $i: " +
        s"got ${img.samples(i)}, want ${samples(i)}"))
  }

  test("DWT 5/3 forward/inverse round-trips exactly, all parities") {
    val rnd = new Random(7)
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 3), (5, 8), (8, 5), (7, 7),
                       (64, 64), (65, 33), (1, 17), (17, 1), (100, 3))) {
      val a = Array.fill(w * h)(rnd.nextInt(65536) - 32768)
      val orig = a.clone()
      val levels = {
        var l = 0; var lw = w; var lh = h
        while (l < 5 && lw >= 2 && lh >= 2) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; l += 1 }
        l
      }
      Jpeg2000.dwtForward(a, w, h, levels)
      Jpeg2000.dwtInverse(a, w, h, levels)
      assert(a.sameElements(orig), s"DWT round-trip failed for ${w}x$h levels=$levels")
    }
  }

  test("DWT decorrelates a constant raster to a single LL value") {
    val w = 16; val h = 16
    val a = Array.fill(w * h)(1000)
    Jpeg2000.dwtForward(a, w, h, 2)
    // all high-band coefficients of a constant signal are exactly zero
    val ll = for (y <- 0 until 4; x <- 0 until 4) yield a(y * w + x)
    assert(ll.forall(_ == 1000), "LL of a constant raster keeps the constant (5/3 DC gain 1)")
    val rest = for (y <- 0 until h; x <- 0 until w; if x >= 4 || y >= 4) yield a(y * w + x)
    assert(rest.forall(_ == 0), "high bands of a constant raster are zero")
  }

  test("full codestream round-trips: random rasters across shapes and depths") {
    val rnd = new Random(42)
    for ((w, h, depth) <- Seq((1, 1, 8), (3, 2, 4), (7, 5, 8), (16, 16, 12),
                              (64, 64, 8), (65, 64, 10), (100, 80, 16),
                              (257, 129, 9), (1, 40, 8), (40, 1, 8)))
      roundTrip(w, h, depth, (_, _) => rnd.nextInt(1 << depth))
  }

  test("full codestream round-trips: smooth field (the GRIB-shaped case)") {
    // smooth fields are what 5.40 exists for: the wavelet concentrates
    // energy in LL and the stream compresses well below raw packing
    val w = 144; val h = 73 // a 2.5° global grid shape
    val depth = 12
    def field(x: Int, y: Int): Int =
      (2048 + 1500 * math.sin(x * 0.1) * math.cos(y * 0.15)).toInt
    roundTrip(w, h, depth, field)
    val samples = Array.tabulate(w * h)(i => field(i % w, i / w))
    val bytes = Jpeg2000.encode(samples, w, h, depth)
    val rawBits = w * h * depth / 8
    assert(bytes.length < rawBits,
      s"smooth field should compress below raw packing: ${bytes.length} vs $rawBits bytes")
  }

  test("full codestream round-trips: constant and all-zero rasters") {
    roundTrip(33, 21, 8, (_, _) => 0)      // every block excluded
    roundTrip(33, 21, 8, (_, _) => 255)    // max value
    roundTrip(64, 64, 1, (x, y) => (x + y) % 2) // 1-bit checkerboard
  }

  test("full codestream round-trips: sparse impulses (run-length mode stress)") {
    // mostly-zero blocks exercise the cleanup pass's run-length coding
    // and the uniform-context position decode on every stripe
    val rnd = new Random(11)
    roundTrip(128, 96, 10,
      (x, y) => if (rnd.nextInt(97) == 0) 1 + rnd.nextInt(1023) else 0)
  }

  test("decoder handles foreign stream shapes: small/asymmetric code-blocks, SOP/EPH") {
    val rnd = new Random(23)
    val w = 100; val h = 80; val depth = 10
    val samples = Array.tabulate(w * h)(_ => rnd.nextInt(1 << depth))
    for ((cbx, cby, sop, eph) <- Seq((4, 4, false, false), (5, 3, false, false),
                                     (6, 6, true, false), (6, 6, false, true),
                                     (4, 6, true, true))) {
      val bytes = Jpeg2000.encode(samples, w, h, depth,
        cbExpX = cbx, cbExpY = cby, sop = sop, eph = eph)
      val img = Jpeg2000.decode(bytes, 0, bytes.length)
      assert(img.samples.sameElements(samples),
        s"round-trip failed for cb=2^$cbx×2^$cby sop=$sop eph=$eph")
    }
  }

  test("decoder rejects streams outside the GRIB lossless profile") {
    val samples = Array.tabulate(64)(_ % 16)
    val ok = Jpeg2000.encode(samples, 8, 8, 4)
    // flip the transform byte (offset: find COD SPcod transform = last
    // byte of COD segment) from 5/3 (1) to 9/7 (0)
    val cod = {
      var i = 0
      while (!((ok(i) & 0xFF) == 0xFF && (ok(i + 1) & 0xFF) == 0x52)) i += 1
      i
    }
    val lcod = ((ok(cod + 2) & 0xFF) << 8) | (ok(cod + 3) & 0xFF)
    val lossy = ok.clone()
    lossy(cod + 2 + lcod - 1) = 0 // transform byte: 9/7 irreversible
    val e = intercept[IllegalArgumentException] {
      Jpeg2000.decode(lossy, 0, lossy.length)
    }
    assert(e.getMessage.contains("9/7"), s"wrong failure: ${e.getMessage}")
    // truncated stream (no SOC) rejects
    val e2 = intercept[IllegalArgumentException] {
      Jpeg2000.decode(ok, 2, ok.length - 2)
    }
    assert(e2.getMessage.contains("SOC"))
  }

  test("codestream markers sit where a foreign decoder expects them") {
    val samples = Array.tabulate(100)(i => i * 40 % 4096)
    val b = Jpeg2000.encode(samples, 10, 10, 12)
    def u16(i: Int) = ((b(i) & 0xFF) << 8) | (b(i + 1) & 0xFF)
    assert(u16(0) == 0xFF4F, "SOC first")
    assert(u16(2) == 0xFF51, "SIZ second")
    assert(u16(b.length - 2) == 0xFFD9, "EOC last")
    // SIZ geometry fields
    def u32(i: Int) = ((b(i) & 0xFF) << 24) | ((b(i + 1) & 0xFF) << 16) |
      ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
    assert(u32(8) == 10 && u32(12) == 10, "Xsiz/Ysiz")
    assert(u16(40) == 1, "single component")
    assert((b(42) & 0xFF) == 11, "Ssiz = depth-1, unsigned")
  }

  // ---- irreversible 9/7 (lossy 5.40 profile) -----------------------

  private def smoothField(w: Int, h: Int, depth: Int): Array[Int] = {
    val mid = 1 << (depth - 1)
    Array.tabulate(w * h) { i =>
      val x = i % w; val y = i / w
      (mid + (mid - 1) * math.sin(x * 0.11) * math.cos(y * 0.17)).toInt
    }
  }

  private def maxErr(a: Array[Int], b: Array[Int]): Int =
    a.zip(b).map { case (x, y) => math.abs(x - y) }.max

  test("DWT 9/7 forward/inverse round-trips to machine precision, all parities") {
    val rnd = new Random(31)
    for ((w, h) <- Seq((1, 1), (2, 2), (3, 3), (5, 8), (8, 5), (7, 7),
                       (64, 64), (65, 33), (1, 17), (17, 1), (100, 3))) {
      val a = Array.fill(w * h)(rnd.nextDouble() * 65536 - 32768)
      val orig = a.clone()
      val levels = {
        var l = 0; var lw = w; var lh = h
        while (l < 5 && lw >= 2 && lh >= 2) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; l += 1 }
        l
      }
      Jpeg2000.dwtForward97(a, w, h, levels)
      Jpeg2000.dwtInverse97(a, w, h, levels)
      val err = a.zip(orig).map { case (x, y) => math.abs(x - y) }.max
      assert(err < 1e-7, s"9/7 round-trip error $err for ${w}x$h levels=$levels")
    }
  }

  test("DWT 9/7 normalization matches the standard: DC gain 1, high bands vanish") {
    // the analysis lowpass of Table F.4 sums to 1.0 — a constant
    // raster must survive each level UNSCALED in LL and zero out every
    // high band (this pins the even×1/K, odd×K scaling convention;
    // openjpeg's internal half-scale high bands would fail it)
    val w = 16; val h = 16
    val a = Array.fill(w * h)(1000.0)
    Jpeg2000.dwtForward97(a, w, h, 2)
    for (y <- 0 until 4; x <- 0 until 4)
      assert(math.abs(a(y * w + x) - 1000.0) < 1e-9, s"LL($x,$y) = ${a(y * w + x)}")
    for (y <- 0 until h; x <- 0 until w; if x >= 4 || y >= 4)
      assert(math.abs(a(y * w + x)) < 1e-9, s"high band ($x,$y) = ${a(y * w + x)}")
  }

  test("lossy near-lossless: quantShift 0 reconstructs within ±2 everywhere") {
    // Δ_b = 1 per subband: error ≤ ½ per kept coefficient (mid-bin),
    // up to Δ for sub-step coefficients quantized to zero; synthesis
    // sums a handful of band contributions per pixel → a 2-count
    // ceiling on smooth fields (observed max 2)
    val w = 144; val h = 73; val depth = 12
    val samples = smoothField(w, h, depth)
    val bytes = Jpeg2000.encode(samples, w, h, depth, irreversible = true)
    val img = Jpeg2000.decode(bytes, 0, bytes.length)
    assert(img.width == w && img.height == h)
    assert(maxErr(img.samples, samples) <= 2,
      s"near-lossless error ${maxErr(img.samples, samples)}")
  }

  test("lossy rate/distortion: coarser steps shrink the stream, error tracks Δ") {
    val w = 144; val h = 73; val depth = 12
    val samples = smoothField(w, h, depth)
    val lossless = Jpeg2000.encode(samples, w, h, depth)
    var prevLen = Int.MaxValue
    for (qs <- Seq(2, 4, 6)) {
      val bytes = Jpeg2000.encode(samples, w, h, depth,
        irreversible = true, quantShift = qs)
      val img = Jpeg2000.decode(bytes, 0, bytes.length)
      val err = maxErr(img.samples, samples)
      // error scales with the step but synthesis spreads it: allow a
      // small constant factor over Δ = 2^qs
      assert(err <= (3 << qs), s"qs=$qs: error $err exceeds ${3 << qs}")
      assert(err > 0, s"qs=$qs should actually lose information here")
      assert(bytes.length < prevLen,
        s"qs=$qs stream ${bytes.length} not smaller than previous $prevLen")
      prevLen = bytes.length
    }
    assert(prevLen < lossless.length,
      "coarse lossy must compress below the lossless stream")
  }

  test("lossy QCD styles: expounded and derived both decode, derived transmits one pair") {
    val w = 100; val h = 80; val depth = 10
    val samples = smoothField(w, h, depth)
    val exp = Jpeg2000.encode(samples, w, h, depth,
      irreversible = true, quantShift = 2)
    val der = Jpeg2000.encode(samples, w, h, depth,
      irreversible = true, quantShift = 2, qcdDerived = true)
    // locate QCD in both and check style + length
    def qcd(b: Array[Byte]): (Int, Int) = {
      var i = 0
      while (!((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0x5C)) i += 1
      val l = ((b(i + 2) & 0xFF) << 8) | (b(i + 3) & 0xFF)
      (b(i + 4) & 0x1F, l)
    }
    assert(qcd(exp)._1 == 2, "expounded style")
    assert(qcd(der) == ((1, 5)), "derived: style 1, Lqcd = 3 + one 16-bit pair")
    val imgE = Jpeg2000.decode(exp, 0, exp.length)
    val imgD = Jpeg2000.decode(der, 0, der.length)
    assert(maxErr(imgE.samples, samples) <= 12, "expounded error bound")
    // derived steps grow with decomposition depth on the fine bands —
    // coarser overall, still bounded
    assert(maxErr(imgD.samples, samples) <= (3 << 7), "derived error bound")
  }

  test("lossy mantissa path: μ stretches the step by 1 + μ/2048") {
    val w = 64; val h = 64; val depth = 12
    val samples = smoothField(w, h, depth)
    val m0 = Jpeg2000.encode(samples, w, h, depth,
      irreversible = true, quantShift = 3)
    val m1536 = Jpeg2000.encode(samples, w, h, depth,
      irreversible = true, quantShift = 3, quantMant = 1536)
    val i0 = Jpeg2000.decode(m0, 0, m0.length)
    val i1 = Jpeg2000.decode(m1536, 0, m1536.length)
    // μ=1536 → Δ×1.75: stream must not grow, both stay bounded
    assert(m1536.length <= m0.length)
    assert(maxErr(i0.samples, samples) <= (3 << 3))
    assert(maxErr(i1.samples, samples) <= (7 << 3))
  }

  test("lossy constant raster survives within the mid-bin offset") {
    val w = 33; val h = 21
    val samples = Array.fill(w * h)(200)
    val bytes = Jpeg2000.encode(samples, w, h, 8, irreversible = true)
    val img = Jpeg2000.decode(bytes, 0, bytes.length)
    // LL carries the exact constant; mid-bin reconstruction may sit
    // half a step high, so the rounded output is within ±1
    assert(maxErr(img.samples, samples) <= 1)
  }

  test("crossed transform/quantization combinations fail loudly") {
    val samples = smoothField(32, 32, 8)
    // 9/7 stream whose QCD style byte is patched to 0 (exponents-only)
    val b = Jpeg2000.encode(samples, 32, 32, 8, irreversible = true, quantShift = 1)
    var i = 0
    while (!((b(i) & 0xFF) == 0xFF && (b(i + 1) & 0xFF) == 0x5C)) i += 1
    val bad = b.clone()
    bad(i + 4) = (bad(i + 4) & 0xE0).toByte // keep guard bits, style → 0
    val e = intercept[IllegalArgumentException](Jpeg2000.decode(bad, 0, bad.length))
    assert(e.getMessage.contains("mismatch"), s"wrong failure: ${e.getMessage}")
  }
}
