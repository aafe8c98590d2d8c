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
}
