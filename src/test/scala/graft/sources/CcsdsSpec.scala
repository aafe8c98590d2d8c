package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Round-trips for the CCSDS 121.0-B codec behind GRIB2 template 5.42
  * — the same build-the-fixture-yourself discipline as the JPEG2000
  * and GeoTIFF specs. Lossless: decode(encode(x)) == x exactly. */
class CcsdsSpec extends AnyFunSuite {

  private def roundTrip(samples: Array[Int], n: Int, j: Int = 32,
                        rsi: Int = 128, flags: Int = Ccsds.FlagPreprocess): Unit = {
    val enc = Ccsds.encode(samples, n, j, rsi, flags)
    val back = Ccsds.decode(enc, 0, enc.length, samples.length, n, j, rsi, flags)
    samples.indices.find(i => back(i) != samples(i)).foreach(i =>
      fail(s"n=$n j=$j rsi=$rsi flags=$flags: mismatch at $i: " +
        s"got ${back(i)}, want ${samples(i)}"))
  }

  test("random samples round-trip across resolutions, block sizes, RSIs") {
    val rnd = new Random(17)
    for (n <- Seq(1, 4, 8, 12, 16, 20, 25); j <- Seq(8, 32, 64); rsi <- Seq(1, 4, 128)) {
      val samples = Array.fill(500)(rnd.nextInt(1 << math.min(n, 30)))
      roundTrip(samples, n, j, rsi)
    }
  }

  test("smooth fields round-trip and compress (the GRIB-shaped case)") {
    val n = 16
    val samples = Array.tabulate(10000)(i =>
      (30000 + 20000 * math.sin(i * 0.01)).toInt)
    roundTrip(samples, n)
    val enc = Ccsds.encode(samples, n)
    assert(enc.length < samples.length * n / 8,
      s"smooth field should compress: ${enc.length} vs ${samples.length * n / 8}")
  }

  test("constant and zero fields exercise zero-block runs and ROS") {
    roundTrip(Array.fill(10000)(0), 12)          // all-zero: pure zero runs
    roundTrip(Array.fill(10000)(3071), 12)       // constant: zero deltas after ref
    // segment-boundary shapes: runs that end exactly at 64-block edges
    roundTrip(Array.fill(64 * 32)(7), 8, j = 32, rsi = 128)
    roundTrip(Array.fill(65 * 32 + 5)(7), 8, j = 32, rsi = 128)
    // constant runs SHORTER than a segment (counts 1..4 and >4 paths)
    for (len <- Seq(33, 96, 200, 2048)) roundTrip(Array.fill(len)(9), 8)
    val enc = Ccsds.encode(Array.fill(10000)(0), 12)
    assert(enc.length < 100, s"all-zero stream should be tiny, got ${enc.length}")
  }

  test("sparse impulses round-trip (zero runs broken by spikes)") {
    val rnd = new Random(23)
    val samples = Array.tabulate(8000)(i =>
      if (rnd.nextInt(331) == 0) 1 + rnd.nextInt(4094) else 0)
    roundTrip(samples, 12)
  }

  test("partial tail blocks and tiny inputs round-trip") {
    val rnd = new Random(29)
    for (len <- Seq(1, 2, 7, 31, 33, 63, 127, 129))
      roundTrip(Array.fill(len)(rnd.nextInt(256)), 8)
  }

  test("no-preprocessing and pad-RSI modes round-trip") {
    val rnd = new Random(31)
    val samples = Array.fill(1000)(rnd.nextInt(1 << 10))
    roundTrip(samples, 10, flags = 0)                       // direct coding
    roundTrip(samples, 10, rsi = 8,
      flags = Ccsds.FlagPreprocess | Ccsds.FlagPadRsi)      // byte-aligned RSIs
  }

  test("high-entropy data falls back to uncompressed blocks losslessly") {
    val rnd = new Random(37)
    // alternating extremes defeat the predictor: max-entropy deltas
    val samples = Array.tabulate(2000)(i => if (i % 2 == 0) 0 else 65535)
    roundTrip(samples, 16)
    val enc = Ccsds.encode(samples, 16)
    // the stream cannot blow up beyond ~uncompressed + per-block IDs
    assert(enc.length <= samples.length * 2 + samples.length / 32 * 2 + 16,
      s"worst case should stay near raw size, got ${enc.length}")
  }

  test("unsupported modes fail loudly") {
    val e = intercept[IllegalArgumentException] {
      Ccsds.decode(Array[Byte](0, 0), 0, 2, 10, 8, 32, 128, Ccsds.FlagSigned)
    }
    assert(e.getMessage.contains("signed"))
    val e2 = intercept[IllegalArgumentException] {
      Ccsds.decode(Array[Byte](0, 0), 0, 2, 10, 8, 32, 128, Ccsds.FlagRestricted)
    }
    assert(e2.getMessage.contains("restricted"))
  }

  test("second extension decodes in non-reference blocks") {
    // hand-build a stream: preprocessing OFF so deltas are the samples;
    // one 8-sample block of tiny pairs coded with the second extension
    // (ID 0, sub-ID 1, FS((a+b)(a+b+1)/2 + b) per pair)
    val samples = Array(0, 1, 1, 0, 2, 0, 0, 0)
    val bits = new StringBuilder
    bits.append("000")   // ID 0 (n=8 → 3-bit ID)
    bits.append("1")     // sub-ID: second extension
    for (p <- samples.grouped(2)) {
      val m = (p(0) + p(1)) * (p(0) + p(1) + 1) / 2 + p(1)
      bits.append("0" * m).append("1")
    }
    while (bits.length % 8 != 0) bits.append("0")
    val bytes = bits.toString.grouped(8).map(s => Integer.parseInt(s, 2).toByte).toArray
    val back = Ccsds.decode(bytes, 0, bytes.length, samples.length, 8, 8, 128, 0)
    assert(back.sameElements(samples))
  }
}
