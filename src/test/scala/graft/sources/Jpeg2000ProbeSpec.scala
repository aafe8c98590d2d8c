package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import scala.util.Random

/** Layer-by-layer probes beneath the full-codestream round-trip:
  * isolate the MQ coder and the Tier-1 block coder so a framing bug
  * can't masquerade as an arithmetic-coder bug (and vice versa). */
class Jpeg2000ProbeSpec extends AnyFunSuite {

  test("MQ coder round-trips random bit/context sequences") {
    val rnd = new Random(3)
    for (n <- Seq(1, 2, 7, 64, 500, 5000); trial <- 0 until 3) {
      val bits = Array.fill(n)(rnd.nextInt(2))
      val ctx = Array.fill(n)(rnd.nextInt(Jpeg2000.NumCtx))
      val back = Jpeg2000.mqProbe(bits, ctx)
      assert(back.sameElements(bits), s"MQ round-trip failed at n=$n trial=$trial")
    }
  }

  test("MQ coder round-trips skewed sequences (long MPS runs)") {
    val rnd = new Random(5)
    for (pOne <- Seq(0.001, 0.05, 0.5, 0.95, 0.999)) {
      val n = 3000
      val bits = Array.fill(n)(if (rnd.nextDouble() < pOne) 1 else 0)
      val ctx = Array.fill(n)(rnd.nextInt(Jpeg2000.NumCtx))
      val back = Jpeg2000.mqProbe(bits, ctx)
      assert(back.sameElements(bits), s"MQ round-trip failed at pOne=$pOne")
    }
  }

  test("T1 block coder round-trips random blocks, all bands and shapes") {
    val rnd = new Random(9)
    for (band <- 0 to 3;
         (w, h) <- Seq((1, 1), (4, 4), (3, 7), (16, 16), (64, 64), (33, 5))) {
      val coeffs = Array.fill(w * h)(rnd.nextInt(4096) - 2048)
      val back = Jpeg2000.t1Probe(coeffs, w, h, band)
      coeffs.indices.find(i => back(i) != coeffs(i)).foreach(i =>
        fail(s"T1 band=$band ${w}x$h mismatch at $i: got ${back(i)}, want ${coeffs(i)}"))
    }
  }

  test("T1 block coder round-trips sparse blocks (run-length mode)") {
    val rnd = new Random(13)
    for (band <- 0 to 3) {
      val w = 64; val h = 64
      val coeffs = Array.fill(w * h)(
        if (rnd.nextInt(61) == 0) rnd.nextInt(512) - 256 else 0)
      val back = Jpeg2000.t1Probe(coeffs, w, h, band)
      assert(back.sameElements(coeffs), s"T1 sparse band=$band failed")
    }
  }
}
