package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Self-contained CCSDS 121.0-B lossless codec (the "AEC"/Rice coder
  * libaec implements) for GRIB2 template 5.42 — ECMWF's default
  * packing for its open data and the modern replacement for 5.40 in
  * the operational feeds (reference decode path: eccodes → libaec,
  * georiva formats/grib.py:122-230).
  *
  * Scope is the GRIB profile: unsigned n-bit samples (n ≤ 25), MSB
  * bit-packing, unit-delay predictor preprocessing with reference
  * samples every RSI blocks, block sizes 8/16/32/64, and the coding
  * options the standard defines —
  *
  *  - zero-block runs (FS-coded count, remainder-of-segment marker,
  *    64-block segments),
  *  - k-split: FS-coded high parts then k split LSBs per sample,
  *  - uncompressed (all-ones option ID, n bits per sample),
  *  - second extension (paired samples, FS-coded (a+b)(a+b+1)/2+b) —
  *    decode-only, and only in non-reference blocks; a
  *    second-extension REFERENCE block (a corner the standard leaves
  *    to implementations) fails loudly rather than guessing libaec's
  *    pairing.
  *
  * The encoder picks per block the cheapest of zero-run / k-split /
  * uncompressed (never second extension — always legal, simpler to
  * verify) so specs can round-trip realistic streams bit-exactly.
  *
  * Written from the public CCSDS 121.0-B recommendation; no libaec
  * code. Flags follow the GRIB template's CCSDS-options mask: bit 1
  * signed (unsupported), bit 8 preprocessing, bit 16 restricted
  * (unsupported), bit 32 pad-RSI (byte-align each reference-sample
  * interval). The MSB/3-byte bits describe libaec's UNCOMPRESSED i/o
  * layout, not the coded stream, and are ignored here.
  */
object Ccsds {

  final val FlagSigned = 1
  final val FlagPreprocess = 8
  final val FlagRestricted = 16
  final val FlagPadRsi = 32

  private final val SegmentBlocks = 64

  private def idBits(n: Int): Int = if (n <= 8) 3 else if (n <= 16) 4 else 5

  private final class BitWriter {
    val out = ArrayBuffer[Byte]()
    private var acc = 0L
    private var nb = 0
    def put(v: Long, bits: Int): Unit = {
      var i = bits - 1
      while (i >= 0) {
        acc = (acc << 1) | ((v >> i) & 1L); nb += 1
        if (nb == 8) { out += acc.toByte; acc = 0L; nb = 0 }
        i -= 1
      }
    }
    /** FS codeword: m zeros then a one. */
    def fs(m: Int): Unit = { var i = 0; while (i < m) { put(0, 1); i += 1 }; put(1, 1) }
    def alignByte(): Unit = if (nb > 0) put(0, 8 - nb)
    def finish(): Array[Byte] = { alignByte(); out.toArray }
  }

  private final class BitReader(data: Array[Byte], start: Int, end: Int) {
    private var pos = start
    private var acc = 0
    private var nb = 0
    def bit(): Int = {
      if (nb == 0) {
        require(pos < end, "CCSDS stream truncated")
        acc = data(pos) & 0xFF; pos += 1; nb = 8
      }
      nb -= 1
      (acc >> nb) & 1
    }
    def bits(n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    def fs(): Int = {
      var m = 0
      while (bit() == 0) {
        m += 1
        require(m <= 100000, "runaway FS codeword (corrupt CCSDS stream)")
      }
      m
    }
    def alignByte(): Unit = { nb = 0 }
  }

  /** Map a prediction error into a non-negative code (CCSDS 121.0-B
    * §4.2, the windowed mapper): θ bounds the short codes to errors
    * reachable from the predicted value. */
  private def mapError(e: Int, pred: Int, maxVal: Int): Int = {
    val theta = math.min(pred, maxVal - pred)
    if (e >= 0 && e <= theta) 2 * e
    else if (e < 0 && e >= -theta) -2 * e - 1
    else theta + math.abs(e)
  }

  private def unmapError(d: Int, pred: Int, maxVal: Int): Int = {
    val theta = math.min(pred, maxVal - pred)
    if (d <= 2 * theta) {
      if ((d & 1) == 0) d / 2 else -(d + 1) / 2
    } else {
      // beyond the window only ONE sign keeps the sample in range
      // (mag > theta = min(pred, maxVal - pred) rules the other out)
      val mag = d - theta
      if (pred + mag <= maxVal) mag
      else if (pred - mag >= 0) -mag
      else throw new IllegalArgumentException(
        "mapped delta reaches no valid sample (corrupt CCSDS stream)")
    }
  }

  /** Encode `samples` (non-negative, < 2^n) with preprocessing.
    * `j` = block size, `rsi` = blocks per reference-sample interval. */
  def encode(samples: Array[Int], n: Int, j: Int = 32, rsi: Int = 128,
             flags: Int = FlagPreprocess): Array[Byte] = {
    require(n >= 1 && n <= 25, s"unsupported sample resolution $n")
    require(Set(8, 16, 32, 64).contains(j), s"bad block size $j")
    require(rsi >= 1 && rsi <= 0xFFFF, s"bad RSI $rsi")
    require((flags & FlagSigned) == 0 && (flags & FlagRestricted) == 0,
      "signed/restricted modes not supported")
    val preprocess = (flags & FlagPreprocess) != 0
    val maxVal = (1 << n) - 1
    val bw = new BitWriter
    val idW = idBits(n)
    val uncompressedId = (1 << idW) - 1
    // k-split IDs are 1..idMaxK+... k = ID-1 must keep FS lengths sane:
    // legal k range 0..n-2 (k = n-1 never beats uncompressed)
    val kMax = math.max(0, math.min(n - 2, uncompressedId - 2))

    var i = 0
    var blockInRsi = 0
    var pred = 0
    while (i < samples.length) {
      val isRsiStart = blockInRsi == 0
      if (isRsiStart && (flags & FlagPadRsi) != 0) bw.alignByte()
      val blockLen = math.min(j, samples.length - i)
      // preprocess the block: reference (raw) + mapped deltas
      val refLen = if (preprocess && isRsiStart) 1 else 0
      val deltas = new Array[Int](blockLen - refLen)
      if (preprocess) {
        if (isRsiStart) pred = samples(i)
        var s = refLen
        while (s < blockLen) {
          deltas(s - refLen) = mapError(samples(i + s) - pred, pred, maxVal)
          pred = samples(i + s)
          s += 1
        }
      } else {
        var s = 0
        while (s < blockLen) { deltas(s) = samples(i + s); s += 1 }
      }

      val allZero = deltas.forall(_ == 0) && blockLen == j
      if (allZero && !(preprocess && isRsiStart && blockLen < j)) {
        // extend the zero run across full blocks (reference blocks and
        // partial tail blocks break the run)
        var run = 1
        var probe = i + blockLen
        var probeBlockInRsi = (blockInRsi + 1) % rsi
        val segEnd = SegmentBlocks * ((blockInRsi / SegmentBlocks) + 1)
        var predR = pred
        var continue = true
        while (continue && probe + j <= samples.length &&
               probeBlockInRsi != 0 && blockInRsi + run < segEnd) {
          var z = true
          var s = 0
          var p2 = predR
          while (z && s < j) {
            if (mapError(samples(probe + s) - p2, p2, maxVal) != 0) z = false
            else p2 = samples(probe + s)
            s += 1
          }
          if (z) { run += 1; probe += j; predR = p2
                   probeBlockInRsi = (probeBlockInRsi + 1) % rsi }
          else continue = false
        }
        bw.put(0, idW); bw.put(0, 1) // ID 0 + sub-ID 0: zero-block run
        if (refLen == 1) bw.put(samples(i), n)
        val atSegEnd = blockInRsi + run == segEnd
        if (atSegEnd && run > 4) bw.fs(4) // remainder-of-segment
        else if (run <= 4) bw.fs(run - 1)
        else bw.fs(run)
        i += blockLen + (run - 1) * j
        blockInRsi = (blockInRsi + run) % rsi
        pred = predR
      } else {
        // pick cheapest of k-split (k = 0..kMax) vs uncompressed; the
        // FS cost of k-split is sum(d >> k) + count
        var bestK = -1
        var bestCost = deltas.length * n // uncompressed cost (ref costs n either way)
        var k = 0
        while (k <= kMax) {
          var cost = 0L
          var s = 0
          while (s < deltas.length && cost < bestCost) {
            cost += (deltas(s) >> k) + 1 + k
            s += 1
          }
          if (cost < bestCost) { bestCost = cost.toInt; bestK = k }
          k += 1
        }
        if (bestK < 0) {
          bw.put(uncompressedId, idW)
          if (refLen == 1) bw.put(samples(i), n)
          var s = refLen
          while (s < blockLen) {
            bw.put(if (preprocess) deltas(s - refLen) else samples(i + s), n)
            s += 1
          }
          // NOTE: uncompressed blocks carry the MAPPED deltas under
          // preprocessing (the unmapper still runs on decode)
        } else {
          bw.put(bestK + 1, idW)
          if (refLen == 1) bw.put(samples(i), n)
          var s = 0
          while (s < deltas.length) { bw.fs(deltas(s) >> bestK); s += 1 }
          if (bestK > 0) {
            s = 0
            while (s < deltas.length) { bw.put(deltas(s) & ((1 << bestK) - 1), bestK); s += 1 }
          }
        }
        i += blockLen
        blockInRsi = (blockInRsi + 1) % rsi
      }
    }
    bw.finish()
  }

  /** Decode `count` samples from `data[off, off+len)`. */
  def decode(data: Array[Byte], off: Int, len: Int, count: Int,
             n: Int, j: Int, rsi: Int, flags: Int): Array[Int] = {
    require(n >= 1 && n <= 25, s"unsupported sample resolution $n")
    require(Set(8, 16, 32, 64).contains(j), s"bad block size $j")
    require((flags & FlagSigned) == 0,
      "signed CCSDS samples not supported (GRIB packs unsigned scaled values)")
    require((flags & FlagRestricted) == 0,
      "restricted low-entropy coding not supported")
    val preprocess = (flags & FlagPreprocess) != 0
    val maxVal = (1 << n) - 1
    val br = new BitReader(data, off, off + len)
    val idW = idBits(n)
    val uncompressedId = (1 << idW) - 1
    val out = new Array[Int](count)

    var i = 0
    var blockInRsi = 0
    var pred = 0
    def unmapInto(deltas: Array[Int], start: Int): Unit = {
      var s = 0
      while (s < deltas.length) {
        val e = unmapError(deltas(s), pred, maxVal)
        pred += e
        require(pred >= 0 && pred <= maxVal, "CCSDS sample out of range (corrupt stream)")
        out(start + s) = pred
        s += 1
      }
    }

    while (i < count) {
      val isRsiStart = blockInRsi == 0
      if (isRsiStart && (flags & FlagPadRsi) != 0) br.alignByte()
      val blockLen = math.min(j, count - i)
      val refLen = if (preprocess && isRsiStart) 1 else 0
      val id = br.bits(idW).toInt
      if (id == 0) {
        val subId = br.bit()
        if (subId == 0) { // zero-block run
          if (refLen == 1) { pred = br.bits(n).toInt; out(i) = pred }
          val z = br.fs()
          val segEnd = SegmentBlocks * ((blockInRsi / SegmentBlocks) + 1)
          val run =
            if (z < 4) z + 1
            else if (z == 4) segEnd - blockInRsi // remainder of segment
            else z
          // zero deltas: every sample repeats the prediction
          var filled = refLen
          val total = math.min(run.toLong * j, (count - i).toLong).toInt
          while (filled < total) { out(i + filled) = pred; filled += 1 }
          i += total
          blockInRsi = (blockInRsi + run) % rsi
        } else { // second extension
          require(refLen == 0,
            "second-extension coding of a reference block not supported " +
              "(implementation-defined corner; re-encode or use another packing)")
          val deltas = new Array[Int](blockLen)
          var p = 0
          while (p < blockLen) {
            val m = br.fs().toLong
            // invert m = (a+b)(a+b+1)/2 + b
            val t = ((math.sqrt(8.0 * m + 1) - 1) / 2).toLong
            val tt = if ((t + 1) * (t + 2) / 2 <= m) t + 1
                     else if (t * (t + 1) / 2 > m) t - 1 else t
            val b = (m - tt * (tt + 1) / 2).toInt
            val a = (tt - b).toInt
            deltas(p) = a
            if (p + 1 < blockLen) deltas(p + 1) = b
            p += 2
          }
          if (preprocess) unmapInto(deltas, i)
          else { var s = 0; while (s < blockLen) { out(i + s) = deltas(s); s += 1 } }
          i += blockLen
          blockInRsi = (blockInRsi + 1) % rsi
        }
      } else {
        if (refLen == 1) { pred = br.bits(n).toInt; out(i) = pred }
        val m = blockLen - refLen
        val deltas = new Array[Int](m)
        if (id == uncompressedId) {
          var s = 0
          while (s < m) { deltas(s) = br.bits(n).toInt; s += 1 }
        } else {
          val k = id - 1
          require(k <= n, s"split exponent $k exceeds resolution $n (corrupt stream)")
          var s = 0
          while (s < m) { deltas(s) = br.fs() << k; s += 1 }
          if (k > 0) {
            s = 0
            while (s < m) { deltas(s) |= br.bits(k).toInt; s += 1 }
          }
        }
        if (preprocess) unmapInto(deltas, i + refLen)
        else { var s = 0; while (s < m) { out(i + refLen + s) = deltas(s); s += 1 } }
        i += blockLen
        blockInRsi = (blockInRsi + 1) % rsi
      }
    }
    out
  }
}
