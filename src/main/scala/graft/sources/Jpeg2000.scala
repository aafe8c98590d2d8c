package graft.sources

import scala.collection.mutable.ArrayBuffer

/** Self-contained JPEG2000 (ITU-T T.800 / ISO 15444-1) codestream codec
  * for the GRIB2 template 5.40 profile — the subset every operational
  * GRIB producer emits through eccodes' jasper/openjpeg path
  * (reference decode: georiva formats/grib.py:122-230 via eccodes):
  *
  *  - raw codestream (SOC..EOC, no JP2 container — GRIB section 7
  *    carries the bare codestream),
  *  - single tile, single component, no subsampling,
  *  - REVERSIBLE 5/3 wavelet (lossless; GRIB 5.40 compression type 0)
  *    with quantization style 0,
  *  - IRREVERSIBLE 9/7 wavelet (lossy; GRIB 5.40 compression type 1,
  *    e.g. rate-limited MRMS products) with scalar quantization,
  *    derived or expounded, mid-bin (r = ½) reconstruction,
  *  - single quality layer, no precinct partitioning (default 2^15),
  *  - code-blocks up to 64×64, default coding mode (no bypass /
  *    reset / termall / vertically-causal / segmentation symbols).
  *
  * Anything outside the subset fails loudly (the GRIB reader
  * dead-letters the file with the thrown reason) rather than decoding
  * wrong numbers. Lossy streams decode to the nearest integer of the
  * 9/7 synthesis — APPROXIMATE by construction; the GRIB reader
  * surfaces which packing produced a field so exactness-sensitive
  * consumers can filter on it.
  *
  * All five progression orders are accepted: with one layer, one
  * component and one precinct per resolution, every progression
  * degenerates to the same resolution-major packet sequence.
  *
  * The encoder exists so specs can round-trip real codestreams (the
  * same build-the-fixture-yourself discipline as GeoTiffSpec's COGs)
  * and so Grib2.write can emit 5.40 messages.
  *
  * Layout of this file: MQ arithmetic coder (Annex C), tag trees
  * (B.10.2), bit-stuffed packet-header I/O (B.10.1), EBCOT Tier-1
  * coefficient coding (Annex D), reversible 5/3 DWT (Annex F), and
  * Tier-2 codestream assembly/parsing (Annexes A/B).
  */
object Jpeg2000 {

  // ---- MQ arithmetic coder (T.800 Annex C) -------------------------

  // Qe, NMPS, NLPS, SWITCH — Table C.2, 47 states.
  private val Qe = Array(
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601)
  private val Nmps = Array(
    1, 2, 3, 4, 5, 38, 7, 8, 9, 10, 11, 12, 13, 29, 15, 16, 17, 18,
    19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33, 34,
    35, 36, 37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46)
  private val Nlps = Array(
    1, 6, 9, 12, 29, 33, 6, 14, 14, 14, 17, 18, 20, 21, 14, 14, 15,
    16, 17, 18, 19, 19, 20, 21, 22, 23, 24, 25, 26, 27, 28, 29, 30,
    31, 32, 33, 34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46)
  private val Switch = Array(
    1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
    0, 0, 0, 0, 0)

  /** 19 coding contexts (Annex D): 0–8 zero coding, 9–13 sign coding,
    * 14–16 magnitude refinement, 17 run-length, 18 uniform. */
  final val NumCtx = 19
  final val CtxRl = 17
  final val CtxUni = 18

  private def initCtxStates(): (Array[Int], Array[Int]) = {
    val idx = new Array[Int](NumCtx)
    val mps = new Array[Int](NumCtx)
    idx(0) = 4; idx(CtxRl) = 3; idx(CtxUni) = 46 // Table D.7 initial states
    (idx, mps)
  }

  /** MQ encoder (Annex C.2 software conventions). One instance per
    * code-block; contexts reset at construction. */
  private final class MqEncoder {
    private val (ctxIdx, ctxMps) = initCtxStates()
    private var a = 0x8000
    private var c = 0
    private var ct = 12
    // `out` carries one 0x00 sentinel for the byte "before the segment"
    // (spec BP = BPST − 1); it is dropped at flush unless a carry
    // propagated into it, in which case it IS the first code byte.
    private val out = ArrayBuffer[Int](0)

    private def byteout(): Unit = {
      if (out.last == 0xFF) {
        out += ((c >> 20) & 0xFF); c &= 0xFFFFF; ct = 7
      } else if (c < 0x8000000) {
        out += ((c >> 19) & 0xFF); c &= 0x7FFFF; ct = 8
      } else {
        out(out.length - 1) += 1 // carry
        if (out.last == 0xFF) {
          c &= 0x7FFFFFF
          out += ((c >> 20) & 0xFF); c &= 0xFFFFF; ct = 7
        } else {
          out += ((c >> 19) & 0xFF); c &= 0x7FFFF; ct = 8
        }
      }
    }

    private def renorm(): Unit = {
      do {
        a <<= 1; c <<= 1; ct -= 1
        if (ct == 0) byteout()
      } while ((a & 0x8000) == 0)
    }

    def encode(bit: Int, cx: Int): Unit = {
      val i = ctxIdx(cx); val qe = Qe(i)
      if (bit == ctxMps(cx)) { // CODEMPS
        a -= qe
        if ((a & 0x8000) == 0) {
          if (a < qe) a = qe else c += qe
          ctxIdx(cx) = Nmps(i)
          renorm()
        } else c += qe
      } else { // CODELPS
        a -= qe
        if (a < qe) c += qe else a = qe
        if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
        ctxIdx(cx) = Nlps(i)
        renorm()
      }
    }

    /** FLUSH (C.2.9) and return the code segment bytes. */
    def flush(): Array[Byte] = {
      // SETBITS (Figure C.9): force as many 1-bits into C as the final
      // interval allows, so the decoder's synthesized 1-bits agree
      val tempC = c + a
      c |= 0xFFFF
      if (c >= tempC) c -= 0x8000
      c <<= ct; byteout()
      c <<= ct; byteout()
      // a trailing 0xFF is dropped (the decoder re-synthesizes 1-bits
      // past the segment end)
      if (out.last == 0xFF) out.remove(out.length - 1)
      val drop = if (out.head == 0) 1 else 0 // sentinel untouched → drop
      out.drop(drop).map(_.toByte).toArray
    }
  }

  /** MQ decoder over `data[start, end)` (Annex C.3). Bytes past `end`
    * read as 0xFF (marker-found rule feeds 1-bits forever). */
  private final class MqDecoder(data: Array[Byte], start: Int, end: Int) {
    private val (ctxIdx, ctxMps) = initCtxStates()
    private var bp = start
    private var a = 0
    private var c = 0
    private var ct = 0

    private def byteAt(i: Int): Int =
      if (i < end && i < data.length) data(i) & 0xFF else 0xFF

    private def bytein(): Unit = {
      if (byteAt(bp) == 0xFF) {
        if (byteAt(bp + 1) > 0x8F) { c += 0xFF00; ct = 8 }
        else { bp += 1; c += byteAt(bp) << 9; ct = 7 }
      } else { bp += 1; c += byteAt(bp) << 8; ct = 8 }
    }

    // INITDEC
    c = byteAt(bp) << 16
    bytein()
    c <<= 7; ct -= 7; a = 0x8000

    private def renorm(): Unit = {
      do {
        if (ct == 0) bytein()
        a <<= 1; c <<= 1; ct -= 1
      } while ((a & 0x8000) == 0)
    }

    def decode(cx: Int): Int = {
      val i = ctxIdx(cx); val qe = Qe(i)
      a -= qe
      var d = 0
      if (((c >>> 16) & 0xFFFF) < qe) {
        // LPS exchange
        if (a < qe) { d = ctxMps(cx); ctxIdx(cx) = Nmps(i) }
        else {
          d = 1 - ctxMps(cx)
          if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
          ctxIdx(cx) = Nlps(i)
        }
        a = qe
        renorm()
      } else {
        c -= qe << 16
        if ((a & 0x8000) == 0) {
          // MPS exchange
          if (a < qe) {
            d = 1 - ctxMps(cx)
            if (Switch(i) == 1) ctxMps(cx) = 1 - ctxMps(cx)
            ctxIdx(cx) = Nlps(i)
          } else { d = ctxMps(cx); ctxIdx(cx) = Nmps(i) }
          renorm()
        } else d = ctxMps(cx)
      }
      d
    }
  }

  // ---- tag trees (B.10.2) ------------------------------------------

  /** Quad-tree over a w×h leaf grid; shared by encoder (values set,
    * `encode` emits bits) and decoder (`decode` consumes bits). Node
    * state (`low`, `known`) persists across calls — the incremental
    * threshold protocol packet headers rely on. */
  private final class TagTree(val w: Int, val h: Int) {
    // levels(0) = leaves (w×h) … levels(last) = 1×1 root
    private val dims = {
      val b = ArrayBuffer[(Int, Int)]((w, h))
      while (b.last._1 > 1 || b.last._2 > 1)
        b += (((b.last._1 + 1) / 2, (b.last._2 + 1) / 2))
      b.toArray
    }
    val value: Array[Array[Int]] = dims.map { case (lw, lh) => new Array[Int](lw * lh) }
    private val low = dims.map { case (lw, lh) => new Array[Int](lw * lh) }
    private val known = dims.map { case (lw, lh) => new Array[Boolean](lw * lh) }

    /** Encoder side: set leaf values then fold mins upward. */
    def setLeaves(vs: Array[Int]): Unit = {
      require(vs.length == w * h)
      Array.copy(vs, 0, value(0), 0, vs.length)
      var l = 1
      while (l < dims.length) {
        val (lw, lh) = dims(l); val (pw, ph) = dims(l - 1)
        var y = 0
        while (y < lh) {
          var x = 0
          while (x < lw) {
            var m = Int.MaxValue
            var dy = 0
            while (dy < 2) {
              var dx = 0
              while (dx < 2) {
                val cy = 2 * y + dy; val cx = 2 * x + dx
                if (cy < ph && cx < pw) m = math.min(m, value(l - 1)(cy * pw + cx))
                dx += 1
              }
              dy += 1
            }
            value(l)(y * lw + x) = m
            x += 1
          }
          y += 1
        }
        l += 1
      }
    }

    private def path(x: Int, y: Int): Array[Int] = {
      // node indices root→leaf
      val p = new Array[Int](dims.length)
      var l = 0
      while (l < dims.length) {
        val lw = dims(l)._1
        p(dims.length - 1 - l) = (y >> l) * lw + (x >> l)
        l += 1
      }
      p
    }

    def encode(x: Int, y: Int, threshold: Int, bw: HeaderBitWriter): Unit = {
      val p = path(x, y)
      var lowBound = 0
      var d = 0
      while (d < p.length) {
        val l = dims.length - 1 - d // level index into arrays
        val n = p(d)
        if (low(l)(n) < lowBound) low(l)(n) = lowBound
        var continue = true
        while (continue && low(l)(n) < threshold) {
          if (low(l)(n) >= value(l)(n)) {
            if (!known(l)(n)) { bw.bit(1); known(l)(n) = true }
            continue = false
          } else { bw.bit(0); low(l)(n) += 1 }
        }
        lowBound = low(l)(n)
        d += 1
      }
    }

    /** Decode toward `threshold`; afterwards `leafKnown`/`leafValue`
      * report what the header has revealed so far. */
    def decode(x: Int, y: Int, threshold: Int, br: HeaderBitReader): Unit = {
      val p = path(x, y)
      var lowBound = 0
      var d = 0
      while (d < p.length) {
        val l = dims.length - 1 - d
        val n = p(d)
        if (low(l)(n) < lowBound) low(l)(n) = lowBound
        while (!known(l)(n) && low(l)(n) < threshold) {
          if (br.bit() == 1) { known(l)(n) = true; value(l)(n) = low(l)(n) }
          else low(l)(n) += 1
        }
        lowBound = low(l)(n)
        d += 1
      }
    }

    def leafKnown(x: Int, y: Int): Boolean = known(0)(y * w + x)
    def leafValue(x: Int, y: Int): Int = value(0)(y * w + x)
    def leafLow(x: Int, y: Int): Int = low(0)(y * w + x)
  }

  // ---- packet-header bit I/O with 0xFF stuffing (B.10.1) ------------

  final class HeaderBitWriter {
    private val out = ArrayBuffer[Int]()
    private var acc = 0
    private var nb = 0
    private def cap: Int = if (out.nonEmpty && out.last == 0xFF) 7 else 8
    def bit(b: Int): Unit = {
      acc = (acc << 1) | (b & 1); nb += 1
      if (nb == cap) { out += acc; acc = 0; nb = 0 }
    }
    def bits(v: Int, n: Int): Unit = {
      var i = n - 1
      while (i >= 0) { bit((v >> i) & 1); i -= 1 }
    }
    /** Flush to a byte boundary; a trailing 0xFF takes its stuffed
      * partner byte so the body can start clean. */
    def finish(): Array[Byte] = {
      if (nb > 0) { out += (acc << (cap - nb)); acc = 0; nb = 0 }
      if (out.nonEmpty && out.last == 0xFF) out += 0
      out.map(_.toByte).toArray
    }
  }

  final class HeaderBitReader(data: Array[Byte], start: Int) {
    private var posB = start
    private var acc = 0
    private var nb = 0
    private var prevFF = false
    def bit(): Int = {
      if (nb == 0) {
        val cap = if (prevFF) 7 else 8
        val b = data(posB) & 0xFF
        prevFF = b == 0xFF
        acc = if (cap == 7) b & 0x7F else b
        nb = cap
        posB += 1
      }
      nb -= 1
      (acc >> nb) & 1
    }
    def bits(n: Int): Int = {
      var v = 0; var i = 0
      while (i < n) { v = (v << 1) | bit(); i += 1 }
      v
    }
    /** Byte position where the packet body starts (consumes the
      * stuffed partner of a trailing 0xFF, mirroring the writer). */
    def bodyStart(): Int = {
      if (prevFF && nb == 0) posB + 1
      else if (prevFF) posB // mid-byte after FF: stuffed byte is current
      else posB
    }
  }

  // ---- EBCOT Tier-1 (Annex D) --------------------------------------

  final val BandLL = 0; final val BandHL = 1
  final val BandLH = 2; final val BandHH = 3

  /** Zero-coding context from neighbor significance sums (Table D.1). */
  private def zcCtx(band: Int, sh: Int, sv: Int, sd: Int): Int = {
    // HL transposes the roles of horizontal and vertical neighbors
    val (h, v) = if (band == BandHL) (sv, sh) else (sh, sv)
    if (band == BandHH) {
      if (sd >= 3) 8
      else if (sd == 2) { if (h + v >= 1) 7 else 6 }
      else if (sd == 1) { if (h + v >= 2) 5 else if (h + v == 1) 4 else 3 }
      else { if (h + v >= 2) 2 else if (h + v == 1) 1 else 0 }
    } else {
      if (h == 2) 8
      else if (h == 1) { if (v >= 1) 7 else if (sd >= 1) 6 else 5 }
      else { // h == 0
        if (v == 2) 4
        else if (v == 1) 3
        else if (sd >= 2) 2
        else if (sd == 1) 1
        else 0
      }
    }
  }

  /** Sign-coding context and XOR bit (Tables D.2/D.3) packed as
    * ctx*2 + xor. `ch`/`cv` are the clamped horizontal/vertical sign
    * contributions in {-1, 0, 1}. */
  private def scCtx(ch: Int, cv: Int): Int = (ch, cv) match {
    case (1, 1)   => 13 * 2
    case (1, 0)   => 12 * 2
    case (1, -1)  => 11 * 2
    case (0, 1)   => 10 * 2
    case (0, 0)   => 9 * 2
    case (0, -1)  => 10 * 2 + 1
    case (-1, 1)  => 11 * 2 + 1
    case (-1, 0)  => 12 * 2 + 1
    case (-1, -1) => 13 * 2 + 1
    case _        => throw new IllegalStateException("unreachable")
  }

  /** Shared Tier-1 state for one code-block; the encode and decode
    * drivers walk identical scans over it so the context modeling can
    * not drift between the two sides. */
  private final class T1(val w: Int, val h: Int, val band: Int) {
    val sig = new Array[Boolean](w * h)     // significant
    val sgn = new Array[Boolean](w * h)     // negative
    val visited = new Array[Boolean](w * h) // coded in this plane's SPP
    val refined = new Array[Boolean](w * h) // has had a refinement pass
    val mag = new Array[Int](w * h)         // accumulated magnitude

    @inline def sigAt(x: Int, y: Int): Boolean =
      x >= 0 && x < w && y >= 0 && y < h && sig(y * w + x)
    @inline private def signC(x: Int, y: Int): Int =
      if (!sigAt(x, y)) 0 else if (sgn(y * w + x)) -1 else 1

    def zcAt(x: Int, y: Int): Int = {
      val sh = (if (sigAt(x - 1, y)) 1 else 0) + (if (sigAt(x + 1, y)) 1 else 0)
      val sv = (if (sigAt(x, y - 1)) 1 else 0) + (if (sigAt(x, y + 1)) 1 else 0)
      val sd = (if (sigAt(x - 1, y - 1)) 1 else 0) + (if (sigAt(x + 1, y - 1)) 1 else 0) +
        (if (sigAt(x - 1, y + 1)) 1 else 0) + (if (sigAt(x + 1, y + 1)) 1 else 0)
      zcCtx(band, sh, sv, sd)
    }

    def scAt(x: Int, y: Int): Int = {
      val ch = math.max(-1, math.min(1, signC(x - 1, y) + signC(x + 1, y)))
      val cv = math.max(-1, math.min(1, signC(x, y - 1) + signC(x, y + 1)))
      scCtx(ch, cv)
    }

    def mrCtxAt(x: Int, y: Int): Int =
      if (refined(y * w + x)) 16
      else if (zcAt(x, y) > 0) 15
      else 14
  }

  /** Encode one code-block losslessly. `coeffs` are signed integers in
    * raster order; returns (numbps, MQ code segment). numbps = 0 ⇒ the
    * block is all-zero and contributes nothing (excluded from the
    * packet). Total passes = 3·numbps − 2. */
  private def t1Encode(coeffs: Array[Int], w: Int, h: Int, band: Int): (Int, Array[Byte]) = {
    var maxMag = 0
    var i = 0
    while (i < coeffs.length) { val m = math.abs(coeffs(i)); if (m > maxMag) maxMag = m; i += 1 }
    if (maxMag == 0) return (0, Array.emptyByteArray)
    val numbps = 32 - Integer.numberOfLeadingZeros(maxMag)
    val t = new T1(w, h, band)
    val mq = new MqEncoder

    def bitOf(x: Int, y: Int, p: Int): Int = (math.abs(coeffs(y * w + x)) >> p) & 1
    def negOf(x: Int, y: Int): Boolean = coeffs(y * w + x) < 0

    def codeSignificance(x: Int, y: Int, p: Int): Unit = {
      // coefficient just became significant: code its sign
      val packed = t.scAt(x, y)
      val ctx = packed >> 1; val xr = packed & 1
      val neg = negOf(x, y)
      mq.encode((if (neg) 1 else 0) ^ xr, ctx)
      val idx = y * w + x
      t.sig(idx) = true; t.sgn(idx) = neg; t.mag(idx) |= 1 << p
    }

    var p = numbps - 1
    var firstPlane = true
    while (p >= 0) {
      if (!firstPlane) {
        // significance propagation pass
        var r0 = 0
        while (r0 < h) {
          val rEnd = math.min(r0 + 4, h)
          var x = 0
          while (x < w) {
            var y = r0
            while (y < rEnd) {
              val idx = y * w + x
              if (!t.sig(idx) && t.zcAt(x, y) > 0) {
                val b = bitOf(x, y, p)
                mq.encode(b, t.zcAt(x, y))
                if (b == 1) codeSignificance(x, y, p)
                t.visited(idx) = true
              }
              y += 1
            }
            x += 1
          }
          r0 += 4
        }
        // magnitude refinement pass
        r0 = 0
        while (r0 < h) {
          val rEnd = math.min(r0 + 4, h)
          var x = 0
          while (x < w) {
            var y = r0
            while (y < rEnd) {
              val idx = y * w + x
              if (t.sig(idx) && !t.visited(idx)) {
                val b = bitOf(x, y, p)
                mq.encode(b, t.mrCtxAt(x, y))
                t.refined(idx) = true
                t.mag(idx) |= b << p
              }
              y += 1
            }
            x += 1
          }
          r0 += 4
        }
      }
      // cleanup pass
      var r0 = 0
      while (r0 < h) {
        val rEnd = math.min(r0 + 4, h)
        var x = 0
        while (x < w) {
          var y = r0
          // run-length mode: full 4-row column, all insignificant,
          // unvisited, and no significant neighbors anywhere
          var rl = rEnd - r0 == 4
          if (rl) {
            var k = r0
            while (rl && k < rEnd) {
              val idx = k * w + x
              rl = !t.sig(idx) && !t.visited(idx) && t.zcAt(x, k) == 0
              k += 1
            }
          }
          if (rl) {
            var i0 = -1
            var k = r0
            while (i0 < 0 && k < rEnd) { if (bitOf(x, k, p) == 1) i0 = k - r0; k += 1 }
            if (i0 < 0) { mq.encode(0, CtxRl); y = rEnd }
            else {
              mq.encode(1, CtxRl)
              mq.encode((i0 >> 1) & 1, CtxUni)
              mq.encode(i0 & 1, CtxUni)
              codeSignificance(x, r0 + i0, p)
              y = r0 + i0 + 1
            }
          }
          while (y < rEnd) {
            val idx = y * w + x
            if (!t.sig(idx) && !t.visited(idx)) {
              val b = bitOf(x, y, p)
              mq.encode(b, t.zcAt(x, y))
              if (b == 1) codeSignificance(x, y, p)
            }
            y += 1
          }
          x += 1
        }
        r0 += 4
      }
      java.util.Arrays.fill(t.visited, false)
      firstPlane = false
      p -= 1
    }
    (numbps, mq.flush())
  }

  /** Decode one code-block's MQ segment: `numbps` bitplanes,
    * `numPasses` passes, into signed coefficients (raster order). */
  private def t1Decode(data: Array[Byte], start: Int, end: Int,
                       w: Int, h: Int, band: Int,
                       numbps: Int, numPasses: Int): Array[Int] = {
    val t = new T1(w, h, band)
    val mq = new MqDecoder(data, start, end)
    var passesLeft = numPasses

    def decodeSignificance(x: Int, y: Int, p: Int): Unit = {
      val packed = t.scAt(x, y)
      val ctx = packed >> 1; val xr = packed & 1
      val neg = (mq.decode(ctx) ^ xr) == 1
      val idx = y * w + x
      t.sig(idx) = true; t.sgn(idx) = neg; t.mag(idx) |= 1 << p
    }

    var p = numbps - 1
    var firstPlane = true
    while (p >= 0 && passesLeft > 0) {
      if (!firstPlane) {
        if (passesLeft > 0) { // significance propagation
          var r0 = 0
          while (r0 < h) {
            val rEnd = math.min(r0 + 4, h)
            var x = 0
            while (x < w) {
              var y = r0
              while (y < rEnd) {
                val idx = y * w + x
                if (!t.sig(idx) && t.zcAt(x, y) > 0) {
                  if (mq.decode(t.zcAt(x, y)) == 1) decodeSignificance(x, y, p)
                  t.visited(idx) = true
                }
                y += 1
              }
              x += 1
            }
            r0 += 4
          }
          passesLeft -= 1
        }
        if (passesLeft > 0) { // magnitude refinement
          var r0 = 0
          while (r0 < h) {
            val rEnd = math.min(r0 + 4, h)
            var x = 0
            while (x < w) {
              var y = r0
              while (y < rEnd) {
                val idx = y * w + x
                if (t.sig(idx) && !t.visited(idx)) {
                  val b = mq.decode(t.mrCtxAt(x, y))
                  t.refined(idx) = true
                  t.mag(idx) |= b << p
                }
                y += 1
              }
              x += 1
            }
            r0 += 4
          }
          passesLeft -= 1
        }
      }
      if (passesLeft > 0) { // cleanup
        var r0 = 0
        while (r0 < h) {
          val rEnd = math.min(r0 + 4, h)
          var x = 0
          while (x < w) {
            var y = r0
            var rl = rEnd - r0 == 4
            if (rl) {
              var k = r0
              while (rl && k < rEnd) {
                val idx = k * w + x
                rl = !t.sig(idx) && !t.visited(idx) && t.zcAt(x, k) == 0
                k += 1
              }
            }
            if (rl) {
              if (mq.decode(CtxRl) == 0) y = rEnd
              else {
                val i0 = (mq.decode(CtxUni) << 1) | mq.decode(CtxUni)
                decodeSignificance(x, r0 + i0, p)
                y = r0 + i0 + 1
              }
            }
            while (y < rEnd) {
              val idx = y * w + x
              if (!t.sig(idx) && !t.visited(idx)) {
                if (mq.decode(t.zcAt(x, y)) == 1) decodeSignificance(x, y, p)
              }
              y += 1
            }
            x += 1
          }
          r0 += 4
        }
        passesLeft -= 1
      }
      java.util.Arrays.fill(t.visited, false)
      firstPlane = false
      p -= 1
    }
    val out = new Array[Int](w * h)
    var i = 0
    while (i < out.length) {
      out(i) = if (t.sgn(i)) -t.mag(i) else t.mag(i)
      i += 1
    }
    out
  }

  // ---- reversible 5/3 DWT (Annex F) --------------------------------

  /** One 1-D forward 5/3 step over `n` samples read from `buf` at
    * `off + i*stride`, writing low coefficients first (ceil(n/2)) then
    * high (floor(n/2)) back into the same positions (mallat order).
    * Signals start at even parity (tile origin 0) — the only case the
    * single-tile profile produces. */
  private def fwd53(buf: Array[Int], off: Int, stride: Int, n: Int,
                    scratch: Array[Int]): Unit = {
    if (n <= 1) return
    var i = 0
    while (i < n) { scratch(i) = buf(off + i * stride); i += 1 }
    val nd = n / 2        // high count
    val ns = (n + 1) / 2  // low count
    val d = new Array[Int](nd)
    val s = new Array[Int](ns)
    // whole-sample symmetric extension: x(-1)=x(1), x(n)=x(n-2)
    @inline def xv(j: Int): Int =
      scratch(if (j < 0) -j else if (j >= n) 2 * (n - 1) - j else j)
    var k = 0
    while (k < nd) { d(k) = scratch(2 * k + 1) - ((xv(2 * k) + xv(2 * k + 2)) >> 1); k += 1 }
    @inline def dv(pos: Int): Int = { // high-pass value at odd position
      var pp = pos
      if (pp < 0) pp = -pp
      if (pp > n - 1) pp = 2 * (n - 1) - pp
      d((pp - 1) / 2)
    }
    k = 0
    while (k < ns) { s(k) = scratch(2 * k) + ((dv(2 * k - 1) + dv(2 * k + 1) + 2) >> 2); k += 1 }
    i = 0
    while (i < ns) { buf(off + i * stride) = s(i); i += 1 }
    i = 0
    while (i < nd) { buf(off + (ns + i) * stride) = d(i); i += 1 }
  }

  /** Inverse of [[fwd53]]. */
  private def inv53(buf: Array[Int], off: Int, stride: Int, n: Int,
                    scratch: Array[Int]): Unit = {
    if (n <= 1) return
    val nd = n / 2
    val ns = (n + 1) / 2
    val s = new Array[Int](ns)
    val d = new Array[Int](nd)
    var i = 0
    while (i < ns) { s(i) = buf(off + i * stride); i += 1 }
    i = 0
    while (i < nd) { d(i) = buf(off + (ns + i) * stride); i += 1 }
    @inline def dv(pos: Int): Int = {
      var pp = pos
      if (pp < 0) pp = -pp
      if (pp > n - 1) pp = 2 * (n - 1) - pp
      d((pp - 1) / 2)
    }
    val x = scratch
    var k = 0
    while (k < ns) { x(2 * k) = s(k) - ((dv(2 * k - 1) + dv(2 * k + 1) + 2) >> 2); k += 1 }
    @inline def ev(pos: Int): Int = { // reconstructed even sample
      var pp = pos
      if (pp < 0) pp = -pp
      if (pp > n - 1) pp = 2 * (n - 1) - pp
      x(pp) // even positions only by construction
    }
    k = 0
    while (k < nd) { x(2 * k + 1) = d(k) + ((ev(2 * k) + ev(2 * k + 2)) >> 1); k += 1 }
    i = 0
    while (i < n) { buf(off + i * stride) = x(i); i += 1 }
  }

  /** Multi-level 2-D forward transform, in-place mallat layout:
    * rows then columns per level, recursing on the LL quadrant. */
  def dwtForward(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Int](math.max(w, h))
    var lw = w; var lh = h
    var l = 0
    while (l < levels) {
      var y = 0
      while (y < lh) { fwd53(a, y * w, 1, lw, scratch); y += 1 }
      var x = 0
      while (x < lw) { fwd53(a, x, w, lh, scratch); x += 1 }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      l += 1
    }
  }

  /** Inverse of [[dwtForward]]: smallest level outward, columns then
    * rows. */
  def dwtInverse(a: Array[Int], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Int](math.max(w, h))
    // level dims outward-in
    val ws = new Array[Int](levels + 1); val hs = new Array[Int](levels + 1)
    ws(0) = w; hs(0) = h
    var l = 1
    while (l <= levels) { ws(l) = (ws(l - 1) + 1) / 2; hs(l) = (hs(l - 1) + 1) / 2; l += 1 }
    l = levels
    while (l >= 1) {
      val lw = ws(l - 1); val lh = hs(l - 1)
      var x = 0
      while (x < lw) { inv53(a, x, w, lh, scratch); x += 1 }
      var y = 0
      while (y < lh) { inv53(a, y * w, 1, lw, scratch); y += 1 }
      l -= 1
    }
  }

  // ---- irreversible 9/7 DWT (Annex F.4.8) --------------------------

  // Lifting constants (Table F.4). Scaling follows the STANDARD's
  // filter normalization — analysis lowpass DC gain 1 (the tabulated
  // h0 sums to 1.0), analysis highpass Nyquist gain 2 — which the
  // pure lifting chain delivers at gains K and 2/K respectively, so
  // the forward scales even×(1/K), odd×K and the inverse undoes both
  // BEFORE un-lifting. (openjpeg stores high bands internally at half
  // this scale and compensates with gain-0 stepsizes — an internal
  // convention that cancels out in the codestream; conforming streams
  // are exchangeable either way.)
  private val A97 = -1.586134342059924
  private val B97 = -0.052980118572961
  private val G97 = 0.882911075530934
  private val D97 = 0.443506852043971
  private val K97 = 1.230174104914001

  /** One 1-D inverse 9/7 step: mallat-ordered low/high at
    * `off + i*stride` back to interleaved samples (mirror of
    * [[inv53]]; whole-sample symmetric extension, even start parity). */
  private def inv97(buf: Array[Double], off: Int, stride: Int, n: Int,
                    scratch: Array[Double]): Unit = {
    if (n <= 1) { return } // single sample: transform is identity
    val nd = n / 2
    val ns = (n + 1) / 2
    val x = scratch
    var i = 0
    // undo the final scaling while interleaving
    while (i < ns) { x(2 * i) = K97 * buf(off + i * stride); i += 1 }
    i = 0
    while (i < nd) { x(2 * i + 1) = buf(off + (ns + i) * stride) / K97; i += 1 }
    @inline def at(pos: Int): Double = {
      var pp = pos
      if (pp < 0) pp = -pp
      if (pp > n - 1) pp = 2 * (n - 1) - pp
      x(pp)
    }
    // un-lift in reverse order: δ, γ, β, α
    var k = 0
    while (k < ns) { x(2 * k) -= D97 * (at(2 * k - 1) + at(2 * k + 1)); k += 1 }
    k = 0
    while (k < nd) { x(2 * k + 1) -= G97 * (at(2 * k) + at(2 * k + 2)); k += 1 }
    k = 0
    while (k < ns) { x(2 * k) -= B97 * (at(2 * k - 1) + at(2 * k + 1)); k += 1 }
    k = 0
    while (k < nd) { x(2 * k + 1) -= A97 * (at(2 * k) + at(2 * k + 2)); k += 1 }
    i = 0
    while (i < n) { buf(off + i * stride) = x(i); i += 1 }
  }

  /** Forward of [[inv97]] (encoder + spec round-trips). */
  private def fwd97(buf: Array[Double], off: Int, stride: Int, n: Int,
                    scratch: Array[Double]): Unit = {
    if (n <= 1) { return }
    val nd = n / 2
    val ns = (n + 1) / 2
    val x = scratch
    var i = 0
    while (i < n) { x(i) = buf(off + i * stride); i += 1 }
    @inline def at(pos: Int): Double = {
      var pp = pos
      if (pp < 0) pp = -pp
      if (pp > n - 1) pp = 2 * (n - 1) - pp
      x(pp)
    }
    var k = 0
    while (k < nd) { x(2 * k + 1) += A97 * (at(2 * k) + at(2 * k + 2)); k += 1 }
    k = 0
    while (k < ns) { x(2 * k) += B97 * (at(2 * k - 1) + at(2 * k + 1)); k += 1 }
    k = 0
    while (k < nd) { x(2 * k + 1) += G97 * (at(2 * k) + at(2 * k + 2)); k += 1 }
    k = 0
    while (k < ns) { x(2 * k) += D97 * (at(2 * k - 1) + at(2 * k + 1)); k += 1 }
    i = 0
    while (i < ns) { buf(off + i * stride) = x(2 * i) / K97; i += 1 }
    i = 0
    while (i < nd) { buf(off + (ns + i) * stride) = x(2 * i + 1) * K97; i += 1 }
  }

  /** Multi-level 2-D irreversible transforms, same mallat layout and
    * level order as the reversible pair. */
  def dwtForward97(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Double](math.max(w, h))
    var lw = w; var lh = h
    var l = 0
    while (l < levels) {
      var y = 0
      while (y < lh) { fwd97(a, y * w, 1, lw, scratch); y += 1 }
      var x = 0
      while (x < lw) { fwd97(a, x, w, lh, scratch); x += 1 }
      lw = (lw + 1) / 2; lh = (lh + 1) / 2
      l += 1
    }
  }

  def dwtInverse97(a: Array[Double], w: Int, h: Int, levels: Int): Unit = {
    val scratch = new Array[Double](math.max(w, h))
    val ws = new Array[Int](levels + 1); val hs = new Array[Int](levels + 1)
    ws(0) = w; hs(0) = h
    var l = 1
    while (l <= levels) { ws(l) = (ws(l - 1) + 1) / 2; hs(l) = (hs(l - 1) + 1) / 2; l += 1 }
    l = levels
    while (l >= 1) {
      val lw = ws(l - 1); val lh = hs(l - 1)
      var x = 0
      while (x < lw) { inv97(a, x, w, lh, scratch); x += 1 }
      var y = 0
      while (y < lh) { inv97(a, y * w, 1, lw, scratch); y += 1 }
      l -= 1
    }
  }

  // ---- Tier-2: codestream (Annexes A/B) ----------------------------

  /** Band geometry at one resolution in the mallat-layout frame:
    * (band id, x0, y0, width, height). */
  private def bandsAtRes(w: Int, h: Int, levels: Int, r: Int): Seq[(Int, Int, Int, Int, Int)] = {
    val ws = new Array[Int](levels + 1); val hs = new Array[Int](levels + 1)
    ws(0) = w; hs(0) = h
    var l = 1
    while (l <= levels) { ws(l) = (ws(l - 1) + 1) / 2; hs(l) = (hs(l - 1) + 1) / 2; l += 1 }
    if (r == 0) Seq((BandLL, 0, 0, ws(levels), hs(levels)))
    else {
      val l2 = levels - r + 1 // decomposition level whose high bands appear
      val lw = ws(l2); val lh = hs(l2)            // low dims at this level
      val hw = ws(l2 - 1) - lw; val hh = hs(l2 - 1) - lh // high dims
      Seq((BandHL, lw, 0, hw, lh), (BandLH, 0, lh, lw, hh), (BandHH, lw, lh, hw, hh))
        .filter(b => b._4 > 0 && b._5 > 0)
    }
  }

  /** Subband log2 gain for the reversible exponent assignment
    * (E.1.1: εb = B + gain). */
  private def bandGain(band: Int): Int = band match {
    case BandLL => 0
    case BandHH => 2
    case _      => 1
  }

  private def u16be(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }
  private def u32be(b: ArrayBuffer[Byte], v: Int): Unit = {
    b += ((v >> 24) & 0xFF).toByte; b += ((v >> 16) & 0xFF).toByte
    b += ((v >> 8) & 0xFF).toByte; b += (v & 0xFF).toByte
  }

  /** Encode `samples` (w×h raster of unsigned ints < 2^depth) as a
    * single-tile codestream. `cbExpX`/`cbExpY` set the code-block
    * size (64×64 default, jasper's default); `sop`/`eph` emit the
    * optional packet markers some producers enable — both exist
    * mainly so specs can exercise the decoder against every stream
    * shape a foreign encoder emits.
    *
    * `irreversible = true` switches to the 9/7 transform with scalar
    * quantization (the lossy 5.40 profile): every subband step is
    * Δ_b = 2^(quantShift)·(1 + quantMant/2^11) relative to its
    * nominal range (quantShift 0 ≈ near-lossless, each +1 doubles
    * the step), signalled as QCD style 2, or style 1 (derived, one
    * transmitted pair) when `qcdDerived` is set. */
  def encode(samples: Array[Int], w: Int, h: Int, depth: Int,
             cbExpX: Int = 6, cbExpY: Int = 6,
             sop: Boolean = false, eph: Boolean = false,
             irreversible: Boolean = false, quantShift: Int = 0,
             quantMant: Int = 0, qcdDerived: Boolean = false): Array[Byte] = {
    require(w > 0 && h > 0 && samples.length == w * h, "bad raster shape")
    require(depth >= 1 && depth <= 25, s"unsupported depth $depth")
    require(cbExpX >= 2 && cbExpY >= 2 && cbExpX + cbExpY <= 12,
      s"bad code-block exponents $cbExpX/$cbExpY (T.800 limit: area ≤ 4096)")
    require(quantShift >= 0 && quantMant >= 0 && quantMant <= 2047,
      s"bad quantization parameters shift=$quantShift mant=$quantMant")
    val levels = {
      // decompose while both dims stay ≥ 2 samples at the low band,
      // capped at jasper's default of 5
      var l = 0; var lw = w; var lh = h
      while (l < 5 && lw >= 2 && lh >= 2) { lw = (lw + 1) / 2; lh = (lh + 1) / 2; l += 1 }
      l
    }
    val guard = 2
    // Effective quantization exponent per subband — also the style-0
    // exponent (where it degenerates to the nominal range R_b and the
    // step is 1). Derived style transmits only ε0 = ε_LL; the decoder
    // reconstructs the rest via E-5, so the encoder must quantize
    // with exactly those per-band steps.
    def epsFor(r: Int, band: Int): Int =
      if (!irreversible) depth + bandGain(band)
      else if (qcdDerived) {
        val nB = if (r == 0) levels else levels - r + 1
        (depth - quantShift) - levels + nB
      } else depth + bandGain(band) - quantShift
    def deltaFor(r: Int, band: Int): Double =
      math.pow(2.0, depth + bandGain(band) - epsFor(r, band)) *
        (1.0 + quantMant / 2048.0)
    // DC level shift then wavelet
    val a = new Array[Int](w * h)
    val shift = 1 << (depth - 1)
    if (irreversible) {
      val fa = new Array[Double](w * h)
      var i = 0
      while (i < fa.length) {
        require(samples(i) >= 0 && (depth >= 25 || samples(i) < (1 << depth)),
          s"sample ${samples(i)} out of $depth-bit range")
        fa(i) = samples(i) - shift
        i += 1
      }
      dwtForward97(fa, w, h, levels)
      // quantize each mallat-layout band region: q = sign·⌊|c|/Δ_b⌋
      var r = 0
      while (r <= levels) {
        for ((band, bx0, by0, bw0, bh0) <- bandsAtRes(w, h, levels, r)) {
          val eps = epsFor(r, band)
          require(eps >= 1 && eps <= 31,
            s"quantization exponent $eps out of range (quantShift too coarse)")
          val delta = deltaFor(r, band)
          var yy = 0
          while (yy < bh0) {
            var xx = 0
            while (xx < bw0) {
              val idx = (by0 + yy) * w + (bx0 + xx)
              val q = (math.abs(fa(idx)) / delta).toInt
              a(idx) = if (fa(idx) < 0) -q else q
              xx += 1
            }
            yy += 1
          }
        }
        r += 1
      }
    } else {
      var i = 0
      while (i < a.length) {
        require(samples(i) >= 0 && (depth >= 25 || samples(i) < (1 << depth)),
          s"sample ${samples(i)} out of $depth-bit range")
        a(i) = samples(i) - shift
        i += 1
      }
      dwtForward(a, w, h, levels)
    }

    val out = ArrayBuffer[Byte]()
    // SOC
    u16be(out, 0xFF4F)
    // SIZ
    u16be(out, 0xFF51)
    u16be(out, 41)          // Lsiz for 1 component
    u16be(out, 0)           // Rsiz
    u32be(out, w); u32be(out, h)   // Xsiz, Ysiz
    u32be(out, 0); u32be(out, 0)   // XOsiz, YOsiz
    u32be(out, w); u32be(out, h)   // XTsiz, YTsiz (single tile)
    u32be(out, 0); u32be(out, 0)   // XTOsiz, YTOsiz
    u16be(out, 1)           // Csiz
    out += (depth - 1).toByte      // Ssiz: unsigned
    out += 1.toByte; out += 1.toByte // XRsiz, YRsiz
    // COD
    u16be(out, 0xFF52)
    u16be(out, 12)          // Lcod (no precinct sizes)
    out += ((if (sop) 2 else 0) | (if (eph) 4 else 0)).toByte // Scod
    out += 0.toByte         // progression: LRCP
    u16be(out, 1)           // layers
    out += 0.toByte         // no MCT
    out += levels.toByte
    out += (cbExpX - 2).toByte // xcb
    out += (cbExpY - 2).toByte // ycb
    out += 0.toByte         // code-block style: default
    out += (if (irreversible) 0 else 1).toByte // transform
    // QCD — subband order: LL_levels, then per resolution HL, LH, HH
    u16be(out, 0xFF5C)
    if (!irreversible) {
      // style 0 (no quantization), one exponent byte per subband
      u16be(out, 3 + (3 * levels + 1))
      out += ((guard << 5) | 0).toByte
      out += (((depth + bandGain(BandLL)) << 3) & 0xFF).toByte
      var r = 1
      while (r <= levels) {
        for (band <- Seq(BandHL, BandLH, BandHH))
          out += (((depth + bandGain(band)) << 3) & 0xFF).toByte
        r += 1
      }
    } else if (qcdDerived) {
      // style 1 (scalar derived): one 16-bit (ε0, μ0) pair
      u16be(out, 3 + 2)
      out += ((guard << 5) | 1).toByte
      u16be(out, (epsFor(0, BandLL) << 11) | quantMant)
    } else {
      // style 2 (scalar expounded): 16-bit (ε, μ) per subband
      u16be(out, 3 + 2 * (3 * levels + 1))
      out += ((guard << 5) | 2).toByte
      u16be(out, (epsFor(0, BandLL) << 11) | quantMant)
      var r = 1
      while (r <= levels) {
        for (band <- Seq(BandHL, BandLH, BandHH))
          u16be(out, (epsFor(r, band) << 11) | quantMant)
        r += 1
      }
    }

    // tile body: one packet per resolution (LRCP, 1 layer, 1 precinct)
    val body = ArrayBuffer[Byte]()
    var r = 0
    while (r <= levels) {
      val bands = bandsAtRes(w, h, levels, r)
      case class Blk(numbps: Int, seg: Array[Byte], passes: Int)
      // collect code-blocks per band, raster order
      val perBand = bands.map { case (band, bx0, by0, bw, bh) =>
        val nbx = (bw + (1 << cbExpX) - 1) >> cbExpX
        val nby = (bh + (1 << cbExpY) - 1) >> cbExpY
        val blks = for (cy <- 0 until nby; cx <- 0 until nbx) yield {
          val x0 = cx << cbExpX; val y0 = cy << cbExpY
          val cw = math.min(1 << cbExpX, bw - x0)
          val ch = math.min(1 << cbExpY, bh - y0)
          val cf = new Array[Int](cw * ch)
          var yy = 0
          while (yy < ch) {
            var xx = 0
            while (xx < cw) {
              cf(yy * cw + xx) = a((by0 + y0 + yy) * w + (bx0 + x0 + xx))
              xx += 1
            }
            yy += 1
          }
          val (numbps, seg) = t1Encode(cf, cw, ch, band)
          Blk(numbps, seg, if (numbps == 0) 0 else 3 * numbps - 2)
        }
        (band, nbx, nby, blks)
      }
      val anyData = perBand.exists(_._4.exists(_.numbps > 0))
      val bw = new HeaderBitWriter
      if (!anyData) bw.bit(0) // empty packet: nothing included this layer
      else {
        bw.bit(1)
        for ((band, nbx, nby, blks) <- perBand; if blks.nonEmpty) {
          val mb = epsFor(r, band) + guard - 1
          val incl = new TagTree(nbx, nby)
          val zbp = new TagTree(nbx, nby)
          incl.setLeaves(blks.map(b => if (b.numbps > 0) 0 else 1).toArray)
          zbp.setLeaves(blks.map(b => if (b.numbps > 0) mb - b.numbps else 0).toArray)
          var bi = 0
          for (cy <- 0 until nby; cx <- 0 until nbx) {
            val blk = blks(bi)
            require(blk.numbps <= mb, s"numbps ${blk.numbps} exceeds Mb $mb")
            incl.encode(cx, cy, 1, bw)
            if (blk.numbps > 0) {
              // zero-bitplanes: raise the threshold until the leaf resolves
              var thr = 1
              while (!zbp.leafKnown(cx, cy)) {
                zbp.encode(cx, cy, thr, bw)
                thr += 1
              }
              // number of passes (Table B.4)
              val np = blk.passes
              if (np == 1) bw.bit(0)
              else if (np == 2) { bw.bit(1); bw.bit(0) }
              else if (np <= 5) { bw.bits(0x3, 2); bw.bits(np - 3, 2) }
              else if (np <= 36) { bw.bits(0xF, 4); bw.bits(np - 6, 5) }
              else { bw.bits(0x1FF, 9); bw.bits(np - 37, 7) }
              // length: single codeword segment over all passes
              var lblock = 3
              val lenBitsAvail = () => lblock + floorLog2(np)
              val need = math.max(1, 32 - Integer.numberOfLeadingZeros(math.max(1, blk.seg.length)))
              while (lenBitsAvail() < need) { bw.bit(1); lblock += 1 }
              bw.bit(0)
              bw.bits(blk.seg.length, lenBitsAvail())
            }
            bi += 1
          }
        }
      }
      if (sop) { // SOP: FF91, Lsop=4, Nsop = packet index
        body += 0xFF.toByte; body += 0x91.toByte
        body += 0.toByte; body += 4.toByte
        body += ((r >> 8) & 0xFF).toByte; body += (r & 0xFF).toByte
      }
      body ++= bw.finish()
      if (eph) { body += 0xFF.toByte; body += 0x92.toByte }
      for ((_, _, _, blks) <- perBand; b <- blks; if b.numbps > 0) body ++= b.seg
      r += 1
    }

    // SOT + SOD + body + EOC
    u16be(out, 0xFF90)
    u16be(out, 10)
    u16be(out, 0)                    // Isot
    u32be(out, 12 + 2 + body.length) // Psot: SOT..end of tile-part
    out += 0.toByte                  // TPsot
    out += 1.toByte                  // TNsot
    u16be(out, 0xFF93)               // SOD
    out ++= body
    u16be(out, 0xFFD9)               // EOC
    out.toArray
  }

  private def floorLog2(v: Int): Int = 31 - Integer.numberOfLeadingZeros(v)

  /** Spec-only hook: MQ encode+decode a (bit, context) sequence. */
  private[sources] def mqProbe(bits: Array[Int], ctx: Array[Int]): Array[Int] = {
    val enc = new MqEncoder
    var i = 0
    while (i < bits.length) { enc.encode(bits(i), ctx(i)); i += 1 }
    val seg = enc.flush()
    val dec = new MqDecoder(seg, 0, seg.length)
    Array.tabulate(bits.length)(j => dec.decode(ctx(j)))
  }

  /** Spec-only hook: T1 encode+decode one code-block. */
  private[sources] def t1Probe(coeffs: Array[Int], w: Int, h: Int, band: Int): Array[Int] = {
    val (numbps, seg) = t1Encode(coeffs, w, h, band)
    if (numbps == 0) new Array[Int](w * h)
    else t1Decode(seg, 0, seg.length, w, h, band, numbps, 3 * numbps - 2)
  }

  /** Decoded image. */
  case class Image(width: Int, height: Int, depth: Int, signed: Boolean,
                   samples: Array[Int])

  /** Decode a codestream at `bytes[off, off+len)`. Fails loudly on
    * anything outside the GRIB profile (see object scaladoc). */
  def decode(bytes: Array[Byte], off: Int, len: Int): Image = {
    var p = off
    val end = off + len
    def u8(): Int = { val v = bytes(p) & 0xFF; p += 1; v }
    def u16(): Int = { val v = ((bytes(p) & 0xFF) << 8) | (bytes(p + 1) & 0xFF); p += 2; v }
    def u32(): Int = { val v = ((bytes(p) & 0xFF) << 24) | ((bytes(p + 1) & 0xFF) << 16) |
      ((bytes(p + 2) & 0xFF) << 8) | (bytes(p + 3) & 0xFF); p += 4; v }

    require(u16() == 0xFF4F, "not a JPEG2000 codestream (missing SOC)")
    var w = 0; var h = 0; var depth = 0; var signed = false
    var levels = -1; var cbw = 0; var cbh = 0; var cbStyle = 0
    var sopUsed = false; var ephUsed = false
    var irreversible = false
    var guard = 0
    var expnts: Array[Int] = null   // style 0: exponents only
    var qMants: Array[Int] = null   // styles 1/2: 11-bit mantissas
    var qStyle = -1

    var sotSeen = false
    while (!sotSeen) {
      val marker = u16()
      marker match {
        case 0xFF51 => // SIZ
          val lsiz = u16(); val base = p
          val rsiz = u16()
          require(rsiz == 0 || rsiz == 1 || rsiz == 2, s"unsupported Rsiz $rsiz")
          w = u32(); h = u32()
          val xo = u32(); val yo = u32()
          require(xo == 0 && yo == 0, "nonzero image offset not supported")
          val xt = u32(); val yt = u32()
          require(xt >= w && yt >= h, "multi-tile codestreams not supported")
          val xto = u32(); val yto = u32()
          require(xto == 0 && yto == 0, "nonzero tile offset not supported")
          val csiz = u16()
          require(csiz == 1, s"multi-component codestreams not supported ($csiz components)")
          val ssiz = u8()
          signed = (ssiz & 0x80) != 0
          depth = (ssiz & 0x7F) + 1
          require(depth <= 25, s"depth $depth exceeds the integer profile")
          val xr = u8(); val yr = u8()
          require(xr == 1 && yr == 1, "component subsampling not supported")
          p = base + lsiz - 2
        case 0xFF52 => // COD
          val lcod = u16(); val base = p
          val scod = u8()
          sopUsed = (scod & 0x02) != 0
          ephUsed = (scod & 0x04) != 0
          val prog = u8()
          require(prog >= 0 && prog <= 4, s"bad progression $prog")
          // any progression is resolution-major with 1 layer/1 comp/1 precinct
          val layers = u16()
          require(layers == 1, s"multi-layer codestreams not supported ($layers layers)")
          require(u8() == 0, "multiple component transform not supported")
          levels = u8()
          require(levels <= 32, s"bad decomposition level count $levels")
          cbw = 1 << ((u8() & 0x0F) + 2)
          cbh = 1 << ((u8() & 0x0F) + 2)
          require(cbw <= 1024 && cbh <= 1024 && cbw.toLong * cbh <= 4096,
            s"bad code-block size ${cbw}x$cbh")
          cbStyle = u8()
          require(cbStyle == 0,
            f"code-block style 0x$cbStyle%02x not supported (bypass/reset/termall/causal)")
          val xfm = u8()
          require(xfm == 0 || xfm == 1, s"bad transform byte $xfm")
          irreversible = xfm == 0
          if ((scod & 0x01) != 0) {
            // explicit precinct sizes: accept only full-size (≥ band)
            var i = 0
            while (i <= levels) {
              val ps = u8()
              require((ps & 0x0F) >= 8 && ((ps >> 4) & 0x0F) >= 8,
                "precinct partitioning not supported")
              i += 1
            }
          }
          p = base + lcod - 2
        case 0xFF5C => // QCD
          val lqcd = u16(); val base = p
          val sq = u8()
          qStyle = sq & 0x1F
          guard = (sq >> 5) & 0x7
          qStyle match {
            case 0 => // no quantization (reversible): 8-bit exponents
              expnts = Array.fill(lqcd - 3)(u8() >> 3)
            case 1 | 2 => // scalar derived / expounded: 16-bit (ε, μ)
              val nb = (lqcd - 3) / 2
              require(nb >= 1, s"QCD style $qStyle with no step sizes")
              expnts = new Array[Int](nb); qMants = new Array[Int](nb)
              var i = 0
              while (i < nb) {
                val v = u16()
                expnts(i) = v >> 11; qMants(i) = v & 0x7FF
                i += 1
              }
            case s =>
              throw new IllegalArgumentException(s"unsupported quantization style $s")
          }
          p = base + lqcd - 2
        case 0xFF64 | 0xFF63 | 0xFF55 | 0xFF57 | 0xFF58 =>
          // COM, CRG, TLM, PLM, PLT — informational pointers, skip.
          // PPM/PPT (relocated packet headers), COC/QCC (per-component
          // overrides), RGN (ROI) and POC all CHANGE decoding and fall
          // through to the loud unsupported-marker failure below.
          val l = u16(); p += l - 2
        case 0xFF90 => sotSeen = true
        case m =>
          throw new IllegalArgumentException(f"unsupported marker 0x$m%04x in main header")
      }
    }
    require(w > 0 && h > 0 && w.toLong * h <= (1L << 26),
      s"implausible image shape ${w}x$h (corrupt SIZ?)")
    require(w > 0 && h > 0 && depth > 0 && levels >= 0 && expnts != null,
      "incomplete main header (need SIZ, COD, QCD before SOT)")
    // T.800 pairs the transforms with their quantization modes: the
    // reversible 5/3 carries style-0 (no quantization, exponents
    // only); the irreversible 9/7 carries scalar quantization
    // (derived or expounded). A crossed combination has no defined
    // step sizes — refuse rather than guess.
    require(irreversible == (qStyle != 0),
      s"transform/quantization mismatch: ${if (irreversible) "9/7" else "5/3"} " +
        s"with QCD style $qStyle")
    if (qStyle == 2)
      require(expnts.length >= 3 * levels + 1,
        s"expounded QCD carries ${expnts.length} step sizes for ${3 * levels + 1} subbands")

    // SOT (marker already consumed)
    val lsot = u16()
    require(lsot == 10, s"bad Lsot $lsot")
    u16() // Isot
    u32() // Psot (single tile-part: data runs to EOC)
    val tpsot = u8()
    require(tpsot == 0, "multiple tile-parts not supported")
    u8() // TNsot
    // skip tile-part header markers until SOD
    var sodSeen = false
    while (!sodSeen) {
      val m = u16()
      if (m == 0xFF93) sodSeen = true
      else if (m == 0xFF58 || m == 0xFF64) { val l = u16(); p += l - 2 } // PLT, COM
      else throw new IllegalArgumentException(f"unsupported marker 0x$m%04x in tile header")
    }

    // decode packets, resolution-major
    val a = new Array[Int](w * h)
    val fa = if (irreversible) new Array[Double](w * h) else null
    var r = 0
    while (r <= levels) {
      if (sopUsed && p + 1 < end &&
        (bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) == 0x91) p += 6
      val br = new HeaderBitReader(bytes, p)
      val bands = bandsAtRes(w, h, levels, r)
      case class Contrib(band: Int, bx0: Int, by0: Int, x0: Int, y0: Int,
                         cw: Int, ch: Int, numbps: Int, passes: Int, segLen: Int,
                         delta: Double)
      val contribs = ArrayBuffer[Contrib]()
      if (br.bit() == 1) {
        for ((band, bx0, by0, bw0, bh0) <- bands) {
          val nbx = (bw0 + cbw - 1) / cbw
          val nby = (bh0 + cbh - 1) / cbh
          if (nbx > 0 && nby > 0) {
            val sbIdx = if (r == 0) 0 else 1 + 3 * (r - 1) + (band - 1)
            // Effective (ε, μ) for this subband: style 2 transmits one
            // entry per subband in sbIdx order; style 1 (derived)
            // transmits only the LL pair and scales by decomposition
            // depth, ε_b = ε0 − N_L + n_b (E-5), n_b = number of
            // decompositions from the original image to the subband.
            val (epsB, muB) =
              if (qStyle == 1) {
                val nB = if (r == 0) levels else levels - r + 1
                (expnts(0) - levels + nB, qMants(0))
              } else {
                require(sbIdx < expnts.length, "QCD carries too few subband exponents")
                (expnts(sbIdx), if (qStyle == 0) 0 else qMants(sbIdx))
              }
            // Δ_b = 2^(R_b − ε_b)·(1 + μ_b/2^11), R_b = B + band gain
            // (E.1.1). Unused (1.0) on the reversible path.
            val delta =
              if (!irreversible) 1.0
              else math.pow(2.0, depth + bandGain(band) - epsB) * (1.0 + muB / 2048.0)
            val mb = guard + epsB - 1
            require(mb >= 1 && mb <= 30, s"implausible Mb $mb")
            val incl = new TagTree(nbx, nby)
            val zbp = new TagTree(nbx, nby)
            for (cy <- 0 until nby; cx <- 0 until nbx) {
              incl.decode(cx, cy, 1, br)
              val included = incl.leafKnown(cx, cy) && incl.leafValue(cx, cy) < 1
              if (included) {
                // zero-bitplanes: raise threshold until resolved
                var thr = 1
                while (!zbp.leafKnown(cx, cy)) {
                  zbp.decode(cx, cy, thr, br)
                  thr += 1
                }
                val zeroPlanes = zbp.leafValue(cx, cy)
                val numbps = mb - zeroPlanes
                require(numbps >= 1, s"zero-bitplanes $zeroPlanes ≥ Mb $mb")
                // passes (Table B.4)
                val np =
                  if (br.bit() == 0) 1
                  else if (br.bit() == 0) 2
                  else {
                    val v2 = br.bits(2)
                    if (v2 < 3) 3 + v2
                    else {
                      val v5 = br.bits(5)
                      if (v5 < 31) 6 + v5 else 37 + br.bits(7)
                    }
                  }
                var lblock = 3
                while (br.bit() == 1) lblock += 1
                val segLen = br.bits(lblock + floorLog2(np))
                val x0 = cx * cbw; val y0 = cy * cbh
                contribs += Contrib(band, bx0, by0, x0, y0,
                  math.min(cbw, bw0 - x0), math.min(cbh, bh0 - y0),
                  numbps, np, segLen, delta)
              }
            }
          }
        }
      }
      p = br.bodyStart()
      if (ephUsed) {
        require((bytes(p) & 0xFF) == 0xFF && (bytes(p + 1) & 0xFF) == 0x92,
          "EPH flagged but missing")
        p += 2
      }
      for (cb <- contribs) {
        val coeffs = t1Decode(bytes, p, p + cb.segLen, cb.cw, cb.ch, cb.band,
          cb.numbps, cb.passes)
        var yy = 0
        while (yy < cb.ch) {
          var xx = 0
          while (xx < cb.cw) {
            val dst = (cb.by0 + cb.y0 + yy) * w + (cb.bx0 + cb.x0 + xx)
            val q = coeffs(yy * cb.cw + xx)
            if (irreversible) {
              // Mid-bin reconstruction (E.1.1.2 with r = 1/2, the
              // choice openjpeg's Tier-1 bakes in via oneplushalf):
              // x̂ = sign(q)·(|q| + ½)·Δ_b for q ≠ 0. With a fully
              // coded single-layer stream |q| is the exact quantizer
              // output, so the ½ places the value at its bin center.
              if (q != 0)
                fa(dst) = (if (q < 0) -(math.abs(q) + 0.5) else q + 0.5) * cb.delta
            } else a(dst) = q
            xx += 1
          }
          yy += 1
        }
        p += cb.segLen
      }
      r += 1
    }

    if (irreversible) {
      dwtInverse97(fa, w, h, levels)
      val shift = if (signed) 0 else 1 << (depth - 1)
      val lo = if (signed) -(1 << (depth - 1)) else 0
      val hi = (if (signed) (1 << (depth - 1)) else (1 << depth)) - 1
      var i = 0
      while (i < a.length) {
        val v = math.round(fa(i) + shift).toInt
        a(i) = math.max(lo, math.min(hi, v))
        i += 1
      }
    } else {
      dwtInverse(a, w, h, levels)
      if (!signed) {
        val shift = 1 << (depth - 1)
        var i = 0
        while (i < a.length) { a(i) += shift; i += 1 }
      }
    }
    Image(w, h, depth, signed, a)
  }
}
