package graft.sources

/** Baseline JPEG (ITU-T T.81 sequential DCT, 8-bit) codec, serving
  * TIFF compression 7 — the encoding of aerial-imagery COGs — and the
  * multimodal decode path. The reference reads JPEG-in-TIFF through
  * rasterio/libjpeg (georiva formats/geotiff.py delegates to rasterio);
  * this is the JVM-native equivalent written from the public T.81
  * spec. No external libraries.
  *
  * Decoder coverage (what libjpeg/GDAL emit inside TIFF tiles):
  *  - SOF0 baseline and SOF1 extended-sequential frames, 8-bit,
  *    1 component (grayscale) or 3 components (YCbCr or RGB)
  *  - arbitrary sampling factors 1-4 per component (4:4:4, 4:2:2,
  *    4:2:0 chroma subsampling), single interleaved scan
  *  - DQT 8-bit and 16-bit precision tables, multiple per segment
  *  - DHT canonical Huffman tables (T.81 annex C assignment)
  *  - DRI restart intervals with RST0-7 marker resync
  *  - 0xFF00 byte stuffing; APPn/COM segments skipped
  *  - ABBREVIATED streams (tables in a separate stream — the TIFF
  *    JPEGTables tag 347 form): [[parseTables]] seeds a [[Tables]]
  *    that [[decode]] completes from the per-tile scan stream
  *
  * Unsupported inputs FAIL LOUDLY (progressive SOF2, arithmetic
  * coding SOF9+, hierarchical, 12-bit precision, >4 components):
  * a granule never decodes to wrong numbers.
  *
  * The encoder exists to fabricate honest fixtures and to serve
  * [[GeoTiff.writeCog]] compression 7: uniform quantization (q=1 by
  * default, near-lossless through the float DCT round-trip), custom
  * canonical Huffman tables carried in the stream, optional 4:2:0
  * subsampling and restart markers, and an abbreviated-stream mode
  * mirroring what GDAL writes (shared JPEGTables + per-tile scans).
  */
object JpegCodec {

  /** Decoded image: 8-bit chunky samples, `comps` per pixel (1 gray,
    * 3 RGB after YCbCr conversion, or raw components when
    * `colorTransform = false`). */
  case class Image(width: Int, height: Int, comps: Int, data: Array[Byte])

  // natural position of zigzag index k (T.81 figure 5)
  private[sources] val Zigzag: Array[Int] = Array(
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63)

  // cos((2x+1)·u·π/16) and the C(u) normalization, shared by both DCTs
  private val CosT: Array[Array[Double]] =
    Array.tabulate(8, 8)((u, x) => math.cos((2 * x + 1) * u * math.Pi / 16))
  private val Cn: Array[Double] =
    Array.tabulate(8)(u => if (u == 0) 1.0 / math.sqrt(2) else 1.0)

  // ---- Huffman tables (T.81 annex C canonical assignment) ---------

  /** `bits(l-1)` = number of codes of length l (1..16); `vals` in
    * code order. Builds both the decoder's mincode/maxcode/valptr
    * walk (F.2.2.3) and the encoder's symbol -> (code, length) map. */
  private[sources] final class Huff(val bits: Array[Int], val vals: Array[Int]) {
    require(bits.length == 16 && vals.length == bits.sum,
      s"DHT counts ${bits.sum} != ${vals.length} values")
    val minCode = new Array[Int](17)
    val maxCode = Array.fill(17)(-1) // -1 = no codes of this length
    val valPtr = new Array[Int](17)
    private var code = 0; private var k = 0
    for (l <- 1 to 16) {
      if (bits(l - 1) > 0) {
        valPtr(l) = k; minCode(l) = code
        code += bits(l - 1); k += bits(l - 1)
        maxCode(l) = code - 1
      }
      code <<= 1
    }
    require(k == vals.length, "huffman table over-subscribed")
    // encoder view: symbol -> (code, len)
    lazy val enc: Map[Int, (Int, Int)] = {
      var c = 0; var i = 0
      val m = Map.newBuilder[Int, (Int, Int)]
      for (l <- 1 to 16) {
        for (_ <- 0 until bits(l - 1)) { m += ((vals(i), (c, l))); c += 1; i += 1 }
        c <<= 1
      }
      m.result()
    }
  }

  /** Mutable table state so abbreviated streams (TIFF JPEGTables)
    * can seed tables once and reuse them across tile scans. */
  final class Tables {
    val quant = new Array[Array[Int]](4) // zigzag order, as serialized
    val dc = new Array[Huff](4)
    val ac = new Array[Huff](4)
    var restartInterval = 0
  }

  // ---- bit IO with 0xFF00 stuffing --------------------------------

  private final class BitReader(b: Array[Byte], var pos: Int) {
    private var acc = 0; private var cnt = 0
    def bit(): Int = {
      if (cnt == 0) {
        require(pos < b.length, "JPEG scan data truncated")
        val v = b(pos) & 0xff; pos += 1
        if (v == 0xff) {
          require(pos < b.length, "JPEG scan data truncated at 0xFF")
          val nb = b(pos) & 0xff
          require(nb == 0x00,
            f"unexpected marker 0xFF$nb%02X inside entropy-coded data")
          pos += 1
        }
        acc = v; cnt = 8
      }
      cnt -= 1
      (acc >> cnt) & 1
    }
    def bits(n: Int): Int = { var v = 0; var i = 0; while (i < n) { v = (v << 1) | bit(); i += 1 }; v }
    /** Byte-align and consume the expected RSTn marker. */
    def restart(n: Int): Unit = {
      cnt = 0
      require(pos + 1 < b.length, "JPEG truncated at restart marker")
      val m = ((b(pos) & 0xff) << 8) | (b(pos + 1) & 0xff)
      require(m == 0xffd0 + n, f"expected RST$n marker, found 0x$m%04X")
      pos += 2
    }
  }

  private final class BitWriter(out: java.io.ByteArrayOutputStream) {
    private var acc = 0; private var cnt = 0
    def put(code: Int, len: Int): Unit = {
      var i = len - 1
      while (i >= 0) {
        acc = (acc << 1) | ((code >> i) & 1); cnt += 1
        if (cnt == 8) {
          out.write(acc)
          if (acc == 0xff) out.write(0x00) // byte stuffing
          acc = 0; cnt = 0
        }
        i -= 1
      }
    }
    /** Pad the final partial byte with 1-bits (T.81 F.1.2.3). */
    def flush(): Unit = if (cnt > 0) { put(0xff, 8 - cnt) } // fills to byte
  }

  private def extend(v: Int, t: Int): Int =
    if (t == 0) 0 else if (v < (1 << (t - 1))) v - (1 << t) + 1 else v

  // ---- decoder ----------------------------------------------------

  private case class Comp(id: Int, h: Int, v: Int, tq: Int,
                          var td: Int = 0, var ta: Int = 0)

  /** Parse a tables-only stream (the TIFF JPEGTables tag: SOI,
    * DQT/DHT/DRI segments, EOI) into `t`. Frame/scan markers here are
    * a malformed tables stream — fail loudly. */
  def parseTables(b: Array[Byte], t: Tables): Unit = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "JPEGTables stream has no SOI")
    var p = 2
    while (p < b.length) {
      require((b(p) & 0xff) == 0xff, f"bad marker byte at $p")
      val m = b(p + 1) & 0xff; p += 2
      m match {
        case 0xd9 => return // EOI
        case 0xdb | 0xc4 | 0xdd =>
          val len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
          segment(b, p + 2, p + len, m, t); p += len
        case 0xd8 => // repeated SOI: ignore
        case other if other >= 0xe0 && other <= 0xef => // APPn
          p += ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
        case other =>
          throw new IllegalArgumentException(
            f"marker 0xFF$other%02X not allowed in a JPEGTables stream")
      }
    }
  }

  private def segment(b: Array[Byte], from: Int, to: Int, marker: Int, t: Tables): Unit =
    marker match {
      case 0xdb => // DQT: repeated (pq<<4|tq, 64 entries)
        var p = from
        while (p < to) {
          val pqtq = b(p) & 0xff; p += 1
          val pq = pqtq >> 4; val tq = pqtq & 15
          require(pq <= 1, s"bad DQT precision $pq")
          require(tq < 4, s"bad DQT id $tq")
          val q = new Array[Int](64)
          var i = 0
          while (i < 64) {
            q(i) = if (pq == 0) b(p) & 0xff
                   else ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
            p += 1 + pq; i += 1
          }
          t.quant(tq) = q
        }
      case 0xc4 => // DHT: repeated (tc<<4|th, bits[16], vals)
        var p = from
        while (p < to) {
          val tcth = b(p) & 0xff; p += 1
          val tc = tcth >> 4; val th = tcth & 15
          require(tc <= 1 && th < 4, s"bad DHT class/id $tc/$th")
          val bits = Array.tabulate(16)(i => b(p + i) & 0xff); p += 16
          val n = bits.sum
          val vals = Array.tabulate(n)(i => b(p + i) & 0xff); p += n
          val h = new Huff(bits, vals)
          if (tc == 0) t.dc(th) = h else t.ac(th) = h
        }
      case 0xdd => // DRI
        t.restartInterval = ((b(from) & 0xff) << 8) | (b(from + 1) & 0xff)
      case _ => sys.error("unreachable")
    }

  /** Decode a complete or abbreviated (pre-seeded tables) stream.
    * `colorTransform`: convert 3-component YCbCr to RGB (the JFIF and
    * TIFF photometric-6 convention); pass false for photometric-2 RGB
    * streams, which carry components untransformed. */
  def decode(b: Array[Byte], pre: Option[Tables] = None,
             colorTransform: Boolean = true): Image = {
    require(b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8,
      "not a JPEG stream (no SOI)")
    val t = new Tables
    pre.foreach { s =>
      Array.copy(s.quant, 0, t.quant, 0, 4)
      Array.copy(s.dc, 0, t.dc, 0, 4)
      Array.copy(s.ac, 0, t.ac, 0, 4)
      t.restartInterval = s.restartInterval
    }
    var p = 2
    var w = 0; var h = 0
    var comps: Array[Comp] = null
    var scanStart = -1
    while (scanStart < 0) {
      require(p + 1 < b.length, "JPEG truncated before SOS")
      require((b(p) & 0xff) == 0xff, f"bad marker byte at $p: 0x${b(p) & 0xff}%02X")
      val m = b(p + 1) & 0xff; p += 2
      def len = ((b(p) & 0xff) << 8) | (b(p + 1) & 0xff)
      m match {
        case 0xc0 | 0xc1 => // SOF0 baseline / SOF1 extended sequential
          val prec = b(p + 2) & 0xff
          require(prec == 8, s"unsupported JPEG sample precision $prec (8-bit only)")
          h = ((b(p + 3) & 0xff) << 8) | (b(p + 4) & 0xff)
          w = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
          val nc = b(p + 7) & 0xff
          require(nc == 1 || nc == 3,
            s"unsupported JPEG component count $nc (grayscale or YCbCr/RGB only)")
          comps = Array.tabulate(nc) { i =>
            val o = p + 8 + i * 3
            val hv = b(o + 1) & 0xff
            val c = Comp(b(o) & 0xff, hv >> 4, hv & 15, b(o + 2) & 0xff)
            require(c.h >= 1 && c.h <= 4 && c.v >= 1 && c.v <= 4,
              s"bad sampling factors ${c.h}x${c.v}")
            c
          }
          p += len
        case 0xc2 =>
          throw new IllegalArgumentException(
            "progressive JPEG (SOF2) not supported (baseline/extended sequential only)")
        case other if other == 0xc3 || (other >= 0xc5 && other <= 0xc7) ||
                      (other >= 0xc9 && other <= 0xcb) || (other >= 0xcd && other <= 0xcf) =>
          throw new IllegalArgumentException(
            f"unsupported JPEG frame type SOF 0x$other%02X (baseline/extended sequential only)")
        case 0xdb | 0xc4 | 0xdd => segment(b, p + 2, p + len, m, t); p += len
        case 0xda => // SOS
          require(comps != null, "SOS before SOF")
          val ns = b(p + 2) & 0xff
          require(ns == comps.length,
            s"multi-scan JPEG not supported ($ns of ${comps.length} components in scan)")
          for (i <- 0 until ns) {
            val o = p + 3 + i * 2
            val cid = b(o) & 0xff
            val c = comps.find(_.id == cid).getOrElse(
              sys.error(s"SOS component $cid not in frame"))
            c.td = (b(o + 1) & 0xff) >> 4; c.ta = b(o + 1) & 15
          }
          val so = p + 3 + ns * 2
          val ss = b(so) & 0xff; val se = b(so + 1) & 0xff
          require(ss == 0 && se == 63, s"non-baseline spectral selection $ss..$se")
          scanStart = p + len
        case 0xd9 => throw new IllegalArgumentException("EOI before SOS")
        case other if (other >= 0xe0 && other <= 0xef) || other == 0xfe => p += len
        case other =>
          throw new IllegalArgumentException(f"unsupported JPEG marker 0xFF$other%02X")
      }
    }

    val hmax = comps.map(_.h).max; val vmax = comps.map(_.v).max
    val mcusX = (w + 8 * hmax - 1) / (8 * hmax)
    val mcusY = (h + 8 * vmax - 1) / (8 * vmax)
    // per-component plane, MCU-padded
    val planeW = comps.map(c => mcusX * 8 * c.h)
    val planeH = comps.map(c => mcusY * 8 * c.v)
    val planes = comps.indices.map(i => new Array[Byte](planeW(i) * planeH(i))).toArray

    val br = new BitReader(b, scanStart)
    val pred = new Array[Int](comps.length)
    val coef = new Array[Double](64)
    var mcu = 0
    val nMcus = mcusX * mcusY
    var rst = 0
    while (mcu < nMcus) {
      if (t.restartInterval > 0 && mcu > 0 && mcu % t.restartInterval == 0) {
        br.restart(rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < comps.length) {
        val c = comps(ci)
        val dcH = t.dc(c.td); val acH = t.ac(c.ta); val q = t.quant(c.tq)
        require(dcH != null && acH != null && q != null,
          s"scan references undefined table (dc ${c.td} ac ${c.ta} q ${c.tq})")
        var bv = 0
        while (bv < c.v) {
          var bh = 0
          while (bh < c.h) {
            java.util.Arrays.fill(coef, 0.0)
            // DC
            val tcat = huffDecode(br, dcH)
            require(tcat <= 15, s"bad DC category $tcat")
            pred(ci) += extend(br.bits(tcat), tcat)
            coef(0) = pred(ci).toDouble * q(0)
            // AC
            var k = 1
            var eob = false
            while (k < 64 && !eob) {
              val rs = huffDecode(br, acH)
              val r = rs >> 4; val s = rs & 15
              if (s == 0) { if (r == 15) k += 16 else eob = true }
              else {
                k += r
                require(k < 64, "AC run overflows block")
                coef(Zigzag(k)) = extend(br.bits(s), s).toDouble * q(k)
                k += 1
              }
            }
            idctInto(coef, planes(ci), planeW(ci),
              (my * c.v + bv) * 8, (mx * c.h + bh) * 8)
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }

    // upsample (box replication) + interleave + color transform
    val nc = comps.length
    val out = new Array[Byte](w * h * nc)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val o = (y * w + x) * nc
        if (nc == 1) out(o) = planes(0)((y * comps(0).v / vmax) * planeW(0) + x * comps(0).h / hmax)
        else {
          var s0 = 0; var s1 = 0; var s2 = 0
          var i = 0
          while (i < 3) {
            val c = comps(i)
            val v = planes(i)((y * c.v / vmax) * planeW(i) + x * c.h / hmax) & 0xff
            if (i == 0) s0 = v else if (i == 1) s1 = v else s2 = v
            i += 1
          }
          if (colorTransform) {
            val r = s0 + 1.402 * (s2 - 128)
            val g = s0 - 0.344136 * (s1 - 128) - 0.714136 * (s2 - 128)
            val bch = s0 + 1.772 * (s1 - 128)
            out(o) = clamp8(r); out(o + 1) = clamp8(g); out(o + 2) = clamp8(bch)
          } else { out(o) = s0.toByte; out(o + 1) = s1.toByte; out(o + 2) = s2.toByte }
        }
        x += 1
      }
      y += 1
    }
    Image(w, h, nc, out)
  }

  private def huffDecode(br: BitReader, h: Huff): Int = {
    var code = br.bit(); var l = 1
    while (code > h.maxCode(l)) {
      require(l < 16, "invalid Huffman code (no symbol within 16 bits)")
      code = (code << 1) | br.bit(); l += 1
    }
    h.vals(h.valPtr(l) + code - h.minCode(l))
  }

  private def clamp8(v: Double): Byte = {
    val r = math.round(v).toInt
    (if (r < 0) 0 else if (r > 255) 255 else r).toByte
  }

  /** Separable IDCT: a column pass then a row pass (128 8-tap dot
    * products instead of the 4096-term direct form). */
  private def idctInto(coef: Array[Double], plane: Array[Byte], pw: Int,
                       py: Int, px: Int): Unit = {
    val tmp = new Array[Double](64) // tmp(u + y*8) = Σ_v C(v) F(u,v) cos_v(y)
    var y = 0
    while (y < 8) {
      var u = 0
      while (u < 8) {
        var s = 0.0
        var v = 0
        while (v < 8) {
          val f = coef(v * 8 + u)
          if (f != 0.0) s += Cn(v) * f * CosT(v)(y)
          v += 1
        }
        tmp(y * 8 + u) = s
        u += 1
      }
      y += 1
    }
    y = 0
    while (y < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var u = 0
        while (u < 8) { s += Cn(u) * tmp(y * 8 + u) * CosT(u)(x); u += 1 }
        val r = math.round(s / 4 + 128).toInt
        plane((py + y) * pw + px + x) =
          (if (r < 0) 0 else if (r > 255) 255 else r).toByte
        x += 1
      }
      y += 1
    }
  }

  // ---- encoder ----------------------------------------------------

  // fixture/writer tables: canonical, incomplete trees (no all-ones
  // code), carried in the stream so any T.81 decoder reads them
  private val EncDcHuff = new Huff(
    Array(0, 0, 0, 11, 1, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0),
    Array.tabulate(12)(identity))
  private val EncAcHuff = new Huff(
    Array(0, 0, 0, 0, 0, 0, 0, 162, 0, 0, 0, 0, 0, 0, 0, 0),
    (Seq(0x00, 0xf0) ++ (for (r <- 0 to 15; s <- 1 to 10) yield (r << 4) | s)).toArray)

  /** Encode 8-bit chunky samples (1 or 3 components). 3-component
    * input is taken as RGB and forward-transformed to YCbCr.
    * `quant`: uniform quantizer step (1 = near-lossless).
    * `subsample420`: 2x2 chroma subsampling (3-component only).
    * `restartInterval`: RSTn cadence in MCUs, 0 = none.
    * `abbreviated`: return (tablesStream, scanStream) as the TIFF
    * JPEGTables tag splits them; otherwise scanStream contains all
    * tables (interchange format) and tablesStream is empty. */
  def encodeStreams(img: Image, quant: Int = 1, subsample420: Boolean = false,
                    restartInterval: Int = 0,
                    abbreviated: Boolean = false): (Array[Byte], Array[Byte]) = {
    require(img.comps == 1 || img.comps == 3, "encode: 1 or 3 components")
    require(!subsample420 || img.comps == 3, "subsampling needs 3 components")
    require(quant >= 1 && quant <= 255, "quant step in [1, 255]")
    val w = img.width; val h = img.height

    // component planes (YCbCr for color), MCU-padded by edge replication
    val hmax = if (subsample420) 2 else 1
    val mcuSz = 8 * hmax
    val mcusX = (w + mcuSz - 1) / mcuSz
    val mcusY = (h + mcuSz - 1) / mcuSz
    val sampOf = Array.tabulate(img.comps)(i => if (subsample420 && i > 0) 1 else hmax)
    // full-res padded planes first
    val fullW = mcusX * mcuSz; val fullH = mcusY * mcuSz
    val full = Array.fill(img.comps)(new Array[Int](fullW * fullH))
    var y = 0
    while (y < fullH) {
      val sy = math.min(y, h - 1)
      var x = 0
      while (x < fullW) {
        val sx = math.min(x, w - 1)
        val o = (sy * w + sx) * img.comps
        if (img.comps == 1) full(0)(y * fullW + x) = img.data(o) & 0xff
        else {
          val r = img.data(o) & 0xff; val g = img.data(o + 1) & 0xff; val b = img.data(o + 2) & 0xff
          full(0)(y * fullW + x) = clampI(0.299 * r + 0.587 * g + 0.114 * b)
          full(1)(y * fullW + x) = clampI(128 - 0.168736 * r - 0.331264 * g + 0.5 * b)
          full(2)(y * fullW + x) = clampI(128 + 0.5 * r - 0.418688 * g - 0.081312 * b)
        }
        x += 1
      }
      y += 1
    }
    // subsampled planes (box average) where sampling factor is 1 of 2
    val planes = Array.tabulate(img.comps) { i =>
      if (sampOf(i) == hmax) full(i)
      else {
        val sw = fullW / 2; val sh = fullH / 2
        val p = new Array[Int](sw * sh)
        for (yy <- 0 until sh; xx <- 0 until sw) {
          val s = full(i)(2 * yy * fullW + 2 * xx) + full(i)(2 * yy * fullW + 2 * xx + 1) +
            full(i)((2 * yy + 1) * fullW + 2 * xx) + full(i)((2 * yy + 1) * fullW + 2 * xx + 1)
          p(yy * sw + xx) = (s + 2) / 4
        }
        p
      }
    }
    val planeWs = Array.tabulate(img.comps)(i => if (sampOf(i) == hmax) fullW else fullW / 2)

    val qz = Array.fill(64)(quant)

    // ---- headers
    def seg(out: java.io.ByteArrayOutputStream, marker: Int, body: Array[Byte]): Unit = {
      out.write(0xff); out.write(marker)
      val len = body.length + 2
      out.write(len >> 8); out.write(len & 0xff); out.write(body, 0, body.length)
    }
    def dqtBody: Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write(0x00) // pq=0 tq=0
      qz.foreach(b.write)
      b.toByteArray
    }
    def dhtBody(tc: Int, th: Int, hf: Huff): Array[Byte] = {
      val b = new java.io.ByteArrayOutputStream()
      b.write((tc << 4) | th); hf.bits.foreach(b.write); hf.vals.foreach(b.write)
      b.toByteArray
    }
    def tablesInto(out: java.io.ByteArrayOutputStream): Unit = {
      seg(out, 0xdb, dqtBody)
      seg(out, 0xc4, dhtBody(0, 0, EncDcHuff))
      seg(out, 0xc4, dhtBody(1, 0, EncAcHuff))
      if (restartInterval > 0)
        seg(out, 0xdd, Array[Byte]((restartInterval >> 8).toByte, (restartInterval & 0xff).toByte))
    }

    val tablesOut = new java.io.ByteArrayOutputStream()
    val scanOut = new java.io.ByteArrayOutputStream()
    tablesOut.write(0xff); tablesOut.write(0xd8)
    scanOut.write(0xff); scanOut.write(0xd8)
    if (abbreviated) {
      tablesInto(tablesOut)
      tablesOut.write(0xff); tablesOut.write(0xd9)
    } else tablesInto(scanOut)

    // SOF0
    val sof = new java.io.ByteArrayOutputStream()
    sof.write(8); sof.write(h >> 8); sof.write(h & 0xff); sof.write(w >> 8); sof.write(w & 0xff)
    sof.write(img.comps)
    for (i <- 0 until img.comps) {
      sof.write(i + 1)
      sof.write(if (subsample420 && i == 0) 0x22 else 0x11)
      sof.write(0) // all components share quant table 0
    }
    seg(scanOut, 0xc0, sof.toByteArray)
    // SOS
    val sos = new java.io.ByteArrayOutputStream()
    sos.write(img.comps)
    for (i <- 0 until img.comps) { sos.write(i + 1); sos.write(0x00) } // dc 0 / ac 0
    sos.write(0); sos.write(63); sos.write(0)
    seg(scanOut, 0xda, sos.toByteArray)

    // ---- entropy-coded data
    val bw = new BitWriter(scanOut)
    val pred = new Array[Int](img.comps)
    val coef = new Array[Int](64)
    var rst = 0
    var mcu = 0
    val nMcus = mcusX * mcusY
    while (mcu < nMcus) {
      if (restartInterval > 0 && mcu > 0 && mcu % restartInterval == 0) {
        bw.flush()
        scanOut.write(0xff); scanOut.write(0xd0 + rst); rst = (rst + 1) & 7
        java.util.Arrays.fill(pred, 0)
      }
      val my = mcu / mcusX; val mx = mcu % mcusX
      var ci = 0
      while (ci < img.comps) {
        val hcv = if (subsample420 && ci == 0) 2 else 1
        var bv = 0
        while (bv < hcv) {
          var bh = 0
          while (bh < hcv) {
            fdct(planes(ci), planeWs(ci), (my * hcv + bv) * 8, (mx * hcv + bh) * 8, qz, coef)
            // DC
            val diff = coef(0) - pred(ci); pred(ci) = coef(0)
            val t0 = cat(diff)
            putSym(bw, EncDcHuff, t0); putAmp(bw, diff, t0)
            // AC
            var k = 1; var run = 0
            while (k < 64) {
              val v = coef(k)
              if (v == 0) run += 1
              else {
                while (run >= 16) { putSym(bw, EncAcHuff, 0xf0); run -= 16 }
                val s = cat(v)
                putSym(bw, EncAcHuff, (run << 4) | s); putAmp(bw, v, s)
                run = 0
              }
              k += 1
            }
            if (run > 0) putSym(bw, EncAcHuff, 0x00) // EOB
            bh += 1
          }
          bv += 1
        }
        ci += 1
      }
      mcu += 1
    }
    bw.flush()
    scanOut.write(0xff); scanOut.write(0xd9)
    (tablesOut.toByteArray, scanOut.toByteArray)
  }

  /** Interchange-format convenience: one self-contained stream. */
  def encode(img: Image, quant: Int = 1, subsample420: Boolean = false,
             restartInterval: Int = 0): Array[Byte] =
    encodeStreams(img, quant, subsample420, restartInterval)._2

  private def clampI(v: Double): Int = {
    val r = math.round(v).toInt
    if (r < 0) 0 else if (r > 255) 255 else r
  }

  private def cat(v: Int): Int = {
    var a = math.abs(v); var t = 0
    while (a != 0) { a >>= 1; t += 1 }
    t
  }

  private def putSym(bw: BitWriter, h: Huff, sym: Int): Unit = {
    val (c, l) = h.enc.getOrElse(sym,
      sys.error(f"symbol 0x$sym%02X not in encoder Huffman table"))
    bw.put(c, l)
  }

  private def putAmp(bw: BitWriter, v: Int, t: Int): Unit =
    if (t > 0) bw.put(if (v >= 0) v else v + (1 << t) - 1, t)

  /** Separable forward DCT of the 8x8 block at (py, px), quantized by
    * `qz` (zigzag-order steps), coefficients out in ZIGZAG order. */
  private def fdct(plane: Array[Int], pw: Int, py: Int, px: Int,
                   qz: Array[Int], out: Array[Int]): Unit = {
    val tmp = new Array[Double](64) // tmp(x + v*8) = Σ_y f(x,y) cos_v(y)
    var v = 0
    while (v < 8) {
      var x = 0
      while (x < 8) {
        var s = 0.0
        var y = 0
        while (y < 8) {
          s += (plane((py + y) * pw + px + x) - 128) * CosT(v)(y)
          y += 1
        }
        tmp(v * 8 + x) = s
        x += 1
      }
      v += 1
    }
    var k = 0
    while (k < 64) {
      val nat = Zigzag(k)
      val u = nat % 8; val vv = nat / 8
      var s = 0.0
      var x = 0
      while (x < 8) { s += CosT(u)(x) * tmp(vv * 8 + x); x += 1 }
      out(k) = math.round(s * Cn(u) * Cn(vv) / 4 / qz(k)).toInt
      k += 1
    }
  }
}
