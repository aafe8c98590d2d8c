package graft.sources

/** HDF5 szip filter (filter id 4) decoded through the self-contained
  * CCSDS 121.0-B extended-Rice coder in [[Ccsds]] — szip IS that
  * algorithm (libaec, which replaced the license-encumbered szlib,
  * serves both its `aec` and `sz_` entry points from one codec; the
  * reference reads szip-filtered NetCDF-4 via h5netcdf → HDF5 →
  * libaec, georiva formats/netcdf.py:33-366).
  *
  * Filter client data, per HDF5's H5Zszip set_local convention:
  * cd[0] options mask, cd[1] bits per pixel, cd[2] pixels per block,
  * cd[3] pixels per scanline. HDF5 always stores RAW mode (bit 7): no
  * szip stream header, just the entropy-coded blocks. The mapping onto
  * the CCSDS profile:
  *
  *  - EC (mask bit 4) = plain entropy coding; NN (bit 32) = the
  *    unit-delay nearest-neighbour predictor = CCSDS preprocessing.
  *  - Each scanline is an independent reference-sample interval whose
  *    coded bits are byte-aligned, i.e. rsi = scanline/block with the
  *    pad-RSI flag; scanlines that are not a whole number of blocks
  *    fail loudly (HDF5's set_local always emits aligned ones).
  *  - MSB (bit 16) / LSB (bit 8) describe the byte order of the
  *    UNCOMPRESSED multi-byte samples only (HDF5 sets them from the
  *    dataset's datatype byte order); the coded stream is bit-packed
  *    MSB-first either way, so the option only drives the final
  *    sample→bytes serialization here.
  *
  * Supported: 8/16/24-bit samples, block sizes 8/16/32 (the CCSDS J
  * values szip's ≤32 range admits; 64 would be legal CCSDS but szip
  * caps blocks at 32 pixels), and 32-bit samples via szlib's
  * byte-plane recoding (libaec sz_compat.c `interleave_buffer`: byte j
  * of every sample is gathered into contiguous plane j BEFORE entropy
  * coding, then the 4n-byte plane-major stream is Rice-coded as 8-bit
  * samples with the SAME pixels-per-block/scanline geometry — float
  * sign/exponent planes are smooth, mantissa planes noisy, which is
  * the point of the recode). The MSB/LSB option is a no-op for 32-bit
  * data: the interleave permutes raw bytes and its inverse restores
  * them verbatim, whatever their order (libaec behaves identically —
  * with 8-bit AEC samples the byte-order flag has nothing to order).
  * The CHIP option fails loudly; the ALLOW-K13 bit is accepted and
  * ignored — it only constrains the ENCODER's split-exponent choice
  * (H5Pset_szip ORs it in by default), so real files carry it and a
  * decoder's behavior is identical either way. Every guard names
  * the feature.
  */
object Szip {

  final val MaskAllowK13 = 1
  final val MaskChip = 2
  final val MaskEc = 4
  final val MaskLsb = 8
  final val MaskMsb = 16
  final val MaskNn = 32
  final val MaskRaw = 128

  private def params(cd: Array[Int]): (Int, Int, Int, Int) = {
    require(cd.length >= 4,
      s"szip filter needs 4 client-data values, got ${cd.length}")
    (cd(0), cd(1), cd(2), cd(3))
  }

  private def ccsdsShape(options: Int, bpp: Int, ppb: Int, ppsl: Int,
                         rawSize: Int, elemSize: Int): (Int, Int, Int) = {
    require(rawSize > 0, "szip needs the unfiltered chunk size " +
      "(szip-filtered fractal heap blocks not supported)")
    require((options & MaskChip) == 0, "szip CHIP option not supported")
    require(bpp == 8 || bpp == 16 || bpp == 24,
      s"szip bits-per-pixel $bpp not supported (8/16/24 direct, 32 interleaved)")
    require(bpp == elemSize * 8,
      s"szip bits-per-pixel $bpp does not match the ${elemSize}-byte datatype")
    require(ppb == 8 || ppb == 16 || ppb == 32,
      s"szip pixels-per-block $ppb not supported (CCSDS J of 8/16/32 only)")
    require(ppsl >= ppb && ppsl % ppb == 0,
      s"szip pixels-per-scanline $ppsl not a whole number of $ppb-pixel blocks")
    require(rawSize % elemSize == 0,
      s"szip chunk of $rawSize bytes is not whole ${elemSize}-byte samples")
    val count = rawSize / elemSize
    (count, ppb, ppsl / ppb)
  }

  private def flagsOf(options: Int): Int =
    Ccsds.FlagPadRsi |
      (if ((options & MaskNn) != 0) Ccsds.FlagPreprocess else 0)

  /** Geometry checks shared by the 32-bit byte-plane path (the sample
    * path's [[ccsdsShape]] additionally pins bpp ∈ 8/16/24). */
  private def planeShape(options: Int, ppb: Int, ppsl: Int, rawSize: Int,
                         elemSize: Int): (Int, Int) = {
    require(rawSize > 0, "szip needs the unfiltered chunk size " +
      "(szip-filtered fractal heap blocks not supported)")
    require((options & MaskChip) == 0, "szip CHIP option not supported")
    require(elemSize == 4,
      s"szip bits-per-pixel 32 on a ${elemSize}-byte datatype")
    require(ppb == 8 || ppb == 16 || ppb == 32,
      s"szip pixels-per-block $ppb not supported (CCSDS J of 8/16/32 only)")
    require(ppsl >= ppb && ppsl % ppb == 0,
      s"szip pixels-per-scanline $ppsl not a whole number of $ppb-pixel blocks")
    require(rawSize % 4 == 0,
      s"szip chunk of $rawSize bytes is not whole 4-byte samples")
    (ppb, ppsl / ppb)
  }

  /** szlib's 32-bit byte-plane permutation (libaec sz_compat.c
    * `interleave_buffer`): dest[j·n + i] = src[i·4 + j]. */
  private def interleave(src: Array[Byte]): Array[Int] = {
    val n = src.length / 4
    val out = new Array[Int](src.length)
    var i = 0
    while (i < n) {
      var j = 0
      while (j < 4) { out(j * n + i) = src(i * 4 + j) & 0xff; j += 1 }
      i += 1
    }
    out
  }

  /** Decode one szip-filtered chunk back to raw little/big-endian
    * sample bytes (the byte order the LSB/MSB option masks declare). */
  def decode(data: Array[Byte], cd: Array[Int], rawSize: Int,
             elemSize: Int): Array[Byte] = {
    val (options, bpp, ppb, ppsl) = params(cd)
    if (bpp == 32) { // byte-plane recoding: 4n 8-bit samples, plane-major
      val (j32, rsi32) = planeShape(options, ppb, ppsl, rawSize, elemSize)
      val planes = Ccsds.decode(data, 0, data.length, rawSize, 8, j32, rsi32,
        flagsOf(options))
      val n = rawSize / 4
      val out = new Array[Byte](rawSize)
      var i = 0
      while (i < n) {
        var b = 0
        while (b < 4) { out(i * 4 + b) = planes(b * n + i).toByte; b += 1 }
        i += 1
      }
      return out
    }
    val (count, j, rsi) = ccsdsShape(options, bpp, ppb, ppsl, rawSize, elemSize)
    val samples = Ccsds.decode(data, 0, data.length, count, bpp, j, rsi,
      flagsOf(options))
    val out = new Array[Byte](rawSize)
    val msb = (options & MaskMsb) != 0
    var i = 0
    while (i < count) {
      val v = samples(i)
      var b = 0
      while (b < elemSize) {
        val shift = if (msb) 8 * (elemSize - 1 - b) else 8 * b
        out(i * elemSize + b) = ((v >> shift) & 0xff).toByte
        b += 1
      }
      i += 1
    }
    out
  }

  /** Encode raw sample bytes the way [[decode]] expects them back —
    * the fixture writer for the spec round-trips. */
  def encode(raw: Array[Byte], cd: Array[Int], elemSize: Int): Array[Byte] = {
    val (options, bpp, ppb, ppsl) = params(cd)
    if (bpp == 32) {
      val (j32, rsi32) = planeShape(options, ppb, ppsl, raw.length, elemSize)
      return Ccsds.encode(interleave(raw), 8, j32, rsi32, flagsOf(options))
    }
    val (count, j, rsi) = ccsdsShape(options, bpp, ppb, ppsl, raw.length, elemSize)
    val msb = (options & MaskMsb) != 0
    val samples = new Array[Int](count)
    var i = 0
    while (i < count) {
      var v = 0
      var b = 0
      while (b < elemSize) {
        val shift = if (msb) 8 * (elemSize - 1 - b) else 8 * b
        v |= (raw(i * elemSize + b) & 0xff) << shift
        b += 1
      }
      samples(i) = v
      i += 1
    }
    Ccsds.encode(samples, bpp, j, rsi, flagsOf(options))
  }
}
