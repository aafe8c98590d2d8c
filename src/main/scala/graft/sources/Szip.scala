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
  * caps blocks at 32 pixels). 32-bit samples (floats, ints) fail
  * loudly — szlib recodes those as interleaved byte streams, a layout
  * variant this engine has no fixture ground truth for. The CHIP option fails loudly; the ALLOW-K13 bit is accepted and
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
      s"szip bits-per-pixel $bpp not supported (8/16/24 only; " +
        "32-bit samples use szlib's interleaved byte-stream recoding)")
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

  /** Decode one szip-filtered chunk back to raw little/big-endian
    * sample bytes (the byte order the LSB/MSB option masks declare). */
  def decode(data: Array[Byte], cd: Array[Int], rawSize: Int,
             elemSize: Int): Array[Byte] = {
    val (options, bpp, ppb, ppsl) = params(cd)
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
