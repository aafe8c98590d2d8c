package graft.sources

/** HDF5 packed-bit filters: N-bit (filter id 5, `H5Znbit.c`) and
  * scale+offset (filter id 6, `H5Zscaleoffset.c`), per the public HDF5
  * source and the "n-bit and scale+offset filters" RFC. Both filters
  * emit one MSB-first bitstream: each element contributes a fixed
  * number of significant bits (the datatype's declared precision for
  * n-bit; the chunk's computed `minbits` for scale+offset), consumed
  * most-significant-bit first — byte-level equivalent of libhdf5's
  * `decompress_one_byte` walk from `begin_i` down to `end_i`.
  *
  * The reference reads both transparently via h5netcdf/libhdf5
  * (georiva `formats/netcdf.py:33-366`); stock h5py produces them with
  * `Dataset(..., scaleoffset=N)` and netcdf-c with `nc_def_var_quantize`
  * / nbit-enabled builds.
  *
  * Scope (fail-loud beyond it, FORMATS.md): atomic integer/float
  * datatypes only — the compound/array/no-op n-bit trees and the
  * E-scaling float mode (unimplemented in libhdf5 itself) raise.
  */
object H5Packed {

  // ---- MSB-first bitstream --------------------------------------

  private final class BitReader(buf: Array[Byte], start: Int) {
    private var j = start
    private var left = 8 // bits remaining in buf(j)
    def read(n: Int): Long = {
      var need = n
      var out = 0L
      while (need > 0) {
        require(j < buf.length, "packed bitstream truncated")
        val take = math.min(left, need)
        val v = (buf(j) >> (left - take)) & ((1 << take) - 1)
        out = (out << take) | (v & 0xffL)
        left -= take; need -= take
        if (left == 0) { j += 1; left = 8 }
      }
      out
    }
  }

  private final class BitWriter(expect: Int) {
    private val out = new java.io.ByteArrayOutputStream(expect)
    private var cur = 0
    private var used = 0 // bits used in cur
    def write(v: Long, n: Int): Unit = {
      var todo = n
      while (todo > 0) {
        val take = math.min(8 - used, todo)
        val bits = ((v >>> (todo - take)) & ((1L << take) - 1)).toInt
        cur = (cur << take) | bits
        used += take; todo -= take
        if (used == 8) { out.write(cur); cur = 0; used = 0 }
      }
    }
    def result(): Array[Byte] = {
      if (used > 0) { out.write(cur << (8 - used)); cur = 0; used = 0 }
      out.toByteArray
    }
  }

  private def putElem(dst: Array[Byte], at: Int, size: Int, bigEndian: Boolean,
                      v: Long): Unit = {
    var i = 0
    while (i < size) {
      val shift = if (bigEndian) 8 * (size - 1 - i) else 8 * i
      dst(at + i) = ((v >>> shift) & 0xff).toByte
      i += 1
    }
  }

  private def getElem(src: Array[Byte], at: Int, size: Int, bigEndian: Boolean): Long = {
    var v = 0L
    var i = 0
    while (i < size) {
      val shift = if (bigEndian) 8 * (size - 1 - i) else 8 * i
      v |= (src(at + i) & 0xffL) << shift
      i += 1
    }
    v
  }

  // ---- n-bit (filter 5) -----------------------------------------

  /** cd_values per `H5Z__set_local_nbit`: [0] valid-count, [1]
    * compression-needed flag, [2] chunk element count, then the
    * datatype description — atomic: [3]=1, [4] size, [5] byte order
    * (0 LE / 1 BE), [6] bit precision, [7] bit offset. */
  private def nbitParms(cd: Array[Int]): (Int, Int, Boolean, Int, Int) = {
    require(cd.length >= 8, s"nbit filter: ${cd.length} client values (need 8)")
    require(cd(3) == 1,
      s"nbit datatype tree class ${cd(3)} not supported (atomic integers only)")
    val size = cd(4); val order = cd(5); val precision = cd(6); val offset = cd(7)
    require(size >= 1 && size <= 8, s"nbit element size $size")
    require(order == 0 || order == 1, s"nbit byte order $order")
    require(precision >= 1 && offset >= 0 && precision + offset <= 8 * size,
      s"nbit precision $precision + offset $offset exceeds ${8 * size} bits")
    (cd(2), size, order == 1, precision, offset)
  }

  /** Unpack an n-bit chunk back to full-width elements; significant
    * bits return to [offset, offset+precision), padding bits zero. */
  def nbitDecode(chunk: Array[Byte], cd: Array[Int]): Array[Byte] = {
    val (nelmts, size, be, precision, offset) = nbitParms(cd)
    if (precision == 8 * size) return chunk // no-op precision: stored raw
    val out = new Array[Byte](nelmts * size)
    val r = new BitReader(chunk, 0)
    var i = 0
    while (i < nelmts) {
      putElem(out, i * size, size, be, r.read(precision) << offset)
      i += 1
    }
    out
  }

  /** Fixture encoder: the inverse walk (drops padding bits). */
  def nbitEncode(raw: Array[Byte], cd: Array[Int]): Array[Byte] = {
    val (nelmts, size, be, precision, offset) = nbitParms(cd)
    require(raw.length == nelmts * size, "nbit encode: size mismatch")
    if (precision == 8 * size) return raw
    val w = new BitWriter(nelmts * size)
    var i = 0
    while (i < nelmts) {
      w.write((getElem(raw, i * size, size, be) >>> offset) &
        ((1L << precision) - 1), precision)
      i += 1
    }
    w.result()
  }

  // ---- scale+offset (filter 6) ----------------------------------

  /** cd_values per `H5Z__set_local_scaleoffset`: [0] scale type
    * (0 float D-scaling, 1 float E-scaling, 2 integer), [1] scale
    * factor, [2] chunk element count, [3] datatype class (0 int,
    * 1 float), [4] size, [5] integer sign, [6] byte order, [7] fill
    * defined?, [8..] the fill value bytes (native order). */
  private final case class SoParms(scaleType: Int, scaleFactor: Int, nelmts: Int,
                                   isFloat: Boolean, size: Int, signed: Boolean,
                                   bigEndian: Boolean, fillDefined: Boolean,
                                   fillBits: Long)

  private def soParms(cd: Array[Int]): SoParms = {
    require(cd.length >= 8, s"scaleoffset filter: ${cd.length} client values")
    val scaleType = cd(0); val cls = cd(3); val size = cd(4)
    require(cls == 0 || cls == 1,
      s"scaleoffset datatype class $cls not supported (integer and float only)")
    require(scaleType != 1,
      "scaleoffset E-scaling not supported (unimplemented in libhdf5 too)")
    require(size == 1 || size == 2 || size == 4 || size == 8,
      s"scaleoffset element size $size")
    require(cls == 0 || size == 4 || size == 8,
      s"scaleoffset float element size $size (4 or 8 only)")
    val fillDefined = cd(7) == 1
    val fillBits =
      if (!fillDefined) 0L
      else {
        require(cd.length >= 8 + (size + 3) / 4, "scaleoffset fill value missing")
        // fill memcpy'd into the words in native (little-endian) order
        if (size <= 4) cd(8).toLong & ((1L << (8 * size)) - 1)
        else (cd(8).toLong & 0xffffffffL) | (cd(9).toLong << 32)
      }
    SoParms(scaleType, cd(1), cd(2), cls == 1, size, cd(5) == 1, cd(6) == 1,
      fillDefined, fillBits)
  }

  /** Chunk header written by `H5Z__scaleoffset_save_min`: bytes 0-3 =
    * minbits (LE), byte 4 = stored minval width, bytes 5.. = minval
    * (LE two's complement); packed data begins at offset 21. */
  private val SoDataOffset = 21

  def scaleoffsetDecode(chunk: Array[Byte], cd: Array[Int]): Array[Byte] = {
    val p = soParms(cd)
    require(chunk.length >= SoDataOffset, "scaleoffset chunk shorter than its header")
    var minbits = 0L
    var i = 0
    while (i < 4) { minbits |= (chunk(i) & 0xffL) << (8 * i); i += 1 }
    val mvSize = math.min(chunk(4) & 0xff, 8)
    var minval = 0L
    i = 0
    while (i < mvSize) { minval |= (chunk(5 + i) & 0xffL) << (8 * i); i += 1 }
    require(minbits <= 8L * p.size, s"scaleoffset minbits $minbits > ${8 * p.size}")
    val out = new Array[Byte](p.nelmts * p.size)
    if (minbits == 8L * p.size) { // incompressible chunk: raw copy after header
      System.arraycopy(chunk, SoDataOffset, out, 0, out.length)
      return out
    }
    val mb = minbits.toInt
    val sentinel = (1L << mb) - 1 // all-ones encodes the fill value
    val r = new BitReader(chunk, SoDataOffset)
    val tenSf = math.pow(10.0, p.scaleFactor.toDouble)
    i = 0
    while (i < p.nelmts) {
      val u = if (mb == 0) 0L else r.read(mb)
      val bits =
        if (p.fillDefined && u == sentinel) p.fillBits
        else if (!p.isFloat) minval + u
        else p.size match { // float D-scaling: v = (stored + scaled min) / 10^sf
          case 4 => (java.lang.Float.floatToIntBits(
            ((u + minval).toDouble / tenSf).toFloat) & 0xffffffffL)
          case 8 => java.lang.Double.doubleToLongBits((u + minval).toDouble / tenSf)
        }
      putElem(out, i * p.size, p.size, p.bigEndian, bits)
      i += 1
    }
    out
  }

  private def ceilLog2(n: Long): Int = { // H5Z__scaleoffset_log2
    var v = 0; var lower = 1L; var x = n
    while ({ x >>= 1; x != 0 }) { v += 1; lower <<= 1 }
    if (n == lower) v else v + 1
  }

  /** Fixture encoder: computes minbits/minval like
    * `H5Z__scaleoffset_precompress_*`, writes the 21-byte header and
    * the packed stream. */
  def scaleoffsetEncode(raw: Array[Byte], cd: Array[Int]): Array[Byte] = {
    val p = soParms(cd)
    require(raw.length == p.nelmts * p.size, "scaleoffset encode: size mismatch")
    val tenSf = math.pow(10.0, p.scaleFactor.toDouble)
    def signExtend(v: Long): Long =
      if (!p.signed || p.size == 8) v
      else (v << (64 - 8 * p.size)) >> (64 - 8 * p.size)
    // scaled integer view of each element (fill elements → None)
    val vals = new Array[Long](p.nelmts)
    val isFill = new Array[Boolean](p.nelmts)
    var i = 0
    while (i < p.nelmts) {
      val bits = getElem(raw, i * p.size, p.size, p.bigEndian)
      if (p.fillDefined && bits == p.fillBits) isFill(i) = true
      else vals(i) =
        if (!p.isFloat) signExtend(bits)
        else if (p.size == 4)
          math.round(java.lang.Float.intBitsToFloat(bits.toInt).toDouble * tenSf)
        else math.round(java.lang.Double.longBitsToDouble(bits) * tenSf)
      i += 1
    }
    val live = vals.indices.filter(!isFill(_))
    require(live.nonEmpty, "scaleoffset fixture: all-fill chunk")
    val minval = live.map(vals).min
    val span = live.map(vals).max - minval + 1
    var minbits = ceilLog2(if (p.fillDefined) span + 1 else span)
    if (minbits >= 8 * p.size) minbits = 8 * p.size
    val header = new Array[Byte](SoDataOffset)
    i = 0
    while (i < 4) { header(i) = ((minbits >> (8 * i)) & 0xff).toByte; i += 1 }
    header(4) = 8
    i = 0
    while (i < 8) { header(5 + i) = ((minval >>> (8 * i)) & 0xff).toByte; i += 1 }
    if (minbits == 8 * p.size) return header ++ raw // incompressible
    val sentinel = (1L << minbits) - 1
    val w = new BitWriter(p.nelmts * p.size)
    i = 0
    while (i < p.nelmts) {
      w.write(if (isFill(i)) sentinel else vals(i) - minval, minbits)
      i += 1
    }
    header ++ w.result()
  }
}
