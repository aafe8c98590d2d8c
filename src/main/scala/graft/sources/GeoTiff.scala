package graft.sources

import java.io.{ByteArrayOutputStream, DataOutputStream}
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal self-contained GeoTIFF codec: single-band float32,
  * strip-organized, uncompressed, little-endian, with the two GeoTIFF
  * georeferencing tags (ModelPixelScale + ModelTiepoint) that the
  * reference relies on for bounds/affine recovery
  * (formats/geotiff.py:37-373, formats/base.py:40-82).
  *
  * Written from the public TIFF 6.0 + GeoTIFF specs — no external
  * imaging library (none ships in this container). NaN is the nodata
  * sentinel, exactly like the reference payloads. South-up inputs are
  * normalized north-up at read time via the `needs_flip` check
  * (pixel-scale sign, formats/geotiff.py:322-345).
  */
object GeoTiff {

  case class Raster(width: Int, height: Int, data: Array[Float],
                    west: Double, north: Double, px: Double, py: Double) {
    def bounds: (Double, Double, Double, Double) =
      (west, north - py * height, west + px * width, north)
  }

  private val TAG_WIDTH = 256
  private val TAG_HEIGHT = 257
  private val TAG_BITS = 258
  private val TAG_COMPRESSION = 259
  private val TAG_PHOTOMETRIC = 262
  private val TAG_STRIP_OFFSETS = 273
  private val TAG_ROWS_PER_STRIP = 278
  private val TAG_STRIP_BYTES = 279
  private val TAG_SAMPLE_FORMAT = 339
  private val TAG_PIXEL_SCALE = 33550
  private val TAG_TIEPOINT = 33922

  /** Magic sniff (formats/registry.py + geotiff.py:43-52). */
  def canHandle(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
       (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42))

  /** Encode a north-up float32 raster as a little-endian GeoTIFF. */
  def write(r: Raster): Array[Byte] = {
    require(r.data.length == r.width * r.height, "data size mismatch")
    val pixelBytes = r.width * r.height * 4
    val headerLen = 8
    val dataOff = headerLen
    val ifdOff = dataOff + pixelBytes
    // 11 tags, then the out-of-line doubles for scale (3) + tiepoint (6).
    val nTags = 11
    val ifdLen = 2 + nTags * 12 + 4
    val scaleOff = ifdOff + ifdLen
    val tieOff = scaleOff + 3 * 8

    val buf = ByteBuffer.allocate(tieOff + 6 * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOff)
    r.data.foreach(buf.putFloat)
    buf.putShort(nTags.toShort)
    def tag(id: Int, typ: Int, count: Int, value: Long): Unit = {
      buf.putShort(id.toShort).putShort(typ.toShort).putInt(count)
      buf.putInt(value.toInt)
    }
    tag(TAG_WIDTH, 3, 1, r.width)         // SHORT
    tag(TAG_HEIGHT, 3, 1, r.height)
    tag(TAG_BITS, 3, 1, 32)
    tag(TAG_COMPRESSION, 3, 1, 1)         // none
    tag(TAG_PHOTOMETRIC, 3, 1, 1)         // min-is-black
    tag(TAG_STRIP_OFFSETS, 4, 1, dataOff) // LONG, one strip
    tag(TAG_ROWS_PER_STRIP, 3, 1, r.height)
    tag(TAG_STRIP_BYTES, 4, 1, pixelBytes)
    tag(TAG_SAMPLE_FORMAT, 3, 1, 3)       // IEEE float
    tag(TAG_PIXEL_SCALE, 12, 3, scaleOff) // DOUBLE×3
    tag(TAG_TIEPOINT, 12, 6, tieOff)      // DOUBLE×6
    buf.putInt(0)                          // next IFD
    buf.putDouble(r.px).putDouble(r.py).putDouble(0.0)
    // tiepoint: raster (0,0,0) ↦ model (west, north, 0)
    buf.putDouble(0).putDouble(0).putDouble(0)
    buf.putDouble(r.west).putDouble(r.north).putDouble(0)
    buf.array()
  }

  /** Decode. Handles II/MM order, strip layout, float32 samples, and
    * south-up flip normalization. */
  def read(bytes: Array[Byte]): Raster = {
    require(canHandle(bytes), "not a TIFF")
    val order = if (bytes(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN
    val buf = ByteBuffer.wrap(bytes).order(order)
    val ifdOff = buf.getInt(4)
    val n = buf.getShort(ifdOff) & 0xffff
    var width = 0; var height = 0; var rowsPerStrip = Int.MaxValue
    var stripOffsets = Array[Long](); var stripBytes = Array[Long]()
    var px = 1.0; var py = 1.0; var west = 0.0; var north = 0.0
    var sampleFormat = 1; var bits = 32

    def tagValues(typ: Int, count: Int, at: Int): Array[Long] = {
      val inline = typeSize(typ) * count <= 4
      val base = if (inline) at else buf.getInt(at)
      (0 until count).map { i =>
        typ match {
          case 3 => (buf.getShort(base + i * 2) & 0xffff).toLong
          case 4 => buf.getInt(base + i * 4).toLong & 0xffffffffL
          case _ => throw new IllegalArgumentException(s"type $typ")
        }
      }.toArray
    }
    def tagDoubles(count: Int, at: Int): Array[Double] = {
      val base = buf.getInt(at)
      (0 until count).map(i => buf.getDouble(base + i * 8)).toArray
    }
    def typeSize(t: Int) = t match {
      case 3 => 2; case 4 => 4; case 12 => 8; case _ => 1
    }

    for (i <- 0 until n) {
      val e = ifdOff + 2 + i * 12
      val id = buf.getShort(e) & 0xffff
      val typ = buf.getShort(e + 2) & 0xffff
      val count = buf.getInt(e + 4)
      val valAt = e + 8
      id match {
        case TAG_WIDTH => width = tagValues(typ, 1, valAt)(0).toInt
        case TAG_HEIGHT => height = tagValues(typ, 1, valAt)(0).toInt
        case TAG_BITS => bits = tagValues(typ, 1, valAt)(0).toInt
        case TAG_ROWS_PER_STRIP => rowsPerStrip = tagValues(typ, 1, valAt)(0).toInt
        case TAG_STRIP_OFFSETS => stripOffsets = tagValues(typ, count, valAt)
        case TAG_STRIP_BYTES => stripBytes = tagValues(typ, count, valAt)
        case TAG_SAMPLE_FORMAT => sampleFormat = tagValues(typ, 1, valAt)(0).toInt
        case TAG_PIXEL_SCALE =>
          val d = tagDoubles(3, valAt); px = d(0); py = d(1)
        case TAG_TIEPOINT =>
          val d = tagDoubles(6, valAt); west = d(3); north = d(4)
        case _ => // ignore
      }
    }
    require(bits == 32 && sampleFormat == 3, "only float32 supported")
    val data = new Array[Float](width * height)
    var row = 0
    for (s <- stripOffsets.indices) {
      val rows = math.min(rowsPerStrip, height - row)
      val base = stripOffsets(s).toInt
      var i = 0
      while (i < rows * width) {
        data(row * width + i) = buf.getFloat(base + i * 4)
        i += 1
      }
      row += rows
    }
    // South-up normalization: negative py means origin at the south edge.
    if (py < 0) {
      val flipped = new Array[Float](width * height)
      for (y <- 0 until height; x <- 0 until width)
        flipped(y * width + x) = data((height - 1 - y) * width + x)
      Raster(width, height, flipped, west, north - py * height, px, -py)
    } else Raster(width, height, data, west, north, px, py)
  }
}
