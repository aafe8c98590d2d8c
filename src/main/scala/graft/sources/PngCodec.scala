package graft.sources

import java.nio.ByteBuffer

/** Self-contained PNG codec for template 5.41 data sections (written
  * from the public PNG specification): big-endian samples, grayscale
  * 8/16-bit, RGB 24-bit, RGBA 32-bit; encoder emits filter-0 rows,
  * decoder reconstructs all five standard row filters. */
object PngCodec {
  private val Sig: Array[Byte] =
    Array(0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n').map(_.toByte)

  // A Deflater/Inflater owns a native zlib window (~256 KB) whose
  // allocation dwarfs the actual compression work for the KB-sized
  // payloads the multimodal corpus carries; constructing one PER IMAGE
  // made the codec constants the dominant cost of every media query.
  // java.util.zip objects are single-threaded, so reuse is per-TASK-
  // thread: reset() between uses, never end(). BEST_SPEED because the
  // engine's PNG writes are fixture/feature payloads, not archival
  // storage — the stream stays a fully standard deflate stream.
  private val sharedDeflater = new ThreadLocal[java.util.zip.Deflater] {
    override def initialValue() =
      new java.util.zip.Deflater(java.util.zip.Deflater.BEST_SPEED)
  }
  private val sharedInflater = new ThreadLocal[java.util.zip.Inflater] {
    override def initialValue() = new java.util.zip.Inflater()
  }

  /** Deflate `raw` through the thread's reused Deflater. */
  private[graft] def deflate(raw: Array[Byte]): Array[Byte] = {
    val defl = sharedDeflater.get()
    defl.reset()
    defl.setInput(raw); defl.finish()
    val zout = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](64 * 1024)
    while (!defl.finished()) {
      val nz = defl.deflate(buf)
      if (nz > 0) zout.write(buf, 0, nz)
    }
    zout.toByteArray
  }

  private def chunk(out: java.io.ByteArrayOutputStream, typ: String,
                    payload: Array[Byte]): Unit = {
    def u32(v: Long): Unit = {
      out.write((v >> 24).toInt & 0xff); out.write((v >> 16).toInt & 0xff)
      out.write((v >> 8).toInt & 0xff); out.write(v.toInt & 0xff)
    }
    u32(payload.length.toLong)
    out.write(typ.getBytes("US-ASCII"))
    out.write(payload)
    val crc = new java.util.zip.CRC32()
    crc.update(typ.getBytes("US-ASCII")); crc.update(payload)
    u32(crc.getValue)
  }

  /** depth ∈ {8 gray, 16 gray, 24 RGB, 32 RGBA}; one value per pixel,
    * sample bytes big-endian across channels. */
  def encode(vals: Array[Long], w: Int, h: Int, depth: Int): Array[Byte] = {
    require(vals.length == w * h, s"${vals.length} values for ${w}x$h image")
    val (bitDepth, colorType, bpp) = depth match {
      case 8 => (8, 0, 1)
      case 16 => (16, 0, 2)
      case 24 => (8, 2, 3)
      case 32 => (8, 6, 4)
      case o => throw new IllegalArgumentException(s"unsupported PNG depth $o")
    }
    val raw = new Array[Byte](h * (1 + w * bpp))
    var p = 0; var i = 0
    for (_ <- 0 until h) {
      raw(p) = 0; p += 1 // filter type 0 (None)
      for (_ <- 0 until w) {
        var k = bpp - 1
        while (k >= 0) { raw(p) = ((vals(i) >> (k * 8)) & 0xff).toByte; p += 1; k -= 1 }
        i += 1
      }
    }
    // Deflate output can EXCEED the input for incompressible data (~5
    // bytes per 64 KB block + headers); deflate() loops until
    // finished() rather than trusting a one-shot into a fixed buffer.
    val z = deflate(raw)
    require(z.length > 0, "deflate produced no output")
    val out = new java.io.ByteArrayOutputStream()
    out.write(Sig)
    val ihdr = ByteBuffer.allocate(13)
      .putInt(w).putInt(h).put(bitDepth.toByte).put(colorType.toByte)
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk(out, "IHDR", ihdr.array())
    chunk(out, "IDAT", z)
    chunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** A decoded image: row-major pixel values, dimensions, and the
    * offset just past this PNG (for walking concatenated frames). */
  case class Image(w: Int, h: Int, pixels: Array[Long], end: Int)

  /** Decode a PNG at `off` into one value per pixel (row-major). */
  def decode(bytes: Array[Byte], off: Int): Array[Long] =
    decodeImage(bytes, off).pixels

  def decodeImage(bytes: Array[Byte], off: Int): Image = {
    require(bytes.length >= off + 8 &&
      (0 until 8).forall(i => bytes(off + i) == Sig(i)), "not a PNG data section")
    def u32(o: Int): Int = ((bytes(o) & 0xff) << 24) | ((bytes(o + 1) & 0xff) << 16) |
      ((bytes(o + 2) & 0xff) << 8) | (bytes(o + 3) & 0xff)
    var p = off + 8
    var w = 0; var h = 0; var bitDepth = 0; var colorType = 0
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done) {
      val len = u32(p); val typ = new String(bytes, p + 4, 4, "US-ASCII")
      val body = p + 8
      typ match {
        case "IHDR" =>
          w = u32(body); h = u32(body + 4)
          bitDepth = bytes(body + 8) & 0xff; colorType = bytes(body + 9) & 0xff
          require((bytes(body + 10) & 0xff) == 0 && (bytes(body + 12) & 0xff) == 0,
            "only deflate compression, no interlace")
        case "IDAT" => idat.write(bytes, body, len)
        case "IEND" => done = true
        case _ => // ancillary chunk: skip
      }
      p = body + len + 4
    }
    val bpp = (colorType, bitDepth) match {
      case (0, 8) => 1
      case (0, 16) => 2
      case (2, 8) => 3
      case (6, 8) => 4
      case o => throw new IllegalArgumentException(s"unsupported PNG format $o")
    }
    // inflate (thread-reused Inflater — see sharedInflater)
    val inf = sharedInflater.get()
    inf.reset()
    inf.setInput(idat.toByteArray)
    val raw = new Array[Byte](h * (1 + w * bpp))
    var got = 0
    while (got < raw.length && !inf.finished()) {
      val k = inf.inflate(raw, got, raw.length - got)
      require(k > 0 || !inf.needsInput(), "truncated PNG stream")
      got += k
    }
    require(got == raw.length, s"PNG stream yielded $got of ${raw.length} bytes")
    // reconstruct the five standard row filters
    val stride = w * bpp
    val cur = new Array[Int](stride)
    val prev = new Array[Int](stride)
    val vals = new Array[Long](w * h)
    var vi = 0
    for (row <- 0 until h) {
      val base = row * (1 + stride)
      val ft = raw(base) & 0xff
      var i = 0
      while (i < stride) {
        val x = raw(base + 1 + i) & 0xff
        val a = if (i >= bpp) cur(i - bpp) else 0
        val b = if (row > 0) prev(i) else 0
        val c = if (row > 0 && i >= bpp) prev(i - bpp) else 0
        cur(i) = ft match {
          case 0 => x
          case 1 => (x + a) & 0xff
          case 2 => (x + b) & 0xff
          case 3 => (x + (a + b) / 2) & 0xff
          case 4 =>
            val pa = math.abs(b - c); val pb = math.abs(a - c)
            val pc = math.abs(a + b - 2 * c)
            val pred = if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
            (x + pred) & 0xff
          case o => throw new IllegalArgumentException(s"unknown PNG filter $o")
        }
        i += 1
      }
      var px = 0
      while (px < w) {
        var v = 0L
        var k = 0
        while (k < bpp) { v = (v << 8) | cur(px * bpp + k); k += 1 }
        vals(vi) = v; vi += 1; px += 1
      }
      System.arraycopy(cur, 0, prev, 0, stride)
    }
    Image(w, h, vals, p)
  }
}

