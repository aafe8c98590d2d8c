package graft.llm

import java.io.ByteArrayOutputStream
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets.US_ASCII

/** Pure-JVM media codecs for the multimodal column path: real byte-level
  * header parsing (and fixture writers) for PNG, JPEG and WAV — no
  * external image/audio libraries, which this environment doesn't have.
  *
  *  - PNG: full signature + chunk walk; the writer emits genuinely valid
  *    grayscale PNGs (correct CRC32s, deflated scanlines).
  *  - JPEG: marker scan to the SOF0/1/2 frame header for dimensions.
  *  - WAV: RIFF chunk walk; fmt → channels/rate/bits, data → frames.
  *  - "video": a concatenated PNG frame sequence; the parser walks each
  *    frame's chunk structure to count frames.
  *
  * Decoding compressed photographic content (full JPEG entropy decode,
  * video codecs) is explicitly out of scope — the engine treats payloads
  * as opaque binaries and extracts METADATA features, which is the real
  * shape of a 100 TB curation pass (decode-for-training happens on GPU
  * hosts, not in the relational engine).
  */
object MediaCodecs {

  case class Header(format: String, width: Int, height: Int,
                    channels: Int, sampleRate: Int, nFrames: Int)

  private val PngSig = Array[Byte](0x89.toByte, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n')

  // ---- writers -----------------------------------------------------

  /** A real, decodable grayscale PNG of the given size (zero pixels). */
  def png(w: Int, h: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(PngSig)
    def chunk(typ: String, data: Array[Byte]): Unit = {
      val bb = ByteBuffer.allocate(4 + 4 + data.length + 4)
      bb.putInt(data.length).put(typ.getBytes(US_ASCII)).put(data)
      val crc = new java.util.zip.CRC32()
      crc.update(typ.getBytes(US_ASCII)); crc.update(data)
      bb.putInt(crc.getValue.toInt)
      out.write(bb.array())
    }
    val ihdr = ByteBuffer.allocate(13)
    ihdr.putInt(w).putInt(h).put(8.toByte).put(0.toByte) // 8-bit grayscale
      .put(0.toByte).put(0.toByte).put(0.toByte)
    chunk("IHDR", ihdr.array())
    val raw = new Array[Byte](h * (1 + w)) // filter byte 0 + w gray bytes per row
    chunk("IDAT", graft.sources.PngCodec.deflate(raw)) // thread-reused Deflater
    chunk("IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Structurally valid JPEG header stream: SOI + SOF0 (dims) + EOI. */
  def jpegHeader(w: Int, h: Int): Array[Byte] = {
    val bb = ByteBuffer.allocate(2 + 2 + 2 + 9 + 2)
    bb.put(0xff.toByte).put(0xd8.toByte) // SOI
    bb.put(0xff.toByte).put(0xc0.toByte) // SOF0
    bb.putShort(11)                      // segment length (incl. itself)
    bb.put(8.toByte)                     // precision
    bb.putShort(h.toShort).putShort(w.toShort)
    bb.put(1.toByte)                     // 1 component
    bb.put(1.toByte).put(0x11.toByte).put(0.toByte)
    bb.put(0xff.toByte).put(0xd9.toByte) // EOI
    bb.array()
  }

  /** Real PCM-16 WAV of silent frames. */
  def wav(channels: Int, sampleRate: Int, nFrames: Int): Array[Byte] = {
    val blockAlign = channels * 2
    val dataSize = nFrames * blockAlign
    val bb = ByteBuffer.allocate(44 + dataSize).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(US_ASCII)).putInt(36 + dataSize)
      .put("WAVE".getBytes(US_ASCII))
    bb.put("fmt ".getBytes(US_ASCII)).putInt(16)
      .putShort(1).putShort(channels.toShort).putInt(sampleRate)
      .putInt(sampleRate * blockAlign).putShort(blockAlign.toShort).putShort(16)
    bb.put("data".getBytes(US_ASCII)).putInt(dataSize)
    bb.array() // remaining bytes are zero = silence
  }

  /** Mono 16-bit PCM WAV with per-sample content f(i) — decodable
    * end-to-end (wavSamples), used by the audio-energy operator whose
    * oracle recomputes the same pattern arithmetically. */
  def wavPattern(sampleRate: Int, nFrames: Int, f: Int => Int): Array[Byte] = {
    val bytes = wav(1, sampleRate, nFrames)
    val bb = ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var i = 0
    while (i < nFrames) { bb.putShort(44 + i * 2, f(i).toShort); i += 1 }
    bytes
  }

  /** 16-bit LE PCM samples from a WAV's data chunk (RIFF chunk walk —
    * same traversal as parseWav, returning the payload). */
  def wavSamples(b: Array[Byte]): Array[Int] = {
    require(b.length >= 12 && new String(b, 0, 4, US_ASCII) == "RIFF" &&
      new String(b, 8, 4, US_ASCII) == "WAVE", "not a WAV")
    val bb = ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = 12
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, US_ASCII)
      val size = bb.getInt(p + 4)
      require(size >= 0 && p + 8 + size <= b.length,
        s"corrupt RIFF chunk '$id' size=$size at offset $p")
      if (id == "data")
        return Array.tabulate(size / 2)(i => bb.getShort(p + 8 + i * 2).toInt)
      p += 8 + size + (size & 1)
    }
    throw new IllegalArgumentException("WAV missing data chunk")
  }

  /** n concatenated PNG frames (the fixture "video" container). */
  def pngFrames(w: Int, h: Int, n: Int): Array[Byte] = {
    val one = png(w, h)
    val out = new ByteArrayOutputStream()
    (0 until n).foreach(_ => out.write(one))
    out.toByteArray
  }

  /** A real 8-bit grayscale PNG with per-pixel content f(x, y) —
    * decodable end-to-end (graft.sources.PngCodec), used by the
    * resize / frame-sample operators whose oracles recompute the same
    * pattern arithmetically. */
  def pngPattern(w: Int, h: Int, f: (Int, Int) => Int): Array[Byte] =
    graft.sources.PngCodec.encode(
      Array.tabulate(w * h)(i => (f(i % w, i / w) & 0xff).toLong), w, h, 8)

  /** n concatenated patterned PNG frames; frame fi gets f(fi)(x, y). */
  def pngFramesPattern(w: Int, h: Int, n: Int, f: Int => (Int, Int) => Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    (0 until n).foreach(fi => out.write(pngPattern(w, h, f(fi))))
    out.toByteArray
  }

  /** Decode all frames of a payload: concatenated PNG frames, or one
    * baseline JPEG (via the native T.81 codec) surfaced in the same
    * packed-pixel form — gray as the sample, RGB as R<<16|G<<8|B. */
  def decodeFrames(b: Array[Byte]): Seq[graft.sources.PngCodec.Image] = {
    if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      val img = graft.sources.JpegCodec.decode(b)
      val px = new Array[Long](img.width * img.height)
      var i = 0
      while (i < px.length) {
        px(i) =
          if (img.comps == 1) (img.data(i) & 0xff).toLong
          else ((img.data(i * 3) & 0xff).toLong << 16) |
            ((img.data(i * 3 + 1) & 0xff).toLong << 8) |
            (img.data(i * 3 + 2) & 0xff).toLong
        i += 1
      }
      return Seq(graft.sources.PngCodec.Image(img.width, img.height, px, b.length))
    }
    val frames = scala.collection.mutable.Buffer[graft.sources.PngCodec.Image]()
    var p = 0
    while (p + 8 <= b.length && sigAt(b, p)) {
      val img = graft.sources.PngCodec.decodeImage(b, p)
      frames += img
      p = img.end
    }
    require(frames.nonEmpty, "no PNG or JPEG frames")
    frames.toSeq
  }

  // ---- parser ------------------------------------------------------

  /** Sniff + parse the header of a media payload. Throws on anything
    * that doesn't carry one of the supported magics. */
  def parse(b: Array[Byte]): Header = {
    if (b.length >= 8 && b.take(8).sameElements(PngSig)) parsePngSeq(b)
    else if (b.length >= 2 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) parseJpeg(b)
    else if (b.length >= 12 && new String(b, 0, 4, US_ASCII) == "RIFF" &&
             new String(b, 8, 4, US_ASCII) == "WAVE") parseWav(b)
    else throw new IllegalArgumentException(
      s"unknown media magic: ${b.take(4).map(x => f"${x & 0xff}%02x").mkString(" ")}")
  }

  private def u32be(b: Array[Byte], o: Int): Int =
    ByteBuffer.wrap(b, o, 4).getInt

  /** Allocation-free PNG-signature probe (the frame walks run per row). */
  private def sigAt(b: Array[Byte], p: Int): Boolean = {
    var i = 0
    while (i < 8) { if (b(p + i) != PngSig(i)) return false; i += 1 }
    true
  }

  /** Walk one PNG's chunks from `off` (which must point at a signature);
    * returns (width, height, offsetAfterIEND). */
  private def pngOne(b: Array[Byte], off: Int): (Int, Int, Int) = {
    require(b.length >= off + 8 && b.slice(off, off + 8).sameElements(PngSig), "not PNG")
    var p = off + 8
    var w = -1; var h = -1
    var done = false
    while (!done) {
      val len = u32be(b, p)
      val typ = new String(b, p + 4, 4, US_ASCII)
      if (typ == "IHDR") { w = u32be(b, p + 8); h = u32be(b, p + 12) }
      p += 4 + 4 + len + 4
      if (typ == "IEND") done = true
    }
    require(w > 0 && h > 0, "PNG missing IHDR")
    (w, h, p)
  }

  private def parsePngSeq(b: Array[Byte]): Header = {
    val (w, h, end0) = pngOne(b, 0)
    var n = 1; var p = end0
    while (p + 8 <= b.length && sigAt(b, p)) {
      val (_, _, e) = pngOne(b, p); p = e; n += 1
    }
    Header(if (n > 1) "png-seq" else "png", w, h, 1, 0, n)
  }

  private def parseJpeg(b: Array[Byte]): Header = {
    var p = 2
    while (p + 4 <= b.length) {
      require((b(p) & 0xff) == 0xff, f"bad JPEG marker at $p: ${b(p) & 0xff}%02x")
      val marker = b(p + 1) & 0xff
      if (marker == 0xd9 || marker == 0xda) // EOI / start-of-scan: no SOF seen
        throw new IllegalArgumentException("JPEG has no SOF header")
      val len = ((b(p + 2) & 0xff) << 8) | (b(p + 3) & 0xff)
      // SOF0-SOF15 except DHT(C4)/JPG(C8)/DAC(CC)
      if (marker >= 0xc0 && marker <= 0xcf &&
          marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
        val h = ((b(p + 5) & 0xff) << 8) | (b(p + 6) & 0xff)
        val w = ((b(p + 7) & 0xff) << 8) | (b(p + 8) & 0xff)
        val ncomp = b(p + 9) & 0xff
        return Header("jpeg", w, h, ncomp, 0, 1)
      }
      p += 2 + len
    }
    throw new IllegalArgumentException("JPEG truncated before SOF")
  }

  private def parseWav(b: Array[Byte]): Header = {
    val bb = ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    var p = 12
    var channels = -1; var rate = -1; var blockAlign = -1; var dataSize = -1
    while (p + 8 <= b.length) {
      val id = new String(b, p, 4, US_ASCII)
      val size = bb.getInt(p + 4)
      if (id == "fmt ") {
        channels = bb.getShort(p + 10)
        rate = bb.getInt(p + 12)
        blockAlign = bb.getShort(p + 20)
      } else if (id == "data") dataSize = size
      p += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(channels > 0 && blockAlign > 0, "WAV missing fmt chunk")
    val frames = if (dataSize < 0) 0 else dataSize / blockAlign
    Header("wav", 0, 0, channels, rate, frames)
  }
}
