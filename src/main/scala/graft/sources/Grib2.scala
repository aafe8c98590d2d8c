package graft.sources

import java.nio.ByteBuffer

/** Minimal self-contained GRIB2 codec: edition-2 messages with a
  * regular lat/lon grid (template 3.0), product template 4.0, simple
  * packing (template 5.0) and an optional bitmap (section 6) carrying
  * nodata. Written from the public WMO FM 92 GRIB-2 specification — no
  * eccodes/cfgrib on the JVM (the reference's decode path,
  * formats/grib.py:37-230, keys variables by (discipline, category,
  * number) which we surface as the VariableKey triple).
  *
  * Supports what the engine's ingest needs: decode a float grid +
  * georeferencing + reference/valid time; encode the same for fixtures
  * and round-trip tests. GRIB sign-magnitude integers are handled.
  */
object Grib2 {

  case class Message(raster: GeoTiff.Raster,
                     discipline: Int, category: Int, parameter: Int,
                     refTime: java.time.LocalDateTime, forecastHours: Int)

  def canHandle(b: Array[Byte]): Boolean =
    b.length >= 4 && b(0) == 'G' && b(1) == 'R' && b(2) == 'I' && b(3) == 'B'

  // ---- encode ------------------------------------------------------

  /** Encode with simple packing: Y = (R + X·2^E)/10^D, D decimal digits
    * preserved; NaN cells go to the section-6 bitmap. */
  def write(m: Message, decimals: Int = 2): Array[Byte] = {
    val r = m.raster
    val n = r.width * r.height
    val valid = r.data.filter(!_.isNaN)
    require(valid.nonEmpty, "all-NaN grid")
    val scale = math.pow(10, decimals)
    val ref = math.floor(valid.min * scale)
    val xs = r.data.map(v => if (v.isNaN) 0L else math.round(v * scale - ref))
    val maxX = xs.max
    val nbits = math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, maxX)))
    val hasNaN = r.data.exists(_.isNaN)

    val sections = scala.collection.mutable.Buffer[Array[Byte]]()
    def sec(num: Int)(body: java.io.ByteArrayOutputStream => Unit): Unit = {
      val b = new java.io.ByteArrayOutputStream()
      body(b)
      val payload = b.toByteArray
      val bb = ByteBuffer.allocate(5 + payload.length)
      bb.putInt(5 + payload.length).put(num.toByte).put(payload)
      sections += bb.array()
    }
    def bu8(b: java.io.ByteArrayOutputStream, v: Int) = b.write(v & 0xff)
    def bu16(b: java.io.ByteArrayOutputStream, v: Int) = { bu8(b, v >> 8); bu8(b, v) }
    def bu32(b: java.io.ByteArrayOutputStream, v: Long) = {
      bu8(b, (v >> 24).toInt); bu8(b, (v >> 16).toInt); bu8(b, (v >> 8).toInt); bu8(b, v.toInt)
    }
    def bs16(b: java.io.ByteArrayOutputStream, v: Int) = {
      val a = math.abs(v); bu16(b, if (v < 0) a | 0x8000 else a)
    }
    def bs32(b: java.io.ByteArrayOutputStream, v: Long) = {
      val a = math.abs(v); bu32(b, if (v < 0) a | 0x80000000L else a)
    }

    sec(1) { b => // identification
      bu16(b, 0); bu16(b, 0) // centre, subcentre
      bu8(b, 2); bu8(b, 1); bu8(b, 1) // tables, local tables, ref time sig
      bu16(b, m.refTime.getYear); bu8(b, m.refTime.getMonthValue)
      bu8(b, m.refTime.getDayOfMonth); bu8(b, m.refTime.getHour)
      bu8(b, m.refTime.getMinute); bu8(b, m.refTime.getSecond)
      bu8(b, 0); bu8(b, 1) // production status, data type
    }
    sec(3) { b => // grid definition, template 3.0 lat/lon
      bu8(b, 0); bu32(b, n); bu8(b, 0); bu8(b, 0); bu16(b, 0)
      bu8(b, 6); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0); bu8(b, 0); bu32(b, 0)
      bu32(b, r.width); bu32(b, r.height); bu32(b, 0); bu32(b, 0)
      val microN = math.round((r.north - r.py / 2) * 1e6)
      val microW = math.round((r.west + r.px / 2) * 1e6)
      bs32(b, microN); bs32(b, microW) // first point (north-west center)
      bu8(b, 0x30)
      bs32(b, math.round((r.north - r.py * r.height + r.py / 2) * 1e6))
      bs32(b, math.round((r.west + r.px * r.width - r.px / 2) * 1e6))
      bu32(b, math.round(r.px * 1e6)); bu32(b, math.round(r.py * 1e6))
      bu8(b, 0) // scanning: +i, -j (north-up rows)
    }
    sec(4) { b => // product definition, template 4.0
      bu16(b, 0); bu16(b, 0)
      bu8(b, m.category); bu8(b, m.parameter)
      bu8(b, 0); bu8(b, 0); bu8(b, 0); bu16(b, 0); bu8(b, 0)
      bu8(b, 1) // time unit: hours
      bu32(b, m.forecastHours)
      bu8(b, 1); bu8(b, 0); bu32(b, 0); bu8(b, 255); bu8(b, 0); bu32(b, 0)
    }
    sec(5) { b => // data representation, template 5.0 simple packing
      bu32(b, n); bu16(b, 0)
      bu32(b, java.lang.Float.floatToIntBits(ref.toFloat).toLong & 0xffffffffL)
      bs16(b, 0) // E
      bs16(b, decimals) // D
      bu8(b, nbits); bu8(b, 0)
    }
    sec(6) { b => // bitmap
      if (!hasNaN) bu8(b, 255)
      else {
        bu8(b, 0)
        var acc = 0; var nb = 0
        for (v <- r.data) {
          acc = (acc << 1) | (if (v.isNaN) 0 else 1); nb += 1
          if (nb == 8) { bu8(b, acc); acc = 0; nb = 0 }
        }
        if (nb > 0) bu8(b, acc << (8 - nb))
      }
    }
    sec(7) { b => // bit-packed data (present cells only when bitmap)
      var acc = 0L; var nb = 0
      for ((v, i) <- r.data.zipWithIndex if !v.isNaN) {
        acc = (acc << nbits) | xs(i); nb += nbits
        while (nb >= 8) { bu8(b, ((acc >> (nb - 8)) & 0xff).toInt); nb -= 8 }
      }
      if (nb > 0) bu8(b, ((acc << (8 - nb)) & 0xff).toInt)
    }

    val body = sections.toArray.flatten
    val total = 16L + body.length + 4
    val head = ByteBuffer.allocate(16)
    head.put("GRIB".getBytes).putShort(0).put(m.discipline.toByte).put(2.toByte)
      .putLong(total)
    head.array() ++ body ++ "7777".getBytes
  }

  // ---- decode ------------------------------------------------------

  /** Real GRIB files concatenate messages (one per variable/level/step);
    * split on the Section-0 total-length field and decode each. */
  def readAll(bytes: Array[Byte]): Seq[Message] = {
    val out = scala.collection.mutable.Buffer[Message]()
    var pos = 0
    while (pos + 16 <= bytes.length &&
           bytes(pos) == 'G' && bytes(pos + 1) == 'R' &&
           bytes(pos + 2) == 'I' && bytes(pos + 3) == 'B') {
      val total = ByteBuffer.wrap(bytes, pos + 8, 8).getLong.toInt
      out += read(java.util.Arrays.copyOfRange(bytes, pos, pos + total))
      pos += total
    }
    out.toSeq
  }

  def read(bytes: Array[Byte]): Message = {
    require(canHandle(bytes), "not GRIB")
    val bb = ByteBuffer.wrap(bytes)
    val discipline = bytes(6) & 0xff
    require((bytes(7) & 0xff) == 2, "only GRIB2")
    var pos = 16
    var width = 0; var height = 0
    var west = 0.0; var north = 0.0; var px = 1.0; var py = 1.0
    var refR = 0.0f; var e = 0; var d = 0; var nbits = 0
    var category = 0; var parameter = 0; var forecastHours = 0
    var refTime = java.time.LocalDateTime.MIN
    var bitmap: Array[Boolean] = null
    var data: Array[Float] = null
    var nPts = 0

    def u16(o: Int) = ((bytes(o) & 0xff) << 8) | (bytes(o + 1) & 0xff)
    def u32(o: Int): Long = ((bytes(o) & 0xffL) << 24) | ((bytes(o + 1) & 0xffL) << 16) |
      ((bytes(o + 2) & 0xffL) << 8) | (bytes(o + 3) & 0xffL)
    def s16(o: Int): Int = { val v = u16(o); if ((v & 0x8000) != 0) -(v & 0x7fff) else v }
    def s32(o: Int): Long = { val v = u32(o); if ((v & 0x80000000L) != 0) -(v & 0x7fffffffL) else v }

    while (pos < bytes.length - 4) {
      if (new String(bytes, pos, math.min(4, bytes.length - pos)) == "7777") { pos = bytes.length }
      else {
        val len = u32(pos).toInt
        val num = bytes(pos + 4) & 0xff
        val o = pos + 5
        num match {
          case 1 =>
            refTime = java.time.LocalDateTime.of(u16(o + 7), bytes(o + 9) & 0xff,
              bytes(o + 10) & 0xff, bytes(o + 11) & 0xff, bytes(o + 12) & 0xff,
              bytes(o + 13) & 0xff)
          case 3 =>
            nPts = u32(o + 1).toInt
            width = u32(o + 25).toInt; height = u32(o + 29).toInt
            val la1 = s32(o + 41) / 1e6; val lo1 = s32(o + 45) / 1e6
            px = u32(o + 58) / 1e6; py = u32(o + 62) / 1e6
            west = lo1 - px / 2; north = la1 + py / 2
          case 4 =>
            category = bytes(o + 4) & 0xff; parameter = bytes(o + 5) & 0xff
            forecastHours = u32(o + 13).toInt
          case 5 =>
            refR = java.lang.Float.intBitsToFloat(u32(o + 6).toInt)
            e = s16(o + 10); d = s16(o + 12); nbits = bytes(o + 14) & 0xff
          case 6 =>
            val ind = bytes(o) & 0xff
            if (ind == 0) {
              bitmap = new Array[Boolean](nPts)
              var i = 0
              while (i < nPts) {
                bitmap(i) = ((bytes(o + 1 + i / 8) >> (7 - i % 8)) & 1) == 1
                i += 1
              }
            }
          case 7 =>
            data = new Array[Float](nPts)
            val factor = math.pow(2, e) / math.pow(10, d)
            val base = refR / math.pow(10, d)
            var acc = 0L; var nb = 0; var bi = o; var i = 0
            while (i < nPts) {
              if (bitmap != null && !bitmap(i)) data(i) = Float.NaN
              else {
                while (nb < nbits) { acc = (acc << 8) | (bytes(bi) & 0xffL); bi += 1; nb += 8 }
                val x = (acc >> (nb - nbits)) & ((1L << nbits) - 1); nb -= nbits
                data(i) = (base + x * factor).toFloat
              }
              i += 1
            }
          case _ =>
        }
        pos += len
      }
    }
    Message(GeoTiff.Raster(width, height, data, west, north, px, py),
      discipline, category, parameter, refTime, forecastHours)
  }
}
