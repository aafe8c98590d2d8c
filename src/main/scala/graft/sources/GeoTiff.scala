package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.util.zip.{Deflater, Inflater}

/** Self-contained GeoTIFF codec covering the shapes the reference
  * platform actually produces and consumes: strip- OR tile-organized,
  * uncompressed, LZW- or deflate-compressed with predictor 1/2/3 (byte
  * planes 4 or 8 deep), one
  * or many bands (chunky and planar layouts), uint8/int16/uint16/
  * int32/uint32/float32/float64 samples (doubles narrow to the
  * engine's float32 pixel model at decode), II/MM byte order, with the two GeoTIFF
  * georeferencing tags (ModelPixelScale + ModelTiepoint) the reference
  * relies on for bounds/affine recovery (formats/geotiff.py:37-373,
  * formats/base.py:40-82) and GDAL's ASCII nodata tag.
  *
  * The reference's own COG sink writes 256² tiles, deflate, predictor
  * 3 for floats / 2 for ints (ingestion/asset_writer.py:46-148,
  * 213-235) — [[writeCog]] mirrors that profile and [[read]] decodes
  * it, so the engine can round-trip the very files the reference
  * platform serves. Written from the public TIFF 6.0 + GeoTIFF specs
  * (the floating-point predictor follows the published libtiff
  * semantics: per-row MSB-first byte planes, byte-differenced with a
  * samples-per-pixel stride, byte-order-independent) — no external
  * imaging library (none ships in this container).
  *
  * NaN is the nodata sentinel, exactly like the reference payloads;
  * integer rasters map their declared nodata to NaN at decode.
  * South-up inputs are normalized north-up at read time via the
  * `needs_flip` check (pixel-scale sign, formats/geotiff.py:322-345).
  * Multi-page files (COG overview pyramids) default to IFD 0 — the
  * full-resolution image — with [[levels]]/[[readBand]] exposing the
  * pyramid for low-zoom serving; [[bandCount]] powers `band_N`
  * variable discovery (formats/geotiff.py:58-94).
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
  private val TAG_SAMPLES_PER_PIXEL = 277
  private val TAG_ROWS_PER_STRIP = 278
  private val TAG_STRIP_BYTES = 279
  private val TAG_PLANAR_CONFIG = 284
  private val TAG_PREDICTOR = 317
  private val TAG_TILE_WIDTH = 322
  private val TAG_TILE_LENGTH = 323
  private val TAG_TILE_OFFSETS = 324
  private val TAG_TILE_BYTES = 325
  private val TAG_SAMPLE_FORMAT = 339
  private val TAG_PIXEL_SCALE = 33550
  private val TAG_TIEPOINT = 33922
  private val TAG_GDAL_NODATA = 42113
  private val TAG_JPEG_TABLES = 347

  /** Magic sniff (formats/registry.py + geotiff.py:43-52): classic
    * TIFF (version 42) and BigTIFF (version 43 — 8-byte offsets, the
    * form any >4 GiB COG ships in; the reference reads both
    * transparently via rasterio, formats/geotiff.py:37-94). */
  def canHandle(bytes: Array[Byte]): Boolean =
    bytes.length >= 8 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 42 && bytes(3) == 0) ||
       (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 42) ||
       isBigTiff(bytes))

  /** BigTIFF: version 43, offset size 8, reserved 0 (TIFF supplement
    * "BigTIFF Design", Adobe/AWare 2007). */
  private def isBigTiff(bytes: Array[Byte]): Boolean =
    bytes.length >= 16 &&
      ((bytes(0) == 'I' && bytes(1) == 'I' && bytes(2) == 43 && bytes(3) == 0 &&
        bytes(4) == 8 && bytes(5) == 0 && bytes(6) == 0 && bytes(7) == 0) ||
       (bytes(0) == 'M' && bytes(1) == 'M' && bytes(2) == 0 && bytes(3) == 43 &&
        bytes(4) == 0 && bytes(5) == 8 && bytes(6) == 0 && bytes(7) == 0))

  // ---- write: legacy simple form ----------------------------------

  /** Encode a north-up float32 raster as a little-endian GeoTIFF —
    * single band, one strip, uncompressed (the minimal shape round-
    * tripped since round 1; [[writeCog]] is the reference-profile
    * writer). */
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

  /** Encode the same minimal raster in BIGTIFF layout (version 43,
    * 8-byte offsets, 20-byte IFD entries, LONG8 chunk offsets/sizes) —
    * the header format any >4 GiB COG must use. The writer exists so
    * the reader's BigTIFF path round-trips against a self-contained
    * fixture; a small file is a legal BigTIFF (the format does not
    * require large offsets, only 8-byte fields). */
  def writeBig(r: Raster): Array[Byte] = {
    require(r.data.length == r.width * r.height, "data size mismatch")
    val pixelBytes = r.width * r.height * 4
    val headerLen = 16
    val dataOff = headerLen
    val ifdOff = dataOff + pixelBytes
    val nTags = 11
    val ifdLen = 8 + nTags * 20 + 8
    val scaleOff = ifdOff + ifdLen
    val tieOff = scaleOff + 3 * 8

    val buf = ByteBuffer.allocate(tieOff + 6 * 8).order(ByteOrder.LITTLE_ENDIAN)
    buf.put('I'.toByte).put('I'.toByte).putShort(43)
    buf.putShort(8).putShort(0).putLong(ifdOff)
    r.data.foreach(buf.putFloat)
    buf.putLong(nTags)
    def tag(id: Int, typ: Int, count: Long, value: Long): Unit = {
      buf.putShort(id.toShort).putShort(typ.toShort).putLong(count)
      buf.putLong(value)
    }
    tag(TAG_WIDTH, 3, 1, r.width)          // SHORT
    tag(TAG_HEIGHT, 3, 1, r.height)
    tag(TAG_BITS, 3, 1, 32)
    tag(TAG_COMPRESSION, 3, 1, 1)          // none
    tag(TAG_PHOTOMETRIC, 3, 1, 1)          // min-is-black
    tag(TAG_STRIP_OFFSETS, 16, 1, dataOff) // LONG8, one strip
    tag(TAG_ROWS_PER_STRIP, 3, 1, r.height)
    tag(TAG_STRIP_BYTES, 16, 1, pixelBytes)
    tag(TAG_SAMPLE_FORMAT, 3, 1, 3)        // IEEE float
    tag(TAG_PIXEL_SCALE, 12, 3, scaleOff)  // DOUBLE×3, out of line
    tag(TAG_TIEPOINT, 12, 6, tieOff)       // DOUBLE×6, out of line
    buf.putLong(0L)                        // next IFD
    buf.putDouble(r.px).putDouble(r.py).putDouble(0.0)
    buf.putDouble(0).putDouble(0).putDouble(0)
    buf.putDouble(r.west).putDouble(r.north).putDouble(0)
    buf.array()
  }

  // ---- write: reference COG profile -------------------------------

  /** dtype name → (bits per sample, TIFF sample format). Mirrors the
    * reference writer's dtype adaptivity (asset_writer.py:56-60). */
  private def dtypeSpec(dtype: String): (Int, Int) = dtype match {
    case "uint8"   => (8, 1)
    case "uint16"  => (16, 1)
    case "int16"   => (16, 2)
    case "int32"   => (32, 2)
    case "uint32"  => (32, 1)
    case "float32" => (32, 3)
    case "float64" => (64, 3)
    case other => throw new IllegalArgumentException(s"unsupported dtype: $other")
  }

  /** Deflate predictor by dtype, exactly the reference's rule
    * (asset_writer.py:213-235): 3 for floats, 2 for ints. */
  def predictorFor(dtype: String): Int =
    if (dtype.startsWith("float")) 3 else 2

  /** Internal tile block size by raster dimensions — the reference's
    * exact rule (asset_writer.py:168-186): <512 px → 128, <2048 → 256,
    * else 512. */
  def blocksizeFor(width: Int, height: Int): Int = {
    val m = math.min(width, height)
    if (m < 512) 128 else if (m < 2048) 256 else 512
  }

  /** Overview level count: build until the smallest overview fits ~2
    * block widths, always ≥ 1 (asset_writer.py:188-211). */
  def overviewLevelsFor(width: Int, height: Int, blocksize: Int): Int = {
    val m = math.min(width, height)
    var levels = 0; var level = 2
    while (m / level >= blocksize * 2) { levels += 1; level *= 2 }
    math.max(levels, 1)
  }

  /** The reference `write_cog` profile end-to-end
    * (asset_writer.py:46-148): adaptive blocksize, overview levels to
    * the 2-block floor, deflate + predictor by dtype, average
    * overview resampling. */
  def writeCogAuto(bands: Seq[Array[Float]], width: Int, height: Int,
                   west: Double, north: Double, px: Double, py: Double,
                   dtype: String = "float32",
                   nodata: Option[Double] = None): Array[Byte] = {
    val bs = blocksizeFor(width, height)
    writeCog(bands, width, height, west, north, px, py, tileSize = bs,
      dtype = dtype, nodata = nodata,
      overviewLevels = overviewLevelsFor(width, height, bs))
  }

  /** Encode a multi-band north-up raster in the reference COG sink's
    * profile: tiled (256² default), deflate, predictor by dtype,
    * little-endian, with `overviewLevels` reduced-resolution pages
    * (factors 2, 4, …) chained behind IFD 0 — NaN-aware AVERAGE
    * decimation, the reference's continuous-field resampling
    * (asset_writer.py:128-136), tile data laid out overviews-first /
    * full-res-last like cog_translate. `planar = false` writes
    * pixel-interleaved (chunky, GDAL's default); `true` writes one
    * tile set per band. Integer dtypes encode NaN as `nodata`
    * (required then); the value is recorded in GDAL's ASCII nodata
    * tag so decode restores NaN. */
  def writeCog(bands: Seq[Array[Float]], width: Int, height: Int,
               west: Double, north: Double, px: Double, py: Double,
               tileSize: Int = 256, dtype: String = "float32",
               nodata: Option[Double] = None,
               planar: Boolean = false,
               overviewLevels: Int = 0,
               compression: Int = 8,
               stripped: Boolean = false,
               sparse: Boolean = false): Array[Byte] = {
    require(Set(1, 5, 7, 8, 32773).contains(compression),
      s"compression $compression not supported (1 none, 5 LZW, 7 JPEG, 8 deflate, 32773 PackBits)")
    val s = bands.size
    require(s >= 1, "at least one band")
    require(bands.forall(_.length == width * height), "band size mismatch")
    val (bits, fmt) = dtypeSpec(dtype)
    val bps = bits / 8
    val predictor = if (compression == 7) 1 else predictorFor(dtype)
    if (fmt != 3)
      require(nodata.isDefined || bands.forall(!_.exists(_.isNaN)),
        "integer dtype with NaN cells needs an explicit nodata value")
    val fill = nodata.getOrElse(0.0)
    val stride = if (planar) 1 else s // predictor lag = interleaved channels
    val planes = if (planar) s else 1
    val chans = if (planar) 1 else s
    if (compression == 7) {
      require(bits == 8 && fmt == 1, "JPEG compression requires uint8 samples")
      require(chans == 1 || chans == 3,
        "JPEG compression requires 1 (grayscale) or 3 (YCbCr) interleaved samples")
    }
    // shared abbreviated-stream tables (TIFF JPEGTables tag 347) —
    // content-independent for the fixed fixture tables, so one blob
    // serves every tile, the GDAL layout
    lazy val jpegTablesBytes: Array[Byte] = JpegCodec.encodeStreams(
      JpegCodec.Image(8, 8, 1, new Array[Byte](64)), abbreviated = true)._1

    def encodeValue(buf: ByteBuffer, v: Float): Unit = {
      val x = if (v.isNaN && fmt != 3) fill else v.toDouble
      bits match {
        case 8  => buf.put(x.toInt.toByte)
        case 16 => buf.putShort(x.toInt.toShort)
        case 32 =>
          if (fmt == 3) buf.putFloat(x.toFloat)
          else if (fmt == 1) buf.putInt(x.toLong.toInt) // unsigned wrap
          else buf.putInt(x.toInt)
        case 64 => buf.putDouble(x)
      }
    }

    // NaN-aware average decimation by `f` (all-NaN windows stay NaN)
    def decimate(src: Array[Float], sw: Int, sh: Int, f: Int): (Array[Float], Int, Int) = {
      val ow = (sw + f - 1) / f; val oh = (sh + f - 1) / f
      val dst = new Array[Float](ow * oh)
      for (oy <- 0 until oh; ox <- 0 until ow) {
        var sum = 0.0; var n = 0
        var yy = oy * f
        while (yy < math.min(oy * f + f, sh)) {
          var xx = ox * f
          while (xx < math.min(ox * f + f, sw)) {
            val v = src(yy * sw + xx)
            if (!v.isNaN) { sum += v; n += 1 }
            xx += 1
          }
          yy += 1
        }
        dst(oy * ow + ox) = if (n == 0) Float.NaN else (sum / n).toFloat
      }
      (dst, ow, oh)
    }

    case class Page(bands: Seq[Array[Float]], w: Int, h: Int, overview: Boolean)
    val pages = Page(bands, width, height, overview = false) +:
      (1 to overviewLevels).map { k =>
        val dec = bands.map(b => decimate(b, width, height, 1 << k))
        Page(dec.map(_._1), dec.head._2, dec.head._3, overview = true)
      }

    def pack(raw: Array[Byte], rowSamples: Int): Array[Byte] = {
      val pred = applyPredictor(raw, predictor, rowSamples, bps, fmt, stride)
      compression match {
        case 1 => pred
        case 5 => lzwEncode(pred)
        case 7 => // abbreviated per-chunk scan; tables live in tag 347
          JpegCodec.encodeStreams(
            JpegCodec.Image(rowSamples / chans, pred.length / rowSamples, chans, pred),
            abbreviated = true)._2
        case 8 => deflate(pred)
        case 32773 => packbitsEncode(pred, rowSamples * bps)
      }
    }
    // one compressed payload per (plane, tileRow, tileCol); edge tiles
    // are FULL size with fill padding, per the TIFF tiling model
    def tilesFor(pg: Page): IndexedSeq[Array[Byte]] = {
      val ta = (pg.w + tileSize - 1) / tileSize
      val td = (pg.h + tileSize - 1) / tileSize
      for {
        p <- 0 until planes; ty <- 0 until td; tx <- 0 until ta
      } yield {
        // GDAL SPARSE_OK: an all-nodata tile is never written — its
        // offset AND bytecount stay 0 (empty payload here; the offset
        // map below translates emptiness to offset 0)
        def allNaN: Boolean = {
          var yy = 0
          var all = true
          while (all && yy < tileSize) {
            var xx = 0
            while (all && xx < tileSize) {
              val y = ty * tileSize + yy; val x = tx * tileSize + xx
              if (y < pg.h && x < pg.w) {
                var c = 0
                while (all && c < chans) {
                  val band = if (planar) p else c
                  if (!pg.bands(band)(y * pg.w + x).isNaN) all = false
                  c += 1
                }
              }
              xx += 1
            }
            yy += 1
          }
          all
        }
        if (sparse && fmt == 3 && allNaN) Array.emptyByteArray
        else {
        val rowSamples = tileSize * chans
        val raw = ByteBuffer.allocate(tileSize * rowSamples * bps)
          .order(ByteOrder.LITTLE_ENDIAN)
        for (yy <- 0 until tileSize; xx <- 0 until tileSize; c <- 0 until chans) {
          val y = ty * tileSize + yy; val x = tx * tileSize + xx
          val band = if (planar) p else c
          val v =
            if (y < pg.h && x < pg.w) pg.bands(band)(y * pg.w + x)
            else if (fmt == 3) 0f else fill.toFloat
          encodeValue(raw, v)
        }
        pack(raw.array(), rowSamples)
        }
      }
    }
    // STRIP organization — GDAL's default for small rasters: chunks of
    // `tileSize` full-width rows, the LAST strip short (strips are not
    // padded, unlike tiles)
    def stripsFor(pg: Page): IndexedSeq[Array[Byte]] = {
      val sd = (pg.h + tileSize - 1) / tileSize
      for (p <- 0 until planes; sy <- 0 until sd) yield {
        val rows = math.min(tileSize, pg.h - sy * tileSize)
        val rowSamples = pg.w * chans
        val raw = ByteBuffer.allocate(rows * rowSamples * bps)
          .order(ByteOrder.LITTLE_ENDIAN)
        for (yy <- 0 until rows; x <- 0 until pg.w; c <- 0 until chans) {
          val band = if (planar) p else c
          encodeValue(raw, pg.bands(band)((sy * tileSize + yy) * pg.w + x))
        }
        pack(raw.array(), rowSamples)
      }
    }
    val pageTiles = pages.map(pg => if (stripped) stripsFor(pg) else tilesFor(pg))

    // IFD assembly: tags ascending, out-of-line arrays right after
    // each IFD, tile payloads at the tail with overview data FIRST
    // and full-res LAST (cog_translate's range-request-friendly order)
    val nodataAscii = nodata.map(v =>
      (if (v == v.floor && v.abs < 1e15) v.toLong.toString else v.toString) + "\u0000")
    case class Entry(id: Int, typ: Int, count: Int, inline: Option[Long],
                     payload: Option[Array[Byte]])
    def shorts(vs: Seq[Int]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.size * 2).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putShort(v.toShort)); b.array()
    }
    def longs(vs: Seq[Long]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.size * 4).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(v => b.putInt(v.toInt)); b.array()
    }
    def doubles(vs: Seq[Double]): Array[Byte] = {
      val b = ByteBuffer.allocate(vs.size * 8).order(ByteOrder.LITTLE_ENDIAN)
      vs.foreach(b.putDouble); b.array()
    }
    def arr(id: Int, typ: Int, vs: Array[Byte], count: Int): Entry =
      if (vs.length <= 4) Entry(id, typ, count,
        Some(ByteBuffer.wrap(java.util.Arrays.copyOf(vs, 4))
          .order(ByteOrder.LITTLE_ENDIAN).getInt().toLong & 0xffffffffL), None)
      else Entry(id, typ, count, None, Some(vs))

    def entriesFor(pg: Page, tiles: IndexedSeq[Array[Byte]]): Seq[Entry] = {
      val nTiles = tiles.size
      (if (pg.overview) // NewSubfileType: reduced-resolution subfile
        Seq(Entry(254, 4, 1, Some(1L), None)) else Nil) ++
      Seq(
        Entry(TAG_WIDTH, 3, 1, Some(pg.w.toLong), None),
        Entry(TAG_HEIGHT, 3, 1, Some(pg.h.toLong), None),
        arr(TAG_BITS, 3, shorts(Seq.fill(s)(bits)), s),
        Entry(TAG_COMPRESSION, 3, 1, Some(compression.toLong), None),
        Entry(TAG_PHOTOMETRIC, 3, 1,
          Some(if (compression == 7 && chans == 3) 6L else 1L), None),
        Entry(TAG_SAMPLES_PER_PIXEL, 3, 1, Some(s.toLong), None),
        Entry(TAG_PLANAR_CONFIG, 3, 1, Some(if (planar) 2L else 1L), None),
        Entry(TAG_PREDICTOR, 3, 1, Some(predictor.toLong), None)) ++
      (if (stripped) Seq(
        Entry(TAG_STRIP_OFFSETS, 4, nTiles,
          if (nTiles == 1) Some(0L) else None,
          if (nTiles == 1) None else Some(longs(Seq.fill(nTiles)(0L)))),
        Entry(TAG_ROWS_PER_STRIP, 3, 1, Some(tileSize.toLong), None),
        arr(TAG_STRIP_BYTES, 4, longs(tiles.map(_.length.toLong)), nTiles))
      else Seq(
        Entry(TAG_TILE_WIDTH, 3, 1, Some(tileSize.toLong), None),
        Entry(TAG_TILE_LENGTH, 3, 1, Some(tileSize.toLong), None),
        arr(TAG_TILE_OFFSETS, 4, longs(Seq.fill(nTiles)(0L)), nTiles),
        arr(TAG_TILE_BYTES, 4, longs(tiles.map(_.length.toLong)), nTiles))) ++
      Seq(arr(TAG_SAMPLE_FORMAT, 3, shorts(Seq.fill(s)(fmt)), s)) ++
      (if (compression == 7)
        Seq(arr(TAG_JPEG_TABLES, 7, jpegTablesBytes, jpegTablesBytes.length))
       else Nil) ++
      (if (pg.overview) Nil else Seq( // georeferencing on the base image
        arr(TAG_PIXEL_SCALE, 12, doubles(Seq(px, py, 0.0)), 3),
        arr(TAG_TIEPOINT, 12, doubles(Seq(0, 0, 0, west, north, 0)), 6))) ++
      nodataAscii.map(nd =>
        arr(TAG_GDAL_NODATA, 2, nd.getBytes("US-ASCII"), nd.length))
    }
    // TIFF requires ascending tag ids; sorting here keeps the builder
    // free to group entries logically (strip ids interleave with the
    // sample-layout ids: 273 < 277 < 278-279 < 284)
    val pageEntries = pages.zip(pageTiles).map { case (pg, t) =>
      entriesFor(pg, t).sortBy(_.id) }

    // layout pass: [header][IFD+payload block per page][tile data]
    var at = 8
    val ifdOffs = new Array[Int](pages.size)
    val payloadOffs = pageEntries.zipWithIndex.map { case (entries, pi) =>
      ifdOffs(pi) = at
      at += 2 + entries.size * 12 + 4
      entries.map { e =>
        e.payload.map { p =>
          val off = at; at += p.length + (p.length & 1); off // word-aligned
        }
      }
    }
    // tile data region: REVERSE page order (deepest overview first)
    val pageTileOffs: IndexedSeq[IndexedSeq[Int]] = {
      val offs = Array.fill(pages.size)(IndexedSeq.empty[Int])
      for (pi <- pages.indices.reverse)
        offs(pi) = pageTiles(pi).map { t =>
          if (t.isEmpty) 0 // sparse tile: offset 0 = never written
          else { val off = at; at += t.length + (t.length & 1); off }
        }
      offs.toIndexedSeq
    }
    val patched = pageEntries.zipWithIndex.map { case (entries, pi) =>
      val tileOffs = pageTileOffs(pi)
      entries.map { e =>
        if (e.id != TAG_TILE_OFFSETS && e.id != TAG_STRIP_OFFSETS) e
        else if (tileOffs.size == 1) e.copy(inline = Some(tileOffs(0).toLong))
        else e.copy(payload = Some(longs(tileOffs.map(_.toLong))))
      }
    }

    val out = ByteBuffer.allocate(at).order(ByteOrder.LITTLE_ENDIAN)
    out.put('I'.toByte).put('I'.toByte).putShort(42).putInt(ifdOffs(0))
    for (pi <- pages.indices) {
      out.position(ifdOffs(pi))
      out.putShort(patched(pi).size.toShort)
      for ((e, i) <- patched(pi).zipWithIndex) {
        out.putShort(e.id.toShort).putShort(e.typ.toShort).putInt(e.count)
        (e.inline, payloadOffs(pi)(i)) match {
          case (Some(v), _) => out.putInt(v.toInt)
          case (None, Some(off)) => out.putInt(off)
          case _ => sys.error("unreachable")
        }
      }
      out.putInt(if (pi + 1 < pages.size) ifdOffs(pi + 1) else 0) // next IFD
      for ((e, i) <- patched(pi).zipWithIndex; p <- e.payload) {
        out.position(payloadOffs(pi)(i).get)
        out.put(p)
      }
      for ((t, i) <- pageTiles(pi).zipWithIndex if t.nonEmpty) {
        out.position(pageTileOffs(pi)(i))
        out.put(t)
      }
    }
    out.array()
  }

  // ---- TIFF LZW (spec §13): MSB-first codes, 9→12 bits with the
  // "early change" width bump one code early, Clear=256, EOI=257,
  // table entries from 258. The other compression real-world GeoTIFFs
  // arrive in (older GDAL defaults, USGS archives); predictors apply
  // before compression exactly as with deflate. ----------------------

  private val LzwClear = 256
  private val LzwEoi = 257

  private[sources] def lzwEncode(raw: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var bitBuf = 0L; var bitCnt = 0
    var width = 9
    def put(code: Int): Unit = {
      bitBuf = (bitBuf << width) | code
      bitCnt += width
      while (bitCnt >= 8) { out.write(((bitBuf >> (bitCnt - 8)) & 0xff).toInt); bitCnt -= 8 }
    }
    // dictionary: string → code, keyed as (prefixCode << 8 | byte)
    var dict = new java.util.HashMap[Int, Integer]()
    var next = 258
    put(LzwClear)
    var prev = -1 // current prefix CODE (every 1-byte string is its literal code)
    var i = 0
    while (i < raw.length) {
      val b = raw(i) & 0xff
      if (prev < 0) prev = b
      else {
        val key = (prev << 8) | b
        val hit = dict.get(key)
        if (hit != null) prev = hit.intValue()
        else {
          put(prev)
          dict.put(key, Integer.valueOf(next))
          next += 1
          // early change: width grows when the NEXT code would not fit
          // at the current width minus one slot (TIFF's off-by-one)
          if (next == (1 << width) - 1 && width < 12) width += 1
          else if (next == 4094) { // table full: reset
            put(LzwClear)
            dict = new java.util.HashMap[Int, Integer]()
            next = 258; width = 9
          }
          prev = b
        }
      }
      i += 1
    }
    if (prev >= 0) put(prev)
    put(LzwEoi)
    if (bitCnt > 0) out.write(((bitBuf << (8 - bitCnt)) & 0xff).toInt)
    out.toByteArray
  }

  private[sources] def lzwDecode(comp: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var at = 0
    var bitBuf = 0L; var bitCnt = 0; var pos = 0
    var width = 9
    def read(): Int = {
      while (bitCnt < width) {
        if (pos >= comp.length) return LzwEoi
        bitBuf = (bitBuf << 8) | (comp(pos) & 0xff); pos += 1; bitCnt += 8
      }
      val code = ((bitBuf >> (bitCnt - width)) & ((1 << width) - 1)).toInt
      bitCnt -= width
      code
    }
    // table of byte strings; slots 0-255 literals, 258+ built entries
    val table = new Array[Array[Byte]](4096)
    var next = 258
    var prev: Array[Byte] = null
    var done = false
    while (!done) {
      val code = read()
      if (code == LzwEoi) done = true
      else if (code == LzwClear) {
        java.util.Arrays.fill(table.asInstanceOf[Array[AnyRef]], 258, 4096, null)
        next = 258; width = 9; prev = null
      } else {
        val cur: Array[Byte] =
          if (code < 256) Array(code.toByte)
          else if (code < next && table(code) != null) table(code)
          else if (code == next && prev != null) prev :+ prev(0) // KwKwK case
          else throw new IllegalArgumentException(s"bad LZW code $code (next=$next)")
        System.arraycopy(cur, 0, out, at, math.min(cur.length, expected - at))
        at += cur.length
        if (prev != null && next < 4096) {
          table(next) = prev :+ cur(0)
          next += 1
          // one entry EARLIER than the encoder's bump: the decoder's
          // table additions lag the encoder's by exactly one code (the
          // first code after Clear adds nothing), so syncing the width
          // change needs the threshold shifted by one — the TIFF
          // "early change" pairing
          if (next == (1 << width) - 2 && width < 12) width += 1
        }
        prev = cur
        if (at >= expected) done = true
      }
    }
    require(at >= expected, s"LZW stream ended at $at of $expected bytes")
    out
  }

  // ---- TIFF PackBits (spec §9): the byte-oriented RLE of scanned and
  // legacy GeoTIFFs (compression 32773). Control byte n ∈ [0,127]
  // copies n+1 literal bytes, n ∈ [−127,−1] repeats the next byte 1−n
  // times, −128 is a no-op. Rows compress INDEPENDENTLY per the spec —
  // the encoder restarts at every scanline; the decoder accepts the
  // concatenated per-row streams as one (runs never cross rows in a
  // conforming file, so whole-chunk decode yields identical bytes). --

  private[sources] def packbitsEncode(raw: Array[Byte], rowBytes: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    var base = 0
    while (base < raw.length) {
      val end = math.min(base + rowBytes, raw.length)
      var i = base
      while (i < end) {
        var run = 1
        while (i + run < end && run < 128 && raw(i + run) == raw(i)) run += 1
        if (run >= 2) {
          out.write(1 - run) // −(run−1) as a signed byte
          out.write(raw(i))
          i += run
        } else {
          // literal stretch: up to 128 bytes, stopping where a run starts
          var j = i + 1
          while (j < end && j - i < 128 &&
                 !(j + 1 < end && raw(j) == raw(j + 1))) j += 1
          out.write(j - i - 1)
          out.write(raw, i, j - i)
          i = j
        }
      }
      base = end
    }
    out.toByteArray
  }

  private[sources] def packbitsDecode(comp: Array[Byte], expected: Int): Array[Byte] = {
    val out = new Array[Byte](expected)
    var at = 0; var i = 0
    while (at < expected) {
      require(i < comp.length, s"PackBits stream ended at $at of $expected bytes")
      val n = comp(i); i += 1
      if (n >= 0) {
        val cnt = n + 1
        require(i + cnt <= comp.length && at + cnt <= expected,
          s"PackBits literal overruns (at $at of $expected)")
        System.arraycopy(comp, i, out, at, cnt); i += cnt; at += cnt
      } else if (n != -128) {
        val cnt = 1 - n
        require(i < comp.length && at + cnt <= expected,
          s"PackBits run overruns (at $at of $expected)")
        java.util.Arrays.fill(out, at, at + cnt, comp(i)); i += 1; at += cnt
      }
    }
    out
  }

  private def deflate(raw: Array[Byte]): Array[Byte] = {
    val d = new Deflater(Deflater.DEFAULT_COMPRESSION)
    d.setInput(raw); d.finish()
    val out = new java.io.ByteArrayOutputStream(raw.length / 2 + 64)
    val buf = new Array[Byte](65536)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  private def inflate(comp: Array[Byte], expected: Int): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(comp)
    val out = new Array[Byte](expected)
    var at = 0
    while (at < expected && !inf.finished()) {
      val n = inf.inflate(out, at, expected - at)
      if (n == 0 && inf.needsInput())
        throw new IllegalArgumentException("truncated deflate stream")
      at += n
    }
    inf.end()
    out
  }

  /** Forward predictor over one chunk's raw little-endian samples.
    * `rowSamples` = samples per scanline (width × interleaved chans),
    * `stride` = predictor lag (samples per pixel for chunky, 1 for
    * planar) — the libtiff semantics. */
  private def applyPredictor(raw: Array[Byte], predictor: Int,
                             rowSamples: Int, bps: Int, fmt: Int,
                             stride: Int): Array[Byte] = predictor match {
    case 1 => raw
    case 2 =>
      val out = raw.clone()
      val rowBytes = rowSamples * bps
      val buf = ByteBuffer.wrap(out).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until raw.length / rowBytes) {
        val base = r * rowBytes
        // difference back-to-front so each delta uses ORIGINAL values
        var i = rowSamples - 1
        while (i >= stride) {
          bps match {
            case 1 => out(base + i) = (out(base + i) - out(base + i - stride)).toByte
            case 2 =>
              val at = base + i * 2
              buf.putShort(at, (buf.getShort(at) - buf.getShort(at - stride * 2)).toShort)
            case 4 =>
              val at = base + i * 4
              buf.putInt(at, buf.getInt(at) - buf.getInt(at - stride * 4))
            case 8 =>
              val at = base + i * 8
              buf.putLong(at, buf.getLong(at) - buf.getLong(at - stride * 8))
          }
          i -= 1
        }
      }
      out
    case 3 =>
      // floating-point predictor: per row, split samples into MSB-first
      // byte planes, then byte-difference with `stride` lag. Output is
      // byte-order-independent (the planes define the order).
      val rowBytes = rowSamples * bps
      val out = new Array[Byte](raw.length)
      val in = ByteBuffer.wrap(raw).order(ByteOrder.LITTLE_ENDIAN)
      for (r <- 0 until raw.length / rowBytes) {
        val base = r * rowBytes
        for (j <- 0 until rowSamples) {
          val bitsv = if (bps == 8) in.getLong(base + j * 8)
                      else in.getInt(base + j * 4).toLong & 0xffffffffL
          var pl = 0
          while (pl < bps) {
            out(base + pl * rowSamples + j) =
              (bitsv >>> (8 * (bps - 1 - pl))).toByte
            pl += 1
          }
        }
        var i = rowBytes - 1
        while (i >= stride) {
          out(base + i) = (out(base + i) - out(base + i - stride)).toByte
          i -= 1
        }
      }
      out
    case other => throw new IllegalArgumentException(s"predictor $other")
  }

  /** Undo [[applyPredictor]] on a decoded chunk, in place where
    * possible. */
  private def undoPredictor(raw: Array[Byte], predictor: Int,
                            rowSamples: Int, bps: Int, fmt: Int,
                            stride: Int, order: ByteOrder): Array[Byte] =
    predictor match {
      case 1 => raw
      case 2 =>
        val rowBytes = rowSamples * bps
        val buf = ByteBuffer.wrap(raw).order(order)
        for (r <- 0 until raw.length / rowBytes) {
          val base = r * rowBytes
          var i = stride
          while (i < rowSamples) {
            bps match {
              case 1 => raw(base + i) = (raw(base + i) + raw(base + i - stride)).toByte
              case 2 =>
                val at = base + i * 2
                buf.putShort(at, (buf.getShort(at) + buf.getShort(at - stride * 2)).toShort)
              case 4 =>
                val at = base + i * 4
                buf.putInt(at, buf.getInt(at) + buf.getInt(at - stride * 4))
              case 8 =>
                val at = base + i * 8
                buf.putLong(at, buf.getLong(at) + buf.getLong(at - stride * 8))
            }
            i += 1
          }
        }
        raw
      case 3 =>
        val rowBytes = rowSamples * bps
        val out = new Array[Byte](raw.length)
        val ob = ByteBuffer.wrap(out).order(order)
        for (r <- 0 until raw.length / rowBytes) {
          val base = r * rowBytes
          var i = stride
          while (i < rowBytes) {
            raw(base + i) = (raw(base + i) + raw(base + i - stride)).toByte
            i += 1
          }
          for (j <- 0 until rowSamples) {
            var bitsv = 0L
            var pl = 0
            while (pl < bps) {
              bitsv = (bitsv << 8) | (raw(base + pl * rowSamples + j) & 0xffL)
              pl += 1
            }
            if (bps == 8) ob.putLong(base + j * 8, bitsv)
            else ob.putInt(base + j * 4, bitsv.toInt)
          }
        }
        out
      case other => throw new IllegalArgumentException(s"predictor $other")
    }

  // ---- read -------------------------------------------------------

  private case class Ifd(width: Int, height: Int, bits: Int, fmt: Int,
                         spp: Int, planar: Int, compression: Int,
                         predictor: Int, nodata: Option[Double],
                         tileW: Int, tileH: Int,
                         chunkOffs: Array[Long], chunkBytes: Array[Long],
                         tiled: Boolean, rowsPerStrip: Int,
                         px: Double, py: Double, west: Double, north: Double,
                         order: ByteOrder, next: Long,
                         photometric: Int = 1,
                         jpegTables: Option[Array[Byte]] = None)

  private def parseIfd0(in: ByteIn): Ifd = {
    val head = in.slice(0, math.min(16L, in.length).toInt)
    require(canHandle(head), "not a TIFF")
    in.setOrder(if (head(0) == 'I') ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    if (isBigTiff(head)) {
      val off0 = in.getLong(8)
      require(off0 >= 16 && off0 < in.length,
        s"BigTIFF IFD0 offset $off0 outside the file")
      parseIfdAt(in, off0)
    } else parseIfdAt(in, in.getInt(4).toLong & 0xffffffffL)
  }

  /** Every IFD in the file, following the next-IFD chain — page 0 is
    * the full-resolution image, later pages a COG's overview pyramid. */
  private def parseChain(in: ByteIn): Seq[Ifd] = {
    val out = scala.collection.mutable.Buffer(parseIfd0(in))
    while (out.last.next != 0 && out.size < 64)
      out += parseIfdAt(in, out.last.next)
    out.toSeq
  }

  /** One IFD, classic or BigTIFF layout. Layout deltas (BigTIFF
    * supplement): entry count u64 (vs u16), 20-byte entries with u64
    * counts and an 8-byte inline value field (vs 12/u32/4), next-IFD
    * u64, and the LONG8 (16) / SLONG8 (17) / IFD8 (18) value types. */
  private def parseIfdAt(in: ByteIn, ifdOff: Long): Ifd = {
    val big = isBigTiff(in.slice(0, math.min(16L, in.length).toInt))
    val order = in.byteOrder
    val n = if (big) {
      val n64 = in.getLong(ifdOff)
      require(n64 >= 0 && n64 <= 0xffff, s"implausible BigTIFF entry count $n64")
      n64.toInt
    } else in.getShort(ifdOff) & 0xffff
    val entryBase = ifdOff + (if (big) 8 else 2)
    val entrySize = if (big) 20 else 12
    val inlineCap = if (big) 8 else 4
    def offAt(at: Long): Long = {
      val o = if (big) in.getLong(at) else in.getInt(at).toLong & 0xffffffffL
      require(o >= 0 && o < in.length, s"tag value offset $o outside the file")
      o
    }

    var width = 0; var height = 0; var rowsPerStrip = Int.MaxValue
    var chunkOffs = Array[Long](); var chunkBytes = Array[Long]()
    var tileOffs = Array[Long](); var tileBytesA = Array[Long]()
    var px = 1.0; var py = 1.0; var west = 0.0; var north = 0.0
    var fmt = 1; var bits = 1; var spp = 1; var planar = 1
    var compression = 1; var predictor = 1
    var tileW = 0; var tileH = 0
    var nodata: Option[Double] = None
    var photometric = 1
    var jpegTables: Option[Array[Byte]] = None

    def typeSize(t: Int) = t match {
      case 3 => 2; case 4 => 4; case 12 => 8; case 16 | 17 => 8; case _ => 1
    }
    def tagValues(typ: Int, count: Int, at: Long): Array[Long] = {
      val inline = typeSize(typ) * count <= inlineCap
      val base = if (inline) at else offAt(at)
      (0 until count).map { i =>
        typ match {
          case 1 => (in(base + i) & 0xff).toLong
          case 3 => (in.getShort(base + i * 2) & 0xffff).toLong
          case 4 => in.getInt(base + i * 4).toLong & 0xffffffffL
          case 16 | 17 => in.getLong(base + i * 8) // LONG8 / SLONG8
          case _ => throw new IllegalArgumentException(s"type $typ")
        }
      }.toArray
    }
    def tagDoubles(count: Int, at: Long): Array[Double] = {
      val base = if (big && count == 1) at else offAt(at)
      (0 until count).map(i => in.getDouble(base + i * 8)).toArray
    }
    def tagAscii(count: Int, at: Long): String = {
      val base = if (count <= inlineCap) at else offAt(at)
      new String(in.slice(base, count), "US-ASCII").takeWhile(_ != '\u0000').trim
    }

    for (i <- 0 until n) {
      val e = entryBase + i * entrySize
      val id = in.getShort(e) & 0xffff
      val typ = in.getShort(e + 2) & 0xffff
      val count = (if (big) {
        val c64 = in.getLong(e + 4)
        require(c64 >= 0 && c64 <= Int.MaxValue, s"implausible tag count $c64")
        c64
      } else in.getInt(e + 4).toLong & 0xffffffffL).toInt
      val valAt = e + (if (big) 12 else 8)
      id match {
        case TAG_WIDTH => width = tagValues(typ, 1, valAt)(0).toInt
        case TAG_HEIGHT => height = tagValues(typ, 1, valAt)(0).toInt
        case TAG_BITS =>
          val bs = tagValues(typ, count, valAt)
          require(bs.distinct.length == 1, "heterogeneous BitsPerSample")
          bits = bs(0).toInt
        case TAG_COMPRESSION => compression = tagValues(typ, 1, valAt)(0).toInt
        case TAG_SAMPLES_PER_PIXEL => spp = tagValues(typ, 1, valAt)(0).toInt
        case TAG_ROWS_PER_STRIP => rowsPerStrip = tagValues(typ, 1, valAt)(0).toInt
        case TAG_STRIP_OFFSETS => chunkOffs = tagValues(typ, count, valAt)
        case TAG_STRIP_BYTES => chunkBytes = tagValues(typ, count, valAt)
        case TAG_PLANAR_CONFIG => planar = tagValues(typ, 1, valAt)(0).toInt
        case TAG_PREDICTOR => predictor = tagValues(typ, 1, valAt)(0).toInt
        case TAG_TILE_WIDTH => tileW = tagValues(typ, 1, valAt)(0).toInt
        case TAG_TILE_LENGTH => tileH = tagValues(typ, 1, valAt)(0).toInt
        case TAG_TILE_OFFSETS => tileOffs = tagValues(typ, count, valAt)
        case TAG_TILE_BYTES => tileBytesA = tagValues(typ, count, valAt)
        case TAG_SAMPLE_FORMAT =>
          val fs = tagValues(typ, count, valAt)
          require(fs.distinct.length == 1, "heterogeneous SampleFormat")
          fmt = fs(0).toInt
        case TAG_PIXEL_SCALE =>
          val d = tagDoubles(3, valAt); px = d(0); py = d(1)
        case TAG_TIEPOINT =>
          val d = tagDoubles(6, valAt); west = d(3); north = d(4)
        case TAG_GDAL_NODATA =>
          val s = tagAscii(count, valAt)
          nodata = if (s.isEmpty) None
            else if (s.equalsIgnoreCase("nan")) Some(Double.NaN)
            else scala.util.Try(s.toDouble).toOption
        case TAG_PHOTOMETRIC => photometric = tagValues(typ, 1, valAt)(0).toInt
        case TAG_JPEG_TABLES => // type 7 UNDEFINED: raw byte array
          val base = if (count <= inlineCap) valAt else offAt(valAt)
          jpegTables = Some(in.slice(base, count))
        case _ => // ignore (descriptions, GeoKeys, …)
      }
    }
    val tiled = tileOffs.nonEmpty
    Ifd(width, height, bits, fmt, spp, planar, compression, predictor,
      nodata,
      tileW, tileH,
      if (tiled) tileOffs else chunkOffs,
      if (tiled) tileBytesA else chunkBytes,
      tiled, rowsPerStrip, px, py, west, north, order,
      if (big) in.getLong(entryBase + n.toLong.toInt * entrySize)
      else in.getInt(ifdOff + 2 + n * 12).toLong & 0xffffffffL,
      photometric, jpegTables)
  }

  /** Number of bands in the file (`band_N` discovery,
    * formats/geotiff.py:58-94). */
  def bandCount(bytes: Array[Byte]): Int = parseIfd0(ByteIn(bytes)).spp

  /** Decode band 1. */
  def read(bytes: Array[Byte]): Raster = readBand(bytes, 1)

  /** Decode one 1-based band from any supported layout: strips or
    * tiles × uncompressed or deflate × predictor 1/2/3 × chunky or
    * planar × uint8/int16/uint16/int32/float32 × II/MM. */
  def readBand(bytes: Array[Byte], band: Int): Raster =
    readBand(bytes, band, level = 0)

  /** Per-page (width, height) of the file's IFD chain — a COG reports
    * its full-resolution image followed by the overview pyramid, the
    * level inventory a low-zoom reader picks from (the reference's
    * TiTiler serves overviews the same way, asset_writer.py:63-68). */
  def levels(bytes: Array[Byte]): Seq[(Int, Int)] =
    parseChain(ByteIn(bytes)).map(d => (d.width, d.height))

  /** Decode one band of one pyramid level (level 0 = full resolution).
    * Overview pages carry no georeferencing tags; theirs derives from
    * page 0's affine scaled by the dimension ratio, GDAL's overview
    * convention. */
  def readBand(bytes: Array[Byte], band: Int, level: Int): Raster =
    readBand(ByteIn(bytes), band, level)

  /** Decode from a positional-read source — the channel-backed path
    * for BigTIFF granules beyond JVM array addressing. */
  def readBand(in: ByteIn, band: Int, level: Int): Raster = {
    val pages = parseChain(in)
    require(level >= 0 && level < pages.size,
      s"level $level not in file (has ${pages.size})")
    val base = pages.head
    val d0 = pages(level)
    val d =
      if (level == 0) d0
      else d0.copy(
        px = base.px * base.width / d0.width,
        py = base.py * base.height / d0.height,
        west = base.west, north = base.north,
        nodata = d0.nodata.orElse(base.nodata))
    require(band >= 1 && band <= d.spp,
      s"band $band not in file (has ${d.spp})")
    require(Set(1, 5, 7, 8, 32773, 32946).contains(d.compression),
      s"unsupported compression ${d.compression} (none/LZW/JPEG/deflate/PackBits only)")
    if (d.compression == 7) {
      require(d.bits == 8 && d.fmt == 1,
        s"JPEG compression carries uint8 samples, not ${d.bits}-bit format ${d.fmt}")
      require(d.predictor == 1, "JPEG compression does not combine with a predictor")
    }
    require(Set((8, 1), (16, 1), (16, 2), (32, 1), (32, 2), (32, 3),
        (64, 3)).contains((d.bits, d.fmt)) ||
      (d.bits == 8 && d.fmt == 2),
      s"unsupported sample type: ${d.bits}-bit format ${d.fmt}")
    require(d.predictor != 3 || (d.fmt == 3 && (d.bits == 32 || d.bits == 64)),
      "floating-point predictor requires float32/float64 samples")
    val bps = d.bits / 8
    val chans = if (d.planar == 2) 1 else d.spp
    val stride = if (d.planar == 2) 1 else d.spp
    val chan = if (d.planar == 2) 0 else band - 1

    val width = d.width; val height = d.height
    // materializing-reader cap, stated loudly (the HDF5 path's rule):
    // the decoded band is one Float array, so width*height must fit —
    // a 3e9-pixel mosaic would otherwise wrap the allocation negative
    require(width.toLong * height <= Int.MaxValue,
      s"band of $width x $height pixels exceeds the materializing " +
        "reader's 2^31-element cap (tile-subset reads needed)")
    val data = new Array[Float](width * height)

    // shared JPEGTables parse ONCE — a pyramid COG decodes thousands
    // of tiles against the same abbreviated table stream
    lazy val jpegPre = d.jpegTables.map { tb =>
      val t = new JpegCodec.Tables; JpegCodec.parseTables(tb, t); t
    }

    // unify strips and tiles as chunks of (chunkW, chunkH) at (x0, y0)
    val (ta, td, cw, ch) =
      if (d.tiled) ((width + d.tileW - 1) / d.tileW,
        (height + d.tileH - 1) / d.tileH, d.tileW, d.tileH)
      else (1, (height + math.min(d.rowsPerStrip, height) - 1) /
        math.min(d.rowsPerStrip, height), width,
        math.min(d.rowsPerStrip, height))
    val chunksPerPlane = ta * td
    val planeBase = if (d.planar == 2) (band - 1) * chunksPerPlane else 0

    for (ci <- 0 until chunksPerPlane) {
      val ty = ci / ta; val tx = ci % ta
      val y0 = ty * ch; val x0 = tx * cw
      // strips: the LAST strip may be short; tiles are always full
      val rows = if (d.tiled) ch else math.min(ch, height - y0)
      val rowSamples = cw * chans
      val expect = rows * rowSamples * bps
      val off = d.chunkOffs(planeBase + ci)
      val len = d.chunkBytes(planeBase + ci).toInt
      if (off == 0 || len == 0) {
        // SPARSE tile (GDAL SPARSE_OK COGs): offset/bytecount 0 means
        // the tile was never written — every covered pixel is nodata.
        // Decoding would otherwise slice the HEADER bytes as pixels.
        var yy = 0
        while (yy < rows && y0 + yy < height) {
          var xx = 0
          while (xx < cw && x0 + xx < width) {
            data((y0 + yy) * width + (x0 + xx)) = Float.NaN
            xx += 1
          }
          yy += 1
        }
      } else {
      val raw0 = d.compression match {
        case 1 => in.slice(off, expect)
        case 5 => lzwDecode(in.slice(off, len), expect)
        case 7 => // baseline JPEG; tables may live in the shared JPEGTables tag
          val img = JpegCodec.decode(in.slice(off, len), jpegPre,
            colorTransform = d.photometric == 6)
          require(img.comps == chans,
            s"JPEG chunk carries ${img.comps} components, expected $chans")
          require(img.width == cw && img.height == rows,
            s"JPEG chunk is ${img.width}x${img.height}, expected ${cw}x$rows")
          img.data
        case 32773 => packbitsDecode(in.slice(off, len), expect)
        case _ => inflate(in.slice(off, len), expect)
      }
      val raw = undoPredictor(raw0, d.predictor, rowSamples, bps, d.fmt,
        stride, d.order)
      val rb = ByteBuffer.wrap(raw).order(d.order)
      var yy = 0
      while (yy < rows && y0 + yy < height) {
        val rowBase = yy * rowSamples
        var xx = 0
        while (xx < cw && x0 + xx < width) {
          val at = (rowBase + xx * chans + chan) * bps
          val v: Float = (d.bits, d.fmt) match {
            case (8, 1)  => (raw(at) & 0xff).toFloat
            case (8, 2)  => raw(at).toFloat
            case (16, 1) => (rb.getShort(at) & 0xffff).toFloat
            case (16, 2) => rb.getShort(at).toFloat
            case (32, 1) => (rb.getInt(at).toLong & 0xffffffffL).toFloat
            case (32, 2) => rb.getInt(at).toFloat
            case (32, 3) => rb.getFloat(at)
            case (64, 3) => rb.getDouble(at).toFloat // engine model is float32
            case _ => sys.error("unreachable")
          }
          data((y0 + yy) * width + x0 + xx) = v
          xx += 1
        }
        yy += 1
      }
      }
    }

    // declared nodata → NaN, the engine-wide sentinel
    d.nodata.filter(nd => !nd.isNaN).foreach { nd =>
      val ndf = nd.toFloat
      var i = 0
      while (i < data.length) { if (data(i) == ndf) data(i) = Float.NaN; i += 1 }
    }

    // South-up normalization: negative py means origin at the south edge.
    if (d.py < 0) {
      val flipped = new Array[Float](width * height)
      for (y <- 0 until height; x <- 0 until width)
        flipped(y * width + x) = data((height - 1 - y) * width + x)
      Raster(width, height, flipped, d.west, d.north - d.py * height, d.px, -d.py)
    } else Raster(width, height, data, d.west, d.north, d.px, d.py)
  }
}
