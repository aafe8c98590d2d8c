package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads ride
  * as opaque `binary` columns with typed metadata beside them; decode /
  * feature-extraction runs partition-wise over the bytes (the Scala
  * analogue of `mapInPandas` batches).
  *
  * Header decoding is REAL byte-level parsing (MediaCodecs): PNG chunk
  * walk, JPEG SOF marker scan, WAV RIFF chunks, PNG-sequence frame
  * counting. The test corpus synthesizes genuine container bytes from
  * the documents table (deterministic dims), so the parse path is
  * exercised end-to-end; full photographic/audio CONTENT decode is out
  * of scope by design — see MediaCodecs' scaladoc.
  */
object Multimodal {

  case class Media(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, size_bytes: Long,
                           width: Int, height: Int, n_frames: Int)

  /** Deterministic dims so an oracle can recompute them: the payload is
    * BUILT with these and then PARSED back from raw bytes. */
  private def dims(docId: Long, textLen: Int): (Int, Int) =
    (16 + textLen % 64, 16 + (docId % 32).toInt)

  /** Slim (doc_id, text byte length) projection, SPREAD across the
    * cluster when the input arrives under-parallel. Synthesis and
    * decode are CPU-bound codec work; at bench scale the documents
    * table is a single parquet split, so without the spread every
    * payload would encode+decode inside ONE task while the other 31
    * cores idle. The shuffle moves 16-byte rows (never text or pixels)
    * and only fires when the scan has fewer partitions than cores —
    * production-scale inputs already arrive in many splits and skip it. */
  private def slimSpread(docs: DataFrame, spread: Boolean = true): Dataset[(Long, Int)] = {
    val spark = docs.sparkSession
    import spark.implicits._
    val slim = docs.select(col("doc_id"),
      octet_length(col("text")).cast("int").as("len"))
    val cores = spark.sparkContext.defaultParallelism
    // file count is a cheap upper-bound proxy for scan parallelism
    // (probing .rdd.getNumPartitions would pay full physical planning
    // twice per query); an explicit numPartitions keeps AQE from
    // coalescing the spread back into one partition. Header-parse-only
    // corpora pass spread = false: their per-row work is too cheap to
    // repay an exchange.
    val files = try docs.inputFiles.length catch { case _: Exception => 0 }
    val out = if (spread && files < cores) slim.repartition(cores) else slim
    out.as[(Long, Int)]
  }

  /** Synthesize real media containers from documents: even image ids get
    * PNG, odd get JPEG; audio is PCM WAV with one sample frame per text
    * char; video is a PNG frame sequence. */
  def asMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    slimSpread(docs, spread = false)
      .mapPartitions(_.map { case (id, len) =>
        val (w, h) = dims(id, len)
        val kind = (id % 3) match {
          case 0 => "image"
          case 1 => "audio"
          case _ => "video"
        }
        val payload = kind match {
          case "image" => if (id % 2 == 0) MediaCodecs.png(w, h)
                          else MediaCodecs.jpegHeader(w, h)
          case "audio" => MediaCodecs.wav(1 + (id % 2).toInt, 8000, len)
          case _       => MediaCodecs.pngFrames(w, h, 1 + (id % 5).toInt)
        }
        Media(id, kind, payload)
      })
  }

  /** Patterned-media corpus for the pixel-level operators: images
    * (every id ≡ 0 mod 3, even) are real 8-bit grayscale PNGs with
    * pixel = (x + 3y + id) mod 256; videos (id ≡ 2 mod 3) are PNG frame
    * sequences with pixel = (x + 3y + id + 7·frame) mod 256. The
    * pattern is arithmetic, so SQL oracles recompute decoded-pixel
    * statistics without a PNG decoder. */
  def asPatternedMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    slimSpread(docs)
      .mapPartitions(_.flatMap { case (id, len) =>
        val (w, h) = dims(id, len)
        if (id % 3 == 0 && id % 2 == 0)
          Some(Media(id, "image",
            MediaCodecs.pngPattern(w, h, (x, y) => ((x + 3 * y + id) % 256).toInt)))
        else if (id % 3 == 2)
          Some(Media(id, "video", MediaCodecs.pngFramesPattern(w, h,
            1 + (id % 5).toInt, fi => (x, y) => ((x + 3 * y + id + 7 * fi) % 256).toInt)))
        else None
      })
  }

  /** Nearest-neighbour image resize by an integer factor: decode the
    * PNG, keep every factor-th pixel (out(x,y) = in(x·f, y·f)), report
    * output dims + exact pixel sum. Pixels never leave the executor —
    * decode, sample and reduce are one partition-local pass (the
    * mapInPandas batch shape with a compiled codec per element). */
  def resizeNearest(media: Dataset[Media], factor: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val img = MediaCodecs.decodeFrames(m.payload).head
      val w2 = img.w / factor; val h2 = img.h / factor
      var sum = 0L
      var y = 0
      while (y < h2) {
        var x = 0
        while (x < w2) { sum += img.pixels(y * factor * img.w + x * factor); x += 1 }
        y += 1
      }
      (m.doc_id, w2, h2, sum)
    }).toDF("doc_id", "w_out", "h_out", "px_sum")
  }

  /** Perceptual average-hash (aHash): decode the PNG, cut it into an
    * 8×8 grid of blocks (remainder pixels ignored), block mean vs the
    * global mean of block means gives one bit per block — the standard
    * cheap image near-dup fingerprint (images differing by resize /
    * re-encode / brightness keep small hamming distance). All integer
    * floor arithmetic so the hash is engine-exact; emitted as two
    * 32-bit halves (bit b of the 64 = block row-major index b). One
    * partition-local pass; only (doc_id, 2×long) ever shuffles. */
  def imageAhash(media: Dataset[Media], grid: Int = 8): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "image").mapPartitions(_.map { m =>
      val img = MediaCodecs.decodeFrames(m.payload).head
      // images narrower/shorter than the grid have zero-pixel blocks
      // (bw or bh = 0 → division by zero); the hash is meaningless
      // below grid resolution, so reject loudly rather than emit junk
      require(img.w >= grid && img.h >= grid,
        s"imageAhash needs >= ${grid}x$grid pixels, got ${img.w}x${img.h} (doc ${m.doc_id})")
      val bw = img.w / grid; val bh = img.h / grid
      val means = Array.tabulate(grid * grid) { b =>
        val bx = b % grid; val by = b / grid
        var sum = 0L
        var y = by * bh
        while (y < (by + 1) * bh) {
          var x = bx * bw
          while (x < (bx + 1) * bw) { sum += img.pixels(y * img.w + x); x += 1 }
          y += 1
        }
        sum / (bw * bh)
      }
      val global = means.sum / (grid * grid)
      var hi = 0L; var lo = 0L
      var b = 0
      while (b < grid * grid) {
        if (means(b) >= global) {
          if (b < 32) lo |= 1L << b else hi |= 1L << (b - 32)
        }
        b += 1
      }
      (m.doc_id, hi, lo)
    }).toDF("doc_id", "h_hi", "h_lo")
  }

  /** Frame sampling: keep every `step`-th frame of a video payload,
    * reporting per-frame dims + exact pixel sum (the temporal analogue
    * of resize — the decimation a training pipeline runs before feature
    * extraction). */
  def sampleFrames(media: Dataset[Media], step: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "video").flatMap { m =>
      MediaCodecs.decodeFrames(m.payload).zipWithIndex
        .filter(_._2 % step == 0)
        .map { case (img, fi) => (m.doc_id, fi, img.w, img.h, img.pixels.sum) }
    }.toDF("doc_id", "frame_idx", "w", "h", "px_sum")
  }

  /** Patterned PCM audio fixtures: one WAV per audio document whose
    * samples follow a deterministic formula the oracle can recompute
    * (the audio analogue of asPatternedMedia). */
  def asPatternedAudio(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    slimSpread(docs, spread = false)
      .mapPartitions(_.flatMap { case (id, len) =>
        if (id % 3 == 1)
          Some(Media(id, "audio", MediaCodecs.wavPattern(8000, len,
            i => ((id * 31 + i * 7) % 4096).toInt - 2048)))
        else None
      })
  }

  /** Windowed audio energy: decode the PCM payload, cut it into
    * fixed-length sample windows, report the exact integer energy
    * Σ s² per window — the silence/clipping screen an audio-curation
    * pipeline runs before feature extraction. Decode, window and
    * reduce are one partition-local pass; only (doc, window) scalars
    * ever shuffle. */
  def audioEnergy(media: Dataset[Media], windowSamples: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.filter(_.kind == "audio").flatMap { m =>
      val s = MediaCodecs.wavSamples(m.payload)
      s.indices.groupBy(_ / windowSamples).toSeq.map { case (win, idx) =>
        (m.doc_id, win, idx.size,
          idx.map(i => s(i).toLong * s(i)).sum)
      }
    }.toDF("doc_id", "win", "n_samples", "energy")
  }

  /** Partition-wise header parse + feature extraction — the mapInPandas
    * batch shape with a compiled parser per element. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map { m =>
      val hd = MediaCodecs.parse(m.payload)
      // audio reports (sample_rate, channels) in the (width, height)
      // feature slots — one fixed-width feature row per media kind
      val (w, h) = if (hd.format == "wav") (hd.sampleRate, hd.channels)
                   else (hd.width, hd.height)
      MediaFeatures(m.doc_id, m.kind, m.payload.length.toLong, w, h, hd.nFrames)
    })
  }
}
