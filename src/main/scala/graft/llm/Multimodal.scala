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

  /** Synthesize real media containers from documents: even image ids get
    * PNG, odd get JPEG; audio is PCM WAV with one sample frame per text
    * char; video is a PNG frame sequence. */
  def asMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val len = text.getBytes("UTF-8").length
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
