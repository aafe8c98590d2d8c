package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns for training-data pipelines: media payloads ride
  * as opaque `binary` columns with typed metadata beside them; decode /
  * feature-extraction runs partition-wise over the bytes (the Scala
  * analogue of `mapInPandas` batches).
  *
  * The codec itself is STUBBED (this container has no image/audio
  * libraries): `DecodeStub` derives header fields deterministically from
  * the payload bytes. The Spark-side plumbing is real — binary schema,
  * partition-wise iteration, typed output rows — so a real decoder drops
  * in by replacing one function.
  */
object Multimodal {

  case class Media(doc_id: Long, kind: String, payload: Array[Byte])
  case class MediaFeatures(doc_id: Long, kind: String, size_bytes: Long,
                           width: Int, height: Int, n_frames: Int,
                           mean_byte: Double)

  /** Wrap documents as fake media rows: payload = utf-8 bytes. */
  def asMedia(docs: DataFrame): Dataset[Media] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        encode(col("text"), "UTF-8").as("payload"))
      .as[Media]
  }

  /** STUB decoder — deterministic pseudo-header parse. A real
    * implementation would hand `payload` to an image/audio codec here;
    * everything around this function (schema, partitioning, batch
    * iteration) is production-shaped. */
  def decodeStub(m: Media): MediaFeatures = {
    val b = m.payload
    val h4 = b.take(4).map(_.toLong & 0xffL).sum
    val width = 64 + (h4 % 512).toInt
    val height = 64 + (b.length % 512)
    val frames = if (m.kind == "video") (b.length % 7) + 1 else 1
    val mean = if (b.isEmpty) 0.0 else b.map(_.toLong & 0xffL).sum.toDouble / b.length
    MediaFeatures(m.doc_id, m.kind, b.length.toLong, width, height, frames, mean)
  }

  /** Partition-wise decode + feature extraction. */
  def extractFeatures(media: Dataset[Media]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions(_.map(decodeStub))
  }
}
