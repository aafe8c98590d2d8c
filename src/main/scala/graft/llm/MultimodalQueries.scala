package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified multimodal query: real container bytes (PNG/JPEG/WAV/PNG-seq)
  * synthesized from `documents` with deterministic dims, then parsed BACK
  * from raw bytes by MediaCodecs. The DuckDB oracle recomputes the dims
  * formulas from the same table — a mismatch anywhere in the write→parse
  * chain (CRC layout, chunk walk, marker scan, RIFF offsets) breaks the
  * hash compare. Documents are ASCII, so strlen == utf-8 byte length. */
object MultimodalQueries extends QueryModule {

  override def queries = Map(
    "m_media_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables.documents(s, dir))
      Multimodal.extractFeatures(media).toDF()
        .select("doc_id", "kind", "width", "height", "n_frames")
    })
  )

  override def oracleSql = Map(
    "m_media_features" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 8000
        |       ELSE 16 + strlen(text) % 64 END AS INT) AS width,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN 1 + doc_id % 2
        |       ELSE 16 + doc_id % 32 END AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 1 THEN strlen(text)
        |       WHEN doc_id % 3 = 2 THEN 1 + doc_id % 5
        |       ELSE 1 END AS INT) AS n_frames
        |FROM documents""".stripMargin
  )
}
