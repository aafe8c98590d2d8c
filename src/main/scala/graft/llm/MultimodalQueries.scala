package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified multimodal query: binary payload + stub decode features.
  * The DuckDB oracle reproduces the stub header math from the same utf-8
  * bytes (documents are ASCII, so ascii() == byte value). */
object MultimodalQueries extends QueryModule {

  override def queries = Map(
    "m_media_features" -> ((s, dir) => {
      val media = Multimodal.asMedia(Tables.documents(s, dir))
      Multimodal.extractFeatures(media).toDF()
        .select("doc_id", "kind", "size_bytes", "width", "height", "n_frames")
    })
  )

  override def oracleSql = Map(
    "m_media_features" ->
      """SELECT doc_id,
        |  CASE WHEN doc_id % 3 = 0 THEN 'image'
        |       WHEN doc_id % 3 = 1 THEN 'audio' ELSE 'video' END AS kind,
        |  CAST(strlen(text) AS BIGINT) AS size_bytes,
        |  CAST(64 + (ascii(substring(text,1,1)) + ascii(substring(text,2,1))
        |       + ascii(substring(text,3,1)) + ascii(substring(text,4,1))) % 512 AS INT) AS width,
        |  CAST(64 + strlen(text) % 512 AS INT) AS height,
        |  CAST(CASE WHEN doc_id % 3 = 2 THEN strlen(text) % 7 + 1 ELSE 1 END AS INT) AS n_frames
        |FROM documents""".stripMargin
  )
}
