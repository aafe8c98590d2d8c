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
    }),

    // Pixel-level resize: REAL PNG decode (inflate + de-filter) →
    // nearest-neighbour 2× decimation → exact pixel sum, all in one
    // partition-local pass. The oracle recomputes the decoded pattern
    // arithmetically — any defect in the codec or the sampling indexing
    // breaks the hash.
    "m_media_resize" -> ((s, dir) =>
      Multimodal.resizeNearest(
        Multimodal.asPatternedMedia(Tables.documents(s, dir)), 2)),

    // Temporal decimation: walk the PNG frame sequence, keep every 2nd
    // frame, report per-frame dims + exact pixel sum.
    "m_frame_sample" -> ((s, dir) =>
      Multimodal.sampleFrames(
        Multimodal.asPatternedMedia(Tables.documents(s, dir)), 2)),

    // Perceptual average-hash over REAL decoded PNG pixels — the image
    // near-dup fingerprint (the multimodal analogue of d_simhash).
    "m_image_ahash" -> ((s, dir) =>
      Multimodal.imageAhash(
        Multimodal.asPatternedMedia(Tables.documents(s, dir)), 8)),

    // Windowed PCM energy: REAL WAV synth (patterned 16-bit samples) →
    // RIFF chunk walk → 100-sample windows → exact Σs² — the
    // silence/clipping screen of an audio-curation pipeline.
    "m_audio_energy" -> ((s, dir) =>
      Multimodal.audioEnergy(
        Multimodal.asPatternedAudio(Tables.documents(s, dir)), 100))
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
        |FROM documents""".stripMargin,
    "m_media_resize" ->
      """WITH base AS (
        |  SELECT doc_id, 16 + strlen(text) % 64 AS w, 16 + doc_id % 32 AS h
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
        |d AS (SELECT doc_id, CAST(w // 2 AS INT) AS w_out, CAST(h // 2 AS INT) AS h_out FROM base)
        |SELECT d.doc_id AS doc_id, w_out, h_out,
        |  CAST(sum((2 * xs.r + 6 * ys.r + d.doc_id) % 256) AS BIGINT) AS px_sum
        |FROM d CROSS JOIN range(40) xs(r) CROSS JOIN range(24) ys(r)
        |WHERE xs.r < w_out AND ys.r < h_out
        |GROUP BY 1, 2, 3""".stripMargin,
    "m_image_ahash" ->
      """WITH base AS (
        |  SELECT doc_id, 16 + strlen(text) % 64 AS w, 16 + doc_id % 32 AS h
        |  FROM documents WHERE doc_id % 3 = 0 AND doc_id % 2 = 0),
        |d AS (SELECT doc_id, w, h, w // 8 AS bw, h // 8 AS bh FROM base),
        |px AS (
        |  SELECT doc_id, CAST(xs.r // bw AS INT) AS bx, CAST(ys.r // bh AS INT) AS by,
        |    (xs.r + 3 * ys.r + doc_id) % 256 AS p
        |  FROM d CROSS JOIN range(80) xs(r) CROSS JOIN range(48) ys(r)
        |  WHERE xs.r < bw * 8 AND ys.r < bh * 8),
        |bm AS (SELECT doc_id, by * 8 + bx AS b, CAST(sum(p) // count(*) AS BIGINT) AS mean
        |       FROM px GROUP BY 1, 2),
        |gm AS (SELECT doc_id, CAST(sum(mean) // 64 AS BIGINT) AS g FROM bm GROUP BY 1),
        |bits AS (SELECT bm.doc_id AS doc_id, b, CASE WHEN mean >= g THEN 1 ELSE 0 END AS bit
        |         FROM bm JOIN gm ON bm.doc_id = gm.doc_id)
        |SELECT doc_id,
        |  CAST(sum(CASE WHEN b >= 32 AND bit = 1 THEN 1::BIGINT << CAST(b - 32 AS INT) ELSE 0 END) AS BIGINT) AS h_hi,
        |  CAST(sum(CASE WHEN b < 32 AND bit = 1 THEN 1::BIGINT << CAST(b AS INT) ELSE 0 END) AS BIGINT) AS h_lo
        |FROM bits GROUP BY 1""".stripMargin,
    "m_audio_energy" ->
      """WITH base AS (
        |  SELECT doc_id, strlen(text) AS n FROM documents WHERE doc_id % 3 = 1),
        |s AS (
        |  SELECT doc_id, CAST(i // 100 AS INT) AS win,
        |    (doc_id * 31 + i * 7) % 4096 - 2048 AS v
        |  FROM (SELECT doc_id, unnest(range(n)) AS i FROM base))
        |SELECT doc_id, win, CAST(count(*) AS INT) AS n_samples,
        |  CAST(sum(v * v) AS BIGINT) AS energy
        |FROM s GROUP BY 1, 2""".stripMargin,
    "m_frame_sample" ->
      """WITH base AS (
        |  SELECT doc_id, 16 + strlen(text) % 64 AS w, 16 + doc_id % 32 AS h,
        |    1 + doc_id % 5 AS n
        |  FROM documents WHERE doc_id % 3 = 2),
        |fr AS (
        |  SELECT doc_id, w, h, CAST(fs.r * 2 AS INT) AS frame_idx
        |  FROM base CROSS JOIN range(3) fs(r) WHERE fs.r * 2 < n)
        |SELECT doc_id, frame_idx, CAST(w AS INT) AS w, CAST(h AS INT) AS h,
        |  CAST(sum((xs.r + 3 * ys.r + doc_id + 7 * frame_idx) % 256) AS BIGINT) AS px_sum
        |FROM fr CROSS JOIN range(80) xs(r) CROSS JOIN range(48) ys(r)
        |WHERE xs.r < w AND ys.r < h
        |GROUP BY 1, 2, 3, 4""".stripMargin
  )
}
