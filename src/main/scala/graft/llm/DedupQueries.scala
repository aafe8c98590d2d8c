package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Verified near-dup queries over `documents`. The DuckDB oracles rebuild
  * the identical md5-deterministic pipelines in SQL. */
object DedupQueries extends QueryModule {

  /** Shared oracle CTEs: words → distinct 3-gram shingles → set sizes. */
  private val shinglesCte =
    """words AS (
      |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS ws FROM documents),
      |sh AS (
      |  SELECT DISTINCT id, ws[i+1] || ' ' || ws[i+2] || ' ' || ws[i+3] AS s
      |  FROM words CROSS JOIN range(400) t(i) WHERE i < len(ws) - 2),
      |sizes AS (SELECT id, count(*) AS c FROM sh GROUP BY 1)""".stripMargin

  override def queries = Map(
    // MinHash (k=8) → LSH (4 bands × 2 rows) → exact-Jaccard verify.
    "d_minhash_lsh" -> ((s, dir) => {
      val sh = Dedup.shingles(Tables.documents(s, dir), "doc_id", "text")
      val sig = Dedup.minhashSignature(sh, 8)
      val cands = Dedup.candidatePairs(Dedup.lshBands(sig, 8, 2))
      Dedup.pairJaccard(cands, sh).filter(col("jacc") >= 0.5)
    }),

    // Exact all-pairs n-gram Jaccard via the shingle inverted index
    // (pairs that share ≥1 shingle), thresholded.
    "d_ngram_jaccard" -> ((s, dir) => {
      val sh = Dedup.shingles(Tables.documents(s, dir), "doc_id", "text")
      val a = sh.select(col("id").as("doc_a"), col("s"))
      val b = sh.select(col("id").as("doc_b"), col("s"))
      val pairs = a.join(b, Seq("s")).filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      Dedup.pairJaccard(pairs, sh).filter(col("jacc") >= 0.3)
    }),

    // SimHash-32 near-dups: hamming distance ≤ 6 pairs.
    "d_simhash" -> ((s, dir) => {
      val sim = Dedup.simhash32(Tables.documents(s, dir), "doc_id", "text")
      val a = sim.select(col("id").as("doc_a"), col("simhash").as("ha"))
      val b = sim.select(col("id").as("doc_b"), col("simhash").as("hb"))
      a.crossJoin(b).filter(col("doc_a") < col("doc_b"))
        .withColumn("hamming", expr("bit_count(ha ^ hb)"))
        .filter(col("hamming") <= 6)
        .select("doc_a", "doc_b", "hamming")
    })
  )

  override def oracleSql = Map(
    "d_minhash_lsh" ->
      s"""WITH $shinglesCte,
         |salted AS (
         |  SELECT id, j, md5(CAST(j AS VARCHAR) || '|' || s) AS h
         |  FROM sh CROSS JOIN range(1, 9) jj(j)),
         |sig AS (
         |  SELECT id,
         |    min(CASE WHEN j=1 THEN h END) AS m1, min(CASE WHEN j=2 THEN h END) AS m2,
         |    min(CASE WHEN j=3 THEN h END) AS m3, min(CASE WHEN j=4 THEN h END) AS m4,
         |    min(CASE WHEN j=5 THEN h END) AS m5, min(CASE WHEN j=6 THEN h END) AS m6,
         |    min(CASE WHEN j=7 THEN h END) AS m7, min(CASE WHEN j=8 THEN h END) AS m8
         |  FROM salted GROUP BY id),
         |bands AS (
         |  SELECT id, 1 AS band, md5(m1 || m2) AS key FROM sig UNION ALL
         |  SELECT id, 2, md5(m3 || m4) FROM sig UNION ALL
         |  SELECT id, 3, md5(m5 || m6) FROM sig UNION ALL
         |  SELECT id, 4, md5(m7 || m8) FROM sig),
         |cands AS (
         |  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
         |  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key AND a.id < b.id),
         |inter AS (
         |  SELECT doc_a, doc_b, count(*) AS i
         |  FROM cands
         |  JOIN sh sa ON sa.id = doc_a
         |  JOIN sh sb ON sb.id = doc_b AND sb.s = sa.s
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jacc
         |FROM inter JOIN sizes ca ON ca.id = doc_a JOIN sizes cb ON cb.id = doc_b
         |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.5""".stripMargin,
    "d_ngram_jaccard" ->
      s"""WITH $shinglesCte,
         |pairs AS (
         |  SELECT DISTINCT a.id AS doc_a, b.id AS doc_b
         |  FROM sh a JOIN sh b ON a.s = b.s AND a.id < b.id),
         |inter AS (
         |  SELECT doc_a, doc_b, count(*) AS i
         |  FROM pairs
         |  JOIN sh sa ON sa.id = doc_a
         |  JOIN sh sb ON sb.id = doc_b AND sb.s = sa.s
         |  GROUP BY 1, 2)
         |SELECT doc_a, doc_b, CAST(i AS DOUBLE) / (ca.c + cb.c - i) AS jacc
         |FROM inter JOIN sizes ca ON ca.id = doc_a JOIN sizes cb ON cb.id = doc_b
         |WHERE CAST(i AS DOUBLE) / (ca.c + cb.c - i) >= 0.3""".stripMargin,
    "d_simhash" ->
      """WITH wd AS (
        |  SELECT DISTINCT doc_id AS id, w
        |  FROM (SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS w
        |        FROM documents) t),
        |nibs AS (
        |  SELECT id, k, strpos('0123456789abcdef', substring(md5(w), CAST(k+1 AS INT), 1)) - 1 AS nv
        |  FROM wd CROSS JOIN range(8) kk(k)),
        |bits AS (
        |  SELECT id, k, j, sum(CASE WHEN (nv >> j) & 1 = 1 THEN 1 ELSE -1 END) AS sgn
        |  FROM nibs CROSS JOIN range(4) jj(j)
        |  GROUP BY 1, 2, 3),
        |sim AS (
        |  SELECT id, sum(CASE WHEN sgn >= 0 THEN 1::BIGINT ELSE 0::BIGINT END << (k*4+j)) AS simhash
        |  FROM bits GROUP BY id)
        |SELECT a.id AS doc_a, b.id AS doc_b,
        |       CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
        |FROM sim a JOIN sim b ON a.id < b.id
        |WHERE bit_count(xor(a.simhash, b.simhash)) <= 6""".stripMargin
  )
}
