package graft.llm

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.functions._

/** Training-data curation operators beyond the dedup/similarity core:
  * exact n-gram decontamination, multi-rule quality gating (the Gopher
  * rules shape), and vocabulary-coverage filtering. All arithmetic is
  * integer counts + single IEEE divisions, so results hash-match the
  * DuckDB oracles bit-for-bit. */
object CurationQueries extends QueryModule {

  /** Deterministic benchmark gate (same md5 gate as t_dataset_split):
    * ~10% of documents form the held-out benchmark set. */
  private def gateSpark(c: String) =
    s"CAST(conv(substring(md5(CAST($c AS STRING)), 1, 8), 16, 10) AS BIGINT) % 100"
  private def gateDuck(c: String) =
    s"CAST(concat('0x', substring(md5(CAST($c AS VARCHAR)), 1, 8)) AS BIGINT) % 100"

  /** Reference vocabulary for coverage filtering (a fixed, versioned
    * artifact in a real pipeline — here an inline broadcast list). */
  private val vocab = Seq("table", "value", "query", "scan", "fast", "row",
    "key", "join", "sort", "filter", "data", "column", "group", "order",
    "the", "a")

  override def queries = Map(
    // Exact n-gram-collision decontamination (the published long-n-gram
    // overlap method, complementary to d_decontaminate's LSH sweep): a
    // training document sharing ANY 8-gram with a held-out benchmark
    // document is contaminated. The 8-gram inverted index makes this an
    // equi-join — at 100 TB the index is the shuffle and no pair ever
    // forms except through a shared 8-gram.
    "d_decontaminate_ngram" -> ((s, dir) => {
      val sh8 = Dedup.shingles(Tables.documents(s, dir), "doc_id", "text", n = 8)
        .withColumn("g", expr(gateSpark("id")))
      val bench = sh8.filter(col("g") >= 90).select(col("id").as("bench_doc"), col("s"))
      val train = sh8.filter(col("g") < 90).select(col("id").as("train_doc"), col("s"))
      bench.join(train, "s")
        .groupBy("bench_doc", "train_doc")
        .agg(count(lit(1)).as("n_collisions"))
    }),

    // Multi-rule quality gate (the Gopher-rules shape): word count,
    // mean word length, type-token ratio, and the top-bigram repetition
    // fraction, each an integer-count signal; the pass flag ANDs the
    // configured windows. One pass over exploded words + one over
    // non-distinct bigrams, both map-side-partial aggregations.
    "t_gopher_quality" -> ((s, dir) => {
      val ws = split(trim(lower(col("text"))), "\\s+")
      val docs = Tables.documents(s, dir).select(col("doc_id"), ws.as("ws"))
      val w = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      val wa = w.groupBy("doc_id").agg(
        count(lit(1)).as("n_words"),
        countDistinct(col("w")).as("n_distinct"),
        sum(length(col("w"))).as("sum_len"))
      val bg = docs.select(col("doc_id"), explode(
          when(size(col("ws")) >= 2,
            transform(sequence(lit(0), size(col("ws")) - 2),
              i => concat_ws(" ", element_at(col("ws"), i + 1), element_at(col("ws"), i + 2))))
            .otherwise(array().cast("array<string>"))).as("s"))
      val bga = bg.groupBy("doc_id", "s").agg(count(lit(1)).as("c"))
        .groupBy("doc_id").agg(max(col("c")).as("maxc"), sum(col("c")).as("sumc"))
      val ttr = col("n_distinct").cast("double") / col("n_words")
      val mwl = col("sum_len").cast("double") / col("n_words")
      val rep = col("maxc").cast("double") / col("sumc")
      wa.join(bga, Seq("doc_id"), "left").select(
        col("doc_id"), col("n_words"),
        mwl.as("mean_word_len"), ttr.as("ttr"),
        coalesce(rep, lit(0.0)).as("top_bigram_frac"),
        (col("n_words") >= 30 && ttr >= 0.35 &&
          coalesce(rep, lit(0.0)) <= 0.1 &&
          mwl >= 3.8 && mwl <= 5.2).cast("int").as("pass"))
    }),

    // Domain-mixture table: per-(source, lang) token mass, corpus share,
    // and the up/down-sampling factor that re-mixes the corpus to a
    // uniform per-domain token budget — the "how much of each domain
    // goes in the run" planning step. Two hash aggregations; the
    // corpus-total side is one broadcast row.
    "t_domain_mix" -> ((s, dir) => {
      val tok = Tables.documents(s, dir).select(
        col("source"), col("lang"),
        TextAnalysis.tokenCountWs(col("text")).cast("long").as("n"))
      val g = tok.groupBy("source", "lang")
        .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("n_tokens"))
      val tot = g.agg(sum(col("n_tokens")).as("total_tokens"),
        count(lit(1)).as("n_domains"))
      g.crossJoin(broadcast(tot)).select(
        col("source"), col("lang"), col("n_docs"), col("n_tokens"),
        (col("n_tokens").cast("double") / col("total_tokens")).as("share"),
        (col("total_tokens").cast("double") / (col("n_domains") * col("n_tokens")))
          .as("uniform_weight"))
    }),

    // Vocabulary coverage / OOV-rate filter: fraction of tokens outside
    // a fixed reference vocabulary (tokenizer coverage screening). The
    // vocabulary is a broadcast-scale literal; the scan is one map-side
    // aggregation over exploded tokens.
    "t_vocab_coverage" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"),
          explode(split(trim(lower(col("text"))), "\\s+")).as("w"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"),
          sum(when(col("w").isin(vocab: _*), 0L).otherwise(1L)).as("n_oov"))
        .select(col("doc_id"), col("n_words"), col("n_oov"),
          (col("n_oov").cast("double") / col("n_words")).as("oov_rate"),
          (col("n_oov").cast("double") / col("n_words") <= 0.5).cast("int").as("keep"))
    })
  )

  private val wordsCte =
    """words AS (
      |  SELECT doc_id AS id, string_split_regex(trim(lower(text)), '\s+') AS ws
      |  FROM documents)""".stripMargin

  override def oracleSql = Map(
    "d_decontaminate_ngram" -> {
      val joins = (1 to 8).map(j => s"ws[i+$j]").mkString(" || ' ' || ")
      s"""WITH $wordsCte,
         |sh AS (
         |  SELECT DISTINCT id, $joins AS s
         |  FROM words CROSS JOIN range(400) t(i) WHERE i < len(ws) - 7),
         |g AS (SELECT DISTINCT id, ${gateDuck("id")} AS gg FROM sh)
         |SELECT a.id AS bench_doc, b.id AS train_doc, count(*) AS n_collisions
         |FROM sh a JOIN sh b ON a.s = b.s
         |JOIN g ga ON ga.id = a.id JOIN g gb ON gb.id = b.id
         |WHERE ga.gg >= 90 AND gb.gg < 90
         |GROUP BY 1, 2""".stripMargin
    },
    "t_gopher_quality" ->
      s"""WITH $wordsCte,
         |w AS (SELECT id, unnest(ws) AS w FROM words),
         |wa AS (
         |  SELECT id, count(*) AS n_words, count(DISTINCT w) AS n_distinct,
         |         sum(length(w)) AS sum_len
         |  FROM w GROUP BY 1),
         |bg AS (
         |  SELECT id, ws[i+1] || ' ' || ws[i+2] AS s
         |  FROM words CROSS JOIN range(400) t(i) WHERE i < len(ws) - 1),
         |bgc AS (SELECT id, s, count(*) AS c FROM bg GROUP BY 1, 2),
         |bga AS (SELECT id, max(c) AS maxc, sum(c) AS sumc FROM bgc GROUP BY 1)
         |SELECT wa.id AS doc_id, n_words,
         |  CAST(sum_len AS DOUBLE) / n_words AS mean_word_len,
         |  CAST(n_distinct AS DOUBLE) / n_words AS ttr,
         |  coalesce(CAST(maxc AS DOUBLE) / sumc, 0.0) AS top_bigram_frac,
         |  CAST(n_words >= 30 AND CAST(n_distinct AS DOUBLE) / n_words >= 0.35
         |    AND coalesce(CAST(maxc AS DOUBLE) / sumc, 0.0) <= 0.1
         |    AND CAST(sum_len AS DOUBLE) / n_words >= 3.8
         |    AND CAST(sum_len AS DOUBLE) / n_words <= 5.2 AS INT) AS pass
         |FROM wa LEFT JOIN bga ON wa.id = bga.id""".stripMargin,
    "t_domain_mix" ->
      """WITH tok AS (
        |  SELECT source, lang,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n
        |  FROM documents),
        |g AS (
        |  SELECT source, lang, count(*) AS n_docs, sum(n) AS n_tokens
        |  FROM tok GROUP BY 1, 2),
        |tot AS (SELECT sum(n_tokens) AS total_tokens, count(*) AS n_domains FROM g)
        |SELECT source, lang, n_docs, CAST(n_tokens AS BIGINT) AS n_tokens,
        |  CAST(n_tokens AS DOUBLE) / total_tokens AS share,
        |  CAST(total_tokens AS DOUBLE) / (n_domains * n_tokens) AS uniform_weight
        |FROM g CROSS JOIN tot""".stripMargin,
    "t_vocab_coverage" -> {
      val inList = vocab.map(v => s"'$v'").mkString(", ")
      s"""WITH $wordsCte,
         |w AS (SELECT id, unnest(ws) AS w FROM words)
         |SELECT id AS doc_id, count(*) AS n_words,
         |  CAST(sum(CASE WHEN w IN ($inList) THEN 0 ELSE 1 END) AS BIGINT) AS n_oov,
         |  CAST(sum(CASE WHEN w IN ($inList) THEN 0 ELSE 1 END) AS DOUBLE) / count(*) AS oov_rate,
         |  CAST(CAST(sum(CASE WHEN w IN ($inList) THEN 0 ELSE 1 END) AS DOUBLE) / count(*) <= 0.5 AS INT) AS keep
         |FROM w GROUP BY 1""".stripMargin
    }
  )
}
