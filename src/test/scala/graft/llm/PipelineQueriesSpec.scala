package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics of the pipeline-shaping operators: repetition signals,
  * sequence packing, SCD-2 interval builds. */
class PipelineQueriesSpec extends SparkSpec {
  import spark.implicits._

  test("t_repetition: fully repeated doc scores 1-1/n; all-distinct doc scores 0") {
    val r = PipelineQueries.queries("t_repetition")(spark, sf0001)
      .collect().map(x => x.getLong(0) -> x).toMap
    // every sf doc exists; sanity on bounds
    assert(r.values.forall { x =>
      val d = x.getDouble(2); val t = x.getDouble(3)
      d >= 0.0 && d < 1.0 && t >= 0.0 && t <= 1.0
    })
    // synthetic micro-check against hand computation
    val df = Seq((1L, "a a a a"), (2L, "w x y z")).toDF("doc_id", "text")
      .withColumn("lang", lit("en")).withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))
    val tmp = java.nio.file.Files.createTempDirectory("rep-").toString
    df.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val m = PipelineQueries.queries("t_repetition")(spark, tmp)
      .collect().map(x => x.getLong(0) -> (x.getDouble(2), x.getDouble(3))).toMap
    assert(m(1L) == (0.75, 1.0)) // 4 words 1 distinct; bigram "a a" ×3 of 3
    assert(m(2L) == (0.0, 1.0 / 3.0)) // all distinct; each bigram once of 3
  }

  test("t_pack_sequences: bins are contiguous in doc_id order and bounded") {
    val out = PipelineQueries.queries("t_pack_sequences")(spark, sf0001)
      .orderBy("source", "bin").collect()
    assert(out.nonEmpty)
    // within a source, bin k+1's first_doc follows bin k's last_doc
    out.groupBy(_.getString(0)).foreach { case (_, rows) =>
      rows.sliding(2).foreach {
        case Array(a, b) => assert(a.getLong(5) < b.getLong(4))
        case _ =>
      }
      // every bin except possibly the last holds > 2048 - max_doc_tokens;
      // weaker invariant that holds regardless: n_tokens of any closed
      // bin ≥ 2048 - (largest single doc) is data-dependent, so assert
      // the structural one: bins are dense 0..n-1
      val bins = rows.map(_.getLong(1)).sorted
      assert(bins.zipWithIndex.forall { case (b, i) => b == i })
    }
  }

  test("t_tfidf_topk: rare terms outrank common ones; ranks dense 1..3") {
    val out = PipelineQueries.queries("t_tfidf_topk")(spark, sf0001).collect()
    val byDoc = out.groupBy(_.getLong(0))
    byDoc.foreach { case (_, rows) =>
      assert(rows.map(_.getInt(3)).sorted.sameElements(1 to rows.length))
      assert(rows.length <= 3)
      // scores non-increasing with rank
      val sorted = rows.sortBy(_.getInt(3))
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a.getDouble(2) >= b.getDouble(2))
        case _ =>
      }
    }
  }

  test("a20_cube: margins are consistent — grand total = sum of type margins") {
    val out = PipelineQueries.queries("a20_cube")(spark, sf0001).collect()
    val grand = out.filter(r => r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
    val typeMargins = out.filter(r => !r.isNullAt(0) && r.isNullAt(1)).map(_.getLong(2)).sum
    val cells = out.filter(r => !r.isNullAt(0) && !r.isNullAt(1)).map(_.getLong(2)).sum
    assert(grand == typeMargins && typeMargins == cells && grand > 0)
  }

  test("d_containment: containment >= jacc always; self-contained docs found") {
    val out = graft.llm.DedupQueries.queries("d_containment")(spark, sf0001).collect()
    out.foreach { r =>
      assert(r.getDouble(2) >= r.getDouble(3) - 1e-12) // containment >= jaccard
      assert(r.getDouble(2) <= 1.0 + 1e-12)
    }
  }

  test("pagerankInt: star graph — hub outranks leaves, exact hand-computed values") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
    val pr = Dedup.pagerankInt(pairs, 3).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // round-by-round: hub sends floor(p/3), leaves send p; damping 17/20
    assert(pr(1L) == 2483250L, s"hub: ${pr(1L)}")
    assert(pr(2L) == 505583L && pr(3L) == 505583L && pr(4L) == 505583L)
    assert(pr(1L) > pr(2L))
  }

  test("sorted-run folds match their explode/groupBy definitions") {
    import org.apache.spark.sql.functions._
    // distinctCount ≡ size(array_distinct); maxRunCount ≡ max per-key
    // count — checked per row against exploded aggregates on arrays
    // covering empties, singletons, all-equal, and mixed multiplicity
    val rows = Seq(
      Seq.empty[String], Seq("a"), Seq("a", "a", "a"),
      Seq("a", "b", "a", "c", "a", "b"), Seq("", "", "x"),
      (1 to 300).map(i => s"w${i % 37}"))
    val df = rows.zipWithIndex
      .map { case (a, i) => (i.toLong, a) }.toDF("id", "arr")
    val got = df.select(col("id"),
        TextAnalysis.distinctCount(col("arr")).as("d"),
        TextAnalysis.maxRunCount(col("arr")).as("m"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    rows.zipWithIndex.foreach { case (a, i) =>
      val expD = a.distinct.size.toLong
      val expM = if (a.isEmpty) 0L
        else a.groupBy(identity).values.map(_.size).max.toLong
      assert(got(i.toLong) == ((expD, expM)), s"row $i: $a")
    }
  }

  test("t_shard_assign: 16 shards partition the corpus with bounded token spread") {
    val out = PipelineQueries.queries("t_shard_assign")(spark, sf0001).collect()
    assert(out.length == 16)
    val nDocs = out.map(_.getLong(1)).sum
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(nDocs == total) // a partition: every doc lands in exactly one shard
    // round-robin-by-size-rank bounds the spread: any two shards differ
    // by at most one document per "deal round", so the token-mass gap is
    // bounded by the largest document
    val masses = out.map(_.getLong(2))
    val maxDoc = out.map(_.getLong(4)).max
    assert(masses.max - masses.min <= maxDoc,
      s"spread ${masses.max - masses.min} exceeds max doc $maxDoc")
  }

  test("t_quality_lr: margin is the exact sparse dot product plus bias") {
    val out = PipelineQueries.queries("t_quality_lr")(spark, sf0001).collect()
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(out.length == total) // left join keeps vocab-free docs
    // recompute one doc's margin by hand from the raw text
    val wts = QualityLrModel.weights.toMap
    val raw = graft.Tables.documents(spark, sf0001)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    out.take(20).foreach { r =>
      val words = raw(r.getLong(0)).trim.toLowerCase.split("\\s+")
      val dot = words.map(w => wts.getOrElse(w, 0L)).sum
      val expect = (dot + QualityLrModel.biasCents).toDouble / 100.0
      assert(r.getDouble(1) == expect, s"doc ${r.getLong(0)}")
      assert(r.getBoolean(2) == (dot + QualityLrModel.biasCents > 0))
    }
  }

  test("w8_scd2: intervals chain per user, one current row per user") {
    val out = PipelineQueries.queries("w8_scd2")(spark, sf0001)
      .orderBy("user_id", "valid_from").collect()
    val byUser = out.groupBy(_.getLong(0))
    byUser.foreach { case (_, rows) =>
      assert(rows.count(_.getBoolean(4)) == 1) // exactly one open interval
      assert(rows.last.isNullAt(3))
      rows.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getTimestamp(3) == b.getTimestamp(2)) // no gaps/overlap
          assert(a.getString(1) != b.getString(1)) // consecutive states differ
        case _ =>
      }
    }
  }
}
