package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The incremental curation pipeline computes EXACTLY the batch
  * answer: greedy arrival-order semantics make keeps final on emit, so
  * running the same corpus through any id-ordered batch split — via
  * processBatch directly or through the persisted-state streaming
  * runner — must yield the batch run's kept set, and a replayed batch
  * must perturb nothing (X2 idempotence). */
class StreamCurationSpec extends SparkSpec {

  private lazy val docs = Tables.documents(spark, sf0001)
    .select("doc_id", "source", "text").cache()

  private def keptSet(df: DataFrame): Set[(Long, String, Long)] =
    df.collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet

  private lazy val batchKept = keptSet(StreamCuration.endstateBatch(docs))

  private def accumulate(st: StreamCuration.State,
                         d: StreamCuration.State): StreamCuration.State =
    StreamCuration.State(
      fps = st.fps.unionByName(d.fps).distinct(),
      spans = st.spans.unionByName(d.spans).distinct(),
      bands = st.bands.unionByName(d.bands).distinct(),
      docs = st.docs.unionByName(d.docs).distinct(),
      wm = st.wm.unionByName(d.wm).distinct())

  test("three id-ordered batches reproduce the single-batch kept set") {
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val (c1, c2) = (ids(ids.length / 3), ids(2 * ids.length / 3))
    val waves = Seq(
      docs.filter(col("doc_id") < c1),
      docs.filter(col("doc_id") >= c1 && col("doc_id") < c2),
      docs.filter(col("doc_id") >= c2))
    var st = StreamCuration.emptyState(spark)
    var kept = Set.empty[(Long, String, Long)]
    for (w <- waves) {
      val (k, delta) = StreamCuration.processBatch(w, st)
      kept ++= keptSet(k)
      st = accumulate(st, delta)
    }
    assert(kept == batchKept,
      s"incremental diverged: only-incremental=${kept -- batchKept} only-batch=${batchKept -- kept}")
    assert(batchKept.nonEmpty && batchKept.size < docs.count(),
      "pipeline should keep most docs and drop some")
  }

  test("equivalence holds for varied splits: uneven, empty batches, hash-seeded cuts") {
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val n = ids.length
    // deterministic "random" cut points from a hash chain, plus
    // adversarial shapes: everything-in-one-batch-plus-empties, and a
    // tiny first batch (state nearly empty for a big second batch)
    val rnd = new scala.util.Random(0x5eed)
    val splits: Seq[Seq[(Long, Long)]] = Seq(
      Seq((Long.MinValue, Long.MaxValue)), // single batch through the incremental path
      Seq((Long.MinValue, ids(2)), (ids(2), Long.MaxValue)), // 2 docs, then the rest
      Seq((Long.MinValue, ids(0)), (ids(0), Long.MaxValue), (Long.MaxValue, Long.MaxValue)), // empty first AND last batch
      {
        val cuts = Seq.fill(3)(ids(rnd.nextInt(n))).distinct.sorted
        val bounds = Long.MinValue +: cuts :+ Long.MaxValue
        bounds.zip(bounds.tail)
      })
    for (split <- splits) {
      var st = StreamCuration.emptyState(spark)
      var kept = Set.empty[(Long, String, Long)]
      for ((lo, hi) <- split) {
        val (k, delta) = StreamCuration.processBatch(
          docs.filter(col("doc_id") >= lo && col("doc_id") < hi), st)
        kept ++= keptSet(k)
        st = accumulate(st, delta)
      }
      assert(kept == batchKept, s"split $split diverged from the batch kept set")
    }
  }

  test("template flood across batches: cap applies to the combined band index, kept set stays sane") {
    // 120 exact copies of one template arriving across two batches —
    // enough to cross a cap of the batch size, so the cross-batch band
    // join would blow up without the combined-index cap. Exact dedup
    // (stage 1) removes the copies regardless; the test pins that the
    // pipeline completes, keeps exactly one template doc, and that the
    // combined cap is what the fuzzy stage saw.
    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    val flood = spark.range(120).select(
      col("id").as("doc_id"), lit("tpl").as("source"),
      expr(s"""concat_ws(' ', transform(sequence(0, 39), i ->
           | element_at($vocabExpr, pmod(hash(555000 + i), 64) + 1)))""".stripMargin).as("text"))
    val normal = spark.range(120, 200).select(
      col("id").as("doc_id"), lit("web").as("source"),
      expr(s"""concat_ws(' ', transform(sequence(0, 39), i ->
           | element_at($vocabExpr, pmod(hash(id * 100 + i), 64) + 1)))""".stripMargin).as("text"))
    val all = flood.unionByName(normal)
    val expected = keptSet(StreamCuration.endstateBatch(all))
    assert(expected.count(_._2 == "tpl") == 1, "exact dedup should keep exactly one template copy")

    var st = StreamCuration.emptyState(spark)
    var kept = Set.empty[(Long, String, Long)]
    for ((lo, hi) <- Seq((0L, 100L), (100L, 1000L))) {
      val (k, delta) = StreamCuration.processBatch(
        all.filter(col("doc_id") >= lo && col("doc_id") < hi), st)
      kept ++= keptSet(k)
      st = accumulate(st, delta)
    }
    assert(kept == expected,
      s"flood split diverged: only-incremental=${kept -- expected} only-batch=${expected -- kept}")
  }

  test("capped band join with a genuinely hot bucket, cross-batch: incremental == batch, cap visibly suppresses fuzzy drops") {
    // 150 scattered-word variants of one template: each changes the
    // SAME five positions (7,22,37,52,67) to variant-specific words,
    // so no intact 20-token window survives (they pass the stale-span
    // gate, unlike boilerplate floods) while pairwise shingle Jaccard
    // stays ≈0.68 — most variants land in the template's minhash band
    // buckets (~49 of 75 per band per batch). With cap 16 those
    // buckets are HOT in every prefix (49 > 16 in batch 1, ~98 > 16
    // combined, ~97 > 16 in the batch run), so the capped cross-batch
    // band join runs with a non-empty hot set on both sides — the
    // path the 120-copy exact-dup flood above never reaches (stage 1
    // removes exact copies before the band index sees them).
    val cap = 16
    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    val variants = spark.range(150).select(
      col("id").as("doc_id"), lit("tpl").as("source"),
      expr(s"""concat_ws(' ', transform(sequence(0, 79), i ->
           | element_at($vocabExpr, pmod(hash(
           |   CASE WHEN i % 15 = 7 THEN -(id * 100 + i)
           |        ELSE 777000 + i END), 64) + 1)))""".stripMargin).as("text"))
    val normal = spark.range(150, 230).select(
      col("id").as("doc_id"), lit("web").as("source"),
      expr(s"""concat_ws(' ', transform(sequence(0, 79), i ->
           | element_at($vocabExpr, pmod(hash(id * 100 + i), 64) + 1)))""".stripMargin).as("text"))
    val all = variants.unionByName(normal).localCheckpoint()

    // the corpus genuinely has hot buckets at this cap (the 64-word
    // vocab also scatters variants into sub-cap buckets, so the cap
    // suppresses SOME, not all, fuzzy drops — both asserted below)
    val bandsAll = graft.llm.Dedup.lshBands(
      graft.llm.Dedup.minhashSignature(
        graft.llm.Dedup.shingles(all.select("doc_id", "text"), "doc_id", "text"), 8), 8, 2)
    assert(graft.llm.Dedup.hotBuckets(bandsAll, cap).count() > 0,
      s"corpus should have at least one band bucket above cap=$cap")

    val capped = keptSet(StreamCuration.endstateBatch(all, cap))
    val uncapped = keptSet(StreamCuration.endstateBatch(all, Int.MaxValue))
    assert(capped.count(_._2 == "tpl") > uncapped.count(_._2 == "tpl"),
      s"cap should suppress fuzzy drops in the hot buckets: capped kept " +
        s"${capped.count(_._2 == "tpl")} tpl vs uncapped ${uncapped.count(_._2 == "tpl")}")

    var st = StreamCuration.emptyState(spark)
    var kept = Set.empty[(Long, String, Long)]
    for ((lo, hi) <- Seq((0L, 75L), (75L, 1000L))) {
      val (k, delta) = StreamCuration.processBatch(
        all.filter(col("doc_id") >= lo && col("doc_id") < hi), st, cap)
      kept ++= keptSet(k)
      st = accumulate(st, delta)
    }
    assert(kept == capped,
      s"capped flood split diverged: only-incremental=${kept -- capped} only-batch=${capped -- kept}")
  }

  test("a batch straddling the high-water mark fails loudly; fully-past redelivery is allowed") {
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val (k1, d1) = StreamCuration.processBatch(docs.filter(col("doc_id") < cut),
      StreamCuration.emptyState(spark))
    k1.count()
    val st = accumulate(StreamCuration.emptyState(spark), d1)
    // straddling batch: contains ids both below and above the mark
    val e = intercept[IllegalArgumentException] {
      StreamCuration.processBatch(docs, st)
    }
    assert(e.getMessage.contains("straddles"))
    // fully-past redelivery: allowed, keeps nothing new
    val (replay, _) = StreamCuration.processBatch(docs.filter(col("doc_id") < cut), st)
    assert(replay.count() == 0)
  }

  test("crash after the wm row, before the key-set appends: replay converges on the batch kept set") {
    // saveDeltas writes bloom, then wm, then the key-sets — a crash
    // between wm and the key-sets is the ordering's DESIGNED failure
    // direction: wm-present over missing key-set appends means the
    // restart still runs every state-side join (against smaller
    // state), and the checkpoint's replay of the interrupted batch
    // re-appends what was lost. This simulates that exact window.
    val stateDir = java.nio.file.Files.createTempDirectory("graft-wmcrash-").toString
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val wave1 = docs.filter(col("doc_id") < cut)
    val wave2 = docs.filter(col("doc_id") >= cut)

    val (_, d1) = StreamCuration.processBatch(wave1, StreamCuration.emptyState(spark))
    // replicate saveDeltas' prefix only: bloom sidecar + the wm row
    StreamCuration.ensureStateTables(spark, stateDir)
    val bloom = d1.fps.stat.bloomFilter("fp",
      StreamCuration.BloomItems, StreamCuration.BloomFpp)
    val bp = new org.apache.hadoop.fs.Path(s"$stateDir/fp.bloom")
    val bfs = bp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = bfs.create(bp, true)
    try bloom.writeTo(out) finally out.close()
    d1.wm.write.mode("append").parquet(s"$stateDir/wm")

    // restart: wm present, key-sets empty — every fp in the replayed
    // batch is bloom-POSITIVE but the confirm join against empty fps
    // state must kill the false drops
    val stR = StreamCuration.loadState(spark, stateDir)
    assert(stR.fpBloom.isDefined && stR.fps.isEmpty,
      "crash simulation should leave bloom+wm behind empty key-sets")
    val (k1r, d1r) = StreamCuration.processBatch(wave1, stR)
    StreamCuration.saveDeltas(d1r, stateDir)
    val (k2, d2) = StreamCuration.processBatch(wave2,
      StreamCuration.loadState(spark, stateDir))
    StreamCuration.saveDeltas(d2, stateDir)

    val kept = keptSet(k1r) ++ keptSet(k2)
    assert(kept == batchKept,
      s"crash-replay diverged: only-replay=${kept -- batchKept} " +
        s"only-batch=${batchKept -- kept}")
  }

  test("persisted-state streaming runner reproduces the batch kept set; replay is idempotent") {
    val base = java.nio.file.Files.createTempDirectory("graft-curation-").toString
    val (srcDir, stateDir, keptDir, ckptDir) =
      (s"$base/src", s"$base/state", s"$base/kept", s"$base/ckpt")
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val cut = ids(ids.length / 2)
    val wave1 = docs.filter(col("doc_id") < cut)
    val wave2 = docs.filter(col("doc_id") >= cut)

    // wave 1 arrives, stream starts, drains; wave 2 arrives, drains
    wave1.coalesce(1).write.mode("append").parquet(srcDir)
    val stream = spark.readStream.schema(docs.schema).parquet(srcDir)
    val q = StreamCuration.run(stream, stateDir, keptDir, ckptDir)
    q.processAllAvailable()
    wave2.coalesce(1).write.mode("append").parquet(srcDir)
    q.processAllAvailable()
    q.stop()

    val streamed = keptSet(spark.read.parquet(keptDir).distinct())
    assert(streamed == batchKept,
      s"streamed diverged: only-streamed=${streamed -- batchKept} only-batch=${batchKept -- streamed}")
    // the bloom sidecar exists after the first batch, so wave 2 (and
    // the replay below) exercised the scan-only bloom+confirm path —
    // and produced the identical kept set just asserted
    assert(StreamCuration.loadState(spark, stateDir).fpBloom.isDefined,
      "fingerprint bloom sidecar missing after streaming run")

    // compaction: same state, fewer files
    def stateSizes() = {
      val st = StreamCuration.loadState(spark, stateDir)
      (st.fps.count(), st.spans.count(), st.bands.count(), st.docs.count())
    }
    val preCompact = stateSizes()
    def fileCount(name: String) =
      Option(new java.io.File(s"$stateDir/$name").listFiles())
        .map(_.count(_.getName.endsWith(".parquet"))).getOrElse(0)
    val filesBefore = fileCount("fps")
    StreamCuration.compactState(spark, stateDir)
    assert(stateSizes() == preCompact, "compaction changed the state contents")
    assert(fileCount("fps") < filesBefore || filesBefore <= 1,
      s"compaction did not reduce fps file count ($filesBefore)")

    // X2 idempotence: replay wave 2 against the final state — the
    // dedup-on-load state is unchanged and the replayed keeps are the
    // rows already emitted (dedup-on-read absorbs the append)
    val before = stateSizes()
    val (replayKept, replayDelta) =
      StreamCuration.processBatch(wave2, StreamCuration.loadState(spark, stateDir))
    StreamCuration.saveDeltas(replayDelta, stateDir)
    assert(stateSizes() == before, "replayed deltas changed the deduped state")
    // every doc in the replayed wave now matches PRIOR state (itself),
    // so the replay keeps nothing new beyond what state already has
    assert(keptSet(replayKept).isEmpty,
      "replaying a batch against post-batch state must keep nothing (all docs are now 'earlier')")
  }

  test("interrupted compaction swap heals on next load; pre-bucketed plain-parquet state migrates") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cur-heal-").toString
    val (_, delta) = StreamCuration.processBatch(docs, StreamCuration.emptyState(spark))
    StreamCuration.saveDeltas(delta, stateDir)
    def counts() = {
      val st = StreamCuration.loadState(spark, stateDir)
      (st.fps.count(), st.spans.count(), st.bands.count(), st.docs.count())
    }
    val healthy = counts()

    // crash window: compaction renamed the live dir aside but died
    // before renaming the compacted temp in — the live location is
    // GONE and .spans.old holds the intact pre-compaction state
    val fs = new org.apache.hadoop.fs.Path(stateDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val live = new org.apache.hadoop.fs.Path(s"$stateDir/spans")
    val aside = new org.apache.hadoop.fs.Path(s"$stateDir/.spans.old")
    require(fs.rename(live, aside), "test setup rename failed")
    spark.catalog.refreshTable(
      StreamCuration.ensureStateTables(spark, stateDir)("spans"))
    assert(counts() == healthy,
      "load after an interrupted compaction swap must restore the pre-swap state")
    assert(!fs.exists(aside), "recovery should consume the .old directory")

    // migration: rewrite docs state as the PRE-BUCKETED engine wrote it
    // (plain parquet appends, no bucket-id file suffix) — the bucketed
    // scan would refuse these files; ensureStateTables must migrate
    val docsState = spark.read.parquet(s"$stateDir/docs")
      .select("doc_id", "text").collect()
    fs.delete(new org.apache.hadoop.fs.Path(s"$stateDir/docs"), true)
    import spark.implicits._
    docsState.map(r => (r.getLong(0), r.getString(1))).toSeq
      .toDF("doc_id", "text").coalesce(2)
      .write.mode("append").parquet(s"$stateDir/docs")
    spark.catalog.refreshTable(
      StreamCuration.ensureStateTables(spark, stateDir)("docs"))
    assert(counts() == healthy, "plain-parquet state must migrate losslessly")
    // and the migrated files now carry bucket ids
    val migrated = fs.listStatus(new org.apache.hadoop.fs.Path(s"$stateDir/docs"))
      .map(_.getPath.getName).filter(_.endsWith(".parquet"))
    assert(migrated.nonEmpty && migrated.forall(n => "_\\d{5}\\.".r.findFirstIn(n).isDefined),
      s"migrated files must be bucketed: ${migrated.take(3).mkString(",")}")
  }

  test("state persisted with string keys (pre-integer-key engine) fails loudly by name") {
    val stateDir = java.nio.file.Files.createTempDirectory("graft-cur-legacy-").toString
    import spark.implicits._
    // the round-8 layout: span hashes as md5 hex strings
    Seq("0cc9cd4dd26c5137b675a0d819cb9ab0", "ffeeddccbbaa99887766554433221100")
      .toDF("h").write.mode("append").parquet(s"$stateDir/spans")
    val e = intercept[IllegalArgumentException](
      StreamCuration.ensureStateTables(spark, stateDir))
    assert(e.getMessage.contains("pre-integer-key"),
      s"expected the named legacy-state guard, got: ${e.getMessage}")
  }

  test("_band_format guard: 16-bit-era band state fails by name; sentinel'd and fresh dirs load") {
    import spark.implicits._
    // (1) fresh dir: first open must stamp the sentinel
    val fresh = java.nio.file.Files.createTempDirectory("graft-bandfmt-fresh-").toString
    StreamCuration.ensureStateTables(spark, fresh)
    val freshSentinel = new java.io.File(fresh, "_band_format")
    assert(freshSentinel.isFile, "a fresh state dir must get the _band_format sentinel")
    assert(scala.io.Source.fromFile(freshSentinel).mkString.trim
      == StreamCuration.BandFormatVersion)

    // (2) 16-bit-slot-era state: sub-2^32 band keys, no sentinel —
    // must fail BY NAME, not silently return zero matches forever
    val legacy = java.nio.file.Files.createTempDirectory("graft-bandfmt-legacy-").toString
    Seq((1L, 1, 123456789L), (2L, 2, 42L))
      .toDF("id", "band", "key").write.mode("append").parquet(s"$legacy/bands")
    val e = intercept[IllegalArgumentException](
      StreamCuration.ensureStateTables(spark, legacy))
    assert(e.getMessage.contains("16-bit-minhash-slot"),
      s"expected the named band-format guard, got: ${e.getMessage}")
    assert(!new java.io.File(legacy, "_band_format").exists,
      "a failed format check must not stamp the sentinel")

    // (3) sentinel-less dir with NEW-format keys (two 31-bit slots ≈
    // ≥ 2^32): value-space classifier accepts it and stamps the
    // sentinel, so the scan runs at most once per dir
    val upgraded = java.nio.file.Files.createTempDirectory("graft-bandfmt-up-").toString
    Seq((1L, 1, (3L << 32) + 7L), (2L, 2, 42L))
      .toDF("id", "band", "key").write.mode("append").parquet(s"$upgraded/bands")
    StreamCuration.ensureStateTables(spark, upgraded)
    assert(new java.io.File(upgraded, "_band_format").isFile,
      "a value-space-classified new-format dir must be stamped")

    // (4) sentinel'd dir loads without re-running the classifier even
    // though its keys alone would classify as 16-bit-era (the sentinel
    // is authoritative — e.g. a small corpus whose keys happen low)
    val stamped = java.nio.file.Files.createTempDirectory("graft-bandfmt-stamped-").toString
    Seq((1L, 1, 42L)).toDF("id", "band", "key")
      .write.mode("append").parquet(s"$stamped/bands")
    val out = new java.io.FileOutputStream(new java.io.File(stamped, "_band_format"))
    out.write(StreamCuration.BandFormatVersion.getBytes("UTF-8")); out.close()
    StreamCuration.ensureStateTables(spark, stamped) // must not throw
  }

  test("a missing bloom sidecar over existing state heals, and the healed bloom still drops pre-sidecar duplicates") {
    val ids = docs.select("doc_id").orderBy("doc_id").collect().map(_.getLong(0))
    val (c1, c2, maxId) = (ids(ids.length / 3), ids(2 * ids.length / 3), ids.last)
    // a wave-3 doc that exactly duplicates a wave-1 doc: under the
    // sidecar invariant the bloom path must drop it; a bloom that
    // covered only post-heal batches would false-negative it and
    // wrongly keep it — that divergence is what this test pins
    val dupText = docs.filter(col("doc_id") === ids(5)).select("text").head().getString(0)
    val corpus = docs.unionByName(spark.range(1).select(
      lit(maxId + 1).as("doc_id"), lit("dup").as("source"), lit(dupText).as("text")))
    val expected = keptSet(StreamCuration.endstateBatch(corpus))
    assert(!expected.exists(_._1 == maxId + 1), "the seeded duplicate must not survive the batch run")

    val stateDir = java.nio.file.Files.createTempDirectory("graft-heal-").toString
    def wave(lo: Long, hi: Long) =
      corpus.filter(col("doc_id") >= lo && col("doc_id") < hi)
    var kept = Set.empty[(Long, String, Long)]
    def step(lo: Long, hi: Long): StreamCuration.State = {
      val st = StreamCuration.loadState(spark, stateDir)
      val (k, d) = StreamCuration.processBatch(wave(lo, hi), st)
      kept ++= keptSet(k)
      StreamCuration.saveDeltas(d, stateDir)
      st
    }
    step(Long.MinValue, c1)
    // simulate a pre-sidecar state dir (or a crash inside the swap)
    assert(new java.io.File(s"$stateDir/fp.bloom").delete())
    val st2 = step(c1, c2)
    assert(st2.fpBloom.isEmpty, "wave 2 should have run the plain path")
    val healed = StreamCuration.loadState(spark, stateDir)
    assert(healed.fpBloom.isDefined, "wave 2's save should heal the sidecar")
    // the healed sidecar covers wave-1 fingerprints, not just wave 2's
    val w1fp = wave(Long.MinValue, c1)
      .select(graft.llm.TextAnalysis.fingerprint(col("text")).as("fp"))
      .head().getString(0)
    assert(healed.fpBloom.get.mightContainString(w1fp),
      "healed bloom must cover pre-heal fingerprints")
    step(c2, Long.MaxValue) // bloom path; contains the wave-1 duplicate
    assert(kept == expected,
      s"heal split diverged: only-incremental=${kept -- expected} only-batch=${expected -- kept}")
  }
}
