package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

/** LLM-ops soak: the full minhash-LSH-verify dedup pipeline over a
  * synthetic corpus (default 100k docs, ~80 words each, deterministic
  * hash-generated with seeded near-duplicates). Prints docs/s.
  * Run: sbt "runMain graft.SoakDedup [nDocs]". */
object SoakDedup {
  def main(args: Array[String]): Unit = {
    val nDocs = if (args.nonEmpty) args(0).toInt else 100000
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    // every 50th doc is a near-duplicate of its predecessor (same seed,
    // one word in ~40 perturbed via the +1 salt)
    val docs = spark.range(nDocs).select(
        col("id").as("doc_id"),
        expr(s"""concat_ws(' ', transform(sequence(0, 79), i ->
             | element_at($vocabExpr,
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i = 7 THEN -id
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 64) + 1)))""".stripMargin)
          .as("text"))
      .cache()
    val n = docs.count()
    println(s"[soak-dedup] $n docs")

    val t0 = System.nanoTime()
    val sh = Dedup.shingles(docs, "doc_id", "text").cache()
    val sig = Dedup.minhashFromText(docs, "doc_id", "text") // kernel path, as production
    val cands = Dedup.candidatePairs(Dedup.lshBands(sig, 8, 2))
    val verified = Dedup.pairJaccard(cands, sh).filter(col("jacc") >= 0.5).count()
    val dt = (System.nanoTime() - t0) / 1e9
    println(f"[soak-dedup] minhash-LSH-verify  ${dt}%8.2f s  ${n / dt}%9.0f docs/s  verified_pairs=$verified")

    // Broadcast-disabled re-run: the band-frame self-join must complete
    // (and agree) as a SHUFFLED equi-join — the plan shape it takes at
    // 10⁹ docs where no side fits a broadcast build. A forced
    // broadcast() hint would make this impossible; this run asserts the
    // pipeline never reacquired one.
    val t0b = System.nanoTime()
    val priorThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val verifiedShuffle =
      try Dedup.pairJaccard(
        Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh, 8), 8, 2)), sh)
        .filter(col("jacc") >= 0.5).count()
      finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", priorThreshold)
    val dtb = (System.nanoTime() - t0b) / 1e9
    assert(verifiedShuffle == verified,
      s"shuffle-join LSH disagrees with broadcast run: $verifiedShuffle != $verified")
    println(f"[soak-dedup] LSH-shuffle-join    ${dtb}%8.2f s  ${n / dtb}%9.0f docs/s  verified_pairs=$verifiedShuffle (broadcast disabled, equal)")

    // Skewed corpus: 10% of docs are ONE exact template — every band
    // key of the template collapses into a single hot bucket that
    // uncapped LSH would turn into (n/10)² pairs through one reducer.
    // The cap excludes those buckets from pair generation (the exact
    // dedup stage owns identical docs) and the drop is accounted.
    val skewed = spark.range(nDocs).select(
        col("id").as("doc_id"),
        expr(s"""CASE WHEN id % 10 = 3 THEN concat_ws(' ', transform(sequence(0, 79), i ->
             | element_at($vocabExpr, pmod(hash(7777 * 100 + i), 64) + 1)))
             | ELSE concat_ws(' ', transform(sequence(0, 79), i ->
             | element_at($vocabExpr,
             |   pmod(hash(CASE WHEN id % 50 = 1 AND i = 7 THEN -id
             |             WHEN id % 50 = 1 THEN (id - 1) * 100 + i
             |             ELSE id * 100 + i END), 64) + 1))) END""".stripMargin)
          .as("text"))
      .cache()
    skewed.count()
    val t1s = System.nanoTime()
    val shS = Dedup.shingles(skewed, "doc_id", "text").cache()
    val bandsS = Dedup.lshBands(Dedup.minhashSignature(shS, 8), 8, 2)
    val candsS = Dedup.candidatePairs(bandsS)
    val verifiedS = Dedup.pairJaccard(candsS, shS).filter(col("jacc") >= 0.5).count()
    val dts = (System.nanoTime() - t1s) / 1e9
    // recall accounting: which buckets were dropped and how many docs
    // they held (the template flood, nothing else)
    val dropped = Dedup.hotBuckets(bandsS).agg(
      count(lit(1)).as("n_buckets"), sum("n_docs").as("n_rows")).collect()(0)
    println(f"[soak-dedup] LSH-skewed(10%%hot)  ${dts}%8.2f s  ${n / dts}%9.0f docs/s  " +
      f"verified_pairs=$verifiedS dropped_buckets=${dropped.getLong(0)} dropped_rows=${Option(dropped.get(1)).getOrElse(0L)}")
    assert(dts <= 2.5 * dt || dts < 30,
      f"skewed soak ${dts}%.1f s exceeded 2.5x uniform ${dt}%.1f s")
    shS.unpersist(); skewed.unpersist()

    // exact-substring span family over the same corpus: windowing is the
    // native one-pass hasher; repeated-span + coverage ride one distinct
    // aggregate and one per-doc window respectively
    val t1 = System.nanoTime()
    val spans = Dedup.spanHashes(docs, "doc_id", "text", 20)
    val nRep = Dedup.repeatedSpans(spans).count()
    val dt1 = (System.nanoTime() - t1) / 1e9
    println(f"[soak-dedup] repeated-spans      ${dt1}%8.2f s  ${n / dt1}%9.0f docs/s  dup_spans=$nRep")

    val t2 = System.nanoTime()
    val nCov = Dedup.spanCoverage(Dedup.spanHashes(docs, "doc_id", "text", 20), 20).count()
    val dt2 = (System.nanoTime() - t2) / 1e9
    println(f"[soak-dedup] span-coverage       ${dt2}%8.2f s  ${n / dt2}%9.0f docs/s  docs_with_dups=$nCov")
    spark.stop()
  }
}
