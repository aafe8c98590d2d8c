package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Skew hardening for the candidate-generation joins:
  *
  *  - LSH hot-bucket cap: a band key flooded by a template corpus is
  *    excluded from pair generation (with accounting) instead of
  *    emitting O(bucket²) pairs through one reducer; pairs meeting
  *    through healthy buckets are untouched.
  *  - SimHash salt+recombine: hot pigeonhole blocks are spread across
  *    salted reducers with bit-identical output — verified against the
  *    unsalted plan.
  *  - Broadcast independence: the LSH band self-join completes and
  *    agrees with autoBroadcastJoinThreshold=-1 (the shape it takes at
  *    10⁹ docs, where a forced broadcast hint would OOM the driver).
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  /** 400 docs: ids 0-39 are ONE exact template (the hot band bucket);
    * ids 101/201 exactly duplicate 100/200 (seeded pairs that must
    * survive the cap — duplication is exact so band agreement is
    * certain, not probabilistic); the rest are hash-random. 40-word
    * docs over a 64-word vocabulary. */
  private lazy val docs = {
    val vocab = (0 until 64).map(i => s"w$i")
    val vocabExpr = s"array(${vocab.map("'" + _ + "'").mkString(",")})"
    spark.range(400).select(
      col("id").as("doc_id"),
      expr(s"""concat_ws(' ', transform(sequence(0, 39), i ->
           | element_at($vocabExpr, pmod(hash(CASE
           |   WHEN id < 40 THEN 999000 + i
           |   WHEN id IN (101, 201) THEN (id - 1) * 100 + i
           |   ELSE id * 100 + i END), 64) + 1)))""".stripMargin).as("text"))
      .cache()
  }
  private lazy val sh = Dedup.shingles(docs, "doc_id", "text").cache()
  private lazy val bands = Dedup.lshBands(Dedup.minhashSignature(sh, 8), 8, 2)

  test("LSH cap drops the template bucket, keeps healthy pairs, and accounts for the drop") {
    val pairs = Dedup.candidatePairs(bands, maxBucket = 16)
      .as[(Long, Long)].collect().toSet
    // template docs never generate pairs: all their band keys are hot
    assert(!pairs.exists { case (a, b) => a < 40 && b < 40 },
      "capped LSH still generated pairs inside the hot template bucket")
    assert(pairs.contains((100L, 101L)) && pairs.contains((200L, 201L)),
      s"seeded near-dup pairs lost by the cap: $pairs")
    // accounting: the 4 band keys of the 40-doc template exceed the cap
    val hot = Dedup.hotBuckets(bands, maxBucket = 16)
      .agg(count(lit(1)), sum("n_docs")).as[(Long, Long)].head()
    assert(hot._1 == 4 && hot._2 == 160, s"expected 4 hot buckets x 40 docs, got $hot")
  }

  test("cap above every bucket size is a no-op (same pairs as uncapped)") {
    val capped = Dedup.candidatePairs(bands, maxBucket = 64)
      .as[(Long, Long)].collect().toSet
    val uncapped = Dedup.candidatePairs(bands, maxBucket = Int.MaxValue)
      .as[(Long, Long)].collect().toSet
    assert(capped == uncapped)
  }

  test("simhash salt+recombine is bit-identical to the unsalted plan") {
    val sim = Dedup.simhash64(sh).cache()
    def survivors(df: org.apache.spark.sql.DataFrame) =
      df.withColumn("hamming", expr("CAST(bit_count(ha ^ hb) AS INT)"))
        .filter(col("hamming") <= 8)
        .select("doc_a", "doc_b").distinct()
        .as[(Long, Long)].collect().toSet
    val plain = survivors(Dedup.simhashCandidates(sim, maxDist = 8))
    // threshold 10: the 40-doc template floods every block bucket it
    // touches, so the salted branch is genuinely exercised
    val salted = survivors(
      Dedup.simhashCandidates(sim, maxDist = 8, saltBuckets = 4, saltThreshold = 10))
    assert(plain == salted, s"salted simhash diverged: ${plain.diff(salted)} / ${salted.diff(plain)}")
    assert(plain.contains((100L, 101L)), "seeded near-dup missing from simhash pairs")
  }

  test("LSH band join completes and agrees with broadcast disabled") {
    val expected = Dedup.candidatePairs(bands).count()
    val prior = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffled = Dedup.candidatePairs(bands)
      shuffled.collect() // force execution under the -1 threshold
      assert(shuffled.count() == expected)
      val plan = shuffled.queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin"),
        s"band self-join still forces a broadcast with threshold -1:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prior)
  }
}
