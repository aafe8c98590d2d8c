package graft

import org.apache.spark.sql.functions._

/** Scale soak for `Rank.globalRank` — the range-partitioned total
  * ranking behind t_curriculum (quality ordering), t_shard_assign
  * (token-balanced sharding) and Rank-consuming pipelines. A
  * single-partition `row_number() OVER (ORDER BY ...)` would serialize
  * this corpus through one task; the soak proves the two-pass prefix
  * sum ranks tens of millions of rows with every partition bounded by
  * its range slice, and that the rank is a correct total order.
  * Run: sbt "runMain graft.SoakRank [rows]".
  */
object SoakRank {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 20000000L
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // deterministic skewed scores: ~1000 distinct values over n rows —
    // the tie-heavy shape a quality scorer actually produces, where a
    // non-total sort key would make ranks placement-dependent
    val scored = spark.range(n).select(
      col("id"),
      ((col("id") * 2654435761L) % 1000).cast("double").as("score"))

    val t0 = System.nanoTime()
    val ranked = graft.ops.Rank.globalRank(
      scored, Seq(col("score").desc, col("id").asc))
    // correctness of the total order, all checked distributed:
    // ranks are a dense 1..n permutation
    val stats = ranked.agg(
      count(lit(1)).as("n"),
      min("rank").as("mn"), max("rank").as("mx"),
      countDistinct("rank").as("nd")).head()
    require(stats.getLong(0) == n && stats.getLong(1) == 1L &&
      stats.getLong(2) == n && stats.getLong(3) == n,
      s"rank is not a dense permutation: $stats")
    // rank order agrees with the sort order (adjacent-pair check via
    // a self-join on rank+1 over a 0.1% systematic sample of ranks)
    val a = ranked.filter(col("rank") % 1000 === 0)
      .select(col("rank").as("r"), col("score").as("s1"), col("id").as("i1"))
    val b = ranked.filter(col("rank") % 1000 === 1)
      .select((col("rank") - 1).as("r"), col("score").as("s2"), col("id").as("i2"))
    val bad = a.join(b, "r")
      .filter(col("s1") < col("s2") ||
        (col("s1") === col("s2") && col("i1") >= col("i2")))
      .count()
    require(bad == 0, s"$bad adjacent rank pairs violate the sort order")
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[soak] globalRank over $n%,d rows: $secs%.1f s " +
      f"(${n / secs / 1e6}%.1f M rows/s), order verified")

    // the shard-assign shape on top: 16 shards, token-mass spread
    // bounded by one document
    val t1 = System.nanoTime()
    val shards = ranked.withColumn("shard", (col("rank") - 1) % 16)
      .groupBy("shard").agg(sum("score").cast("long").as("mass"))
      .collect().map(_.getLong(1))
    val spread = shards.max - shards.min
    require(spread <= 1000L,
      s"shard spread $spread exceeds one max-document mass")
    println(f"[soak] shard-assign balance over $n%,d rows: " +
      f"${(System.nanoTime() - t1) / 1e9}%.1f s, mass spread $spread (<= 1000)")
    spark.stop()
  }
}
