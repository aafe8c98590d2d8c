package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** globalRank must assign the exact total-order ranks of a global sort
  * regardless of how many range partitions the data is spread over. */
class RankSpec extends SparkSpec {
  import spark.implicits._

  test("ranks equal the global sort order for any partition count") {
    val df = spark.range(1000).select(
      (col("id") * 2654435761L % 1000).as("v"), col("id"))
    val expected = df.orderBy(col("v").desc, col("id").asc)
      .collect().map(_.getLong(1)).zipWithIndex
      .map { case (id, i) => id -> (i + 1L) }.toMap
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = Rank.globalRank(df, Seq(col("v").desc, col("id").asc),
          numPartitions = Some(parts))
        .select("id", "rank").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("rank column is dense 1..n with no partition boundary gaps") {
    val df = spark.range(777).select((col("id") % 13).as("v"), col("id"))
    val ranks = Rank.globalRank(df, Seq(col("v").asc, col("id").asc),
      numPartitions = Some(7)).select("rank").as[Long].collect().sorted
    assert(ranks.toSeq == (1L to 777L))
  }

  test("prefixSum equals the single-partition window for any partition count") {
    val df = spark.range(1000).select(
      (col("id") * 2654435761L % 97).as("v"), col("id"),
      ((col("id") * 7919) % 350 + 1).as("tokens"))
    val expected = df.orderBy(col("v").desc, col("id").asc)
      .collect().scanLeft(0L -> 0L) { case ((_, acc), r) =>
        r.getLong(1) -> (acc + r.getLong(2))
      }.drop(1).toMap
    for (parts <- Seq(1, 3, 8, 32)) {
      val got = Rank.prefixSum(df, Seq(col("v").desc, col("id").asc),
          "tokens", numPartitions = Some(parts))
        .select("id", "cum").collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("prefixSum: last row carries the grand total; empty partitions are fine") {
    val df = spark.range(50).select(col("id").as("v"), col("id"),
      lit(3L).as("tokens"))
    val out = Rank.prefixSum(df, Seq(col("v").asc, col("id").asc),
      "tokens", numPartitions = Some(32)) // 32 ranges over 50 rows
    assert(out.agg(max("cum")).head().getLong(0) == 150L)
    assert(out.count() == 50)
  }
}
