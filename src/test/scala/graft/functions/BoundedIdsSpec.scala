package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bounded_ids: the one-pass LSH bucket materializer — per-group id
  * arrays below the cap, NULL past it, O(min(cap, group)) state. */
class BoundedIdsSpec extends SparkSpec {
  import spark.implicits._

  test("groups at the cap keep their ids; one past the cap nulls (hot-bucket contract)") {
    // group 0: 4 ids (== cap), group 1: 5 ids (> cap), group 2: 1 id
    val df = Seq.tabulate(10)(i => (if (i < 4) 0 else if (i < 9) 1 else 2, i.toLong))
      .toDF("g", "id")
      .repartition(8) // force partial buffers + merges across partitions
    val out = df.groupBy("g")
      .agg(BoundedIds.boundedIds(col("id"), 4).as("ids"))
      .collect().map(r => r.getInt(0) -> Option(r.get(1))).toMap
    def ids(o: Option[Any]): Seq[Long] =
      o.get.asInstanceOf[scala.collection.Seq[Long]].toSeq
    assert(out(0).isDefined && ids(out(0)).sorted == Seq(0L, 1L, 2L, 3L))
    assert(out(1).isEmpty, "a 5-member group must overflow a cap of 4")
    assert(ids(out(2)) == Seq(9L))
  }

  test("overflow survives merges and the serialize round-trip (many partitions)") {
    // one group with 100k members across 32 partitions: every partial
    // buffer overflows or merges into an overflowed one; the result
    // must be NULL, never a truncated array
    val df = spark.range(100000).select(lit(0).as("g"), col("id"))
      .repartition(32)
    val rows = df.groupBy("g")
      .agg(BoundedIds.boundedIds(col("id"), 1024).as("ids")).collect()
    assert(rows.length == 1 && rows.head.isNullAt(1))
    // and a huge cap (the uncapped contract) returns everything
    val all = df.groupBy("g")
      .agg(BoundedIds.boundedIds(col("id"), Int.MaxValue).as("ids"))
      .collect().head.getSeq[Long](1)
    assert(all.size == 100000 && all.toSet == (0L until 100000L).toSet)
  }

  test("pair generation over the arrays equals the relational self-join") {
    val bands = Seq((1L, 1, 10L), (2L, 1, 10L), (3L, 1, 10L), (4L, 1, 20L),
        (5L, 1, 20L), (6L, 2, 10L), (1L, 2, 30L), (2L, 2, 30L))
      .toDF("id", "band", "key")
    val pairs = graft.llm.Dedup.candidatePairs(bands, maxBucket = 1024)
      .as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L)),
      pairs.toString)
  }
}
