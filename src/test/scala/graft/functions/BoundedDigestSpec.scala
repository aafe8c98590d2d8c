package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** bounded_sorted_join: the order-canonical identity-hash pre-image
  * (F11 input_hash) with an O(cap) aggregation buffer and a LOUD
  * failure past the cap — a million-member unit is a recipe defect,
  * not data to collect_list until an executor OOMs. */
class BoundedDigestSpec extends SparkSpec {
  import spark.implicits._

  test("sorts and joins across partitions, matching the sort_array(collect_list) form") {
    val df = Seq((0, "cc"), (0, "aa"), (0, "bb"), (1, "zz"), (1, "ay"))
      .toDF("g", "cs").repartition(8) // force partials + merges
    val out = df.groupBy("g")
      .agg(BoundedDigest.boundedSortedJoin(col("cs")).as("joined"),
        array_join(sort_array(collect_list(col("cs"))), "|").as("oracle"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getString(2)))
    for ((g, joined, oracle) <- out)
      assert(joined == oracle, s"group $g: $joined vs $oracle")
  }

  test("sha256 over the joined form equals the f11 digest contract") {
    val df = Seq.tabulate(7)(i => (i % 2, f"cs$i%02d")).toDF("g", "cs")
    val rows = df.groupBy("g")
      .agg(sha2(BoundedDigest.boundedSortedJoin(col("cs")), 256).as("h"),
        sha2(array_join(sort_array(collect_list(col("cs"))), "|"), 256).as("oracle"))
      .collect()
    rows.foreach(r => assert(r.getString(1) == r.getString(2)))
  }

  test("a group past the cap fails by name, not by OOM or truncation") {
    val df = spark.range(100).select(lit(0).as("g"),
      format_string("cs%03d", col("id")).as("cs"))
    val e = intercept[Exception] {
      df.groupBy("g").agg(BoundedDigest.boundedSortedJoin(col("cs"), cap = 64))
        .collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => x.getMessage +: msgs(x.getCause))
    assert(msgs(e).exists(m => m != null && m.contains("exceeds 64 members")),
      s"got: ${msgs(e).mkString(" | ")}")
  }

  test("a non-string column fails analysis with a named type error") {
    val df = spark.range(5).select(lit(0).as("g"), col("id"))
    val e = intercept[Exception] {
      df.groupBy("g").agg(BoundedDigest.boundedSortedJoin(col("id"))).collect()
    }
    assert(e.getMessage.contains("bounded_sorted_join requires a STRING"),
      e.getMessage)
  }

  test("r15 f11 restructure: key-exchange-first plan equals the pre-r15 form") {
    // the registered query now repartitions the narrow columns by key
    // BEFORE md5 + the aggregate (one exchange, full-width row work);
    // this pins the restructure result-identical to the original chain
    val dir = sf0001
    val after = graft.SparkEntry.queries("f11_input_hash")(spark, dir)
    val before = graft.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"),
        md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
      .groupBy("l_orderkey")
      .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))
    assert(after.except(before).isEmpty && before.except(after).isEmpty)
    assert(after.count() == before.count())
  }

  test("duplicate and empty members survive the round-trip in order") {
    val df = Seq((0, "b"), (0, "b"), (0, ""), (0, "a")).toDF("g", "cs")
      .repartition(4)
    val r = df.groupBy("g")
      .agg(BoundedDigest.boundedSortedJoin(col("cs")).as("j")).head()
    assert(r.getString(1) == "|a|b|b")
  }
}
