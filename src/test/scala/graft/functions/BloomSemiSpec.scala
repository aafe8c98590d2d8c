package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** BloomSemi.probe: the manual runtime-filter pair — membership never
  * misses (no false negatives), non-membership mostly filters, an
  * empty build side drops every probe row, and the exact semi-join
  * behind it keeps results exact regardless of the false-positive
  * rate. */
class BloomSemiSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every build-side key passes the probe") {
    val build = spark.range(0, 1000).select((col("id") * 37).as("k"))
    val probe = spark.range(0, 1000).select((col("id") * 37).as("k"))
    val kept = probe.filter(BloomSemi.probe(build, "k", col("k"))).count()
    assert(kept == 1000, s"bloom dropped ${1000 - kept} true members")
  }

  test("non-members mostly filter out (false-positive rate stays low)") {
    val build = spark.range(0, 1000).select(col("id").as("k"))
    // disjoint probe range: any survivor is a bloom false positive
    val probe = spark.range(1000000, 1100000).select(col("id").as("k"))
    val kept = probe.filter(BloomSemi.probe(build, "k", col("k"))).count()
    assert(kept < 1000, s"$kept of 100000 non-members passed — bloom is not filtering")
  }

  test("an empty build side drops every probe row (matches an exact semi-join)") {
    val build = spark.range(0, 100).select(col("id").as("k")).filter(col("k") < 0)
    val probe = spark.range(0, 50).select(col("id").as("k"))
    assert(probe.filter(BloomSemi.probe(build, "k", col("k"))).count() == 0)
  }

  test("bloom + exact semi-join equals the plain exact semi-join") {
    val build = spark.range(0, 500).select((col("id") * 3).as("k")).filter(col("k") % 2 === 0)
    val probe = spark.range(0, 3000).select(col("id").as("k"), (col("id") % 7).as("v"))
    val exact = probe.join(build, Seq("k"), "left_semi")
      .orderBy("k", "v").collect().toSeq
    val bloomed = probe.filter(BloomSemi.probe(build, "k", col("k")))
      .join(build, Seq("k"), "left_semi")
      .orderBy("k", "v").collect().toSeq
    assert(exact == bloomed)
  }
}
