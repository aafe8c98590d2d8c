package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The native sort-merge as-of operator must agree row-for-row with the
  * composed union+window form on real and adversarial data, and plan as
  * a streaming merge (no union, no window). */
class AsofNativeSpec extends SparkSpec {
  import spark.implicits._

  /** Run `f` with the broadcast threshold pinned (-1 forces the
    * streaming-merge exec; default lets small sides broadcast). */
  private def withThreshold[T](v: String)(f: => T): T = {
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val prev = spark.conf.get(key)
    try { spark.conf.set(key, v); f } finally spark.conf.set(key, prev)
  }

  private def asofNative(left: org.apache.spark.sql.DataFrame,
                         right: org.apache.spark.sql.DataFrame) =
    AsofJoinNative.asof(left, right, "k", "lt", "rt", Seq("p"))
      .select("id", "asof_p").collect().map(r => (r.getLong(0), r.get(1))).toSet

  /** (composed, native-merge, native-broadcast) result sets. */
  private def asofBoth(left: org.apache.spark.sql.DataFrame,
                       right: org.apache.spark.sql.DataFrame) = {
    val composed = AsofJoin.asof(left, right, "k", "lt", "rt", Seq("p"))
      .select("id", "asof_p").collect().map(r => (r.getLong(0), r.get(1))).toSet
    val merge = withThreshold("-1")(asofNative(left, right))
    val bcast = withThreshold("10MB")(asofNative(left, right))
    assert(merge == bcast,
      s"merge and broadcast execs disagree: merge=$merge bcast=$bcast")
    (composed, merge)
  }

  test("agrees with the composed form on adversarial key/time layouts") {
    // keys with: no right rows, right rows all later, exact-tie times,
    // multiple matches (latest wins), and interleaved keys
    val left = Seq(
      (1L, 10L, 100L), (2L, 10L, 200L), (3L, 5L, 300L),
      (1L, 20L, 101L), (4L, 7L, 400L), (2L, 30L, 201L)
    ).toDF("k", "lt", "id")
    val right = Seq(
      (1L, 5L, "a"), (1L, 10L, "b"), (1L, 15L, "c"),
      (2L, 30L, "d"), (3L, 9L, "e"), (5L, 1L, "z")
    ).toDF("k", "rt", "p")
    val (composed, native) = asofBoth(left, right)
    assert(native == composed, s"native=$native composed=$composed")
    // spot-check semantics directly: tie is inclusive, latest wins
    assert(native.contains((100L, "b")))   // k=1 lt=10 -> rt=10
    assert(native.contains((101L, "c")))   // k=1 lt=20 -> rt=15
    assert(native.contains((300L, null)))  // k=3 rt=9 > lt=5 -> null
    assert(native.contains((400L, null)))  // k=4 no right rows
    assert(native.contains((201L, "d")))   // k=2 lt=30 -> rt=30 inclusive
  }

  test("agrees with the composed form on the events fixture") {
    val e = Tables.events(spark, sf0001)
    val clicks = e.filter(col("event_type") === "click")
      .select(col("event_id").as("id"), col("user_id").as("k"), col("ts").as("lt"))
    val views = e.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("k"), col("ts").as("rt"))
      .agg(max(col("value")).as("p"))
    val (composed, native) = asofBoth(clicks, views)
    assert(native.nonEmpty && native == composed)
  }

  test("plans as a co-partitioned streaming merge: no union, no window") {
    withThreshold("-1") {
      val left = Seq((1L, 10L, 100L)).toDF("k", "lt", "id")
      val right = Seq((1L, 5L, "a")).toDF("k", "rt", "p")
      val plan = AsofJoinNative.asof(left, right, "k", "lt", "rt", Seq("p"))
        .queryExecution.executedPlan.toString
      assert(plan.contains("AsofJoin"), s"native node missing:\n$plan")
      assert(!plan.contains("BroadcastAsofJoin"), s"threshold=-1 must pick the merge:\n$plan")
      assert(!plan.contains("Window"), s"window leaked into plan:\n$plan")
      assert(!plan.contains("Union"), s"union leaked into plan:\n$plan")
    }
  }

  test("small right side plans as broadcast: zero exchanges and sorts on the left") {
    withThreshold("10MB") {
      val left = Seq((1L, 10L, 100L), (2L, 4L, 200L)).toDF("k", "lt", "id")
      val right = Seq((1L, 5L, "a"), (2L, 3L, "b")).toDF("k", "rt", "p")
      val df = AsofJoinNative.asof(left, right, "k", "lt", "rt", Seq("p"))
      val plan = df.queryExecution.executedPlan.toString
      assert(plan.contains("BroadcastAsofJoin"), s"broadcast exec missing:\n$plan")
      assert(plan.contains("BroadcastExchange"), s"broadcast exchange missing:\n$plan")
      assert(!plan.contains("Exchange hashpartitioning"), s"shuffle leaked:\n$plan")
      assert(!plan.contains("Sort "), s"sort leaked:\n$plan")
      val out = df.select("id", "asof_p").collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(out == Set((100L, "a"), (200L, "b")))
    }
  }

  test("string keys survive the right iterator's row-buffer reuse") {
    // many rows per key so the remembered key outlives several
    // rIter.next() calls — an uncopied UTF8String view would be
    // overwritten and silently drop or misattribute matches
    val left = (0 until 200).map(i => (s"key_${i % 10}", i.toLong + 1000, i.toLong))
      .toDF("k", "lt", "id")
    val right = (0 until 400).map(i => (s"key_${i % 10}", i.toLong, s"p$i"))
      .toDF("k", "rt", "p")
    val (composed, native) = asofBoth(left, right)
    assert(native == composed)
    assert(native.forall(_._2 != null), "every left row has an earlier right row")
  }

  test("the bare operator output is consumable without a projection on top") {
    // SparkPlan contract: nodes emit UnsafeRow; collect() straight off
    // the custom node (no trailing select) exercises getByteArrayRdd
    import org.apache.spark.sql.GraftShim
    val left = Seq((1L, 10L, 100L)).toDF("k", "lt", "id")
    val right = Seq((1L, 5L, "a")).toDF("k", "rt", "p")
    val lPlan = GraftShim.analyzed(left)
    val rPlan = GraftShim.analyzed(right)
    def a(p: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan, n: String) =
      p.output.find(_.name == n).get
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) {
      val raw = GraftShim.ofRows(spark, AsofJoinPlan(lPlan, rPlan,
        a(lPlan, "k"), a(lPlan, "lt"), a(rPlan, "k"), a(rPlan, "rt"),
        Seq(a(rPlan, "p"))))
      val rows = raw.collect()
      assert(rows.length == 1 && rows(0).getString(3) == "a", s"thr=$thr")
    }
  }

  test("payload name colliding with a left column resolves unambiguously") {
    val left = Seq((1L, 10L, "left_p", 100L)).toDF("k", "lt", "p", "id")
    val right = Seq((1L, 5L, "right_p")).toDF("k", "rt", "p")
    val out = AsofJoinNative.asof(left, right, "k", "lt", "rt", Seq("p"))
      .select("id", "p", "asof_p").collect()(0)
    assert(out.getLong(0) == 100L)
    assert(out.getString(1) == "left_p")
    assert(out.getString(2) == "right_p")
  }

  test("long-backed fast path agrees with the interpreted merge branch") {
    // same logical data through BOTH AsofJoinExec branches: long keys
    // take the primitive fast path; zero-padded string keys (order-
    // preserving) force the generic interpreted path. A semantic fix
    // applied to one branch but not the other diverges here.
    val left = (0 until 300).map(i => (i.toLong % 7, (i * 31 % 500).toLong, i.toLong))
      .toDF("k", "lt", "id")
    val right = (0 until 150).map(i => (i.toLong % 7, (i * 17 % 500).toLong, i.toLong))
      .toDF("k", "rt", "p")
    def pad(c: String) = lpad(col(c).cast("string"), 6, "0")
    withThreshold("-1") {
      val fast = asofNative(left, right)
      val slow = AsofJoinNative.asof(
          left.withColumn("k", pad("k")).withColumn("lt", pad("lt")),
          right.withColumn("k", pad("k")).withColumn("rt", pad("rt")),
          "k", "lt", "rt", Seq("p"))
        .select("id", "asof_p").collect().map(r => (r.getLong(0), r.get(1))).toSet
      assert(fast == slow, s"branches disagree: fast=$fast slow=$slow")
      assert(fast.exists(_._2 != null) && fast.exists(_._2 == null),
        "fixture must exercise both hit and miss paths")
    }
  }

  test("null keys and null times on the left yield null payloads") {
    val left = Seq((Some(1L), Some(10L), 1L), (None, Some(10L), 2L),
      (Some(1L), None, 3L)).toDF("k", "lt", "id")
    val right = Seq((1L, 5L, "a")).toDF("k", "rt", "p")
    for (thr <- Seq("-1", "10MB")) withThreshold(thr) {
      val out = AsofJoinNative.asof(left, right, "k", "lt", "rt", Seq("p"))
        .select("id", "asof_p").collect().map(r => (r.getLong(0), r.get(1))).toMap
      assert(out == Map(1L -> "a", 2L -> null, 3L -> null), s"thr=$thr")
    }
  }
}
