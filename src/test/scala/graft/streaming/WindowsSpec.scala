package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class WindowsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("watermarked tumbling window aggregates arrive per window+key") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Windows.tumblingCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 00:01:00"), "click", 1.25),
      (ts("2024-01-01 00:02:00"), "click", 2.25),
      (ts("2024-01-01 00:06:00"), "view", 4.0))
    q.processAllAvailable()
    // advance watermark far enough to close the first windows
    mem.addData((ts("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .select("ws", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains((ts("2024-01-01 00:00:00"), "click", 2L, 3.5)))
    assert(rows.contains((ts("2024-01-01 00:05:00"), "view", 1L, 4.0)))
  }

  test("sliding windows emit one row per overlapping window") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Windows.slidingCounts(df, "10 minutes", "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("sliding")
      .outputMode("append").start()
    // 00:06 lands in two 10-min windows sliding by 5: [00:00,00:10) and
    // [00:05,00:15)
    mem.addData((ts("2024-01-01 00:06:00"), "click", 1.5))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 01:00:00"), "click", 1.0)) // close them
    q.processAllAvailable()
    val rows = spark.table("sliding")
      .select("ws", "event_type", "n", "sum_value")
      .as[(Timestamp, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows.contains((ts("2024-01-01 00:00:00"), "click", 1L, 1.5)))
    assert(rows.contains((ts("2024-01-01 00:05:00"), "click", 1L, 1.5)))
  }

  test("events later than the watermark are dropped from closed windows") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String, Double)]
    val df = mem.toDF().toDF("ts", "event_type", "value")
    val q = Windows.tumblingCounts(df, "10 minutes", "5 minutes")
      .writeStream.format("memory").queryName("latedrop")
      .outputMode("append").start()
    mem.addData((ts("2024-01-01 00:01:00"), "click", 1.0))
    q.processAllAvailable()
    // advance watermark beyond 00:00–00:05, closing that window
    mem.addData((ts("2024-01-01 01:00:00"), "click", 1.0))
    q.processAllAvailable()
    // a straggler for the closed window must NOT reopen or re-emit it
    mem.addData((ts("2024-01-01 00:02:00"), "click", 99.0))
    mem.addData((ts("2024-01-01 02:00:00"), "click", 1.0))
    q.processAllAvailable()
    val rows = spark.table("latedrop")
      .select("ws", "n", "sum_value").as[(Timestamp, Long, Double)].collect()
    q.stop()
    val w0 = rows.filter(_._1 == ts("2024-01-01 00:00:00"))
    assert(w0.length == 1 && w0.head._2 == 1L && w0.head._3 == 1.0,
      s"late straggler leaked into closed window: ${w0.toSeq}")
    // contrast: the batch/derivation path never drops late data (X4) —
    // IngestStreamSpec's late-arrival case covers that contract.
  }

  test("flatMapGroupsWithState sessionization closes sessions on gap") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Windows.sessionize(mem.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    // user 1: two events 30s apart (one session), then a 10-min gap event
    mem.addData((1L, ts("2024-01-01 00:00:00")), (1L, ts("2024-01-01 00:00:30")))
    q.processAllAvailable()
    mem.addData((1L, ts("2024-01-01 00:10:00")))
    q.processAllAvailable()
    val rows = spark.table("sessions").as[Windows.SessOut].collect().toSeq
    q.stop()
    assert(rows == Seq(Windows.SessOut(1L, 2, 30L)))
  }

  test("final session flushes via event-time timeout and state expires") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, Timestamp)]
    val q = Windows.sessionize(mem.toDS(), gapSeconds = 60)
      .writeStream.format("memory").queryName("sessions_final")
      .outputMode("append").start()
    // user 7 has one session, then goes silent forever
    mem.addData((7L, ts("2024-01-01 00:00:00")), (7L, ts("2024-01-01 00:00:45")))
    q.processAllAvailable()
    assert(spark.table("sessions_final").isEmpty,
      "open session must not emit before its gap passes")
    // a DIFFERENT key advances the watermark past 00:01:45+gap —
    // user 7's final session must flush with no user-7 event arriving
    mem.addData((8L, ts("2024-01-01 01:00:00")))
    q.processAllAvailable()
    // one more tick so the armed timeout fires after the watermark update
    mem.addData((8L, ts("2024-01-01 02:00:00")))
    q.processAllAvailable()
    val rows = spark.table("sessions_final").as[Windows.SessOut].collect().toSet
    q.stop()
    assert(rows.contains(Windows.SessOut(7L, 2, 45L)),
      s"final session never flushed: $rows")
  }

  test("streaming dedup: duplicates within the watermark drop, state stays bounded") {
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Timestamp, String)]
    val df = mem.toDF().toDF("ts", "fp")
    val q = Windows.dedupWithinWatermark(df, "ts", "10 minutes", Seq("fp"))
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    mem.addData(
      (ts("2024-01-01 00:01:00"), "docA"),
      (ts("2024-01-01 00:02:00"), "docA"), // dup within watermark
      (ts("2024-01-01 00:03:00"), "docB"))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 00:04:00"), "docA")) // still within delay
    q.processAllAvailable()
    val first = spark.table("dedup_stream").as[(Timestamp, String)].collect()
    assert(first.count(_._2 == "docA") == 1 && first.count(_._2 == "docB") == 1)
    // advance the watermark far past docA's state, then replay it: state
    // was evicted (bounded memory), so the key re-emits — the documented
    // exactness-within-delay contract
    mem.addData((ts("2024-01-01 10:00:00"), "docC"))
    q.processAllAvailable()
    mem.addData((ts("2024-01-01 10:01:00"), "docA"))
    q.processAllAvailable()
    val later = spark.table("dedup_stream").as[(Timestamp, String)].collect()
    q.stop()
    assert(later.count(_._2 == "docA") == 2,
      s"evicted key must re-emit after watermark passes: ${later.toSeq}")
  }

  test("stream-stream interval join: purchase pairs with in-window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long)]
    val q = Windows.attributionJoin(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id"),
      "10 minutes", 3600L)
      .writeStream.format("memory").queryName("attrib")
      .outputMode("append").start()
    clicks.addData(
      (1L, ts("2024-01-01 00:10:00"), 100L), // in window of purchase 200
      (1L, ts("2024-01-01 02:00:00"), 101L), // later than purchase — no pair
      (2L, ts("2024-01-01 00:10:00"), 102L)) // other user
    purchases.addData((1L, ts("2024-01-01 00:40:00"), 200L))
    q.processAllAvailable()
    // advance both watermarks to flush
    clicks.addData((9L, ts("2024-01-01 06:00:00"), 999L))
    purchases.addData((9L, ts("2024-01-01 06:00:00"), 998L))
    q.processAllAvailable()
    val rows = spark.table("attrib")
      .select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Long)].collect().toSet
    q.stop()
    assert(rows.contains((1L, 100L, 200L)))
    assert(!rows.exists(r => r._2 == 101L || r._2 == 102L),
      s"out-of-window or cross-user click joined: $rows")
  }

  test("streaming novel-span stream drops windows already seen in the horizon") {
    implicit val sqlCtx = spark.sqlContext
    def toks(n: Int, tag: String) = (1 to n).map(i => s"$tag$i").mkString(" ")
    val shared = toks(20, "s")
    val mem = MemoryStream[(Timestamp, Long, String)]
    val df = mem.toDF().toDF("ts", "doc_id", "text")
    val q = Windows.novelSpans(df, "ts", "10 minutes", "doc_id", "text", 20)
      .writeStream.format("memory").queryName("novel")
      .outputMode("append").start()
    // doc 1 introduces the span; doc 2 repeats it verbatim later in the
    // same horizon; doc 3 is fresh content
    mem.addData(
      (ts("2024-01-01 00:01:00"), 1L, shared),
      (ts("2024-01-01 00:02:00"), 2L, shared),
      (ts("2024-01-01 00:03:00"), 3L, toks(20, "z")))
    q.processAllAvailable()
    val perDoc = spark.table("novel").groupBy("id").count()
      .as[(Long, Long)].collect().toMap
    q.stop()
    // exactly one 20-token window per doc; doc 2's was already seen
    assert(perDoc == Map(1L -> 1L, 3L -> 1L),
      s"expected docs 1 and 3 to contribute the novel windows, got $perDoc")
  }
}
