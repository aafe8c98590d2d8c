package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming temporal operators beyond the reference's batch calendar
  * buckets (SURVEY X8 notes the reference has none — these are the
  * Spark-native additions a continuously-ingesting deployment needs):
  * watermarked tumbling/sliding aggregation and custom sessionization
  * state via flatMapGroupsWithState.
  */
object Windows {

  /** Tumbling per-window, per-key counts + exact sums with a watermark
    * bounding state. */
  def tumblingCounts(events: DataFrame, watermark: String, window_ : String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Sliding per-window, per-key counts + exact sums: each event lands
    * in window/slide overlapping windows, enumerated map-side by
    * Spark's window() — still one watermarked hash aggregation (the
    * streaming twin of the w7_sliding batch query). */
  def slidingCounts(events: DataFrame, watermark: String,
                    window_ : String, slide: String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_, slide), col("event_type"))
      .agg(count(lit(1)).as("n"),
        (sum(round(col("value") * 100).cast("long")).cast("double") / 100.0).as("sum_value"))
      .select(col("window.start").as("ws"), col("window.end").as("we"),
        col("event_type"), col("n"), col("sum_value"))

  /** Stream-stream interval join (click→purchase attribution): each
    * purchase joins clicks of the same user within the trailing
    * `intervalSec` window. Both sides carry watermarks and the join
    * condition bounds event-time distance, so state on BOTH sides is
    * evictable — the canonical bounded stream-stream equi+range join.
    * Input frames need (user_id, ts, event_id) (+ any payload). */
  def attributionJoin(clicks: DataFrame, purchases: DataFrame,
                      watermark: String, intervalSec: Long): DataFrame = {
    val c = clicks.select(col("user_id"), col("ts").as("click_ts"),
      col("event_id").as("click_id")).withWatermark("click_ts", watermark)
    val p = purchases.select(col("user_id").as("p_user_id"),
      col("ts").as("purchase_ts"),
      col("event_id").as("purchase_id")).withWatermark("purchase_ts", watermark)
    c.join(p,
      col("user_id") === col("p_user_id") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"INTERVAL $intervalSec SECONDS"))
      .select("user_id", "click_id", "click_ts", "purchase_id", "purchase_ts")
  }

  /** Streaming exact dedup: drop duplicate keys with state bounded by the
    * watermark (dropDuplicatesWithinWatermark — state for a key is
    * evictable once the watermark passes its event time, so the operator
    * runs forever without unbounded state; the batch analogue is
    * d_exact_dedup). A duplicate arriving later than the watermark delay
    * re-emits — that's the documented contract at 100 TB/day stream
    * rates: exactness within the delay window, bounded memory always.
    * Keys are typically a content fingerprint (t_fingerprint) for
    * document streams or the natural event id for event streams. */
  def dedupWithinWatermark(df: DataFrame, tsCol: String, watermark: String,
                           keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "dedup needs at least one key column")
    df.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)
  }

  /** Streaming exact-substring contamination check: arriving documents
    * explode into rolling w-token window hashes (the native
    * span_hash_windows kernel — a stateless projection, so it pipelines
    * inside the micro-batch with no extra shuffle) and any hash already
    * seen inside the watermark horizon is dropped; what survives is the
    * doc's novel-window stream. Emitting per-doc novel-window counts
    * downstream gives an online boilerplate signal; state is the
    * watermark-bounded hash set Spark maintains for
    * dropDuplicatesWithinWatermark — no unbounded growth.
    * Output: (ts, id, h) rows for windows never seen before. */
  def novelSpans(docs: DataFrame, tsCol: String, watermark: String,
                 idCol: String, textCol: String, w: Int = 20): DataFrame = {
    import org.apache.spark.sql.functions._
    // one shared definition of "a span" with the batch family
    graft.llm.Dedup.spanWindows(
        docs.select(col(tsCol), col(idCol).as("id"), col(textCol)),
        textCol, w, keep = Seq(tsCol, "id"))
      .select(col(tsCol), col("id"), col("h"))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark("h")
  }

  case class Sess(user_id: Long, n: Int, first: java.sql.Timestamp, last: java.sql.Timestamp)
  case class SessOut(user_id: Long, n_events: Int, duration_sec: Long)

  /** Session windows with a gap timeout, implemented as explicit state —
    * the KeyValueGroupedDataset.flatMapGroupsWithState surface.
    *
    * Event-time semantics are watermark-driven: each open session arms an
    * EventTimeTimeout at (last + gap), so a key's FINAL session flushes
    * when the watermark passes its gap (no later event for that key
    * needed) and its state is removed — without this, state grows
    * unboundedly and the last session per key is never emitted. Events
    * older than the watermark are dropped by the watermark operator
    * before they can reopen a closed session. */
  def sessionize(events: Dataset[(Long, java.sql.Timestamp)],
                 gapSeconds: Long, watermark: String = "10 seconds"): Dataset[SessOut] = {
    val spark = events.sparkSession
    import spark.implicits._
    def close(uid: Long, s: Sess) =
      SessOut(uid, s.n, (s.last.getTime - s.first.getTime) / 1000)
    events.withWatermark("_2", watermark)
      .groupByKey(_._1)
      .flatMapGroupsWithState[Sess, SessOut](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (uid, it, state: GroupState[Sess]) =>
          if (state.hasTimedOut) {
            // watermark passed last+gap with no new events: final flush
            val s = state.get
            state.remove()
            Iterator.single(close(uid, s))
          } else {
            val sorted = it.toSeq.sortBy(_._2.getTime)
            var cur = state.getOption
            val out = scala.collection.mutable.Buffer[SessOut]()
            for ((_, ts) <- sorted) {
              cur match {
                case Some(s) if ts.getTime - s.last.getTime <= gapSeconds * 1000 =>
                  cur = Some(s.copy(n = s.n + 1, last = ts))
                case Some(s) =>
                  out += close(uid, s)
                  cur = Some(Sess(uid, 1, ts, ts))
                case None =>
                  cur = Some(Sess(uid, 1, ts, ts))
              }
            }
            cur.foreach { s =>
              val deadline = s.last.getTime + gapSeconds * 1000
              if (state.getCurrentWatermarkMs() >= deadline) {
                // the watermark already closed this session — emit now
                out += close(uid, s)
                state.remove()
              } else {
                state.update(s)
                state.setTimeoutTimestamp(deadline)
              }
            }
            out.iterator
          }
      }
  }
}
