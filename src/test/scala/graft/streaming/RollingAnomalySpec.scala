package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** W3/X7 — event-driven rolling anomaly: each arriving slice joins its
  * calendar-slot normal (broadcast climatology) inside foreachBatch and
  * lands in the anomaly table — the reference's ADR 0007 flow on
  * Structured Streaming. */
class RollingAnomalySpec extends SparkSpec {
  import spark.implicits._

  test("arriving slices produce anomalies against their slot normals") {
    implicit val sqlCtx = spark.sqlContext
    // fixed slot climatology: month -> per-pixel normal
    val clim = Seq((1, 0, 0, 10.0), (1, 0, 1, 20.0), (2, 0, 0, 30.0), (2, 0, 1, 40.0))
      .toDF("slot", "y", "x", "clim")

    val sink = scala.collection.mutable.Buffer[(Timestamp, Int, Int, Double)]()
    val mem = MemoryStream[(Timestamp, Int, Int, Double)]
    val q = mem.toDF().toDF("t", "y", "x", "v").writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val anom = batch
          .withColumn("slot", month(col("t")))
          .join(broadcast(clim), Seq("slot", "y", "x"))
          .select(col("t"), col("y"), col("x"), (col("v") - col("clim")).as("anom"))
        sink.synchronized {
          sink ++= anom.as[(Timestamp, Int, Int, Double)].collect()
        }
        ()
      }
      .start()
    def ts(s: String) = Timestamp.valueOf(s)
    mem.addData((ts("2024-01-01 00:00:00"), 0, 0, 13.0), (ts("2024-01-01 00:00:00"), 0, 1, 18.0))
    q.processAllAvailable()
    mem.addData((ts("2024-02-01 00:00:00"), 0, 0, 33.5))
    q.processAllAvailable()
    q.stop()
    val byKey = sink.map(r => (r._2, r._3, r._1.toString.take(7)) -> r._4).toMap
    assert(byKey == Map(
      (0, 0, "2024-01") -> 3.0, (0, 1, "2024-01") -> -2.0, (0, 0, "2024-02") -> 3.5))
  }
}
