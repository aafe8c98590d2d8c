package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}

/** Loaders for the driver-provided parquet tables (TESTDATA.md).
  *
  * At cluster scale these would be partitioned/bucketed Delta or parquet
  * datasets; here each table is a single parquet file per scale factor.
  * All engine queries take the directory so the same code runs at any SF.
  */
object Tables {
  def lineitem(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "region")
  /** `events.ts` arrives in whatever parquet encoding the generator
    * used — seen in the wild as TIMESTAMP(NANOS) (arrives as epoch-nanos
    * LongType under spark.sql.legacy.parquet.nanosAsLong) and as
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) (arrives as
    * TIMESTAMP_NTZ). Normalize both to a session-TZ TimestampType so
    * every downstream query sees ONE type: the session is pinned UTC
    * (Sessions.build), so the NTZ→TZ relabel shifts no wall-clock
    * instant, and ANSI casts (timestamp→long in the sessionize window)
    * stay legal. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = read(spark, dir, "events")
    df.schema("ts").dataType match {
      case LongType => df.withColumn("ts", timestamp_micros(expr("ts DIV 1000")))
      case TimestampNTZType => df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = read(spark, dir, "embeddings")

  /** When enabled (Bench), tables are pinned in memory after first read
    * — the serving-layer setup where dimension/fact tables at this SF
    * fit executor storage and repeated queries skip file listing +
    * decode. Off by default so Verify demonstrates raw-scan pushdown. */
  @volatile var cacheEnabled = false
  private val cached = new java.util.concurrent.ConcurrentHashMap[String, DataFrame]()

  def read(spark: SparkSession, dir: String, name: String): DataFrame =
    if (!cacheEnabled) spark.read.parquet(s"$dir/$name.parquet")
    else cached.computeIfAbsent(s"$dir/$name",
      _ => spark.read.parquet(s"$dir/$name.parquet").cache())

  /** Unpin one dataset's tables / everything (cache lifecycle hooks —
    * Bench/Verify call these between datasets so a long-lived session
    * never accumulates storage blocks per dataset touched). */
  def evictCache(dir: String): Unit = {
    val keys = cached.keySet().toArray(Array.empty[String]).filter(_.startsWith(dir + "/"))
    keys.foreach(k => Option(cached.remove(k)).foreach(_.unpersist(blocking = true)))
  }
  def clearCache(): Unit = {
    cached.values().forEach(df => { df.unpersist(blocking = true); () })
    cached.clear()
  }
}
