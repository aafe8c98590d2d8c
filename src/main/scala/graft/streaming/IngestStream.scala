package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Drop-zone ingest as Structured Streaming (SURVEY §2.9 X1/X2; replaces
  * the reference's MinIO→Redis→Celery chain, ingestion/consumer.py:77-191).
  *
  * Files land under `dropzone/{org}/{catalog}/{collection}/<name>`; the
  * stream discovers them incrementally (file-source checkpointing = the
  * reference's IngestionLog), derives identity from the path + filename
  * timestamp patterns (time_extraction.py:8-98), and `foreachBatch`
  * upserts into a parquet target with content-hash idempotency: a
  * re-delivered granule is a no-op, a changed granule replaces its rows.
  *
  * At scale the target is a Delta/Iceberg MERGE; on plain parquet we get
  * the same semantics with a key anti-join + dynamic partition overwrite.
  */
object IngestStream {

  /** Filename → valid time; supports `*_YYYYMMDD[_HHMM]` and ISO stems,
    * plus the `GR--{reftime}--` forecast prefix (formats/geotiff.py:351-373). */
  def extractTime(fname: org.apache.spark.sql.Column) = {
    // nullif guards ANSI mode: to_timestamp('') throws in Spark 4.
    val stem = regexp_replace(fname, "^GR--\\d{8}T\\d{6}--", "")
    def ext(re: String) = nullif(regexp_extract(stem, re, 1), lit(""))
    coalesce(
      to_timestamp(ext("(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})")),
      to_timestamp(ext("_(\\d{8}_\\d{4})"), "yyyyMMdd_HHmm"),
      to_timestamp(ext("_(\\d{4}-\\d{2}-\\d{2})"), "yyyy-MM-dd"),
      to_timestamp(ext("_(\\d{8})"), "yyyyMMdd"))
  }

  /** Forecast reference time from the `GR--YYYYMMDDTHHMMSS--` prefix. */
  def extractRefTime(fname: org.apache.spark.sql.Column) =
    to_timestamp(nullif(regexp_extract(fname, "^GR--(\\d{8}T\\d{6})--", 1), lit("")),
      "yyyyMMdd'T'HHmmss")

  /** Open the dropzone as a stream of granule rows. Each dropped file is
    * a parquet of long-form pixels (t is overridden by the filename when
    * present — filename is authoritative, content is fallback). */
  def readDropzone(spark: SparkSession, dropzone: String): DataFrame = {
    val raw = spark.readStream
      .schema("y INT, x INT, v DOUBLE")
      .option("pathGlobFilter", "*.parquet")
      .option("recursiveFileLookup", "true")
      .parquet(dropzone)
      .withColumn("path", url_decode(input_file_name()))
    val fname = element_at(split(col("path"), "/"), -1)
    raw
      .withColumn("collection", element_at(split(col("path"), "/"), -2))
      .withColumn("time", extractTime(fname))
      .withColumn("reference_time", extractRefTime(fname))
      .withColumn("granule_hash",
        sha2(concat_ws("|", col("collection"), col("time"),
          coalesce(col("reference_time").cast("string"), lit(""))), 256))
  }

  /** Run the ingest with idempotent upsert into `target` (parquet dir).
    * Processes everything currently available, then stops. */
  def ingestAvailable(spark: SparkSession, dropzone: String, target: String,
                      checkpoint: String): StreamingQuery = {
    val q = readDropzone(spark, dropzone).writeStream
      .option("checkpointLocation", checkpoint)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, target)
      }
      .start()
    q
  }

  /** Content-hash idempotent upsert: granules whose key already exists
    * with the same hash are skipped; new keys append. (Changed-hash
    * overwrite requires partition rewrite — see engine.Derivation for
    * the classification used there.) */
  def upsertBatch(batch: DataFrame, target: String): Unit = {
    val spark = batch.sparkSession
    // granule_hash encodes (collection, time, reference_time) null-safely —
    // a plain key anti-join would leak re-delivered NULL-reference granules
    // because NULL never equi-joins NULL.
    val incoming = batch.dropDuplicates("granule_hash", "y", "x")
    val existingKeys =
      try spark.read.parquet(target).select("granule_hash").distinct()
      catch { case _: Exception => null }
    val fresh =
      if (existingKeys == null) incoming
      else incoming.join(existingKeys, Seq("granule_hash"), "left_anti")
    fresh.write.mode("append").partitionBy("collection").parquet(target)
  }
}
