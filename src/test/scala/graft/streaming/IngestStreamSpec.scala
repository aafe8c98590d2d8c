package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class IngestStreamSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String) =
    Files.createTempDirectory(s"graft-$name-").toString

  /** Drop a single parquet FILE (not a Spark output dir) at destPath. */
  private def dropFile(df: org.apache.spark.sql.DataFrame, destPath: String): Unit = {
    val staging = tmp("staging")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(_.getName.endsWith(".parquet")).get
    val dest = new java.io.File(destPath)
    dest.getParentFile.mkdirs()
    Files.move(part.toPath, dest.toPath)
  }

  test("dropzone ingest: timestamp extraction, idempotent re-delivery, late data") {
    val dz = tmp("dropzone"); val tgt = tmp("target"); val cp1 = tmp("cp1")
    val pixels = Seq((0, 0, 1.5), (0, 1, 2.5), (1, 0, 3.5)).toDF("y", "x", "v")

    // Three filename patterns from the reference's extraction chain.
    dropFile(pixels, s"$dz/org/cat/chirps/precip_20240101.parquet")
    // (colons are illegal in Hadoop paths, so the ISO stem is date-only)
    dropFile(pixels, s"$dz/org/cat/chirps/precip_2024-02-01.parquet")
    dropFile(pixels, s"$dz/org/cat/gfs/GR--20240101T000000--t2m_20240101_0600.parquet")

    IngestStream.ingestAvailable(spark, dz, tgt, cp1).awaitTermination()
    val out1 = spark.read.parquet(tgt)
    assert(out1.count() == 9)
    val times = out1.select("collection", "time", "reference_time").distinct()
      .as[(String, java.sql.Timestamp, Option[java.sql.Timestamp])].collect().toSet
    assert(times.map(_._2.toString).contains("2024-01-01 00:00:00.0"))
    assert(times.map(_._2.toString).contains("2024-02-01 00:00:00.0"))
    assert(times.exists(t => t._1 == "gfs" &&
      t._2.toString == "2024-01-01 06:00:00.0" &&
      t._3.exists(_.toString == "2024-01-01 00:00:00.0")))

    // Re-delivery of an identical granule (fresh checkpoint => the file
    // source re-reads it) must be a no-op via the hash anti-join.
    IngestStream.ingestAvailable(spark, dz, tgt, tmp("cp2")).awaitTermination()
    assert(spark.read.parquet(tgt).count() == 9)

    // A late-arriving OLDER timestep is still processed (no watermark
    // drop — the reference parks & resurrects rather than dropping).
    dropFile(pixels, s"$dz/org/cat/chirps/precip_20231201.parquet")
    IngestStream.ingestAvailable(spark, dz, tgt, tmp("cp3")).awaitTermination()
    val out3 = spark.read.parquet(tgt)
    assert(out3.count() == 12)
    assert(out3.filter(col("time") === "2023-12-01 00:00:00").count() == 3)

    // Re-delivery of the SAME granule identity with CHANGED content must
    // replace its rows (not skip, not duplicate): content is part of the
    // hash and changed granules take the overwrite path.
    val changed = Seq((0, 0, 9.0), (0, 1, 9.5)).toDF("y", "x", "v")
    val dz2 = tmp("dropzone2")
    dropFile(changed, s"$dz2/org/cat/chirps/precip_20231201.parquet")
    IngestStream.ingestAvailable(spark, dz2, tgt, tmp("cp4")).awaitTermination()
    val out4 = spark.read.parquet(tgt)
    assert(out4.count() == 11, "changed granule should replace 3 old rows with 2 new")
    val dec = out4.filter(col("time") === "2023-12-01 00:00:00")
      .select("y", "x", "v").as[(Int, Int, Double)].collect().toSet
    assert(dec == Set((0, 0, 9.0), (0, 1, 9.5)), s"got $dec")
    // other granules untouched
    assert(out4.filter(col("time") === "2024-01-01 00:00:00").count() == 3)
  }

  test("per-batch target read is partition-pruned to the batch's keys") {
    val dz = tmp("dz-prune"); val tgt = tmp("tgt-prune")
    val pixels = Seq((0, 0, 1.0)).toDF("y", "x", "v")
    dropFile(pixels, s"$dz/org/cat/aa/g_20240101.parquet")
    dropFile(pixels, s"$dz/org/cat/bb/g_20240202.parquet")
    IngestStream.ingestAvailable(spark, dz, tgt, tmp("cp-prune")).awaitTermination()

    val pruned = IngestStream.prunedTarget(spark, tgt, Seq(("aa", "2024-01-01")))
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters") &&
      scan.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1").nonEmpty,
      s"expected non-empty PartitionFilters:\n$scan")
    assert(pruned.count() == 1)
  }

  test("unreadable target propagates instead of silently appending duplicates") {
    val dz = tmp("dz-err"); val tgt = tmp("tgt-err")
    val pixels = Seq((0, 0, 1.0)).toDF("y", "x", "v")
    dropFile(pixels, s"$dz/org/cat/cc/g_20240101.parquet")
    // corrupt target: a non-parquet file where data should be
    val dir = new java.io.File(s"$tgt/collection=cc/date=2024-01-01")
    dir.mkdirs()
    Files.write(new java.io.File(dir, "part-00000.parquet").toPath,
      "not parquet".getBytes)
    val q = IngestStream.ingestAvailable(spark, dz, tgt, tmp("cp-err"))
    val thrown = intercept[Exception] { q.awaitTermination() }
    assert(thrown.getMessage != null)
    // and nothing was appended behind the failure
    assert(!new java.io.File(tgt).listFiles().exists(_.getName.startsWith("part-")))
  }
}
