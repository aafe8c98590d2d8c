package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}

/** The DataSource V2 surface: spark.read.format("georaster") must
  * produce exactly the rows Formats.ingestDir builds, with column
  * pruning pushed into the partition reader. */
class GeoRasterSourceSpec extends SparkSpec {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-dsv2-").toString
    for (m <- 1 to 3) {
      val data = Array.tabulate(48) { i =>
        if (i % 13 == 0) Float.NaN else (m * 100 + i).toFloat
      }
      Files.write(Paths.get(f"$d/precip_2024${m}%02d01.tif"),
        GeoTiff.write(GeoTiff.Raster(8, 6, data, -180.0, 90.0, 45.0, 30.0)))
    }
    d
  }

  test("georaster rows match Formats.ingestDir exactly") {
    val dsv2 = spark.read.format("georaster").load(dir)
      .select("fname", "step", "y", "x", "v", "lon", "lat", "time")
    val legacy = Formats.ingestDir(spark, dir)
      .select("fname", "step", "y", "x", "v", "lon", "lat", "time")
    assert(dsv2.count() == 3 * 44)
    assert(dsv2.exceptAll(legacy).isEmpty && legacy.exceptAll(dsv2).isEmpty)
  }

  test("lossy column rides the DSv2 reader, reset PER MESSAGE in a mixed file") {
    // one GRIB file, two concatenated messages over the same grid:
    // lossless 5/3 then lossy 9/7 — the per-raster flag must reset
    // between messages of the SAME granule, not stick
    val d = Files.createTempDirectory("graft-dsv2-lossy-").toString
    val w = 8; val h = 6
    val data = Array.tabulate(w * h)(i => (250.0 + i * 0.5).toFloat)
    def msg(fh: Int) = Grib2.Message(
      GeoTiff.Raster(w, h, data, -180.0, 90.0, 45.0, 30.0),
      0, 0, 0, java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0), fh)
    val bytes = Grib2.write(msg(0), packing = 40) ++
      Grib2.write(msg(6), packing = 40, j2kQuantShift = Some(0))
    Files.write(Paths.get(s"$d/t2m_20240101_0000.grib2"), bytes)
    val rows = spark.read.format("georaster").load(d)
      .groupBy("step", "lossy").count().collect()
      .map(r => (r.getInt(0), r.getBoolean(1)) -> r.getLong(2)).toMap
    assert(rows.keySet == Set((0, false), (6, true)),
      s"per-message lossy flags wrong: $rows")
    assert(rows.values.toSet == Set(w.toLong * h))
  }

  test("column pruning reaches the reader (scan schema = selected cols)") {
    val pruned = spark.read.format("georaster").load(dir).select("v")
    val scan = pruned.queryExecution.executedPlan.collectFirst {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scan.isDefined, "expected a BatchScanExec")
    assert(scan.get.scan.readSchema().fieldNames.sameElements(Array("v")))
    assert(pruned.agg(sum("v")).collect()(0).getDouble(0) > 0)
  }

  test("streaming: dropped granules arrive exactly once per trigger") {
    val drop = Files.createTempDirectory("graft-dsv2-stream-").toString
    def writeTiff(m: Int): Unit = {
      val data = Array.tabulate(48)(i => (m * 100 + i).toFloat)
      Files.write(Paths.get(f"$drop/precip_2024${m}%02d01.tif"),
        GeoTiff.write(GeoTiff.Raster(8, 6, data, -180.0, 90.0, 45.0, 30.0)))
    }
    writeTiff(1)
    val q = spark.readStream.format("georaster").load(drop)
      .groupBy("fname").count()
      .writeStream.format("memory").queryName("georaster_stream")
      .outputMode("complete")
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-ckpt-").toString)
      .start()
    q.processAllAvailable()
    assert(spark.table("georaster_stream").count() == 1)
    writeTiff(2)
    q.processAllAvailable()
    val rows = spark.table("georaster_stream").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    q.stop()
    assert(rows.size == 2 && rows.values.forall(_ == 48)) // no NaN in these
  }

  test("ignoreCorrupt: a bad granule yields zero rows instead of failing the scan") {
    val d = Files.createTempDirectory("graft-dsv2-corrupt-").toString
    Files.write(Paths.get(s"$d/good_20240101.tif"),
      GeoTiff.write(GeoTiff.Raster(4, 3, Array.tabulate(12)(_.toFloat),
        -180.0, 90.0, 90.0, 60.0)))
    Files.write(Paths.get(s"$d/junk_20240102.tif"),
      Array.fill[Byte](64)(0x5a))
    // default: the corrupt file fails the job
    intercept[org.apache.spark.SparkException] {
      spark.read.format("georaster").load(d).count()
    }
    // opt-in tolerance: good granule's rows survive, bad one contributes none
    val tolerant = spark.read.format("georaster")
      .option("ignoreCorrupt", "true").load(d)
    assert(tolerant.count() == 12)
    assert(tolerant.select("fname").distinct().collect()
      .map(_.getString(0)).sameElements(Array("good_20240101.tif")))
  }

  test("filters still apply on top; NaN pixels never surface") {
    val df = spark.read.format("georaster").load(dir)
    assert(df.filter(col("v").isNaN).isEmpty)
    assert(df.filter(col("fname") === "precip_20240201.tif").count() == 44)
    assert(df.select("time").distinct().count() == 3)
  }

  test("stream offset round-trips hostile file names (quotes, '\",\"', newline)") {
    val stream = new GeoRasterMicroBatchStream("/nonexistent", Array("fname"))
    val hostile = Seq("""/drop/a",".tif""", "/drop/b\"quote\".nc", "/drop/c\nnl.grib2", "/drop/plain.tif")
    val off = GeoRasterOffset(hostile)
    val back = stream.deserializeOffset(off.json()).asInstanceOf[GeoRasterOffset]
    assert(back.files == hostile)
  }

  test("stream offset recovers legacy (pre-b64) checkpoints") {
    val stream = new GeoRasterMicroBatchStream("/nonexistent", Array("fname"))
    // the exact escaped-JSON format the previous encoding wrote
    val legacy = """["/drop/a.tif","/drop/b\"q\".nc","/drop/c\\back.grib2"]"""
    val back = stream.deserializeOffset(legacy).asInstanceOf[GeoRasterOffset]
    assert(back.files == Seq("/drop/a.tif", "/drop/b\"q\".nc", "/drop/c\\back.grib2"))
    // format detection anchors on the FIRST element: a legacy file name
    // containing the literal "b64: substring mid-payload must still route
    // to the legacy parser, not be base64-decoded to garbage
    val tricky = """["/drop/a.tif","/drop/weird\"b64:name.nc"]"""
    val backT = stream.deserializeOffset(tricky).asInstanceOf[GeoRasterOffset]
    assert(backT.files == Seq("/drop/a.tif", "/drop/weird\"b64:name.nc"))
  }

  test("drop-zone listing is dot-anchored: x.gtif / data.func never reach the sniffer") {
    val d = java.nio.file.Files.createTempDirectory("ext").toString
    Seq("a.tif", "b.tiff", "c.nc", "d.grib2", "x.gtif", "data.func", "e.nc.bak")
      .foreach(n => java.nio.file.Files.write(
        java.nio.file.Paths.get(d, n), Array[Byte](1, 2, 3)))
    val names = GeoRasterScan.listFiles(d).map(f => new java.io.File(f).getName).toSet
    assert(names == Set("a.tif", "b.tiff", "c.nc", "d.grib2"))
  }

  test("write side: long-form rows round-trip through COGs and back") {
    val out = Files.createTempDirectory("graft-dsv2-w-").toString
    val rows = spark.read.format("georaster").load(dir)
      .select("fname", "step", "y", "x", "v")
    rows.repartition(col("fname"), col("step"))
      .write.format("georaster").mode("append")
      .option("width", 8).option("height", 6)
      .option("west", -180.0).option("north", 90.0)
      .option("px", 45.0).option("py", 30.0)
      .save(out)
    // one COG per (fname, step); pixel values survive the round trip
    val files = new java.io.File(out).listFiles().map(_.getName)
      .filterNot(_.startsWith(".")).sorted // Hadoop local-FS .crc sidecars
    assert(files.length == 3 && files.forall(_.endsWith("_s0.tif")), files.toSeq)
    val back = spark.read.format("georaster").load(out)
      .select("fname", "y", "x", "v").collect()
      .map(r => (r.getString(0).stripSuffix("_s0.tif"), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSet
    val expect = rows.select("fname", "y", "x", "v").collect()
      .map(r => (r.getString(0).stripSuffix(".tif"), r.getInt(1), r.getInt(2), r.getDouble(3)))
      .toSet
    assert(back == expect)
  }

  test("streaming write: micro-batches append COGs readable by the source") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val out = Files.createTempDirectory("graft-dsv2-sw-").toString
    val mem = MemoryStream[(String, Int, Int, Int, Double)]
    val q = mem.toDS().toDF("fname", "step", "y", "x", "v")
      .writeStream.format("georaster")
      .option("width", 4).option("height", 3)
      .option("west", -180.0).option("north", 90.0)
      .option("px", 90.0).option("py", 60.0)
      .option("checkpointLocation",
        Files.createTempDirectory("graft-dsv2-sw-ckpt-").toString)
      .start(out)
    // two batches, two rasters
    mem.addData((0 until 12).map(i => ("a.tif", 0, i / 4, i % 4, i * 1.0)): _*)
    q.processAllAvailable()
    mem.addData((0 until 12).map(i => ("b.tif", 0, i / 4, i % 4, i + 100.0)): _*)
    q.processAllAvailable()
    q.stop()
    val back = spark.read.format("georaster").load(out)
      .select("fname", "y", "x", "v").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getInt(2), r.getDouble(3))).toSet
    val expect = ((0 until 12).map(i => ("a_s0.tif", i / 4, i % 4, i * 1.0)) ++
      (0 until 12).map(i => ("b_s0.tif", i / 4, i % 4, i + 100.0))).toSet
    assert(back == expect)
  }

  test("write side: int16 + nodata encodes sparse rasters; wrong-typed v is rejected") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dsv2-i16-").toString
    // sparse: only 2 of 12 pixels — the rest must encode as nodata.
    // repartition co-locates the raster group (the writer contract;
    // local-FS exclusive create is advisory, not atomic)
    val df = Seq(("m.tif", 0, 0, 0, 7.0), ("m.tif", 0, 2, 3, 9.0))
      .toDF("fname", "step", "y", "x", "v")
      .repartition(col("fname"), col("step"))
    df.write.format("georaster").mode("append")
      .option("width", 4).option("height", 3)
      .option("west", -180.0).option("north", 90.0)
      .option("px", 90.0).option("py", 60.0)
      .option("dtype", "int16").option("nodata", -9999.0)
      .save(out)
    val back = spark.read.format("georaster").load(out)
      .select("y", "x", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getDouble(2))).toSet
    assert(back == Set((0, 0, 7.0), (2, 3, 9.0))) // nodata pixels dropped as NaN
    // integer dtype without nodata is a plan-time error
    val e = intercept[Exception] {
      df.write.format("georaster").mode("append")
        .option("width", 4).option("height", 3)
        .option("west", -180.0).option("north", 90.0)
        .option("px", 90.0).option("py", 60.0)
        .option("dtype", "int16")
        .save(Files.createTempDirectory("graft-x-").toString)
    }
    assert(e.getMessage.contains("requires option 'nodata'"), e.getMessage)
    // a FloatType v would be reinterpreted bit-garbage through
    // getDouble — rejected by TYPE at plan time
    val floatV = df.withColumn("v", col("v").cast("float"))
    val e2 = intercept[Exception] {
      floatV.write.format("georaster").mode("append")
        .option("width", 4).option("height", 3)
        .option("west", -180.0).option("north", 90.0)
        .option("px", 90.0).option("py", 60.0)
        .save(Files.createTempDirectory("graft-x2-").toString)
    }
    assert(e2.getMessage.contains("schema mismatch"), e2.getMessage)
  }

  test("write side: missing grid options and off-grid pixels fail loudly") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dsv2-bad-").toString
    val df = Seq(("f.tif", 0, 1, 1, 5.0)).toDF("fname", "step", "y", "x", "v")
    val e = intercept[Exception] {
      df.write.format("georaster").mode("append").option("width", 8).save(out)
    }
    assert(e.getMessage.contains("requires option"), e.getMessage)
    val offGrid = Seq(("f.tif", 0, 99, 1, 5.0)).toDF("fname", "step", "y", "x", "v")
    val e2 = intercept[Exception] {
      offGrid.write.format("georaster").mode("append")
        .option("width", 8).option("height", 6)
        .option("west", -180.0).option("north", 90.0)
        .option("px", 45.0).option("py", 30.0)
        .save(out)
    }
    assert(e2.getMessage.contains("outside the declared") ||
      Option(e2.getCause).exists(_.getMessage.contains("outside the declared")),
      e2.getMessage)
  }

  test("write side: the default cap admits many complete groups per task (memory-derived)") {
    import spark.implicits._
    // hash repartition legitimately routes groups/partitions COMPLETE
    // groups to one task when distinct groups exceed partitions; a flat
    // 64-raster cap would kill this contract-following write. The
    // derived cap is BufferBudgetBytes / raster bytes — huge for 4x4.
    assert(GeoRasterWriter.defaultMaxBuffered(
      GeoRasterWriteGeom(4, 4, -180, 90, 45, 30, "float32")) > 1000000)
    // and bounded for big rasters: 8k x 8k floats = 256 MiB -> 64 floor
    assert(GeoRasterWriter.defaultMaxBuffered(
      GeoRasterWriteGeom(8192, 8192, -180, 90, 0.01, 0.01, "float32")) ==
      GeoRasterWriter.MinBufferedRasters)
    val out = Files.createTempDirectory("graft-dsv2-many-").toString
    val rows = (0 until 200).flatMap(m => Seq((f"g$m%03d.tif", 0, 0, 0, m * 1.0)))
      .toDF("fname", "step", "y", "x", "v")
      .repartition(2, col("fname"), col("step")) // ~100 groups per task
    rows.write.format("georaster").mode("append")
      .option("width", 4).option("height", 4)
      .option("west", -180.0).option("north", 90.0)
      .option("px", 45.0).option("py", 30.0)
      .save(out)
    assert(new java.io.File(out).listFiles().count(_.getName.endsWith(".tif")) == 200)
  }

  test("write side: a mis-partitioned write dies at the buffer cap, not at OOM") {
    import spark.implicits._
    val out = Files.createTempDirectory("graft-dsv2-cap-").toString
    // 8 distinct rasters funneled into ONE partition with a cap of 4:
    // the writer must fail loudly at raster 5 with a pointer to the
    // repartition contract (silently buffering would OOM at scale)
    val rows = (0 until 8).flatMap(m => Seq((f"g$m%02d.tif", 0, 0, 0, m * 1.0)))
      .toDF("fname", "step", "y", "x", "v").coalesce(1)
    val e = intercept[Exception] {
      rows.write.format("georaster").mode("append")
        .option("width", 4).option("height", 4)
        .option("west", -180.0).option("north", 90.0)
        .option("px", 45.0).option("py", 30.0)
        .option("maxBufferedRasters", 4)
        .save(out)
    }
    def deepMsg(t: Throwable): String =
      (Iterator.iterate(t)(_.getCause).takeWhile(_ != null).map(_.getMessage)
        ++ Iterator.single("")).mkString(" | ")
    assert(deepMsg(e).contains("repartition the frame by (fname, step)"), deepMsg(e))
    // the same frame co-located (and a cap that admits the worst-case
    // hash collision) writes fine
    rows.repartition(col("fname"), col("step"))
      .write.format("georaster").mode("append")
      .option("width", 4).option("height", 4)
      .option("west", -180.0).option("north", 90.0)
      .option("px", 45.0).option("py", 30.0)
      .option("maxBufferedRasters", 8)
      .save(Files.createTempDirectory("graft-dsv2-cap2-").toString)
  }
}
