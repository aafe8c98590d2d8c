package graft.sources

import java.util.{Collections => JCollections}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.connector.write.{BatchWrite, DataWriter, DataWriterFactory, LogicalWriteInfo, PhysicalWriteInfo, Write, WriteBuilder, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 surface for the raster decoders: makes the ingest
  * chipper a first-class Spark source —
  *
  * {{{ spark.read.format("georaster").load(dir) }}}
  *
  * One input partition per raster file (format-sniffed GeoTIFF / GRIB2 /
  * NetCDF, same registry as `Formats.ingestDir`), long-form pixel rows,
  * NaN dropped at the decode boundary, filename-derived valid time
  * (+step hours for multi-timestep files). Column pruning is pushed
  * into the reader (`SupportsPushDownRequiredColumns`): a `select(v)`
  * never materializes lon/lat/time values per pixel.
  *
  * At cluster scale each file decodes on one executor core — exactly
  * the binaryFile+mapPartitions plan `Formats.ingestDir` builds, but as
  * a declarative source usable from SQL (`CREATE TABLE ... USING
  * georaster`) and composable with the rest of the reader API.
  */
class GeoRasterSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "georaster"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GeoRasterSource.schema
  // writes carry their OWN (long-form subset) schema: without this,
  // Spark validates the input frame against the fixed 9-column read
  // schema and rejects every write
  override def supportsExternalMetadata(): Boolean = true
  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: java.util.Map[String, String]): Table =
    new GeoRasterTable(properties.get("path"), schema)
}

object GeoRasterSource {
  val schema: StructType = StructType(Seq(
    StructField("fname", StringType, nullable = false),
    StructField("step", IntegerType, nullable = false),
    StructField("y", IntegerType, nullable = false),
    StructField("x", IntegerType, nullable = false),
    StructField("v", DoubleType, nullable = false),
    StructField("lon", DoubleType, nullable = false),
    StructField("lat", DoubleType, nullable = false),
    StructField("time", TimestampType, nullable = true),
    StructField("lossy", BooleanType, nullable = false)))

  /** Plain-Scala twin of IngestStream.extractTime's regex chain (the
    * Column version can't run inside a partition reader). Returns epoch
    * micros UTC. */
  def parseTime(fname: String): Option[Long] = {
    import java.time.{LocalDate, LocalDateTime, ZoneOffset}
    import java.time.format.DateTimeFormatter
    val stem = fname.replaceFirst("^GR--\\d{8}T\\d{6}--", "")
    def micros(dt: LocalDateTime) = dt.toInstant(ZoneOffset.UTC).toEpochMilli * 1000L
    val iso = "(\\d{4}-\\d{2}-\\d{2}T\\d{2}:\\d{2}:\\d{2})".r
    val ymdHm = "_(\\d{8}_\\d{4})".r
    val isoDate = "_(\\d{4}-\\d{2}-\\d{2})".r
    val ymd = "_(\\d{8})".r
    iso.findFirstMatchIn(stem).map(m =>
        micros(LocalDateTime.parse(m.group(1))))
      .orElse(ymdHm.findFirstMatchIn(stem).map(m =>
        micros(LocalDateTime.parse(m.group(1),
          DateTimeFormatter.ofPattern("yyyyMMdd_HHmm")))))
      .orElse(isoDate.findFirstMatchIn(stem).map(m =>
        micros(LocalDate.parse(m.group(1)).atStartOfDay())))
      .orElse(ymd.findFirstMatchIn(stem).map(m =>
        micros(LocalDate.parse(m.group(1),
          DateTimeFormatter.ofPattern("yyyyMMdd")).atStartOfDay())))
  }
}

class GeoRasterTable(path: String, tableSchema: StructType = GeoRasterSource.schema)
    extends Table with SupportsRead with SupportsWrite {
  require(path != null, "georaster requires a path: spark.read.format(\"georaster\").load(dir)")
  // the name must survive Spark's identifier quoting (it appears in
  // error messages via toSQLId) — parens after a backtick-quoted part
  // make the reporter itself throw
  override def name(): String = s"georaster $path"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    // supportsExternalMetadata exists for the WRITE side's subset
    // schema; on the read side a user-specified schema would flow in
    // unchecked and the partition reader has no decoder for unknown or
    // retyped columns — reject at plan time instead of a per-row
    // MatchError in executors
    tableSchema.fields.foreach { f =>
      require(GeoRasterSource.schema.fields.exists(g =>
        g.name == f.name && g.dataType == f.dataType),
        s"georaster read does not support a user-specified schema " +
          s"(column '${f.name}: ${f.dataType.simpleString}' is not in the source schema)")
    }
    new GeoRasterScanBuilder(path, options.getBoolean("ignorecorrupt", false))
  }
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder =
    new GeoRasterWriteBuilder(path, info)
}

class GeoRasterScanBuilder(path: String, ignoreCorrupt: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = GeoRasterSource.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    // empty prune (e.g. count(*)) still decodes rows — keep one cheap col
    required = if (requiredSchema.isEmpty)
      StructType(GeoRasterSource.schema.take(2)) else requiredSchema
  override def build(): Scan = new GeoRasterScan(path, required, ignoreCorrupt)
}

class GeoRasterScan(path: String, required: StructType,
                    ignoreCorrupt: Boolean = false) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    GeoRasterScan.listFiles(path).map(f => GeoRasterPartition(f): InputPartition)
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoRasterReaderFactory(required.fieldNames, ignoreCorrupt)
  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new GeoRasterMicroBatchStream(path, required.fieldNames, ignoreCorrupt)
}

object GeoRasterScan {
  def listFiles(path: String): Array[String] = {
    // dot-anchored so "x.gtif" / "data.func" don't reach the sniffer;
    // .grb2/.grib are the NCEP feed spellings of GRIB2
    val exts = Seq(".tif", ".tiff", ".grib2", ".grb2", ".grib", ".nc")
    val dir = new java.io.File(path)
    val files =
      if (dir.isFile) Array(dir)
      else Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isFile && exts.exists(f.getName.endsWith(_)))
    files.map(_.getAbsolutePath).sorted
  }
}

/** Streaming twin: the drop-zone as a MicroBatchStream. The offset is
  * the sorted set of file names seen — each trigger's batch is the
  * listing diff, so every dropped granule is processed exactly once
  * (same contract as Spark's own FileStreamSource, minimal form). */
case class GeoRasterOffset(files: Seq[String]) extends Offset {
  // base64 per path (marked "b64:"): the offset round-trips ANY byte
  // sequence in a file name (embedded quotes, '","', newlines)
  // without needing a real JSON parser on recovery — the base64
  // alphabet contains no quote or comma, so the array splits
  // unambiguously. The marker lets recovery distinguish this format
  // from checkpoints written by the older escaped-JSON encoding.
  override def json(): String =
    files.map(f => "\"b64:" + java.util.Base64.getEncoder.encodeToString(
      f.getBytes(java.nio.charset.StandardCharsets.UTF_8)) + "\"")
      .mkString("[", ",", "]")
}

class GeoRasterMicroBatchStream(path: String, fields: Array[String],
                                ignoreCorrupt: Boolean = false)
    extends MicroBatchStream {
  override def initialOffset(): Offset = GeoRasterOffset(Seq.empty)
  override def latestOffset(): Offset =
    GeoRasterOffset(GeoRasterScan.listFiles(path).toSeq)
  override def deserializeOffset(json: String): Offset = {
    val inner = json.trim.stripPrefix("[").stripSuffix("]")
    if (inner.isEmpty) GeoRasterOffset(Seq.empty)
    // anchored to the FIRST element: the writer guarantees new-format
    // payloads start with "b64:, while a legacy file name could contain
    // the escaped substring \"b64: anywhere and must not be misrouted
    else if (inner.startsWith("\"b64:"))
      GeoRasterOffset(inner.split(",").toSeq.map(s =>
        new String(
          java.util.Base64.getDecoder.decode(
            s.trim.stripPrefix("\"").stripSuffix("\"").stripPrefix("b64:")),
          java.nio.charset.StandardCharsets.UTF_8)))
    else
      // legacy checkpoint (pre-b64 escaped-JSON encoding): restarting
      // an old stream must recover its seen-file set, not crash on a
      // '.' outside the base64 alphabet or decode names to garbage
      GeoRasterOffset(inner.split("\",\"").toSeq
        .map(_.stripPrefix("\"").stripSuffix("\"")
          .replace("\\\"", "\"").replace("\\\\", "\\")))
  }
  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val seen = start.asInstanceOf[GeoRasterOffset].files.toSet
    end.asInstanceOf[GeoRasterOffset].files
      .filterNot(seen).sorted.map(f => GeoRasterPartition(f): InputPartition).toArray
  }
  override def createReaderFactory(): PartitionReaderFactory =
    new GeoRasterReaderFactory(fields, ignoreCorrupt)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class GeoRasterPartition(file: String) extends InputPartition

class GeoRasterReaderFactory(fields: Array[String],
                             ignoreCorrupt: Boolean = false)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[GeoRasterPartition].file
    new PartitionReader[InternalRow] {
      // ignoreCorrupt: an unreadable/undecodable granule yields zero
      // rows instead of failing the job (ignoreCorruptFiles semantics;
      // at fleet scale one bad object must not kill a 100 TB ingest)
      // decode ONCE; under ignoreCorrupt any read/sniff/decode failure
      // (incl. truncated payloads) downgrades to an empty granule
      private val decoded: Option[(Seq[(Int, GeoTiff.Raster, Boolean)], Option[(Array[Double], Array[Double])])] =
        try {
          val bytes = java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(file))
          Formats.sniff(bytes) match {
            case Some(d) => Some((d.decodeMultiFlagged(bytes), d.pixelLonLat(bytes)))
            case None if ignoreCorrupt => None
            case None =>
              throw new IllegalArgumentException(s"unknown format: $file")
          }
        } catch {
          case _: Exception if ignoreCorrupt => None
        }
      private val fname = file.substring(file.lastIndexOf('/') + 1)
      private val fnameU = UTF8String.fromString(fname)
      private val baseMicros = GeoRasterSource.parseTime(fname)
      private val ll = decoded.flatMap(_._2)
      private val rasters = decoded.map(_._1).getOrElse(Seq.empty).iterator
      private var step = 0
      private var r: GeoTiff.Raster = _
      private var lossy = false
      private var i = -1
      private var row: InternalRow = _

      private def emit(): InternalRow = {
        val y = i / r.width; val x = i % r.width
        val v = r.data(i)
        val vals: Array[Any] = fields.map {
          case "fname" => fnameU
          case "step" => step
          case "y" => y
          case "x" => x
          case "v" => v.toDouble
          case "lon" => ll.map(_._1(i)).getOrElse(r.west + (x + 0.5) * r.px)
          case "lat" => ll.map(_._2(i)).getOrElse(r.north - (y + 0.5) * r.py)
          case "time" => baseMicros.map(_ + step * 3600L * 1000000L).orNull
          case "lossy" => lossy
        }
        InternalRow.fromSeq(vals.toIndexedSeq)
      }

      override def next(): Boolean = {
        while (true) {
          if (r != null) {
            i += 1
            while (i < r.data.length && r.data(i).isNaN) i += 1
            if (i < r.data.length) { row = emit(); return true }
            r = null
          }
          if (!rasters.hasNext) return false
          val (s, raster, lsy) = rasters.next()
          step = s; r = raster; lossy = lsy; i = -1
        }
        false
      }
      override def get(): InternalRow = row
      override def close(): Unit = ()
    }
  }
}

/** DataSource V2 WRITE side — the COG sink as a first-class Spark
  * writer:
  *
  * {{{
  * df.repartition($"fname", $"step")        // one raster per task
  *   .write.format("georaster").mode("append")   // DSv2 path writes need append/overwrite
  *   .option("width", 64).option("height", 48)
  *   .option("west", -180.0).option("north", 90.0)
  *   .option("px", 5.625).option("py", 3.75)
  *   .save(outDir)
  * }}}
  *
  * Rows are the engine's long form (fname, step, y, x, v); each
  * (fname, step) group in a task becomes one Cloud-Optimized GeoTIFF
  * `name_sN.tif` on the fixed grid the options declare (absent pixels
  * = nodata, the write∘read-symmetric NaN). Co-locating each raster
  * group with `repartition(fname, step)` as above is part of the
  * WRITE CONTRACT: files are created exclusively so a split group
  * fails loudly on filesystems with atomic exclusive create
  * (HDFS/S3A) — on the local filesystem Hadoop's create is
  * check-then-act, so the guard is advisory there. The grid is config (one
  * collection = one grid, the engine-wide storage convention); deriving
  * it per task from the rows would make output georeferencing depend
  * on which pixels happened to survive upstream filters.
  */
class GeoRasterWriteBuilder(path: String, info: LogicalWriteInfo) extends WriteBuilder {
  override def build(): Write = new GeoRasterWrite(path, info)
}

class GeoRasterWrite(path: String, info: LogicalWriteInfo) extends Write with BatchWrite {
  private val opts = info.options
  private def reqOpt(k: String): String = {
    val v = opts.get(k)
    require(v != null, s"georaster write requires option '$k' " +
      "(width/height/west/north/px/py declare the output grid)")
    v
  }
  // resolve eagerly so a missing option fails at plan time, not in tasks
  private val geom = GeoRasterWriteGeom(
    reqOpt("width").toInt, reqOpt("height").toInt,
    reqOpt("west").toDouble, reqOpt("north").toDouble,
    reqOpt("px").toDouble, reqOpt("py").toDouble,
    Option(opts.get("dtype")).getOrElse("float32"),
    Option(opts.get("nodata")).map(_.toDouble))
  require(geom.dtype == "float32" || geom.nodata.isDefined,
    s"georaster write with dtype '${geom.dtype}' requires option 'nodata' " +
      "(absent pixels need an encodable sentinel; float32 uses NaN)")
  // schema is checked by TYPE, not just name: supportsExternalMetadata
  // means Spark ships the frame's own schema with no cast, and e.g. a
  // FloatType v read through getDouble would reinterpret raw bits into
  // garbage pixels with no error
  private val fieldIdx: Map[String, Int] = {
    val s = info.schema()
    val need = Seq("fname" -> StringType, "step" -> IntegerType,
      "y" -> IntegerType, "x" -> IntegerType, "v" -> DoubleType)
    val problems = need.flatMap { case (n, t) =>
      s.fields.find(_.name == n) match {
        case None => Some(s"missing column $n: $t")
        case Some(f) if f.dataType != t =>
          Some(s"column $n is ${f.dataType.simpleString}, need ${t.simpleString}")
        case _ => None
      }
    }
    require(problems.isEmpty,
      s"georaster write schema mismatch: ${problems.mkString("; ")}")
    need.map { case (n, _) => n -> s.fieldIndex(n) }.toMap
  }
  // the SESSION's hadoop conf (s3a credentials etc.), shipped to tasks —
  // a bare executor-side `new Configuration()` would drop every
  // spark.hadoop.* setting
  private val hadoopConf = new SerializableHadoopConf(
    org.apache.spark.sql.SparkSession.active.sparkContext.hadoopConfiguration)
  private val maxBuffered =
    Option(opts.get("maxBufferedRasters")).map(_.toInt)
      .getOrElse(GeoRasterWriter.defaultMaxBuffered(geom))
  override def toBatch: BatchWrite = this
  override def createBatchWriterFactory(pi: PhysicalWriteInfo): DataWriterFactory =
    GeoRasterWriterFactory(path, geom, fieldIdx, hadoopConf, maxBuffered)
  override def commit(messages: Array[WriterCommitMessage]): Unit = ()
  override def abort(messages: Array[WriterCommitMessage]): Unit = {
    // committed tasks' COGs must not survive a failed JOB: with the
    // exclusive-create contract, leftovers would poison every re-run
    val conf = hadoopConf.value
    messages.collect { case GeoRasterCommit(files) => files }.flatten.foreach { f =>
      val p = new org.apache.hadoop.fs.Path(f)
      try p.getFileSystem(conf).delete(p, false) catch { case _: Exception => }
    }
  }

  // streaming twin (writeStream.format("georaster")): each micro-batch
  // appends its rasters as COGs — the continuous export/serving path.
  // Exclusive creation makes a REPLAYED epoch fail loudly on the files
  // it already wrote rather than silently re-truncating them; at-least-
  // once delivery with idempotent names is the drop-zone contract the
  // ingest side already documents (keptDir semantics).
  override def toStreaming: StreamingWrite = new StreamingWrite {
    override def createStreamingWriterFactory(pi: PhysicalWriteInfo): StreamingDataWriterFactory =
      GeoRasterStreamingWriterFactory(path, geom, fieldIdx, hadoopConf)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit = ()
  }
}

/** Minimal serializable Hadoop Configuration carrier (the spark-core
  * twin is private[spark]). */
class SerializableHadoopConf(@transient var value: org.apache.hadoop.conf.Configuration)
    extends Serializable {
  private def writeObject(out: java.io.ObjectOutputStream): Unit = {
    out.defaultWriteObject()
    value.write(out)
  }
  private def readObject(in: java.io.ObjectInputStream): Unit = {
    in.defaultReadObject()
    value = new org.apache.hadoop.conf.Configuration(false)
    value.readFields(in)
  }
}

case class GeoRasterStreamingWriterFactory(path: String, geom: GeoRasterWriteGeom,
                                           fieldIdx: Map[String, Int],
                                           conf: SerializableHadoopConf)
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new GeoRasterWriter(path, geom, fieldIdx, conf)
}

case class GeoRasterWriteGeom(width: Int, height: Int, west: Double,
                              north: Double, px: Double, py: Double,
                              dtype: String, nodata: Option[Double] = None)

case class GeoRasterWriterFactory(path: String, geom: GeoRasterWriteGeom,
                                  fieldIdx: Map[String, Int],
                                  conf: SerializableHadoopConf,
                                  maxBuffered: Int = -1)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    new GeoRasterWriter(path, geom, fieldIdx, conf, maxBuffered)
}

case class GeoRasterCommit(files: Seq[String]) extends WriterCommitMessage

object GeoRasterWriter {
  /** Floor on the derived buffer cap — even for huge rasters a task
    * may legitimately hold a handful of groups at once (rows of
    * co-partitioned groups interleave within the partition). */
  val MinBufferedRasters = 64
  /** Per-task memory budget for buffered raster pixels. The cap is a
    * memory guard, so it is expressed in bytes and divided by the
    * actual raster footprint — a flat raster COUNT would reject
    * contract-following writes whenever distinct (fname, step) groups
    * exceed the partition count (hash routing then sends ~groups/
    * partitions COMPLETE groups to one task, all buffered at once
    * because their rows interleave). */
  val BufferBudgetBytes: Long = 2L << 30 // 2 GiB of floats per task
  def defaultMaxBuffered(geom: GeoRasterWriteGeom): Int = {
    val perRaster = math.max(1L, geom.width.toLong * geom.height * 4L)
    math.max(MinBufferedRasters.toLong,
      BufferBudgetBytes / perRaster).min(Int.MaxValue).toInt
  }
}

class GeoRasterWriter(path: String, geom: GeoRasterWriteGeom,
                      fieldIdx: Map[String, Int],
                      conf: SerializableHadoopConf,
                      maxBuffered: Int = -1)
    extends DataWriter[InternalRow] {
  // -1 = derive from the raster footprint (memory budget / raster bytes)
  private val capRasters =
    if (maxBuffered > 0) maxBuffered else GeoRasterWriter.defaultMaxBuffered(geom)
  private val iF = fieldIdx("fname"); private val iS = fieldIdx("step")
  private val iY = fieldIdx("y"); private val iX = fieldIdx("x")
  private val iV = fieldIdx("v")
  private val acc = scala.collection.mutable.LinkedHashMap[(String, Int), Array[Float]]()
  private val written = scala.collection.mutable.Buffer[org.apache.hadoop.fs.Path]()

  override def write(row: InternalRow): Unit = {
    require(!row.isNullAt(iF) && !row.isNullAt(iS) && !row.isNullAt(iY) &&
      !row.isNullAt(iX) && !row.isNullAt(iV),
      "georaster write rows must be non-null in fname/step/y/x/v")
    val fname = row.getUTF8String(iF).toString
    // the fname column becomes a file name INSIDE the output dir —
    // separators would let a row write outside it
    require(!fname.contains('/') && !fname.contains('\\'),
      s"fname '$fname' contains a path separator")
    val step = row.getInt(iS)
    val y = row.getInt(iY); val x = row.getInt(iX)
    require(y >= 0 && y < geom.height && x >= 0 && x < geom.width,
      s"pixel ($y, $x) outside the declared ${geom.width}x${geom.height} grid")
    // Each buffered raster is width*height floats; a repartition(fname,
    // step) write legitimately routes MANY complete groups to one task
    // (hash routing, groups > partitions), and their rows interleave, so
    // the cap is a MEMORY budget (GeoRasterWriter.BufferBudgetBytes /
    // raster bytes), not a small flat count. It still turns an
    // unbounded mis-partitioned accumulation into an immediate,
    // explained failure instead of an executor OOM.
    if (!acc.contains((fname, step)) && acc.size >= capRasters)
      throw new IllegalStateException(
        s"task buffers $capRasters rasters already (cap $capRasters, " +
          s"~${capRasters.toLong * geom.width * geom.height * 4 >> 20} MiB); " +
          "repartition the frame by (fname, step) before df.write so each " +
          "task receives complete groups, or raise the maxBufferedRasters write option")
    val arr = acc.getOrElseUpdate((fname, step),
      Array.fill(geom.width * geom.height)(Float.NaN))
    arr(y * geom.width + x) = row.getDouble(iV).toFloat
  }

  override def commit(): WriterCommitMessage = {
    val out = new org.apache.hadoop.fs.Path(path)
    val fs = out.getFileSystem(conf.value)
    fs.mkdirs(out)
    val files = acc.map { case ((fname, step), arr) =>
      val base = fname.lastIndexOf('.') match {
        case -1 => fname
        case i => fname.substring(0, i)
      }
      val p = new org.apache.hadoop.fs.Path(out, s"${base}_s$step.tif")
      val bytes = GeoTiff.writeCogAuto(Seq(arr), geom.width, geom.height,
        geom.west, geom.north, geom.px, geom.py, dtype = geom.dtype,
        nodata = geom.nodata)
      // EXCLUSIVE create: a raster split across tasks must fail loudly,
      // never silently keep whichever partial landed last. Track the
      // path BEFORE writing so a failed write's partial file is still
      // cleaned by abort (a leftover would fail every retry's create).
      val os = fs.create(p, false)
      written += p
      try os.write(bytes) finally os.close()
      p.toString
    }.toSeq
    GeoRasterCommit(files)
  }

  override def abort(): Unit =
    written.foreach { p =>
      try p.getFileSystem(conf.value).delete(p, false) catch { case _: Exception => }
    }

  override def close(): Unit = ()
}
