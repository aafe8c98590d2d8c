package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format plugin registry + ingest chipper (SURVEY S1–S4).
  *
  * Decoders are sniffed by magic bytes exactly like the reference's
  * registry (`II/MM` TIFF, `GRIB`, `CDF`/`\x89HDF` — formats/registry.py;
  * geotiff.py:43-52, grib.py:66-74, netcdf.py:38-47). All three decode
  * natively: GeoTIFF (GeoTiff.scala), GRIB2 simple/complex packing
  * (Grib2.scala), and NetCDF in both the classic CDF-1 layout and the
  * NetCDF-4/HDF5 container (NetCdf.scala + Hdf5.scala).
  */
object Formats {

  sealed trait Decoder {
    def name: String
    def canHandle(bytes: Array[Byte]): Boolean
    /** Decode to long-form pixels (y, x, v) + georeferencing. */
    def decode(bytes: Array[Byte]): GeoTiff.Raster
    /** Multi-timestep formats explode to (timestep index, raster);
      * single-granule formats yield one entry. */
    def decodeMulti(bytes: Array[Byte]): Seq[(Int, GeoTiff.Raster)] =
      Seq(0 -> decode(bytes))
    /** Like [[decodeMulti]] plus a per-message LOSSY flag: true when
      * the values are an approximate reconstruction (GRIB2 5.40
      * compression type 1, irreversible 9/7) rather than the
      * producer's exact scaled integers. Ingest carries it as a
      * column so exactness-sensitive consumers can filter. */
    def decodeMultiFlagged(bytes: Array[Byte]): Seq[(Int, GeoTiff.Raster, Boolean)] =
      decodeMulti(bytes).map { case (s, r) => (s, r, false) }
    /** Per-file variable discovery (formats/base.py:108-131): GeoTIFF
      * bands are `band_N`, GRIB2 keys are the (discipline, category,
      * parameter) VariableKey, NetCDF uses the variable name. */
    def listVariables(bytes: Array[Byte]): Seq[String] = Seq("band_1")
    /** Exact per-pixel (lon, lat), row-major, for non-affine
      * (curvilinear) grids; None for affine formats. */
    def pixelLonLat(bytes: Array[Byte]): Option[(Array[Double], Array[Double])] = None
    /** Directory-context variants: formats whose granules reference
      * SIBLING files (HDF5 cross-file virtual datasets) resolve them
      * through `siblings`; every other format ignores it. The ingest
      * paths call these with a resolver rooted at the granule's own
      * directory ([[Formats.siblingsOf]]). */
    def decodeMultiFlagged(bytes: Array[Byte], siblings: Option[Hdf5.Siblings])
        : Seq[(Int, GeoTiff.Raster, Boolean)] = decodeMultiFlagged(bytes)
    def listVariables(bytes: Array[Byte], siblings: Option[Hdf5.Siblings]): Seq[String] =
      listVariables(bytes)
    def pixelLonLat(bytes: Array[Byte], siblings: Option[Hdf5.Siblings])
        : Option[(Array[Double], Array[Double])] = pixelLonLat(bytes)
  }

  /** Sibling resolver rooted at `path`'s directory, for granule
    * formats that reference other files (HDF5 cross-file VDS). Source
    * names may carry subdirectory components but must stay INSIDE the
    * granule's directory — a mapping string is untrusted file content,
    * and without the guard a crafted granule could read any file the
    * executor can (`/etc/...`, credentials) into pixel values. Absent
    * files resolve to None (dangling mapping → fill value). */
  def siblingsOf(path: String): Hdf5.Siblings = { name =>
    require(name.nonEmpty && !name.startsWith("/") && !name.contains('\\') &&
      !name.contains(':') && !name.split('/').contains("..") &&
      !name.split('/').contains(""),
      s"virtual mapping source '$name' escapes the granule directory")
    // the resolver probes the LOCAL filesystem; on a remote scheme a
    // silent miss would fill every member's region with the fill
    // value (total data loss with zero errors), so refuse loudly —
    // absent-member semantics only apply where absence is knowable
    val scheme = "^([A-Za-z][A-Za-z0-9+.-]*):".r.findFirstMatchIn(path).map(_.group(1))
    require(scheme.forall(_ == "file"),
      s"sibling resolution (cross-file VDS / external links) supports " +
        s"local paths only; granule arrived from '$path' — copy the " +
        "granule directory to local/attached storage for ingest")
    // binaryFile's `path` is a URI string: percent-encoded characters
    // (spaces etc.) must be decoded before probing the local
    // filesystem, or a granule in such a directory would resolve no
    // members and silently produce an all-fill cube — the exact
    // silent-loss mode the remote-scheme guard above exists to prevent
    val local =
      if (scheme.isDefined)
        try new java.net.URI(path).getPath
        catch { case _: java.net.URISyntaxException => path.stripPrefix("file:") }
      else path // plain filesystem path, not URI-encoded
    val dir = local.substring(0, local.lastIndexOf('/') + 1)
    val p = java.nio.file.Paths.get(dir + name)
    if (java.nio.file.Files.isRegularFile(p) && java.nio.file.Files.isReadable(p))
      Some(ByteIn.fromPath(dir + name))
    else if (java.nio.file.Files.exists(p))
      // present-but-unreadable is an environment fault, not a dangling
      // mapping — filling its region would be silent data loss
      throw new IllegalStateException(
        s"virtual mapping member '$name' exists at '$p' but is not a " +
          "readable regular file; refusing to treat it as absent (fill)")
    else None
  }

  object GeoTiffDecoder extends Decoder {
    val name = "geotiff"
    def canHandle(b: Array[Byte]) = GeoTiff.canHandle(b)
    def decode(b: Array[Byte]) = GeoTiff.read(b)
    /** `band_N` discovery over the file's SamplesPerPixel
      * (formats/geotiff.py:58-94). */
    override def listVariables(b: Array[Byte]): Seq[String] =
      (1 to GeoTiff.bandCount(b)).map(i => s"band_$i")
  }

  /** GRIB (either edition) legally allows each message its own grid
    * definition, but the ingest flatMap pairs ONE lon/lat array set
    * (from the first message) with EVERY message's pixels — a
    * mixed-grid file would silently mis-georeference later messages.
    * Fail loudly instead; shared by both edition decoders so the
    * invariant cannot drift. */
  private def requireOneGrid(ms: Seq[Grib2.Message]): Seq[Grib2.Message] = {
    val h = ms.head
    ms.zipWithIndex.foreach { case (m, i) =>
      val same = m.raster.width == h.raster.width &&
        m.raster.height == h.raster.height &&
        m.raster.west == h.raster.west && m.raster.north == h.raster.north &&
        m.raster.px == h.raster.px && m.raster.py == h.raster.py &&
        m.proj == h.proj
      require(same,
        s"message $i carries a different grid (${m.raster.width}x${m.raster.height} " +
          s"proj=${m.proj}) than message 0 (${h.raster.width}x${h.raster.height} " +
          s"proj=${h.proj}); mixed-grid GRIB files must be split before ingest")
    }
    ms
  }

  object Grib2Decoder extends Decoder {
    val name = "grib2"
    def canHandle(b: Array[Byte]) = Grib2.canHandle(b)
    def decode(b: Array[Byte]) = Grib2.read(b).raster
    /** One entry per concatenated message, indexed by forecast hour. */
    override def decodeMulti(b: Array[Byte]): Seq[(Int, GeoTiff.Raster)] =
      decodeMultiFlagged(b).map { case (s, r, _) => (s, r) }
    override def decodeMultiFlagged(b: Array[Byte]): Seq[(Int, GeoTiff.Raster, Boolean)] = {
      val ms = requireOneGrid(Grib2.readAll(b))
      // the pixel frame keys rows by (file, step) with no variant
      // column — a deterministic field and a statistical product of
      // the same parameter in one granule would merge into ONE stream
      // of silently conflicting pixels, so mixed-variant files
      // dead-letter instead (they are distinct catalog variables, see
      // Message.variant)
      val variants = ms.map(_.variant).distinct
      require(variants.size <= 1,
        "granule mixes statistical-product variants " +
          variants.sorted.map(v => if (v.isEmpty) "deterministic" else v)
            .mkString("(", ", ", ")") +
          " — one pixel stream cannot carry both")
      ms.map(m => (m.forecastHours, m.raster, m.lossy))
    }
    override def listVariables(b: Array[Byte]): Seq[String] =
      Grib2.readAll(b).map(m =>
        s"d${m.discipline}_c${m.category}_p${m.parameter}${m.variant}").distinct
    /** Projected (Lambert 3.30) grids carry exact per-pixel lon/lat —
      * the same non-affine hook curvilinear NetCDF uses; lat/lon grids
      * return None and keep the affine fast path. Multi-message files
      * must share one grid definition (enforced in decodeMulti and here),
      * so the first message's arrays serve the whole file. */
    override def pixelLonLat(b: Array[Byte]): Option[(Array[Double], Array[Double])] =
      Grib2.lonLatArrays(requireOneGrid(Grib2.readAll(b)).head)
  }

  object Grib1Decoder extends Decoder {
    val name = "grib1"
    def canHandle(b: Array[Byte]) = Grib1.canHandle(b)
    def decode(b: Array[Byte]) = Grib1.read(b).raster
    override def decodeMulti(b: Array[Byte]): Seq[(Int, GeoTiff.Raster)] =
      requireOneGrid(Grib1.readAll(b)).map(m => (m.forecastHours, m.raster))
    /** Lossy rides through: thinned-grid expansion is a resample. */
    override def decodeMultiFlagged(b: Array[Byte]): Seq[(Int, GeoTiff.Raster, Boolean)] =
      requireOneGrid(Grib1.readAll(b)).map(m => (m.forecastHours, m.raster, m.lossy))
    override def listVariables(b: Array[Byte]): Seq[String] =
      Grib1.readAll(b).map(m =>
        s"d${m.discipline}_c${m.category}_p${m.parameter}${m.variant}").distinct
    override def pixelLonLat(b: Array[Byte]): Option[(Array[Double], Array[Double])] =
      Grib2.lonLatArrays(requireOneGrid(Grib1.readAll(b)).head)
  }

  object NetCdfDecoder extends Decoder {
    val name = "netcdf"
    def canHandle(b: Array[Byte]) = NetCdf.canHandle(b) || Hdf5.canHandle(b)
    /** Spatial dims are matched by the reference's NAME SETS (y ∈
      * {latitude, lat, y}, x ∈ {longitude, lon, x} — netcdf.py:276-287),
      * not literal names; rectilinear and curvilinear both qualify. */
    private def gridVar(f: NetCdf.File): String =
      f.gridVars.headOption.map(_.name)
        .getOrElse(throw new IllegalArgumentException("no (…, y, x) variable"))
    def decode(b: Array[Byte]) = {
      val f = NetCdf.readAny(b)
      f.rasters(gridVar(f)).head._2
    }
    override def decodeMulti(b: Array[Byte]): Seq[(Int, GeoTiff.Raster)] = {
      val f = NetCdf.readAny(b)
      f.rasters(gridVar(f))
    }
    override def listVariables(b: Array[Byte]): Seq[String] = {
      val f = NetCdf.readAny(b)
      f.gridVars.map(_.name)
    }
    override def pixelLonLat(b: Array[Byte]): Option[(Array[Double], Array[Double])] = {
      val f = NetCdf.readAny(b)
      f.pixelLonLat(gridVar(f))
    }
    override def decodeMultiFlagged(b: Array[Byte], siblings: Option[Hdf5.Siblings])
        : Seq[(Int, GeoTiff.Raster, Boolean)] = {
      val f = NetCdf.readAny(b, siblings)
      f.rasters(gridVar(f)).map { case (s, r) => (s, r, false) }
    }
    override def listVariables(b: Array[Byte], siblings: Option[Hdf5.Siblings]): Seq[String] = {
      val f = NetCdf.readAny(b, siblings)
      f.gridVars.map(_.name)
    }
    override def pixelLonLat(b: Array[Byte], siblings: Option[Hdf5.Siblings])
        : Option[(Array[Double], Array[Double])] = {
      val f = NetCdf.readAny(b, siblings)
      f.pixelLonLat(gridVar(f))
    }
  }

  val registry: Seq[Decoder] =
    Seq(GeoTiffDecoder, Grib2Decoder, Grib1Decoder, NetCdfDecoder)

  def sniff(bytes: Array[Byte]): Option[Decoder] = registry.find(_.canHandle(bytes))

  /** ONE definition of a raster's long-form pixel rows — the
    * center-of-pixel affine fallback (reference:
    * virtual_zarr.py:326-344) and NaN→drop nodata discipline shared by
    * every ingest path, so the georeferencing convention cannot drift
    * between the binary-column, large-path and quarantine readers. */
  private def rasterRows(fname: String, step: Int, r: GeoTiff.Raster,
                         ll: Option[(Array[Double], Array[Double])],
                         lossy: Boolean)
      : Iterator[(String, Int, Int, Int, Double, Double, Double, Boolean)] =
    (0 until r.height).iterator.flatMap { y =>
      (0 until r.width).iterator.flatMap { x =>
        val v = r.data(y * r.width + x)
        if (v.isNaN) Iterator.empty
        else Iterator.single((fname, step, y, x, v.toDouble,
          ll.map(_._1(y * r.width + x)).getOrElse(r.west + (x + 0.5) * r.px),
          ll.map(_._2(y * r.width + x)).getOrElse(r.north - (y + 0.5) * r.py),
          lossy))
      }
    }

  /** Valid time = filename time + step hours (multi-timestep files). */
  private def withValidTime(pixels: DataFrame): DataFrame =
    pixels.withColumn("time",
      graft.streaming.IngestStream.extractTime(col("fname"))
        + make_interval(lit(0), lit(0), lit(0), lit(0), col("step")))

  /** Batch ingest: read every raster file under `dir` via binaryFile,
    * decode partition-wise (the chipper), explode to long-form pixels
    * with filename-derived time. NaN → NULL at the decode boundary
    * (the engine's nodata discipline, SURVEY §7.3). */
  def ingestDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{tif,tiff,grib2,grb2,grib,nc}").load(dir)
      .select(col("path"), col("content"))
    val pixels = bin.as[(String, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val dec = sniff(bytes).getOrElse(
          throw new IllegalArgumentException(s"unknown format: $path"))
        val fname = path.substring(path.lastIndexOf('/') + 1)
        val sib = Some(siblingsOf(path))
        // geo coords at pixel CENTERS — the engine-wide convention
        // (reference: virtual_zarr.py:326-344 affine at centers);
        // curvilinear grids carry exact per-pixel coords instead
        val ll = dec.pixelLonLat(bytes, sib)
        dec.decodeMultiFlagged(bytes, sib).iterator.flatMap {
          case (step, r, lossy) => rasterRows(fname, step, r, ll, lossy) }
      }
    }.toDF("fname", "step", "y", "x", "v", "lon", "lat", "lossy")
    withValidTime(pixels)
  }

  /** Ingest granules of ANY size — including past the 2 GiB cap of
    * Spark's binary columns and JVM byte arrays — by POSITIONAL reads:
    * file paths fan out to tasks and each task opens its granule as a
    * channel-backed page cache ([[ByteIn]]) instead of materializing
    * the file bytes. Routes TIFF/BigTIFF (multi-GiB aerial COGs) and
    * NetCDF-4/HDF5 (ERA5-class reanalysis granules); output contract
    * is [[ingestDir]]'s long-form pixel frame. The reference reaches
    * such files through rasterio/h5netcdf lazy reads
    * (formats/geotiff.py:37-94, netcdf.py:33-366). Paths must be
    * visible to executors (shared or distributed filesystem). Classic
    * CDF streams and GRIB remain binary-column-sized — their granules
    * are message-structured and stay under the cap in practice. */
  def ingestLargePaths(spark: SparkSession, paths: Seq[String]): DataFrame = {
    import spark.implicits._
    require(paths.nonEmpty, "no paths to ingest")
    val pixels = spark.createDataset(paths)
      .repartition(math.max(1, math.min(paths.size, 256)))
      .mapPartitions { it =>
        it.flatMap { path =>
          val in = ByteIn.fromPath(path)
          val fname = path.substring(path.lastIndexOf('/') + 1)
          def pixelRows(rs: Seq[(Int, GeoTiff.Raster)],
                        ll: Option[(Array[Double], Array[Double])]) =
            rs.iterator.flatMap { case (step, r) =>
              rasterRows(fname, step, r, ll, lossy = false) }
          // both decoders materialize their floats up front, so the
          // channel closes before the pixel iterator is consumed
          val head = try in.slice(0, math.min(16L, in.length).toInt)
                     catch { case e: Exception => in.close(); throw e }
          if (GeoTiff.canHandle(head)) {
            val r = try GeoTiff.readBand(in, 1, 0) finally in.close()
            pixelRows(Seq(0 -> r), None)
          } else if (Hdf5.canHandle(head)) {
            val f = try Hdf5.toNetCdf(in, Some(siblingsOf(path))) finally in.close()
            val vn = f.gridVars.headOption.map(_.name).getOrElse(
              throw new IllegalArgumentException(s"$path: no (…, y, x) variable"))
            pixelRows(f.rasters(vn), f.pixelLonLat(vn))
          } else {
            in.close()
            throw new IllegalArgumentException(
              s"$path: ingestLargePaths reads TIFF/BigTIFF and NetCDF-4/HDF5 containers")
          }
        }
      }.toDF("fname", "step", "y", "x", "v", "lon", "lat", "lossy")
    withValidTime(pixels)
  }

  /** Quarantining ingest: like [[ingestDir]], but a granule whose
    * decode fails (unsupported packing/grid template, corrupt bytes,
    * unknown format) routes to a DEAD-LETTER frame with the failure
    * reason instead of failing the whole batch — a 100-granule feed
    * with three undecodable files ingests 97 (the reference reaches
    * the same outcome by transcoding through eccodes,
    * formats/grib.py:122-230).
    *
    * Returns (pixels, deadLetters(fname, reason)). Both frames derive
    * from ONE classified decode pass; consumers reading both should
    * cache/persist the inputs or accept a second scan — decode errors
    * are deterministic, so the split is consistent either way. */
  def ingestDirQuarantine(spark: SparkSession, dir: String): (DataFrame, DataFrame) = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{tif,tiff,grib2,grb2,grib,nc}").load(dir)
      .select(col("path"), col("content"))
    // one row per pixel with err = null, or ONE row per failed granule
    // with err = reason (pixel columns null)
    val classified = bin.as[(String, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val fname = path.substring(path.lastIndexOf('/') + 1)
        try {
          val dec = sniff(bytes).getOrElse(
            throw new IllegalArgumentException(s"unknown format"))
          val sib = Some(siblingsOf(path))
          val ll = dec.pixelLonLat(bytes, sib)
          dec.decodeMultiFlagged(bytes, sib).iterator.flatMap {
            case (step, r, lossy) =>
              rasterRows(fname, step, r, ll, lossy).map(t =>
                (t._1, t._2, t._3, t._4, t._5, t._6, t._7, t._8, null: String)) }
        } catch {
          case e: Exception =>
            Seq((fname, 0, 0, 0, 0.0, 0.0, 0.0, false,
              s"${e.getClass.getSimpleName}: ${e.getMessage}"))
        }
      }
    }.toDF("fname", "step", "y", "x", "v", "lon", "lat", "lossy", "err")
    val pixels = withValidTime(classified.filter(col("err").isNull).drop("err"))
    val dead = classified.filter(col("err").isNotNull)
      .select(col("fname"), col("err").as("reason"))
    (pixels, dead)
  }
}
