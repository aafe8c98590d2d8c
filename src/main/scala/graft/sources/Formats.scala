package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Format plugin registry + ingest chipper (SURVEY S1–S4).
  *
  * Decoders are sniffed by magic bytes exactly like the reference's
  * registry (`II/MM` TIFF, `GRIB`, `CDF`/`\x89HDF` — formats/registry.py;
  * geotiff.py:43-52, grib.py:66-74, netcdf.py:38-47). GeoTIFF and GRIB2
  * (simple packing) decode natively (GeoTiff.scala, Grib2.scala);
  * NetCDF has no JVM decoder in this container, so its plugin is
  * declared-but-unavailable: sniffing identifies it and ingest surfaces
  * a clear error instead of garbage (SURVEY §7.3 — the trait stays
  * open for a NetCDF-Java drop-in).
  */
object Formats {

  sealed trait Decoder {
    def name: String
    def canHandle(bytes: Array[Byte]): Boolean
    /** Decode to long-form pixels (y, x, v) + georeferencing. */
    def decode(bytes: Array[Byte]): GeoTiff.Raster
  }

  object GeoTiffDecoder extends Decoder {
    val name = "geotiff"
    def canHandle(b: Array[Byte]) = GeoTiff.canHandle(b)
    def decode(b: Array[Byte]) = GeoTiff.read(b)
  }

  object Grib2Decoder extends Decoder {
    val name = "grib2"
    def canHandle(b: Array[Byte]) = Grib2.canHandle(b)
    def decode(b: Array[Byte]) = Grib2.read(b).raster
  }

  object NetCdfDecoder extends Decoder {
    val name = "netcdf"
    def canHandle(b: Array[Byte]) =
      (b.length >= 3 && b(0) == 'C' && b(1) == 'D' && b(2) == 'F') ||
        (b.length >= 4 && (b(0) & 0xff) == 0x89 && b(1) == 'H' && b(2) == 'D' && b(3) == 'F')
    def decode(b: Array[Byte]) =
      throw new UnsupportedOperationException(
        "netcdf: no JVM decoder available; convert to GeoTIFF/parquet upstream")
  }

  val registry: Seq[Decoder] = Seq(GeoTiffDecoder, Grib2Decoder, NetCdfDecoder)

  def sniff(bytes: Array[Byte]): Option[Decoder] = registry.find(_.canHandle(bytes))

  /** Batch ingest: read every raster file under `dir` via binaryFile,
    * decode partition-wise (the chipper), explode to long-form pixels
    * with filename-derived time. NaN → NULL at the decode boundary
    * (the engine's nodata discipline, SURVEY §7.3). */
  def ingestDir(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val bin = spark.read.format("binaryFile")
      .option("pathGlobFilter", "*.{tif,grib2}").load(dir)
      .select(col("path"), col("content"))
    val pixels = bin.as[(String, Array[Byte])].mapPartitions { it =>
      it.flatMap { case (path, bytes) =>
        val dec = sniff(bytes).getOrElse(
          throw new IllegalArgumentException(s"unknown format: $path"))
        val r = dec.decode(bytes)
        val fname = path.substring(path.lastIndexOf('/') + 1)
        // geo coords at pixel CENTERS — the engine-wide convention
        // (reference: virtual_zarr.py:326-344 affine at centers)
        for {
          y <- 0 until r.height; x <- 0 until r.width
          v = r.data(y * r.width + x) if !v.isNaN
        } yield (fname, y, x, v.toDouble,
          r.west + (x + 0.5) * r.px, r.north - (y + 0.5) * r.py)
      }
    }.toDF("fname", "y", "x", "v", "lon", "lat")
    pixels.withColumn("time",
      graft.streaming.IngestStream.extractTime(col("fname")))
  }
}
