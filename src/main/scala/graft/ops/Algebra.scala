package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Pure elementwise operator library — the engine's equivalent of the
  * reference's `geoprocessing/algebra.py` + `ingestion/extractor.py` +
  * `ingestion/utils.py` scalar surface (SURVEY §2.8). All functions are
  * Column expressions (whole-stage-codegen friendly, no UDFs).
  */
object Algebra {

  /** safe_divide: a/b with zero/NULL denominator → NULL (the engine's
    * NULL plays the reference's NaN nodata role).
    * Ref: geoprocessing/algebra.py:16-30. */
  def safeDivide(a: Column, b: Column): Column =
    when(b === 0 || b.isNull, lit(null)).otherwise(a / b)

  /** Wind-speed magnitude from u/v components.
    * Ref: ingestion/extractor.py:203-218. sqrt(u²+v²) rather than
    * hypot(): identical except at overflow extremes, and IEEE
    * correctly-rounded hence bit-deterministic across engines. */
  def vectorMagnitude(u: Column, v: Column): Column =
    sqrt(u * u + v * v)

  /** Meteorological from-direction in degrees [0, 360).
    * Ref: ingestion/extractor.py:220-237. */
  def vectorDirection(u: Column, v: Column): Column =
    pmod(degrees(atan2(u, v)) + 180.0, lit(360.0))

  /** Unit conversion as affine transform; multiplicative units have
    * offset 0, offset units (K→°C) use factor 1 / offset −273.15.
    * Ref: ingestion/utils.py:11-15. */
  def convertUnits(v: Column, factor: Double, offset: Double): Column =
    v * factor + offset

  /** Clamp + linear rescale to the 0..255 encoded-texture byte.
    * floor(x + 0.5) instead of round(): deterministic on the binary
    * double value in every engine (Spark's round() works on the decimal
    * string representation and can disagree with C engines at
    * apparent-tie values). Ref: titiler-app/app/main.py:96-110. */
  def rescaleEncode(v: Column, vmin: Double, vmax: Double): Column =
    floor((least(greatest(v, lit(vmin)), lit(vmax)) - vmin) / (vmax - vmin) * 255.0 + 0.5)
      .cast("int")

  /** Normalize longitudes 0..360 → −180..180 and clamp latitudes to
    * valid WGS84. Ref: ingestion/utils.py:33-54. */
  def normalizeLon(lon: Column): Column =
    pmod(lon + 180.0, lit(360.0)) - 180.0
  def clampLat(lat: Column): Column =
    least(greatest(lat, lit(-90.0)), lit(90.0))

  /** Calendar slot-of-year keys (SURVEY F10; docs/adr/0007):
    * month 1..12, dekad 1..36, pentad 1..72. */
  def monthSlot(ts: Column): Column = month(ts).cast("int")
  def dekadSlot(ts: Column): Column =
    ((month(ts) - 1) * 3 + least(lit(2), floor((dayofmonth(ts) - 1) / 10)) + 1).cast("int")
  def pentadSlot(ts: Column): Column =
    ((month(ts) - 1) * 6 + least(lit(5), floor((dayofmonth(ts) - 1) / 5)) + 1).cast("int")

  /** Content/identity hashing (SURVEY F11): sha256 over the sorted,
    * pipe-joined member checksums — the reference's recipe input_hash.
    * The collection feeding this MUST be bounded
    * ([[graft.functions.BoundedDigest.boundedSortedJoin]] does both
    * steps with an O(cap) buffer) — never sort_array(collect_list),
    * whose aggregation buffer is unbounded by construction.
    * Ref: processing/recipe.py:28-42. */
  def inputHash(checksums: Column): Column =
    sha2(graft.functions.BoundedDigest.boundedSortedJoin(checksums), 256)
}
