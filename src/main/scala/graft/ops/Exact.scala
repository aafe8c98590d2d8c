package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Numeric discipline for cross-engine deterministic results.
  *
  * Floating-point summation is order-dependent, and Spark's partial/final
  * aggregation visits rows in a different order than a single-node engine.
  * To make aggregate results bit-identical across engines (required by the
  * hash-matching correctness gate, and good practice for reproducible
  * pipelines at any scale) we aggregate *exact integers*:
  *
  *  - values that are integer-valued doubles (e.g. quantities) sum exactly
  *    in IEEE double regardless of order;
  *  - arbitrary doubles are scaled by a power of ten and floored
  *    (`floor` is exact and identical in every IEEE implementation),
  *    summed as longs, and descaled once at the end (one float op, same
  *    instruction sequence in every engine).
  *
  * Variance/stddev are derived from exact integer power sums so the only
  * inexact steps are the final few arithmetic ops + sqrt (IEEE
  * correctly-rounded, hence deterministic).
  */
object Exact {

  /** Exact scaled-integer view of a double column: floor(x * 10^scale). */
  def scaled(c: Column, scale: Int): Column =
    floor(c * pow10(scale)).cast("long")

  private def pow10(n: Int): Double = math.pow(10.0, n.toDouble)

  /** Sum of an arbitrary double column, deterministic via floor-scaling. */
  def sumScaled(c: Column, scale: Int): Column =
    (sum(scaled(c, scale)).cast("double") / pow10(scale))

  /** Mean via exact integer sum / count. */
  def avgScaled(c: Column, scale: Int): Column =
    (sum(scaled(c, scale)).cast("double") / pow10(scale)) / count(c).cast("double")

  /** Population stddev of the *scaled-integer* view of c, deterministic.
    * std = sqrt(n*Σx² − (Σx)²) / n, computed on exact integer sums.
    * Descaled back to the original units.
    */
  def stddevPopScaled(c: Column, scale: Int): Column = {
    val x = scaled(c, scale)
    val n = count(c).cast("double")
    val s1 = sum(x).cast("double")
    val s2 = sum(x * x).cast("double")
    sqrt((n * s2 - s1 * s1)) / n / pow10(scale)
  }

  /** Population stddev for integer-valued columns (already exact). */
  def stddevPopExact(c: Column): Column = {
    val x = c.cast("long")
    val n = count(c).cast("double")
    val s1 = sum(x).cast("double")
    val s2 = sum(x * x).cast("double")
    sqrt((n * s2 - s1 * s1)) / n
  }
}
