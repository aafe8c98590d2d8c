package graft.grid

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton (Z-order) keys for 2-D tile clustering.
  *
  * `GridStore.write` sorts rows within a partition by (tile_y, tile_x)
  * — lexicographic order is 1-D-selective: a bbox read prunes parquet
  * row groups well on tile_y but, inside every selected y-run, the
  * tile_x min/max of each row group spans the whole x range, so the x
  * predicate prunes nothing. Interleaving the coordinate bits makes
  * every row group cover a compact square-ish region, so BOTH
  * predicates prune (the technique behind Delta's OPTIMIZE ZORDER and
  * the reference's implicit reliance on PostGIS GiST locality —
  * `georiva` delegates spatial selectivity to index scans; a columnar
  * store gets the same effect from layout + min/max statistics).
  *
  * Built entirely from codegen'd built-in expressions (shifts + masks)
  * — no UDF, no custom Expression needed; stays inside whole-stage
  * codegen. Inputs must be non-negative 31-bit ints (tile indices are
  * by construction): coordinate bit 30 lands at key bit 61, so keys
  * are always positive longs and signed ordering equals unsigned.
  */
object ZOrder {
  private val steps = Seq(
    16 -> 0x0000FFFF0000FFFFL,
    8 -> 0x00FF00FF00FF00FFL,
    4 -> 0x0F0F0F0F0F0F0F0FL,
    2 -> 0x3333333333333333L,
    1 -> 0x5555555555555555L)

  /** Spread the low 32 bits of `v` to the even bit positions. */
  private def spread(v: Column): Column =
    steps.foldLeft(v) { case (c, (sh, mask)) =>
      c.bitwiseOR(shiftleft(c, sh)).bitwiseAND(lit(mask))
    }

  /** Interleaved key: y bits at odd positions, x bits at even. Out-of-
    * domain coordinates fail LOUDLY (like [[zkeyRef]]) — a silently
    * garbled key would scramble the clustering with no symptom beyond
    * quietly lost pruning. */
  def zkey(y: Column, x: Column): Column =
    when(y >= 0 && x >= 0,
      shiftleft(spread(y.cast("long")), 1)
        .bitwiseOR(spread(x.cast("long"))))
      .otherwise(raise_error(concat(
        lit("z-order coords must be non-negative: ("),
        y.cast("string"), lit(", "), x.cast("string"), lit(")")))
        .cast("long"))

  /** Reference implementation for specs and driver-side callers. */
  def zkeyRef(y: Int, x: Int): Long = {
    require(y >= 0 && x >= 0, s"z-order coords must be non-negative: ($y, $x)")
    def sp(v0: Long): Long =
      steps.foldLeft(v0) { case (v, (sh, mask)) => (v | (v << sh)) & mask }
    (sp(y.toLong) << 1) | sp(x.toLong)
  }
}
