package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Random-hyperplane LSH bucket: nPlanes sign-projections of a quantized
  * integer vector, folded into one nPlanes-bit bucket — a single compiled
  * loop per row, no explode, no shuffle, no per-row hashing.
  *
  * The sign table is tiny ((plane × dim) entries, packed one bitmask per
  * dim) and deterministic — md5-derived exactly like the former SQL
  * formulation, so DuckDB oracles reproduce it independently — and ships
  * WITH the expression to every executor; the projections that used to
  * need a 512× posexplode plus two shuffling groupBys (5×10^11 md5 calls
  * at 10^9 vectors) are now map-side arithmetic.
  *
  * Bit p of `signs(i)` set ⇔ plane p weights dimension i with +1 (else
  * −1); bit p of the result set ⇔ projection p is ≥ 0.
  */
case class HyperplaneBucket(child: Expression, signs: Array[Int], nPlanes: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "hyperplane_bucket"

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val len = arr.numElements()
    require(len <= signs.length,
      s"vector has $len dims but the sign table covers ${signs.length}")
    val proj = new Array[Long](nPlanes)
    var i = 0
    while (i < len) {
      if (!arr.isNullAt(i)) {
        val v = arr.getLong(i)
        val s = signs(i)
        var p = 0
        while (p < nPlanes) {
          proj(p) += (if (((s >> p) & 1) != 0) v else -v)
          p += 1
        }
      }
      i += 1
    }
    var bucket = 0L
    var p = 0
    while (p < nPlanes) {
      if (proj(p) >= 0) bucket |= 1L << p
      p += 1
    }
    bucket
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBucket {

  /** Per-dim sign bitmask: bit p set ⇔ first hex char of md5("p_i") is in
    * '0'..'7' (i.e. the top nibble < 8) — the same convention the DuckDB
    * oracle derives with its own md5, so both engines agree on every sign
    * without any shared random state. */
  def signTable(nPlanes: Int, nDims: Int): Array[Int] = {
    require(nPlanes <= 32, "sign bitmask is an Int")
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(nDims) { i =>
      var bits = 0
      var p = 0
      while (p < nPlanes) {
        md.reset()
        val d = md.digest(s"${p}_$i".getBytes("UTF-8"))
        if ((d(0) & 0x80) == 0) bits |= 1 << p
        p += 1
      }
      bits
    }
  }

  def apply(vec: Column, nPlanes: Int, nDims: Int): Column =
    GraftShim.column(HyperplaneBucket(GraftShim.expression(vec),
      signTable(nPlanes, nDims), nPlanes))
}
