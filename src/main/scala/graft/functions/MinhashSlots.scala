package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Per-document MinHash signature in ONE compiled pass: for every
  * n-token window of `tokens`, md5 the window text ("tok1 tok2 … tokn",
  * the [[SpanHashWindows]] digest walk) and fold the running minimum of
  * each of the 8 disjoint 16-bit digest fields. Returns the 8 slot
  * minima as array<int>, or an EMPTY array when the document has fewer
  * than n tokens (no shingles → no signature row downstream).
  *
  * Equivalence to the relational form
  * (`Dedup.minhashSignature(Dedup.shingles(docs))`): min is idempotent,
  * so the minimum over ALL window positions equals the minimum over the
  * DISTINCT shingle set — the explode, the distinct exchange and the
  * per-doc aggregation exchange all collapse into this map-side
  * projection while producing bit-identical signatures (slot x is the
  * integer value of md5 hex chars 4x−3..4x, the same 16-bit field the
  * SQL oracles read). MinhashSlotsSpec pins the parity.
  */
case class MinhashSlots(tokens: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = width
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def checkInputDataTypes() = {
    val ok = tokens.dataType.isInstanceOf[ArrayType] &&
      tokens.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      width.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"minhash_slots expects (array<string>, int), got " +
        s"(${tokens.dataType.simpleString}, ${width.dataType.simpleString})")
  }

  override protected def nullSafeEval(arr: Any, w: Any): Any =
    MinhashSlots.slots(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, w) =>
      s"${ev.value} = graft.functions.MinhashSlots.slots($arr, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, width = newRight)

  override def prettyName: String = "minhash_slots"
}

object MinhashSlots {
  final val K = 8

  def slots(arr: ArrayData, n: Int): ArrayData = {
    val count = arr.numElements()
    if (n <= 0 || count < n) return new GenericArrayData(new Array[Int](0))
    val mins = Array.fill(K)(Int.MaxValue)
    SpanHashWindows.eachWindowDigestShared(arr, n) { (_, d) =>
      var x = 0
      while (x < K) {
        val v = ((d(2 * x) & 0xff) << 8) | (d(2 * x + 1) & 0xff)
        if (v < mins(x)) mins(x) = v
        x += 1
      }
    }
    new GenericArrayData(mins)
  }

  /** Column API: 8 minhash slot minima over n-token windows. */
  def minhashSlots(tokens: Column, n: Int): Column =
    GraftShim.column(MinhashSlots(GraftShim.expression(tokens),
      GraftShim.expression(org.apache.spark.sql.functions.lit(n))))
}
