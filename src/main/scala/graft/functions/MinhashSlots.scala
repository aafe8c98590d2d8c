package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Per-document MinHash signature in ONE compiled pass: for every
  * n-token window of `tokens`, md5 the window text ("tok1 tok2 … tokn",
  * the [[SpanHashWindows]] digest walk, plus a '~'-salted second
  * digest) and fold the running minimum of the 8 disjoint 31-BIT slot
  * fields (slots 1-4 from md5(window) hex chars 1-8/9-16/17-24/25-32,
  * slots 5-8 the same fields of md5(window || '~'), each & 0x7fffffff
  * so a 2-slot band key packs one NON-NEGATIVE long). Returns the 8
  * slot minima as array<int>, or an EMPTY array when the document has
  * fewer than n tokens (no shingles → no signature row downstream).
  *
  * Equivalence to the relational form
  * (`Dedup.minhashSignature(Dedup.shingles(docs))`): min is idempotent,
  * so the minimum over ALL window positions equals the minimum over the
  * DISTINCT shingle set — the explode, the distinct exchange and the
  * per-doc aggregation exchange all collapse into this map-side
  * projection while producing bit-identical signatures (the SQL
  * oracles read the same substring fields). MinhashSlotsSpec pins the
  * parity.
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
    // 31-BIT slot fields (8 hex chars & 0x7fffffff): slots 1-4 from
    // md5(window), 5-8 from md5(window || '~'). 16-bit fields were a
    // measured scale defect — min-of-~80 concentrates each slot into a
    // ~2^10 effective range, so 2-slot band keys collide at random past
    // ~10^6 docs and the LSH candidate set grows quadratically
    // (SoakPipelineScale 5M: 16.2M candidate pairs, 97% noise). The
    // mask keeps band keys non-negative when two slots pack one long.
    SpanHashWindows.eachWindowDigest2(arr, n) { (_, dA, dB) =>
      var x = 0
      while (x < 4) {
        val vA = (((dA(4 * x) & 0xff) << 24) | ((dA(4 * x + 1) & 0xff) << 16) |
          ((dA(4 * x + 2) & 0xff) << 8) | (dA(4 * x + 3) & 0xff)) & 0x7fffffff
        if (vA < mins(x)) mins(x) = vA
        val vB = (((dB(4 * x) & 0xff) << 24) | ((dB(4 * x + 1) & 0xff) << 16) |
          ((dB(4 * x + 2) & 0xff) << 8) | (dB(4 * x + 3) & 0xff)) & 0x7fffffff
        if (vB < mins(4 + x)) mins(4 + x) = vB
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
