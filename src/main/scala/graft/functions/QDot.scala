package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Exact integer dot product of two quantized vectors — the inner loop
  * of every cosine in the similarity family (SemDeDup's within-cluster
  * verification, LSH near-dup, IVF/PQ scoring, centroid assignment).
  *
  * The composed form `aggregate(zip_with(a, b, (x,y) -> x*y), 0L, …)`
  * allocates the zipped array per evaluation and runs the lambda chain
  * through the interpreted higher-order-function path; at 2×10⁶
  * candidate pairs × 64 dims per sf0.1 semdedup run that allocation is
  * the dominant cost (measured 2.5 s → see SCALE round-7). This kernel
  * is one fused loop over the two ArrayData buffers — no intermediate
  * array, whole-stage-codegen friendly via the static-kernel call, and
  * BIT-IDENTICAL to the composed form: long multiply-add in index
  * order, null element or length mismatch → NULL (exactly zip_with's
  * null-padding followed by a null-absorbing sum).
  */
case class QDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"q_dot needs two ARRAY<BIGINT> inputs, got ${left.dataType} / ${right.dataType}")
    }
  }
  override def nullable: Boolean = true
  override def prettyName: String = "q_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    QDotProduct.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      // fresh name per call site: k q_dot expressions can share ONE
      // codegen scope (assignNearest's array_min over k centroids), and
      // a fixed local would redefine -> janino error -> silent
      // interpreted fallback of exactly this hot kernel
      val r = ctx.freshName("qdot")
      s"""Object $r = graft.functions.QDotProduct.dot($a, $b);
         |if ($r == null) { ${ev.isNull} = true; } else { ${ev.value} = ((Long) $r).longValue(); }
         |""".stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object QDotProduct {
  /** Static kernel shared by interpreted + generated paths. Returns
    * null (boxed) on length mismatch or a null element — the composed
    * form's zip_with null-padding + null-absorbing aggregate. */
  def dot(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var acc = 0L
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      acc += a.getLong(i) * b.getLong(i)
      i += 1
    }
    java.lang.Long.valueOf(acc)
  }
}
