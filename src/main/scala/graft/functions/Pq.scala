package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Nearest product-quantization codebook entry for one (m, subvector)
  * row: argmin over the m-th codebook of exact integer squared-L2,
  * ties to the smaller cid — one compiled loop per row over the
  * driver-embedded codebook (m·k·subDim longs, config-scale), instead
  * of k interpreted `aggregate(zip_with(...))` lambdas per row and a
  * CASE tree the optimizer has to plan every training round.
  *
  * ‖sv−c‖² = ‖sv‖² + ‖c‖² − 2·sv·c and ‖sv‖² is constant within a row,
  * so the loop ranks by `cnrm2 − 2·dot` — identical ordering, half the
  * arithmetic. All Long math: exact, engine-independent.
  *
  * codebook(m) = (cid, centroid, cnrm2) triples sorted by cid.
  */
case class PqNearestCode(left: Expression, right: Expression,
    codebook: Array[Array[(Int, Array[Long], Long)]])
    extends BinaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "pq_nearest_code"

  override def nullSafeEval(mAny: Any, svAny: Any): Any = {
    val m = mAny.asInstanceOf[Int]
    val arr = svAny.asInstanceOf[ArrayData]
    val cents = codebook(m)
    val len = arr.numElements()
    var bestScore = Long.MaxValue
    var bestCid = Int.MaxValue
    var c = 0
    while (c < cents.length) {
      val (cid, cq, cn) = cents(c)
      var dot = 0L
      var i = 0
      while (i < len) {
        dot += arr.getLong(i) * cq(i)
        i += 1
      }
      val score = cn - 2L * dot
      if (score < bestScore || (score == bestScore && cid < bestCid)) {
        bestScore = score
        bestCid = cid
      }
      c += 1
    }
    bestCid
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object PqNearestCode {
  def apply(m: Column, sv: Column,
      codebook: Array[Array[(Int, Array[Long], Long)]]): Column =
    GraftShim.column(PqNearestCode(GraftShim.expression(m),
      GraftShim.expression(sv), codebook))
}
