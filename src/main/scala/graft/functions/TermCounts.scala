package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Per-document term frequencies in ONE compiled pass:
  * `term_counts(words)` returns `array<struct<term, tf>>` — the
  * distinct terms of the row's own token array with their counts,
  * sorted by term for determinism.
  *
  * This makes the tf stage of TF-IDF a map-side PROJECTION: each
  * document's words already live in its own row, so the textbook
  * explode → groupBy(doc, word) form pays a corpus-sized shuffle for
  * counts that never needed to leave the row. With tf doc-local, the
  * only exchanges left in tf·idf are vocabulary-sized (df) and
  * result-sized (per-doc top-k partials) — the right shape at any
  * corpus scale.
  */
case class TermCounts(tokens: Expression) extends UnaryExpression {

  override def child: Expression = tokens
  override def dataType: DataType = TermCounts.OutType
  override def checkInputDataTypes() = {
    val ok = tokens.dataType.isInstanceOf[ArrayType] &&
      tokens.dataType.asInstanceOf[ArrayType].elementType == StringType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"term_counts expects array<string>, got ${tokens.dataType.simpleString}")
  }

  override protected def nullSafeEval(arr: Any): Any =
    TermCounts.counts(arr.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.TermCounts.counts($arr);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(tokens = newChild)

  override def prettyName: String = "term_counts"
}

object TermCounts {
  val OutType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false))), containsNull = false)

  def counts(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val m = new java.util.TreeMap[UTF8String, Long]()
    var i = 0
    while (i < n) {
      val w = arr.getUTF8String(i)
      if (w != null) m.merge(w, 1L, (a, b) => a + b)
      i += 1
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      out(j) = new GenericInternalRow(Array[Any](e.getKey, e.getValue))
      j += 1
    }
    new GenericArrayData(out)
  }

  /** Column API: distinct (term, tf) pairs of the row's token array. */
  def termCounts(tokens: Column): Column =
    GraftShim.column(TermCounts(GraftShim.expression(tokens)))
}
