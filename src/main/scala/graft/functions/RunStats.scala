package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sorted-hash run-fold kernels — the codegen upgrade of
  * `TextAnalysis.distinctCount`/`maxRunCount`, whose higher-order
  * `aggregate` folds evaluate interpreted per element (SCALE.md
  * finding #1: 2–6× constant cost on the per-document text signals).
  *
  * Semantics are identical to the composed Column forms: each element
  * hashes with xxhash64 (seed 42, Spark's `xxhash64` function; null
  * element → the seed-unchanged value, exactly like the HashExpression
  * null rule), the hash array sorts, and distinct count = boundary
  * count / max run = longest equal run. Equal hash = equal string up
  * to ~2^-65 per-pair collision odds — negligible at per-document
  * cardinalities and the same determinism class as the md5-derived
  * dedup keys elsewhere (the DuckDB oracles compute TRUE counts, so
  * the gate verifies the collision argument on every run).
  */
object RunStats {
  /** xxhash64-of-null leaves the seed unchanged. */
  private val NullHash = 42L

  private def hashOf(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) NullHash
    else {
      val s = arr.getUTF8String(i)
      XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
    }

  /** (n_distinct, max_run) of a sorted long array, single pass. */
  private def runFold(h: Array[Long]): (Long, Long) = {
    if (h.length == 0) return (0L, 0L)
    java.util.Arrays.sort(h)
    var nd = 1L; var run = 1L; var best = 1L
    var i = 1
    while (i < h.length) {
      if (h(i) == h(i - 1)) { run += 1; if (run > best) best = run }
      else { nd += 1; run = 1 }
      i += 1
    }
    (nd, best)
  }

  /** Static kernel for [[StringArrayRunStats]]. */
  def arrayStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = hashOf(arr, i); i += 1 }
    val (nd, best) = runFold(h)
    InternalRow(nd, best)
  }

  /** Static kernel for [[BigramRunStats]]: word hashes once, bigram
    * hash = xxhash64-mix of adjacent word hashes (injective on hash
    * pairs; tokens are whitespace-split so the pair IS the bigram). */
  def bigramStats(arr: ArrayData): InternalRow = {
    val n = arr.numElements()
    val h = new Array[Long](n)
    var i = 0
    while (i < n) { h(i) = hashOf(arr, i); i += 1 }
    val nb = math.max(n - 1, 0)
    val bg = new Array[Long](nb)
    i = 0
    while (i < nb) { bg(i) = XXH64.hashLong(h(i + 1), h(i)); i += 1 }
    val (ndWords, _) = runFold(h) // sorts h in place — AFTER bigrams built
    val (_, bestBg) = runFold(bg)
    InternalRow(ndWords, bestBg, nb.toLong)
  }
}

private[functions] trait ArrayOfStringsArg { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${other.simpleString}")
  }
}

/** struct(n_distinct, max_run) over any string array — the per-row
  * replacement for explode + countDistinct / explode + groupBy + max
  * when the answer is per-row: zero shuffles, primitive sort + one
  * pass, whole-stage-codegen friendly. */
case class StringArrayRunStats(child: Expression)
    extends UnaryExpression with ArrayOfStringsArg {
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct", LongType, nullable = false),
    StructField("max_run", LongType, nullable = false)))
  override def prettyName: String = "string_array_run_stats"

  override protected def nullSafeEval(arr: Any): Any =
    RunStats.arrayStats(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.RunStats.arrayStats($arr);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** struct(n_distinct_words, max_bigram_run, n_bigrams) over a word
  * array, fused: the word hashes are computed once and the bigram keys
  * are adjacent-hash mixes, so the gopher/repetition signal family is
  * ONE kernel call per document instead of an interpreted bigram
  * `transform` plus two interpreted folds. */
case class BigramRunStats(child: Expression)
    extends UnaryExpression with ArrayOfStringsArg {
  override def dataType: DataType = StructType(Seq(
    StructField("n_distinct_words", LongType, nullable = false),
    StructField("max_bigram_run", LongType, nullable = false),
    StructField("n_bigrams", LongType, nullable = false)))
  override def prettyName: String = "bigram_run_stats"

  override protected def nullSafeEval(arr: Any): Any =
    RunStats.bigramStats(arr.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, arr =>
      s"${ev.value} = graft.functions.RunStats.bigramStats($arr);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StringArrayRunStats {
  def runStats(arr: Column): Column =
    GraftShim.column(StringArrayRunStats(GraftShim.expression(arr)))
}

object BigramRunStats {
  def bigramStats(ws: Column): Column =
    GraftShim.column(BigramRunStats(GraftShim.expression(ws)))
}
