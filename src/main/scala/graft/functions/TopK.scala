package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Sorted bounded buffer of the k best (score, term) pairs, ordered by
  * score DESC then term ASC (binary UTF-8, Spark's string ordering) —
  * the per-group top-k state. Insertion keeps the array sorted, so
  * `eval` emits rank order directly; k is small by construction
  * (ranking output a human or a feature vector consumes), so linear
  * insertion beats heap bookkeeping. */
final class TopKBuf(val k: Int) {
  val scores = new Array[Double](k)
  val terms = new Array[UTF8String](k)
  var size = 0

  // java.lang.Double.compare gives Spark's sort semantics (NaN orders
  // above every value, NaN == NaN), so the aggregate stays equal to
  // the row_number window even when the score expression emits NaN
  private def beats(s: Double, t: UTF8String, i: Int): Boolean = {
    val c = java.lang.Double.compare(s, scores(i))
    c > 0 || (c == 0 && t.compareTo(terms(i)) < 0)
  }

  def insert(s: Double, t: UTF8String): Unit = {
    var pos = 0
    while (pos < size && !beats(s, t, pos)) pos += 1
    if (pos >= k) return
    var i = math.min(size, k - 1)
    while (i > pos) { scores(i) = scores(i - 1); terms(i) = terms(i - 1); i -= 1 }
    scores(pos) = s; terms(pos) = t
    if (size < k) size += 1
  }
}

/** Top-k (term, score) pairs per group as an ARRAY<STRUCT<term, score>>
  * in rank order — the bounded-memory replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY score DESC, term) <= k`:
  * a TypedImperativeAggregate whose partial phase reduces every map
  * partition to ≤ k rows per group BEFORE the shuffle and whose state
  * is k entries on every path, where the window form shuffles the
  * whole scored input and sorts each group. Ties break on the term's
  * binary UTF-8 order, matching the window's deterministic tie-break
  * exactly. */
case class TopKByScore(
    score: Expression,
    term: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKBuf] with BinaryLike[Expression] {

  require(k >= 1, s"top_k_by_score needs k >= 1, got $k")

  override def left: Expression = score
  override def right: Expression = term
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("term", StringType), StructField("score", DoubleType))))
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by_score"

  override def createAggregationBuffer(): TopKBuf = new TopKBuf(k)

  override def update(buf: TopKBuf, input: InternalRow): TopKBuf = {
    val s = score.eval(input)
    val t = term.eval(input)
    if (s != null && t != null)
      // clone: the UTF8String may alias a reused row buffer
      buf.insert(s.asInstanceOf[Double], t.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: TopKBuf, other: TopKBuf): TopKBuf = {
    var i = 0
    while (i < other.size) { buf.insert(other.scores(i), other.terms(i)); i += 1 }
    buf
  }

  override def eval(buf: TopKBuf): Any =
    new GenericArrayData(Array.tabulate[Any](buf.size) { i =>
      new GenericInternalRow(Array[Any](buf.terms(i), buf.scores(i)))
    })

  override def serialize(buf: TopKBuf): Array[Byte] = {
    val byteLens = (0 until buf.size).map(i => buf.terms(i).numBytes())
    val bb = ByteBuffer.allocate(4 + buf.size * 12 + byteLens.sum)
      .order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.size)
    var i = 0
    while (i < buf.size) {
      bb.putDouble(buf.scores(i))
      bb.putInt(byteLens(i))
      bb.put(buf.terms(i).getBytes)
      i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBuf = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    val buf = new TopKBuf(k)
    var i = 0
    while (i < n) {
      val s = bb.getDouble
      val tb = new Array[Byte](bb.getInt)
      bb.get(tb)
      buf.insert(s, UTF8String.fromBytes(tb))
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKByScore =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKByScore =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKByScore =
    copy(score = newLeft, term = newRight)
}

object TopK {
  /** Column API: rank-ordered ARRAY<STRUCT<term, score>> of the k
    * highest-scored terms per group (score DESC, term ASC). */
  def byScore(score: Column, term: Column, k: Int): Column =
    GraftShim.column(TopKByScore(
      GraftShim.expression(score), GraftShim.expression(term), k)
      .toAggregateExpression())
}
