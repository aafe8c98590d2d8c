package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, LongType}

/** Bounded max-heap of the k smallest values seen so far — the KMV
  * (k-minimum-values) sketch state. Multiset semantics (duplicates
  * kept), matching `row_number() ... WHERE rn = k` over the hashed
  * input exactly: the k-th smallest multiset value is independent of
  * any tie-break order, so the sketch is deterministic and
  * merge-order-independent across partitions.
  */
final class KmvHeap(val k: Int) {
  // binary max-heap in a flat array; size ≤ k
  val heap = new Array[Long](k)
  var size = 0

  def insert(v: Long): Unit = {
    if (size < k) {
      // sift up
      var i = size
      heap(i) = v
      size += 1
      while (i > 0 && heap((i - 1) >> 1) < heap(i)) {
        val p = (i - 1) >> 1
        val t = heap(p); heap(p) = heap(i); heap(i) = t
        i = p
      }
    } else if (v < heap(0)) {
      // replace the max, sift down
      heap(0) = v
      var i = 0
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < size && heap(l) > heap(m)) m = l
        if (r < size && heap(r) > heap(m)) m = r
        if (m == i) done = true
        else {
          val t = heap(m); heap(m) = heap(i); heap(i) = t
          i = m
        }
      }
    }
  }

  /** The k-th smallest value, or None while fewer than k seen. */
  def kthMin: Option[Long] = if (size == k) Some(heap(0)) else None
}

/** KMV k-th-minimum aggregate: the k-th smallest `child` value per
  * group, NULL while the group holds fewer than k values — the bounded-
  * memory heart of the KMV distinct sketch (n̂ ≈ (k−1)·H/u_k). A
  * TypedImperativeAggregate with partial+final merge, so the plan is
  * ordinary two-phase aggregation: no window, no per-group sort, state
  * is k longs per group on every path — the 100 TB replacement for
  * `row_number() OVER (PARTITION BY g ORDER BY u)` whose skewed-window
  * form sorts the whole corpus through #groups tasks.
  */
case class KmvKthMin(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[KmvHeap] with UnaryLike[Expression] {

  require(k >= 1, s"kmv_kth_min needs k >= 1, got $k")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "kmv_kth_min"

  override def createAggregationBuffer(): KmvHeap = new KmvHeap(k)

  override def update(buf: KmvHeap, input: InternalRow): KmvHeap = {
    val v = child.eval(input)
    if (v != null) buf.insert(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: KmvHeap, other: KmvHeap): KmvHeap = {
    var i = 0
    while (i < other.size) { buf.insert(other.heap(i)); i += 1 }
    buf
  }

  override def eval(buf: KmvHeap): Any = buf.kthMin.orNull

  override def serialize(buf: KmvHeap): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 * (buf.size + 1)).order(ByteOrder.LITTLE_ENDIAN)
    bb.putLong(buf.size.toLong)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.heap(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): KmvHeap = {
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getLong.toInt
    val h = new KmvHeap(k)
    var i = 0
    while (i < n) { h.insert(bb.getLong); i += 1 }
    h
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvKthMin =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvKthMin =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): KmvKthMin =
    copy(child = newChild)
}

object KmvSketch {
  /** Column API: k-th smallest value of `u` per group (NULL below k). */
  def kthMin(u: Column, k: Int): Column =
    GraftShim.column(KmvKthMin(GraftShim.expression(u), k).toAggregateExpression())
}
