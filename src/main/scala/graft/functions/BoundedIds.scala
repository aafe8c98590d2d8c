package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Bounded per-group id list: collects up to `cap` longs; one more
  * marks the group OVERFLOWED and frees the payload, so the buffer is
  * O(cap) worst-case and O(1) after overflow — never the unbounded
  * `collect_list` that an adversarial hot group could OOM. */
final class IdListBuf(val cap: Int) {
  var ids: Array[Long] = new Array[Long](math.min(cap, 16))
  var size = 0
  var overflow = false

  def add(v: Long): Unit = {
    if (overflow) return
    if (size == cap) { overflow = true; ids = null; return }
    if (size == ids.length)
      ids = java.util.Arrays.copyOf(ids, math.min(cap, ids.length * 2))
    ids(size) = v; size += 1
  }
}

/** `bounded_ids(id, cap)`: array of the group's ids, or NULL when the
  * group exceeds `cap` members — the one-pass LSH bucket materializer.
  * Replaces [count-groups pass → hot-bucket anti-join → self-join] in
  * candidate-pair generation with a single two-phase aggregation whose
  * state is bounded, folding three full exchanges of the band stream
  * into one (see Dedup.candidatePairs). NULL-on-overflow IS the
  * hot-bucket cap: such buckets carry no per-pair signal worth a
  * quadratic blowup. */
case class BoundedIdsAgg(
    child: Expression,
    cap: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[IdListBuf] with UnaryLike[Expression] {

  // update() casts the child's value straight to Long — a non-long id
  // column must fail at ANALYSIS with a named type error, not as a
  // ClassCastException deep inside the aggregate
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_ids requires a BIGINT id column, got ${child.dataType.simpleString}")

  // state grows by doubling to min(cap, group size), so a huge cap
  // (Int.MaxValue = "uncapped", the incremental runner's contract)
  // costs only what the group actually holds
  require(cap >= 1, s"bounded_ids cap $cap out of range")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "bounded_ids"

  override def createAggregationBuffer(): IdListBuf = new IdListBuf(cap)

  override def update(buf: IdListBuf, input: InternalRow): IdListBuf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long])
    buf
  }

  override def merge(buf: IdListBuf, other: IdListBuf): IdListBuf = {
    if (other.overflow) { buf.overflow = true; buf.ids = null; return buf }
    var i = 0
    while (i < other.size && !buf.overflow) { buf.add(other.ids(i)); i += 1 }
    buf
  }

  override def eval(buf: IdListBuf): Any =
    if (buf.overflow) null
    else new GenericArrayData(java.util.Arrays.copyOf(buf.ids, buf.size))

  override def serialize(buf: IdListBuf): Array[Byte] = {
    if (buf.overflow) return Array[Byte](1)
    val bb = ByteBuffer.allocate(1 + 4 + 8 * buf.size).order(ByteOrder.LITTLE_ENDIAN)
    bb.put(0.toByte).putInt(buf.size)
    var i = 0
    while (i < buf.size) { bb.putLong(buf.ids(i)); i += 1 }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): IdListBuf = {
    val out = new IdListBuf(cap)
    if (bytes(0) == 1) { out.overflow = true; out.ids = null; return out }
    val bb = ByteBuffer.wrap(bytes, 1, bytes.length - 1).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    var i = 0
    while (i < n) { out.add(bb.getLong); i += 1 }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedIdsAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedIdsAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedIdsAgg =
    copy(child = newChild)
}

object BoundedIds {
  /** Column API: the group's ids as array<long>, NULL past `cap`. */
  def boundedIds(id: Column, cap: Int): Column =
    GraftShim.column(BoundedIdsAgg(GraftShim.expression(id), cap)
      .toAggregateExpression())
}
