package graft.functions

import java.nio.{ByteBuffer, ByteOrder}

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Bounded per-group string list for order-canonical digests:
  * collects up to `cap` member strings; one more FAILS LOUDLY. The
  * identity-hash contract (input_hash = sha256 over the SORTED member
  * checksums) forces full materialization before the sort, so the
  * buffer cannot stream — what it can do is refuse, by name, the
  * pathological group that an unbounded `collect_list` would carry
  * silently until the aggregation buffer OOMs an executor. Overflow
  * here is a broken recipe (units are contractually small sets of
  * member granules), never data to degrade around. */
final class StrListBuf(val cap: Int) {
  var items: Array[UTF8String] = new Array[UTF8String](math.min(cap, 8))
  var size = 0

  def add(v: UTF8String): Unit = {
    if (size == cap)
      throw new IllegalStateException(
        s"bounded_sorted_join: group exceeds $cap members — the unit/member " +
          "contract bounds identity-hash inputs; a group this large is a " +
          "recipe defect, not data to hash")
    if (size == items.length)
      items = java.util.Arrays.copyOf(items, math.min(cap, items.length * 2))
    items(size) = v; size += 1
  }
}

/** `bounded_sorted_join(s, cap, sep)`: the group's strings sorted and
  * `sep`-joined — the canonical pre-image for content identity hashes
  * (sha256 on top gives the recipe input_hash) — with an O(cap) bound
  * on aggregation-buffer state in place of collect_list's unbounded
  * growth. */
case class BoundedSortedJoinAgg(
    child: Expression,
    cap: Int,
    sep: String,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[StrListBuf] with UnaryLike[Expression] {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_sorted_join requires a STRING column, got ${child.dataType.simpleString}")

  require(cap >= 1, s"bounded_sorted_join cap $cap out of range")

  override def dataType: DataType = StringType
  override def nullable: Boolean = false
  override def prettyName: String = "bounded_sorted_join"

  override def createAggregationBuffer(): StrListBuf = new StrListBuf(cap)

  override def update(buf: StrListBuf, input: InternalRow): StrListBuf = {
    val v = child.eval(input)
    // clone: eval may return a pointer into a reused row buffer
    if (v != null) buf.add(v.asInstanceOf[UTF8String].clone())
    buf
  }

  override def merge(buf: StrListBuf, other: StrListBuf): StrListBuf = {
    var i = 0
    while (i < other.size) { buf.add(other.items(i)); i += 1 }
    buf
  }

  override def eval(buf: StrListBuf): Any = {
    val arr = java.util.Arrays.copyOf(buf.items, buf.size)
    java.util.Arrays.sort(arr, (a: UTF8String, b: UTF8String) => a.compareTo(b))
    UTF8String.concatWs(UTF8String.fromString(sep), arr: _*)
  }

  override def serialize(buf: StrListBuf): Array[Byte] = {
    var bytes = 4
    var i = 0
    while (i < buf.size) { bytes += 4 + buf.items(i).numBytes(); i += 1 }
    val bb = ByteBuffer.allocate(bytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.putInt(buf.size)
    i = 0
    while (i < buf.size) {
      val b = buf.items(i).getBytes
      bb.putInt(b.length).put(b); i += 1
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): StrListBuf = {
    val out = new StrListBuf(cap)
    val bb = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val n = bb.getInt
    var i = 0
    while (i < n) {
      val b = new Array[Byte](bb.getInt)
      bb.get(b)
      out.add(UTF8String.fromBytes(b)); i += 1
    }
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): BoundedSortedJoinAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BoundedSortedJoinAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildInternal(newChild: Expression): BoundedSortedJoinAgg =
    copy(child = newChild)
}

object BoundedDigest {
  /** Column API: the group's strings sorted + `sep`-joined; a group
    * past `cap` members fails the job by name. */
  def boundedSortedJoin(s: Column, cap: Int = 1 << 20, sep: String = "|"): Column =
    GraftShim.column(BoundedSortedJoinAgg(GraftShim.expression(s), cap, sep)
      .toAggregateExpression())
}
