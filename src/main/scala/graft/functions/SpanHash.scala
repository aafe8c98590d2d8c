package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** All rolling w-token window hashes of a token array in ONE pass — the
  * native-Expression upgrade of `transform(sequence(...), i ->
  * md5(concat_ws(" ", slice(ws, i+1, w))))`, which allocates a sliced
  * array, a concatenated UTF8String, and a binary cast per window. The
  * kernel decodes each token's UTF-8 bytes once, reuses one
  * MessageDigest across windows, and feeds token bytes directly to the
  * digest — same md5-of-"tok1 tok2 …" semantics bit-for-bit (the DuckDB
  * oracles stay valid), minus the per-window Catalyst allocation storm.
  * Output order is window position order, so `posexplode` keeps
  * positions exactly as before.
  */
case class SpanHashWindows(tokens: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = width
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes() = {
    val ok = tokens.dataType.isInstanceOf[ArrayType] &&
      tokens.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      width.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"span_hash_windows expects (array<string>, int), got " +
        s"(${tokens.dataType.simpleString}, ${width.dataType.simpleString})")
  }

  override protected def nullSafeEval(arr: Any, w: Any): Any =
    SpanHashWindows.hashes(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, w) =>
      s"${ev.value} = graft.functions.SpanHashWindows.hashes($arr, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, width = newRight)

  override def prettyName: String = "span_hash_windows"
}

object SpanHashWindows {
  private val SPACE = ' '.toByte
  private val HEX = "0123456789abcdef".toCharArray

  /** The one shared digest walk: decode each token's UTF-8 bytes
    * exactly once, then per window feed tokens to one reused
    * MessageDigest and hand the digest to `emit`. Null tokens are
    * skipped separator-and-all, matching `concat_ws(" ", ...)` exactly
    * so the composed-form parity holds on ANY input array (split()
    * never emits nulls, but the expression is library-public). BOTH
    * output projections (hex string, 60-bit long) ride this loop so
    * the null/separator invariant cannot drift between them. */
  /** Package-visible alias for sibling kernels ([[MinhashSlots]]) that
    * fold over the same window digests. */
  private[functions] def eachWindowDigestShared(arr: ArrayData, w: Int)
                                               (emit: (Int, Array[Byte]) => Unit): Unit =
    eachWindowDigest(arr, w)(emit)

  /** Dual-digest walk for [[MinhashSlots]]: per window, md5(text) AND
    * md5(text || '~') — 32 digest bytes so 8 disjoint 31-bit slot
    * fields exist (16-bit fields min-concentrate into a ~2^20
    * effective band keyspace, which floods LSH candidates with
    * birthday collisions past ~10^6 documents; see SCALE.md r11).
    * The second digest clones the first's mid-state, so the window
    * bytes are only fed once. */
  private[functions] def eachWindowDigest2(arr: ArrayData, w: Int)
      (emit: (Int, Array[Byte], Array[Byte]) => Unit): Unit = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    val TILDE = '~'.toByte
    i = 0
    while (i <= n - w) {
      md.reset()
      var j = 0
      var written = 0
      while (j < w) {
        val t = toks(i + j)
        if (t != null) {
          if (written > 0) md.update(SPACE)
          md.update(t)
          written += 1
        }
        j += 1
      }
      val md2 = md.clone().asInstanceOf[MessageDigest]
      md2.update(TILDE)
      emit(i, md.digest(), md2.digest())
      i += 1
    }
  }

  private def eachWindowDigest(arr: ArrayData, w: Int)
                              (emit: (Int, Array[Byte]) => Unit): Unit = {
    val n = arr.numElements()
    val toks = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      toks(i) = if (arr.isNullAt(i)) null else arr.getUTF8String(i).getBytes
      i += 1
    }
    val md = MessageDigest.getInstance("MD5")
    i = 0
    while (i <= n - w) {
      md.reset()
      var j = 0
      var written = 0
      while (j < w) {
        val t = toks(i + j)
        if (t != null) {
          if (written > 0) md.update(SPACE)
          md.update(t)
          written += 1
        }
        j += 1
      }
      emit(i, md.digest())
      i += 1
    }
  }

  /** Static kernel shared by interpreted + generated code paths. */
  def hashes(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(new Array[AnyRef](0))
    val out = new Array[AnyRef](n - w + 1)
    eachWindowDigest(arr, w)((i, d) => out(i) = UTF8String.fromString(hex(d)))
    new GenericArrayData(out)
  }

  private def hex(d: Array[Byte]): String = {
    val c = new Array[Char](d.length * 2)
    var i = 0
    while (i < d.length) {
      c(2 * i) = HEX((d(i) >> 4) & 0xf); c(2 * i + 1) = HEX(d(i) & 0xf)
      i += 1
    }
    new String(c)
  }

  /** 60-bit integer window hashes: the value of the first 15 hex chars
    * of each window's md5 — identical to
    * `conv(substring(md5(window), 1, 15), 16, 10)`, the same
    * oracle-mirrorable truncation [[graft.llm.Dedup.shingleHashes]]
    * uses. Every span shuffle/join/group then moves 8-byte longs
    * instead of 32-char hex strings (the 100 TB inverted-index key
    * shape); a truncation collision produces the identical merged
    * group in BOTH engines because the oracle applies the same
    * substring. Digest bytes 0-6 are the top 56 bits, the high nibble
    * of byte 7 the low 4. */
  def hashesLong(arr: ArrayData, w: Int): ArrayData = {
    val n = arr.numElements()
    if (w <= 0 || n < w) return new GenericArrayData(new Array[Long](0))
    val out = new Array[Long](n - w + 1)
    eachWindowDigest(arr, w) { (i, d) =>
      var v = 0L
      var b = 0
      while (b < 7) { v = (v << 8) | (d(b) & 0xffL); b += 1 }
      out(i) = (v << 4) | ((d(7) >> 4) & 0xfL)
    }
    new GenericArrayData(out)
  }

  /** Column API: all md5 window hashes of `tokens` with window `w`. */
  def spanHashWindows(tokens: Column, w: Int): Column =
    GraftShim.column(SpanHashWindows(GraftShim.expression(tokens),
      GraftShim.expression(org.apache.spark.sql.functions.lit(w))))

  /** Column API: 60-bit long window hashes (see [[hashesLong]]). */
  def spanHashWindowsLong(tokens: Column, w: Int): Column =
    GraftShim.column(SpanHashWindowsLong(GraftShim.expression(tokens),
      GraftShim.expression(org.apache.spark.sql.functions.lit(w))))
}

/** Long-keyed sibling of [[SpanHashWindows]]: same windows, same md5,
  * but each hash leaves the kernel as the 60-bit integer value of its
  * first 15 hex chars (no hex string is ever built). */
case class SpanHashWindowsLong(tokens: Expression, width: Expression)
    extends BinaryExpression {

  override def left: Expression = tokens
  override def right: Expression = width
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes() = {
    val ok = tokens.dataType.isInstanceOf[ArrayType] &&
      tokens.dataType.asInstanceOf[ArrayType].elementType == StringType &&
      width.dataType == IntegerType
    if (ok) org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"span_hash_windows_long expects (array<string>, int), got " +
        s"(${tokens.dataType.simpleString}, ${width.dataType.simpleString})")
  }

  override protected def nullSafeEval(arr: Any, w: Any): Any =
    SpanHashWindows.hashesLong(arr.asInstanceOf[ArrayData], w.asInstanceOf[Int])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (arr, w) =>
      s"${ev.value} = graft.functions.SpanHashWindows.hashesLong($arr, $w);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(tokens = newLeft, width = newRight)

  override def prettyName: String = "span_hash_windows_long"
}
