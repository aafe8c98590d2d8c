package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass byte-scan kernels replacing `java.util.regex` on the
  * text-quality hot paths (VERDICT r8: `t_langid` 10.9× its oracle,
  * quality-gate regexes inside every curation pipeline). Each kernel
  * reproduces the exact match semantics of the regex it replaces —
  * stated per expression — over the UTF-8 bytes directly: ASCII
  * classes never match multi-byte sequences (every such byte is
  * ≥ 0x80), which is exactly how the `[A-Za-z]`-style classes and `\b`
  * (ASCII word chars) behave in both Java regex and RE2, so engine
  * and DuckDB oracle semantics are preserved byte-for-byte.
  */
private[functions] trait StringArg { self: UnaryExpression =>
  override def checkInputDataTypes(): TypeCheckResult = self.child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${other.simpleString}")
  }
}

object TextScan {
  /** Word char for `\b` boundaries: `[A-Za-z0-9_]` (Java and RE2 both
    * use the ASCII set without UNICODE_CHARACTER_CLASS). */
  @inline def isWord(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '_'

  @inline def isDigit(b: Byte): Boolean = b >= '0' && b <= '9'

  /** Column API. */
  def asciiClassCount(c: Column, chars: String): Column =
    GraftShim.column(AsciiClassCount(GraftShim.expression(c), chars))
  def alphaCount(c: Column): Column = asciiClassCount(c,
    (('A' to 'Z') ++ ('a' to 'z')).mkString)
  def wordSetCounts(c: Column, sets: Seq[Seq[String]]): Column =
    GraftShim.column(WordSetCounts(GraftShim.expression(c), sets))
  def cjkCount(c: Column): Column =
    GraftShim.column(CjkCount(GraftShim.expression(c)))
}

/** Count of characters belonging to an ASCII class — the exact count
  * `length(regexp_replace(t, '[^<chars>]', ''))` (kept chars) or
  * `size(regexp_extract_all(t, '[<chars>]'))` computes, since each
  * ASCII class member is one code point. */
case class AsciiClassCount(child: Expression, chars: String)
    extends UnaryExpression with StringArg {
  require(chars.forall(_ < 128), "AsciiClassCount class must be pure ASCII")
  override def dataType: DataType = LongType
  override def prettyName: String = "ascii_class_count"

  @transient private lazy val table: Array[Boolean] = {
    val t = new Array[Boolean](128)
    chars.foreach(c => t(c) = true)
    t
  }

  def count(s: UTF8String): Long = {
    val n = s.numBytes
    var c = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i)
      if (b >= 0 && table(b)) c += 1
      i += 1
    }
    c
  }

  override protected def nullSafeEval(s: Any): Any = count(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acc", this, classOf[AsciiClassCount].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-set counts of tokens equal to a set member, where a token is a
  * maximal run of `[A-Za-z0-9_]` — the exact non-overlapping match
  * count of `\b(w1|w2|…)\b` for each set, in ONE scan for all sets:
  * a `\b…\b`-delimited alternation of word-char-only words matches
  * precisely the whole-token occurrences. Returns array<int>, one
  * count per set, in set order. */
case class WordSetCounts(child: Expression, sets: Seq[Seq[String]])
    extends UnaryExpression with StringArg {
  require(sets.nonEmpty && sets.forall(_.forall(w =>
    w.nonEmpty && w.forall(c => c < 128 && TextScan.isWord(c.toByte)))),
    "WordSetCounts words must be non-empty ASCII word-char strings")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "word_set_counts"

  @transient private lazy val maxLen = sets.flatMap(_.map(_.length)).max
  @transient private lazy val lookup: java.util.HashMap[UTF8String, Array[Int]] = {
    val m = new java.util.HashMap[UTF8String, Array[Int]]()
    sets.zipWithIndex.foreach { case (ws, i) =>
      ws.foreach { w =>
        val k = UTF8String.fromString(w)
        val prev = m.get(k)
        m.put(k, if (prev == null) Array(i) else prev :+ i)
      }
    }
    m
  }

  def count(s: UTF8String): GenericArrayData = {
    val counts = new Array[Int](sets.length)
    val n = s.numBytes
    var i = 0
    while (i < n) {
      if (TextScan.isWord(s.getByte(i))) {
        val ts = i
        i += 1
        while (i < n && TextScan.isWord(s.getByte(i))) i += 1
        if (i - ts <= maxLen) {
          // byte-addressed non-copying view (substring() takes CODE
          // POINT indices; ts/i are byte offsets — equal only on ASCII)
          val hit = lookup.get(UTF8String.fromAddress(
            s.getBaseObject, s.getBaseOffset + ts, i - ts))
          if (hit != null) {
            var j = 0
            while (j < hit.length) { counts(hit(j)) += 1; j += 1 }
          }
        }
      } else i += 1
    }
    new GenericArrayData(counts)
  }

  override protected def nullSafeEval(s: Any): Any = count(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("wsc", this, classOf[WordSetCounts].getName)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.count($s);")
  }
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count of CJK-unified code points — the match count of
  * `[一-鿿]` (one code point per match; the range is BMP, so
  * Java chars and code points coincide). UTF-8: exactly the 3-byte
  * sequences decoding into [0x4E00, 0x9FFF]. */
case class CjkCount(child: Expression) extends UnaryExpression with StringArg {
  override def dataType: DataType = LongType
  override def prettyName: String = "cjk_count"

  override protected def nullSafeEval(s: Any): Any =
    CjkCount.count(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.CjkCount.count($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object CjkCount {
  def count(s: UTF8String): Long = {
    val n = s.numBytes
    var c = 0L
    var i = 0
    while (i < n) {
      val b = s.getByte(i) & 0xff
      if (b < 0x80) i += 1
      else if (b < 0xe0) i += 2
      else if (b < 0xf0) {
        if (i + 2 < n) {
          val cp = ((b & 0x0f) << 12) |
            ((s.getByte(i + 1) & 0x3f) << 6) | (s.getByte(i + 2) & 0x3f)
          if (cp >= 0x4e00 && cp <= 0x9fff) c += 1
        }
        i += 3
      } else i += 4
    }
    c
  }
}
