package graft.functions

import org.apache.spark.sql.{Column, GraftShim}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused PII detect-and-redact kernel: one expression computing, in
  * five single-pass byte scans and zero regex-engine work, exactly
  * what the composed form computes with six `java.util.regex` passes:
  *
  *   n_emails = regexp_count(t, E), n_phones = regexp_count(t, P),
  *   n_ips    = regexp_count(t, I)          (all on the ORIGINAL text)
  *   redacted = replace(replace(replace(t, E, "[EMAIL]"),
  *                P, "[PHONE]"), I, "[IP]")  (sequential, like nested
  *                regexp_replace — the phone/IP scans therefore run on
  *                the already-redacted intermediate for the rewrite,
  *                but on the original for the counts)
  *
  * with  E = [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}
  *       P = \+\d{8,15}
  *       I = \b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b
  *
  * Each scanner reproduces the leftmost-match + greedy-with-backtrack
  * semantics of its pattern exactly (both Java regex and RE2 agree on
  * these patterns — classes, bounded reps, ASCII `\b`):
  *
  *  - EMAIL: a match starts at the head of a maximal local-char run
  *    immediately followed by '@'; the domain is the maximal
  *    [A-Za-z0-9.-] run after '@', backtracked to the LAST '.' that is
  *    (a) preceded by ≥1 domain char and (b) followed by ≥2 alphas;
  *    the match ends at the end of that alpha run. If no such dot
  *    exists there is no match anywhere inside the run (shorter local
  *    parts fail the same domain), and scanning resumes after the '@'.
  *  - PHONE: at each '+', a following digit run of length ≥8 matches
  *    the '+' plus min(len, 15) digits (greedy bounded rep).
  *  - IP: four digit runs of length 1–3 joined by single dots; `\b`
  *    requires a non-word char (or edge) before the first run and
  *    after the last; a longer run fails its group for EVERY split
  *    (backtracking only shortens the tail, which then faces a digit),
  *    so runs must be consumed exactly.
  */
case class PiiScan(child: Expression) extends UnaryExpression with StringArg {
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", LongType, nullable = false),
    StructField("n_phones", LongType, nullable = false),
    StructField("n_ips", LongType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def prettyName: String = "pii_scan"

  override protected def nullSafeEval(s: Any): Any =
    PiiScan.scan(s.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.PiiScan.scan($s);")
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PiiScan {
  import TextScan.{isDigit, isWord}

  /** Column API: struct(n_emails, n_phones, n_ips, redacted). */
  def scanCol(text: Column): Column =
    GraftShim.column(PiiScan(GraftShim.expression(text)))

  @inline private def isLocal(b: Byte): Boolean =
    isWord(b) || b == '.' || b == '%' || b == '+' || b == '-'
  @inline private def isDomain(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z') ||
      (b >= '0' && b <= '9') || b == '.' || b == '-'
  @inline private def isAlpha(b: Byte): Boolean =
    (b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')

  /** Non-overlapping match intervals, flat (start0, end0, start1, …). */
  private final class Intervals {
    var a = new Array[Int](16)
    var n = 0
    def add(s: Int, e: Int): Unit = {
      if (n == a.length) a = java.util.Arrays.copyOf(a, n * 2)
      a(n) = s; a(n + 1) = e; n += 2
    }
    def count: Long = (n / 2).toLong
  }

  private def emails(b: Array[Byte]): Intervals = {
    val out = new Intervals
    val n = b.length
    var pos = 0
    while (pos < n) {
      // next local-char run [rs, re)
      while (pos < n && !isLocal(b(pos))) pos += 1
      val rs = pos
      while (pos < n && isLocal(b(pos))) pos += 1
      val re = pos
      if (re > rs && re < n && b(re) == '@') {
        // maximal domain run after '@'
        val d0 = re + 1
        var e2 = d0
        while (e2 < n && isDomain(b(e2))) e2 += 1
        // last '.' with ≥1 domain char before it and ≥2 alphas after
        // (descending dd = the greedy domain+ backtracking order)
        var dd = e2 - 1
        var end = -1
        while (dd > d0 && end < 0) {
          if (b(dd) == '.' && dd + 2 < n &&
              isAlpha(b(dd + 1)) && isAlpha(b(dd + 2))) {
            // {2,} satisfied — extend the alpha run greedily
            var ae = dd + 3
            while (ae < n && isAlpha(b(ae))) ae += 1
            end = ae
          } else dd -= 1
        }
        if (end > 0) { out.add(rs, end); pos = end }
        else pos = re + 1 // no match in this run; resume after the '@'
      }
      // else: pos already past the run (or at a non-local char)
    }
    out
  }

  private def phones(b: Array[Byte]): Intervals = {
    val out = new Intervals
    val n = b.length
    var i = 0
    while (i < n) {
      if (b(i) == '+') {
        var j = i + 1
        while (j < n && isDigit(b(j)) && j - i <= 15) j += 1
        // j - i - 1 digits consumed (capped at 15 by the loop guard)
        if (j - i - 1 >= 8) { out.add(i, j); i = j }
        else i += 1
      } else i += 1
    }
    out
  }

  private def ips(b: Array[Byte]): Intervals = {
    val out = new Intervals
    val n = b.length
    var i = 0
    while (i < n) {
      if (isDigit(b(i)) && (i == 0 || !isWord(b(i - 1)))) {
        // try the four-group parse from this boundary run start
        var ok = true
        var p = i
        var g = 0
        while (ok && g < 4) {
          val ds = p
          while (p < n && isDigit(b(p))) p += 1
          val len = p - ds
          if (len < 1 || len > 3) ok = false
          else if (g < 3) {
            if (p < n && b(p) == '.') p += 1 else ok = false
          } else {
            if (p < n && isWord(b(p))) ok = false // trailing \b
          }
          g += 1
        }
        if (ok) { out.add(i, p); i = p }
        else {
          // skip this digit run; later runs get their own boundary try
          var j = i + 1
          while (j < n && isDigit(b(j))) j += 1
          i = j
        }
      } else i += 1
    }
    out
  }

  private def replace(b: Array[Byte], iv: Intervals, tag: Array[Byte]): Array[Byte] = {
    if (iv.n == 0) return b
    var outLen = b.length
    var k = 0
    while (k < iv.n) { outLen += tag.length - (iv.a(k + 1) - iv.a(k)); k += 2 }
    val out = new Array[Byte](outLen)
    var src = 0; var dst = 0
    k = 0
    while (k < iv.n) {
      val s = iv.a(k); val e = iv.a(k + 1)
      System.arraycopy(b, src, out, dst, s - src); dst += s - src
      System.arraycopy(tag, 0, out, dst, tag.length); dst += tag.length
      src = e
      k += 2
    }
    System.arraycopy(b, src, out, dst, b.length - src)
    out
  }

  private val EMAIL = "[EMAIL]".getBytes
  private val PHONE = "[PHONE]".getBytes
  private val IP = "[IP]".getBytes

  def scan(s: UTF8String): InternalRow = {
    val t = s.getBytes
    val em = emails(t)
    val r1 = replace(t, em, EMAIL)
    val nPhones = phones(t).count
    val r2 = replace(r1, phones(r1), PHONE)
    val nIps = ips(t).count
    val r3 = replace(r2, ips(r2), IP)
    InternalRow(em.count, nPhones, nIps, UTF8String.fromBytes(r3))
  }
}
