package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** PiiScan vs the regexp_count/regexp_replace composition it replaced,
  * on the seeded corpus plus adversarial strings chosen to stress every
  * backtracking path the kernel hand-rolls: email domain-dot
  * backtrack, {2,} tails, phone bounded reps, IP word boundaries and
  * run-length failures, overlap and resume positions. */
class PiiScanSpec extends SparkSpec {

  private val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private val phoneRe = "\\+\\d{8,15}"
  private val ipRe = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"

  private def regexForm(t: org.apache.spark.sql.Column) = struct(
    regexp_count(t, lit(emailRe)).cast("long").as("n_emails"),
    regexp_count(t, lit(phoneRe)).cast("long").as("n_phones"),
    regexp_count(t, lit(ipRe)).cast("long").as("n_ips"),
    regexp_replace(regexp_replace(regexp_replace(t,
      lit(emailRe), lit("[EMAIL]")),
      lit(phoneRe), lit("[PHONE]")),
      lit(ipRe), lit("[IP]")).as("redacted"))

  private def assertParity(df: DataFrame): Unit = {
    val bad = df.select(col("t"),
        PiiScan.scanCol(col("t")).as("k"), regexForm(col("t")).as("r"))
      .filter(col("k.n_emails") =!= col("r.n_emails") ||
        col("k.n_phones") =!= col("r.n_phones") ||
        col("k.n_ips") =!= col("r.n_ips") ||
        col("k.redacted") =!= col("r.redacted"))
      .select("t", "k", "r").collect()
    assert(bad.isEmpty, bad.take(5).mkString("\n"))
  }

  test("adversarial strings") {
    import spark.implicits._
    assertParity(Seq(
      // emails: dot backtracking, {2,} tails, resume-after-@ paths
      "a@b.co", "a@b.c", "x@y..com", "a@@b.co", "@b.co", "a@",
      "user+tag@sub.domain.co.uk", "a@b.co.uk9", "foo.bar@baz.qux9x",
      "a.b@c-d.ef", "..@..com", "a@b.", "a@.co", "a@b@c.com",
      "pre a@b.cd.e post", "ü@b.de", "x@汉.co", "a%b_c@d.e.fg",
      "two a@b.co c@d.ef emails",
      // phones: bounded reps, consecutive '+', short runs
      "+1234567", "+12345678", "+123456789012345", "+1234567890123456789",
      "x++12345678y", "tel:+49 30 123", "+?+12345678", "a+12345678b",
      // ips: boundaries, long runs, overlap, trailing dots
      "1.2.3.4", "01.002.3.255", "1234.5.6.7", "1.2.3.4567", "1.23456.7.8",
      "a1.2.3.4", "1.2.3.4a", "_1.2.3.4", "1.2.3.4_", "1.2.3.4.5",
      "10.0.0.1 and 192.168.300.1", "1..2.3.4", "1.2.3.", ".1.2.3.4",
      "v1.2.3.4-tag", "999.999.999.999", "1.2.3.4.5.6.7.8",
      // interactions: counts on ORIGINAL, replaces sequential
      "mail user+12345678@host.com now", "ip 1.2.3.4 in user@a1.2.3.4.co",
      "+12345678@x.co", "edge@1.2.3.4", "",
      "u@example.com tel +12065550012 from 10.0.7.77"
    ).toDF("t"))
  }

  test("seeded corpus parity") {
    val seeded = concat(col("text"),
      lit(" contact: user"), col("doc_id").cast("string"),
      lit("@example.com tel +120655500"),
      lpad((col("doc_id") % 100).cast("string"), 2, "0"),
      lit(" from 10.0."), (col("doc_id") % 256).cast("string"), lit(".77"))
    assertParity(spark.read.parquet(s"$sf0001/documents.parquet")
      .select(seeded.as("t")))
  }
}
