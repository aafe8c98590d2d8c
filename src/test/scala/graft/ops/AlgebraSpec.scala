package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.Row

class AlgebraSpec extends SparkSpec {
  import spark.implicits._

  test("safeDivide: zero or NULL denominator yields NULL") {
    val df = Seq((10.0, 2.0), (1.0, 0.0), (3.0, Double.NaN)).toDF("a", "b")
      .withColumn("b", when(isnan(col("b")), lit(null)).otherwise(col("b")))
      .select(Algebra.safeDivide(col("a"), col("b")).as("r"))
    assert(df.collect().map(r => Option(r.get(0))).toSeq ==
      Seq(Some(5.0), None, None))
  }

  test("vectorDirection: cardinal winds map to meteorological convention") {
    // Wind FROM the south (u=0, v>0) => 180; from west (u>0) => 270.
    val df = Seq((0.0, 10.0), (10.0, 0.0), (0.0, -10.0), (-10.0, 0.0))
      .toDF("u", "v")
      .select(Algebra.vectorDirection(col("u"), col("v")).as("d"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(180.0, 270.0, 0.0, 90.0))
  }

  test("rescaleEncode clamps and rounds to 0..255") {
    val df = Seq(-5.0, 0.0, 150.0, 300.0, 999.0).toDF("v")
      .select(Algebra.rescaleEncode(col("v"), 0.0, 300.0).as("e"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 128, 255, 255))
  }

  test("dekad and pentad slots hit documented edges") {
    val days = Seq("2024-01-01", "2024-01-10", "2024-01-11", "2024-01-21",
      "2024-01-31", "2024-12-31")
    val df = days.toDF("d").select(to_timestamp(col("d")).as("t"))
      .select(Algebra.dekadSlot(col("t")).as("dk"), Algebra.pentadSlot(col("t")).as("pt"))
    val rows = df.collect().map(r => (r.getInt(0), r.getInt(1))).toSeq
    assert(rows.map(_._1) == Seq(1, 1, 2, 3, 3, 36))
    assert(rows.map(_._2) == Seq(1, 2, 3, 5, 6, 72))
  }

  test("normalizeLon wraps 0..360 into -180..180") {
    val df = Seq(0.0, 90.0, 180.0, 270.0, 359.0).toDF("l")
      .select(Algebra.normalizeLon(col("l")).as("n"))
    assert(df.collect().map(_.getDouble(0)).toSeq == Seq(0.0, 90.0, -180.0, -90.0, -1.0))
  }
}
