package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Config-side ramp parsing (visualization.py:19-76 semantics). */
class RampsSpec extends AnyFunSuite {

  test("single-stop ramp samples its one flat color everywhere") {
    val spark = graft.SparkSpec.session
    import org.apache.spark.sql.functions._
    val vals = spark.range(5).select((col("id") / 4.0).as("t0"))
    val out = Ramps.sampleContinuous(vals, col("t0"),
        Seq(Ramps.Ramp("flat", "sequential", Seq(Ramps.Stop("#336699")))), Seq("t0"))
      .select("r", "g", "b", "a").distinct().collect()
    assert(out.length == 1)
    assert(out(0).getInt(0) == 0x33 && out(0).getInt(1) == 0x66 &&
      out(0).getInt(2) == 0x99 && out(0).getInt(3) == 255)
  }

  test("hex parsing: full, shorthand, alpha, no-# forms") {
    assert(Ramps.hexToRgba("#000080") == (0, 0, 128, 255))
    assert(Ramps.hexToRgba("ff8800") == (255, 136, 0, 255))
    assert(Ramps.hexToRgba("#f80") == (255, 136, 0, 255))   // shorthand doubles
    assert(Ramps.hexToRgba("#f80c") == (255, 136, 0, 204))  // shorthand + alpha
    assert(Ramps.hexToRgba("#ff0000cc") == (255, 0, 0, 204))
    intercept[IllegalArgumentException](Ramps.hexToRgba(""))
    intercept[IllegalArgumentException](Ramps.hexToRgba("#12345"))
  }

  test("position spreading: even fill, declared values, non-decreasing clamp") {
    def s(p: Option[Double]*) = p.map(Ramps.Stop("#000000", _))
    // all undeclared → even spread
    assert(Ramps.spreadPositions(s(None, None, None)) == Seq(0.0, 0.5, 1.0))
    // single stop
    assert(Ramps.spreadPositions(s(None)) == Seq(0.0))
    // mixed: declared kept, undeclared at i/last
    assert(Ramps.spreadPositions(s(None, Some(0.1), None, Some(1.0)))
      == Seq(0.0, 0.1, 2.0 / 3, 1.0))
    // out-of-order declaration clamps up, like the reference's CSS guard
    assert(Ramps.spreadPositions(s(Some(0.0), Some(0.6), Some(0.4), Some(1.0)))
      == Seq(0.0, 0.6, 0.6, 1.0))
  }
}
