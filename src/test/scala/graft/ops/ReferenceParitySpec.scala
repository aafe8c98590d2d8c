package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The reference's OWN pure-compute test cases
  * (georiva/geoprocessing/tests/test_{algebra,zonal,temporal,regrid,
  * calendar}.py), replayed through this engine's operators: same
  * inputs, same expected numbers. NaN nodata maps to NULL/absent-row
  * per the engine-wide convention.
  */
class ReferenceParitySpec extends SparkSpec {
  import spark.implicits._

  // ---- test_algebra.py -----------------------------------------------

  test("raster_combine: sum/mean/min/max/product on the 2x2 pair") {
    // a = [[1,2],[3,4]], b = [[5,6],[7,8]] as stacked long-form grids
    val rows = for {
      (src, base) <- Seq(("a", Array(1.0, 2.0, 3.0, 4.0)),
                         ("b", Array(5.0, 6.0, 7.0, 8.0)))
      i <- 0 until 4
    } yield (src, i / 2, i % 2, base(i))
    val df = rows.toDF("src", "y", "x", "v")
    val got = df.groupBy("y", "x").agg(
      sum("v").as("sum"), avg("v").as("mean"), min("v").as("min"),
      max("v").as("max"), exp(sum(log("v"))).as("product"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) ->
        (r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5), r.getDouble(6)))
      .toMap
    assert(got((0, 0))._1 == 6.0 && got((1, 1))._1 == 12.0) // sum
    assert(got((0, 0))._2 == 3.0 && got((1, 1))._2 == 6.0) // mean
    assert(got((0, 1))._3 == 2.0 && got((0, 1))._4 == 6.0) // min=a, max=b
    assert(math.abs(got((0, 0))._5 - 5.0) < 1e-9 &&
      math.abs(got((1, 1))._5 - 32.0) < 1e-9) // product
  }

  test("raster_combine: weighted mean (3a + 1b)/4") {
    val rows = Seq(("a", 0, 0, 1.0, 3.0), ("a", 0, 1, 2.0, 3.0),
      ("a", 1, 0, 3.0, 3.0), ("a", 1, 1, 4.0, 3.0),
      ("b", 0, 0, 5.0, 1.0), ("b", 0, 1, 6.0, 1.0),
      ("b", 1, 0, 7.0, 1.0), ("b", 1, 1, 8.0, 1.0))
      .toDF("src", "y", "x", "v", "w")
    val got = rows.groupBy("y", "x")
      .agg((sum(col("w") * col("v")) / sum("w")).as("wm"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 2.0, (0, 1) -> 3.0, (1, 0) -> 4.0, (1, 1) -> 5.0))
  }

  test("raster_combine: NaN is skipped when the other grid is present") {
    // a = [[NaN, 2]], b = [[5, 6]] -> sum [[5, 8]] (nodata = absent row)
    val rows = Seq(("a", 0, 1, 2.0), ("b", 0, 0, 5.0), ("b", 0, 1, 6.0))
      .toDF("src", "y", "x", "v")
    val got = rows.groupBy("y", "x").agg(sum("v").as("s"))
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(got == Map((0, 0) -> 5.0, (0, 1) -> 8.0))
  }

  test("safe_divide: divide-by-zero is nodata, never infinity") {
    val out = Seq((1.0, 0.0), (2.0, 2.0)).toDF("a", "b")
      .select(Algebra.safeDivide(col("a"), col("b")).as("q")).collect()
    assert(out(0).isNullAt(0)) // 1/0 -> nodata, not Inf
    assert(out(1).getDouble(0) == 1.0)
  }

  // ---- test_zonal.py -------------------------------------------------

  private def zonalFixture(dropNaNPixel: Boolean = false) = {
    // 4x4 grid over bbox (0,0,4,4), pixel size 1, values 0..15 with row
    // 0 at the TOP (rasterio from_bounds layout); NaN nodata = no row
    val t = java.sql.Timestamp.valueOf("2020-01-01 00:00:00")
    val px = for {
      row <- 0 until 4; colI <- 0 until 4
      v = (row * 4 + colI).toDouble
      if !(dropNaNPixel && row == 0 && colI == 0)
    } yield (t, row, colI, v, 0.5 + colI, 3.5 - row)
    px.toDF("t", "y", "x", "v", "lon", "lat")
  }

  private def square(id: String, x0: Double, y0: Double, x1: Double, y1: Double) =
    (id, x0, x1, y0, y1,
      s"POLYGON(($x0 $y0, $x1 $y0, $x1 $y1, $x0 $y1, $x0 $y0))")

  test("zonal: full extent aggregates all 16 pixels (count/min/max/sum)") {
    val b = Seq(square("all", 0, 0, 4, 4))
      .toDF("boundary_id", "bw", "be", "bs", "bn", "geom_wkt")
    val r = Zonal.zonalStats(zonalFixture(), b).collect().head
    assert(r.getAs[Long]("zcount") == 16L)
    assert(r.getAs[Double]("zmin") == 0.0 && r.getAs[Double]("zmax") == 15.0)
    assert(r.getAs[Double]("zsum") == 120.0)
  }

  test("zonal: partial geometry counts fewer pixels (bottom-left quadrant = 4)") {
    val b = Seq(square("q", 0, 0, 2, 2))
      .toDF("boundary_id", "bw", "be", "bs", "bn", "geom_wkt")
    val r = Zonal.zonalStats(zonalFixture(), b).collect().head
    assert(r.getAs[Long]("zcount") == 4L) // pixel centers in [0,2)^2
    assert(r.getAs[Double]("zsum") == 8.0 + 9 + 12 + 13)
  }

  test("zonal: none/invalid and non-intersecting geometries return NULL stats") {
    val b = Seq(
      ("none", 0.0, 4.0, 0.0, 4.0, null: String),
      square("far", 100, 100, 101, 101))
      .toDF("boundary_id", "bw", "be", "bs", "bn", "geom_wkt")
    val rows = Zonal.zonalStats(zonalFixture(), b).collect()
    assert(rows.length == 2) // the frame keeps every boundary
    rows.foreach { r =>
      assert(r.isNullAt(r.fieldIndex("zmean")), r.getString(0))
      assert(r.isNullAt(r.fieldIndex("zcount")), r.getString(0))
    }
  }

  test("zonal: NaN pixels are excluded from the count") {
    val b = Seq(square("all", 0, 0, 4, 4))
      .toDF("boundary_id", "bw", "be", "bs", "bn", "geom_wkt")
    val r = Zonal.zonalStats(zonalFixture(dropNaNPixel = true), b).collect().head
    assert(r.getAs[Long]("zcount") == 15L)
  }

  // ---- test_temporal.py ----------------------------------------------

  private def monthly(values: Seq[Double], startYear: Int = 2020) =
    values.zipWithIndex.map { case (v, i) =>
      (java.sql.Timestamp.valueOf(
        f"${startYear + i / 12}%04d-${i % 12 + 1}%02d-01 00:00:00"), v)
    }.toDF("t", "v")

  test("temporal_aggregate: whole-series mean 2.5 and sum 10") {
    val da = monthly(Seq(1.0, 2.0, 3.0, 4.0))
    val r = da.agg(avg("v"), sum("v")).collect().head
    assert(r.getDouble(0) == 2.5 && r.getDouble(1) == 10.0)
  }

  test("temporal_aggregate: monthly resampled to yearly means 5.5 and 17.5") {
    val da = monthly((0 until 24).map(_.toDouble))
    val got = da.groupBy(year(col("t")).as("yr")).agg(avg("v").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDouble(1)).toMap
    assert(got == Map(2020 -> 5.5, 2021 -> 17.5))
  }

  test("anomaly: absolute [6,8] and relative 0.5 against the baseline mean") {
    val value = monthly(Seq(10.0, 12.0))
    val baseline = monthly(Seq(2.0, 4.0, 6.0)) // mean 4.0
    val base = baseline.agg(avg("v").as("bm"))
    val abs = value.crossJoin(base).select((col("v") - col("bm")).as("a"))
      .orderBy("a").collect().map(_.getDouble(0)).toSeq
    assert(abs == Seq(6.0, 8.0))
    val rel = monthly(Seq(6.0)).crossJoin(base)
      .select(((col("v") - col("bm")) / col("bm")).as("r")).collect().head.getDouble(0)
    assert(rel == 0.5)
  }

  test("climatology: JJA mean of month-valued year is 7.0; no season = whole mean") {
    val cube = monthly((1 to 12).map(_.toDouble))
    val jja = cube.filter(month(col("t")).isin(6, 7, 8))
      .agg(avg("v")).collect().head.getDouble(0)
    assert(jja == 7.0)
    assert(monthly(Seq(1.0, 2.0, 3.0, 4.0)).agg(avg("v"))
      .collect().head.getDouble(0) == 2.5)
  }

  test("seasonal anomaly: JJA 13 vs baseline 10 -> +3.0 absolute, 0.3 relative") {
    val valueClim = monthly(Seq.fill(12)(13.0)).filter(month(col("t")).isin(6, 7, 8))
      .agg(avg("v")).collect().head.getDouble(0)
    val baseClim = monthly(Seq.fill(24)(10.0)).filter(month(col("t")).isin(6, 7, 8))
      .agg(avg("v")).collect().head.getDouble(0)
    assert(valueClim - baseClim == 3.0)
    assert((valueClim - baseClim) / baseClim == 0.3)
  }

  test("select_season: DJF keeps only Dec/Jan/Feb — 6 of 24 monthly steps") {
    val da = monthly((0 until 24).map(_.toDouble))
    val djf = da.filter(month(col("t")).isin(12, 1, 2))
    assert(djf.count() == 6)
    assert(djf.select(month(col("t"))).distinct().collect()
      .map(_.getInt(0)).sorted.toSeq == Seq(1, 2, 12))
  }

  /** The engine's least-squares slope (a5_trend's exact formula). */
  private def slopeOf(yearly: org.apache.spark.sql.DataFrame): Double =
    yearly.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum(col("x") * col("y")).as("sxy"), sum(col("x") * col("x")).as("sxx"))
      .select(((col("n") * col("sxy") - col("sx") * col("sy")).cast("double")
        / (col("n") * col("sxx") - col("sx") * col("sx")).cast("double")))
      .collect().head.getDouble(0)

  test("trend: +2/year slope, flat series slope 0, season-aware ignores junk months") {
    val rising = Seq((2000L, 0.0), (2001L, 2.0), (2002L, 4.0), (2003L, 6.0))
      .toDF("x", "y")
    assert(slopeOf(rising) == 2.0)
    val flat = Seq((2000L, 7.0), (2001L, 7.0), (2002L, 7.0), (2003L, 7.0), (2004L, 7.0))
      .toDF("x", "y")
    assert(slopeOf(flat) == 0.0)
    // 3 years monthly: JJA rises 10/12/14, every other month is junk
    // that would wreck the fit without season filtering
    val vals = for (t <- 0 until 36) yield {
      val yearIdx = t / 12; val m = t % 12 + 1
      (2000 + yearIdx, m, if (Set(6, 7, 8)(m)) 10.0 + 2 * yearIdx else 99999.0)
    }
    val yearlyJJA = vals.toDF("yr", "m", "v")
      .filter(col("m").isin(6, 7, 8))
      .groupBy(col("yr").cast("long").as("x")).agg(avg("v").as("y"))
    assert(slopeOf(yearlyJJA) == 2.0)
  }

  // ---- test_calendar.py ----------------------------------------------

  test("noleap -> standard never invents Feb 29") {
    // noleap days spanning a leap-year Feb boundary: doy 57..61 of 2020
    // (Feb 26..28, Mar 1..2 in the noleap calendar) — the standard
    // mapping must hit those month/day pairs, none of them Feb 29
    val doys = Seq(57, 58, 59, 60, 61).toDF("doy")
    val mapped = doys.select(
      expr(GeoCal.noleapMonthOf("doy")).as("m"),
      (col("doy") - expr(GeoCal.noleapCumBefore("doy"))).as("d"))
      .collect().map(r => (r.getInt(0), r.getAs[Number]("d").intValue()))
    assert(mapped.toSeq == Seq((2, 26), (2, 27), (2, 28), (3, 1), (3, 2)))
    assert(!mapped.contains((2, 29)))
  }

  // ---- test_regrid.py ------------------------------------------------

  test("regrid: identity grid returns the same values; nearest upsample preserves range") {
    // identity: each target pixel's nearest source is itself
    val src = Seq((0, 0, 1.0), (0, 1, 2.0), (1, 0, 3.0), (1, 1, 4.0))
      .toDF("y", "x", "v")
    val idProbes = spark.range(2).select(col("id").cast("int").as("yt"))
      .crossJoin(spark.range(2).select(col("id").cast("int").as("xt")))
      .select(col("yt"), col("xt"), col("yt").as("sy"), col("xt").as("sx"))
    val ident = src.join(idProbes, col("y") === col("sy") && col("x") === col("sx"))
      .select("yt", "xt", "v").collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    assert(ident == Map((0, 0) -> 1.0, (0, 1) -> 2.0, (1, 0) -> 3.0, (1, 1) -> 4.0))
    // 2x2 -> 4x4 nearest: each source pixel covers a 2x2 target block;
    // the value RANGE is preserved exactly (reference asserts min/max)
    val up = spark.range(4).select(col("id").cast("int").as("yt"))
      .crossJoin(spark.range(4).select(col("id").cast("int").as("xt")))
      .select(col("yt"), col("xt"),
        (col("yt") / 2).cast("int").as("sy"), (col("xt") / 2).cast("int").as("sx"))
    val vals = Seq((0, 0, 0.0), (0, 1, 10.0), (1, 0, 20.0), (1, 1, 30.0))
      .toDF("y", "x", "v")
      .join(up, col("y") === col("sy") && col("x") === col("sx"))
      .select("v").collect().map(_.getDouble(0))
    assert(vals.length == 16 && vals.min == 0.0 && vals.max == 30.0)
  }
}
