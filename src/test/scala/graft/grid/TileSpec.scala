package graft.grid

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TileSpec extends SparkSpec {
  import spark.implicits._

  private lazy val long = Grid.fromLineitem(spark, sf0001).cache()

  test("chip → unchip round-trips the long-form grid exactly") {
    val tiles = Tile.chip(long, 16, 16)
    val back = Tile.unchip(tiles, 16, 16)
    assert(back.count() == long.count())
    assert(back.except(long).isEmpty && long.except(back).isEmpty)
  }

  test("tile partials reproduce the long-form global stats") {
    val tiles = Tile.chip(long, 16, 16)
      .withColumn("p", Tile.tilePartials(col("tile")))
    val fromTiles = Tile.finalizeStats(tiles, Seq("t"))
      .select("t", "n", "vmean", "vmin", "vmax")
    val fromLong = long.groupBy("t").agg(
      count(lit(1)).as("n"),
      avg(col("v")).as("vmean"),
      min(col("v")).as("vmin"),
      max(col("v")).as("vmax"))
    val joined = fromTiles.as("a").join(fromLong.as("b"), "t")
      .select(
        (col("a.n") === col("b.n")).as("n_ok"),
        (abs(col("a.vmean") - col("b.vmean")) < 1e-9).as("mean_ok"),
        (col("a.vmin") === col("b.vmin") && col("a.vmax") === col("b.vmax")).as("mm_ok"))
    assert(joined.collect().forall(r => r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2)))
  }

  test("addTiles uses np.nansum semantics: all-missing cell sums to 0.0") {
    val r = Seq(1).toDF("i").select(Tile.addTiles(
        expr("array(1.0D, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), 4.0D)"),
        expr("array(10.0D, 20.0D, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))")).as("r"))
      .collect()(0).getSeq[Any](0)
    assert(r == Seq(11.0, 20.0, 0.0, 4.0))
  }

  test("divTiles: zero denominator yields NULL cell") {
    val df = Seq(1).toDF("i").select(
      Tile.divTiles(
        expr("array(10.0D, 5.0D, 1.0D)"),
        expr("array(2.0D, 0.0D, CAST(NULL AS DOUBLE))")).as("r"))
    assert(df.collect()(0).getSeq[Any](0) == Seq(5.0, null, null))
  }

  test("weightedCombineTiles renormalizes weights over valid cells") {
    val r = Seq(1).toDF("i").select(Tile.weightedCombineTiles(Seq(
        expr("array(10.0D, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))") -> 1.0,
        expr("array(20.0D, 30.0D, CAST(NULL AS DOUBLE))") -> 3.0)).as("r"))
      .collect()(0).getSeq[Any](0)
    // cell 0: (10·1 + 20·3)/(1+3) = 17.5; cell 1: 30·3/3 = 30; cell 2: NULL
    assert(r == Seq(17.5, 30.0, null))
  }

  test("affineTile applies unit conversion per cell") {
    val df = Seq(1).toDF("i").select(
      Tile.affineTile(expr("array(0.0D, 100.0D)"), 1.8, 32.0).as("r"))
    assert(df.collect()(0).getSeq[Any](0) == Seq(32.0, 212.0))
  }
}
