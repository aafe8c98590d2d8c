package graft.functions

import graft.SparkSpec
import graft.grid.{Grid, Tile}
import org.apache.spark.sql.functions._

class TileDownsampleSpec extends SparkSpec {
  import spark.implicits._

  test("2x downsample averages valid cells, NULL when block all-invalid") {
    val df = Seq(1).toDF("i").select(TileDownsample2x.downsample2x(
      expr("array(1.0D, 3.0D, 5.0D, CAST(NULL AS DOUBLE)," + // row0
           "      7.0D, 9.0D, CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))"), // row1
      2, 4).as("o"))
    // blocks: [1,3,7,9] → 5.0; [5,NULL,NULL,NULL] → 5.0
    assert(df.collect()(0).getSeq[Any](0) == Seq(5.0, 5.0))
    val allNull = Seq(1).toDF("i").select(TileDownsample2x.downsample2x(
      expr("array(CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)," +
           "      CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE))"), 2, 2).as("o"))
    assert(allNull.collect()(0).getSeq[Any](0) == Seq(null))
  }

  test("tile-level pyramid equals explode+groupBy average downsample") {
    val long = Grid.fromLineitem(spark, sf0001)
    val tiles = Tile.chip(long, 16, 16)
    // tile path: downsample each tile, then re-address tiles (tile grid
    // coords stay; cell addressing halves)
    val tilePath = tiles.select(col("t"), col("tile_y"), col("tile_x"),
        TileDownsample2x.downsample2x(col("tile"), 16, 16).as("tile"))
    // explode path oracle
    val direct = long
      .groupBy(col("t"), (col("y") / 2).cast("int").as("yt"),
        (col("x") / 2).cast("int").as("xt"))
      .agg((sum(col("v")) / count(lit(1))).as("v"))
    // compare via global checksums (addressing differs; values must match
    // as a multiset per timestep)
    val a = Tile.unchip(tilePath, 8, 8).groupBy("t")
      .agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val b = direct.groupBy("t").agg(count(lit(1)).as("n"), sum(col("v")).as("s"))
    val j = a.as("a").join(b.as("b"), "t")
      .filter(col("a.n") =!= col("b.n") || abs(col("a.s") - col("b.s")) > 1e-6)
    assert(j.isEmpty)
  }
}
