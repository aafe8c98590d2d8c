package graft.grid

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Tiled grid layout — the engine's 100 TB storage representation
  * (SURVEY §1.3): one row per (collection, variable, time, tile_y,
  * tile_x) carrying a `tile: array<double>` of TH×TW row-major pixels
  * with NULL nodata, partitioned on disk by (collection, variable,
  * date(time)) and clustered by (tile_y, tile_x).
  *
  * Why tiles: a 0.05° global grid is 7200×3600 pixels — one row per
  * pixel is 26M rows *per timestep*; one row per grid is a 100 MB cell
  * no columnar format handles well. 256² tiles give ~400 rows per
  * timestep, parquet min/max statistics on tile_x/tile_y give free
  * spatial predicate pushdown (the COG-window trick,
  * ingestion/asset_writer.py:168-186), and every elementwise op stays a
  * codegen'd higher-order function over a contiguous array.
  *
  * All tile operators are pure Column expressions (zip_with/transform/
  * aggregate/filter) — no UDF, no shuffle for elementwise math; stats
  * reduce per-tile first (map-side) and only the tiny partials shuffle.
  */
object Tile {

  /** Chip a long-form pixel frame (t,y,x,v) into tiles of th×tw.
    * Absent pixels become NULL (nodata). */
  def chip(long: DataFrame, th: Int, tw: Int): DataFrame = {
    long
      .withColumn("tile_y", (col("y") / th).cast("int"))
      .withColumn("tile_x", (col("x") / tw).cast("int"))
      .withColumn("off", (col("y") % th) * tw + (col("x") % tw))
      .groupBy("t", "tile_y", "tile_x")
      .agg(map_from_arrays(collect_list(col("off")), collect_list(col("v"))).as("cells"))
      .select(col("t"), col("tile_y"), col("tile_x"),
        expr(s"transform(sequence(0, ${th * tw - 1}), i -> cells[i])").as("tile"))
  }

  /** Explode a tiled frame back to long form, dropping nodata. */
  def unchip(tiles: DataFrame, th: Int, tw: Int): DataFrame =
    tiles
      .select(col("t"), col("tile_y"), col("tile_x"),
        posexplode(col("tile")).as(Seq("off", "v")))
      .filter(col("v").isNotNull)
      .select(col("t"),
        (col("tile_y") * th + (col("off") / tw).cast("int")).as("y"),
        (col("tile_x") * tw + col("off") % tw).as("x"),
        col("v"))

  // ---- elementwise tile algebra (NaN-aware via NULL) ----------------

  /** tile-wise a+b with nansum semantics: missing counts as 0, so an
    * all-missing cell yields 0.0 — np.nansum's observed behavior in
    * geoprocessing/algebra.py:46-47. Native kernel — zip_with lambdas
    * evaluate interpreted per element (see SCALE.md). */
  def addTiles(a: Column, b: Column): Column =
    graft.functions.TileAlgebraOp("add_nansum")(a, b)

  /** tile-wise difference (anomaly): NULL propagates. */
  def subTiles(a: Column, b: Column): Column =
    graft.functions.TileAlgebraOp("sub")(a, b)

  /** tile-wise product (weighting/masking). */
  def mulTiles(a: Column, b: Column): Column =
    graft.functions.TileAlgebraOp("mul")(a, b)

  /** tile-wise safe divide. */
  def divTiles(a: Column, b: Column): Column =
    graft.functions.TileAlgebraOp("div_safe")(a, b)

  /** N-way weighted combine with NaN-masked weight renormalization
    * (geoprocessing/algebra.py:33-74 at tile granularity): cell value =
    * Σ wᵢ·vᵢ / Σ {wᵢ : vᵢ valid}; all-missing ⇒ NULL. `inputs` pairs
    * each tile column with its scalar weight. */
  def weightedCombineTiles(inputs: Seq[(Column, Double)]): Column = {
    val num = inputs.map { case (t, w) =>
      transform(t, v => coalesce(v * w, lit(0.0)))
    }.reduce((a, b) => zip_with(a, b, _ + _))
    val den = inputs.map { case (t, w) =>
      transform(t, v => when(v.isNotNull, lit(w)).otherwise(lit(0.0)))
    }.reduce((a, b) => zip_with(a, b, _ + _))
    zip_with(num, den, (n, d) => when(d === 0.0, lit(null)).otherwise(n / d))
  }

  /** scalar affine transform over a tile (unit conversion). */
  def affineTile(t: Column, factor: Double, offset: Double): Column =
    transform(t, x => x * factor + offset)

  /** per-tile stats partials: (n, sum, sumsq, min, max) over valid cells.
    * Aggregate these per group then finalize — map-side combine for free.
    * Backed by the native TileStatsPartial expression: higher-order
    * aggregate/filter lambdas are interpreted per element and measured
    * 2–6× slower than this compiled single pass. */
  def tilePartials(t: Column): Column =
    graft.functions.TileStatsPartial.tileStatsPartial(t)

  /** Finalize stats from summed partials: mean/std/min/max/count. */
  def finalizeStats(df: DataFrame, groupCols: Seq[String]): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(
        sum(col("p.n")).as("n"),
        sum(col("p.sum")).as("s1"),
        sum(col("p.sumsq")).as("s2"),
        min(col("p.mn")).as("vmin"),
        max(col("p.mx")).as("vmax"))
      .select((groupCols.map(col) ++ Seq(
        col("n"), (col("s1") / col("n")).as("vmean"),
        sqrt(col("s2") / col("n") - (col("s1") / col("n")) * (col("s1") / col("n"))).as("vstd"),
        col("vmin"), col("vmax"))): _*)
}
