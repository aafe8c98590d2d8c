package graft.serve

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.grid.{GridStore, Overviews}

/** Serving-layer overview routing (SURVEY §4; the reference serves
  * zoomed-out reads from COG overview levels,
  * ingestion/asset_writer.py:188-211 + titiler's reader): persisted
  * overview TABLES beside the base cube, and a read function that
  * routes a (bbox, resolution) request to the coarsest level whose
  * pixel size still satisfies it. Callers stop hand-picking levels —
  * the router owns the base-table-vs-overview decision, so a tile
  * server pays 1/f² of the scan whenever the request resolution
  * permits.
  */
object OverviewServe {

  /** Overview table location: `<base>_ov<factor>` beside the base. */
  def ovPath(basePath: String, level: Int): String =
    if (level == 1) basePath else s"${basePath}_ov$level"

  /** Build + persist the overview pyramid beside the base store.
    * Level f holds the mean of `v` over f×f tile blocks. Levels
    * cascade: each one aggregates the PREVIOUS level's (sum, count)
    * partials — sum-of-sums ≡ direct sum, so every level is exactly
    * the full-res aggregate while the base cube is scanned once, not
    * once per level (the s8_overview_pyramid shape, persisted). */
  def writeOverviews(spark: SparkSession, basePath: String,
                     levels: Seq[Int] = Seq(2, 4)): Unit = {
    require(levels.nonEmpty && levels == levels.sorted && levels.head >= 2,
      s"overview levels must be ascending factors >= 2, got $levels")
    levels.foldLeft(1) { (prev, f) =>
      // strictly ascending, not merely sorted: a duplicated level (e.g.
      // Seq(2, 2)) passes both the sorted check and f % prev == 0, then
      // skips persisting an intermediate consumed twice and overwrites
      // the same _ov path twice (r14 ADVICE)
      require(f > prev && f % prev == 0,
        s"overview level $f does not cascade from $prev (factors must divide and strictly ascend)")
      f
    }
    // Cache policy (r14, measured at the 1 Gpx SoakGrid decade): only
    // a frame with MORE THAN ONE consuming action earns a persist.
    // The base scan has exactly one (the first level's aggregate), so
    // caching it wrote the whole corpus into the block manager for a
    // single consumer — at 4,000 granules that is ~1 Gpx of rows
    // evicting everything else. Intermediate partials ARE consumed
    // twice (their own write + the next level's aggregate) and are
    // 1/f² of the corpus; they stay cached, serialized so the bounded
    // footprint stays small. The last level's partials have one
    // consumer again — not cached.
    var prev = GridStore.read(spark, basePath)
      .select(col("collection"), col("t"), col("tile_y"), col("tile_x"),
        col("v").cast("double").as("s"), lit(1L).as("n"))
    var prevF = 1
    try levels.foreach { f =>
      val step = f / prevF
      // floor, not truncation: readBbox rescales the request bbox with
      // Math.floorDiv, and the two must agree for negative tile coords
      // (truncation rounds toward zero, floorDiv toward -inf)
      val agg = prev.groupBy(col("collection"), col("t"),
          floor(col("tile_y") / step).cast("int").as("tile_y"),
          floor(col("tile_x") / step).cast("int").as("tile_x"))
        .agg(sum("s").as("s"), sum("n").as("n"))
      val next = if (f == levels.last) agg
        else agg.persist(
          org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER)
      GridStore.write(next.select(col("collection"), col("t"),
        col("tile_y"), col("tile_x"),
        (col("s") / col("n")).as("v"), col("n").as("n_base")), ovPath(basePath, f))
      prev.unpersist()
      prev = next
      prevF = f
    } finally prev.unpersist()
  }

  /** Time-range + tile-bbox read routed to the coarsest level whose
    * pixel size still meets `requestedPxDeg` (Overviews.selectLevel).
    * The bbox arrives in FULL-RES tile coordinates and is rescaled to
    * the chosen level; both predicates stay sargable, so partition
    * pruning (time) and row-group pruning (tile min/max) apply to the
    * overview scan exactly as they do to a base scan. Output carries
    * the chosen `level` so the renderer knows its ground resolution. */
  def readBbox(spark: SparkSession, basePath: String, levels: Seq[Int],
               basePxDeg: Double, requestedPxDeg: Double,
               from: String, to: String,
               tx0: Int, tx1: Int, ty0: Int, ty1: Int): DataFrame = {
    val level = Overviews.selectLevel(levels, basePxDeg, requestedPxDeg)
    GridStore.readRange(spark, ovPath(basePath, level), from, to,
        Math.floorDiv(tx0, level), Math.floorDiv(tx1, level),
        Math.floorDiv(ty0, level), Math.floorDiv(ty1, level))
      .withColumn("level", lit(level))
  }
}
