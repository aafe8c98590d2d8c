package graft.serve

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Overview routing: the serving read must CHOOSE the coarsest
  * sufficient level (asserted on the files actually scanned), and the
  * served values must agree with the full-resolution answer. */
class OverviewServeSpec extends SparkSpec {

  private val PX = 0.25 // base pixel size, degrees

  private def buildStore(): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("ovserve").toString + "/cube"
    val cube = (for (ty <- 0 until 64; tx <- 0 until 64)
      yield ("c", ty, tx, (ty * 3 + tx * 7 % 13).toDouble))
      .toDF("collection", "tile_y", "tile_x", "v")
      .withColumn("t", to_timestamp(lit("2024-01-02 00:00:00")))
    graft.grid.GridStore.write(cube, dir)
    OverviewServe.writeOverviews(spark, dir, Seq(2, 4))
    dir
  }

  test("a coarse request routes to the coarsest sufficient overview table") {
    val dir = buildStore()
    // requested 1.1 deg/px, base 0.25: level 4 (1.0 deg) suffices, 8 absent
    val df = OverviewServe.readBbox(spark, dir, Seq(1, 2, 4),
      basePxDeg = PX, requestedPxDeg = 1.1,
      from = "2024-01-01", to = "2024-01-03", tx0 = 0, tx1 = 31, ty0 = 0, ty1 = 31)
    assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("_ov4")),
      s"expected only _ov4 scans, got ${df.inputFiles.take(3).mkString(", ")}")
    assert(df.select("level").distinct().collect().map(_.getInt(0)).toSeq == Seq(4))
    // 32x32 full-res tiles -> 8x8 level-4 blocks
    assert(df.count() == 64)
    // block-mean cascade is exact: the bbox is level-aligned, so the
    // served mean equals the full-resolution mean over the same bbox
    val servedMean = df.agg(sum(col("v") * col("n_base")) / sum("n_base"))
      .collect().head.getDouble(0)
    val fullMean = graft.grid.GridStore.readRange(spark, dir,
        "2024-01-01", "2024-01-03", 0, 31, 0, 31)
      .agg(avg("v")).collect().head.getDouble(0)
    assert(math.abs(servedMean - fullMean) < 1e-9,
      s"served $servedMean vs full-res $fullMean")
  }

  test("a full-resolution request routes to the base table") {
    val dir = buildStore()
    val df = OverviewServe.readBbox(spark, dir, Seq(1, 2, 4),
      basePxDeg = PX, requestedPxDeg = 0.3, // only level 1 satisfies
      from = "2024-01-01", to = "2024-01-03", tx0 = 0, tx1 = 7, ty0 = 0, ty1 = 7)
    assert(df.inputFiles.nonEmpty && !df.inputFiles.exists(_.contains("_ov")),
      "full-res request must scan the base table")
    assert(df.count() == 64) // 8x8 tiles, untouched resolution
  }

  test("the registered s10c serving query scans the _ov4 table, never base tiles") {
    val df = graft.grid.GridQueries.queries("s10c_served_overview")(spark, sf0001)
    val files = df.inputFiles
    assert(files.nonEmpty && files.forall(_.contains("_ov4")),
      s"s10c must route to the persisted level-4 overview, scanned: " +
        files.take(3).mkString(", "))
    // and the routed answer equals a base-level recompute, exactly
    // (BIGINT partial cascade): same rows, same means
    val base = graft.grid.Grid.fromLineitem(spark, sf0001)
      .groupBy(col("t"), (col("y") / 4).cast("int").as("yt"),
               (col("x") / 4).cast("int").as("xt"))
      .agg((sum(col("v").cast("long")).cast("double") / count(lit(1))).as("v"),
        count(lit(1)).as("n"))
    assert(df.count() == base.count())
    assert(df.join(base, Seq("t", "yt", "xt"))
      .filter(df("v") =!= base("v") || df("n") =!= base("n")).count() == 0,
      "served values must equal the base-level recompute bit-for-bit")
  }

  test("negative tile coordinates bucket and route consistently (floor, not truncation)") {
    import spark.implicits._
    // tiles straddle the origin: truncating division would bucket
    // tile_y = -1 into block 0 while readBbox's floorDiv asks block -1
    val dir = java.nio.file.Files.createTempDirectory("ovserveneg").toString + "/cube"
    val cube = (for (ty <- -8 until 8; tx <- -8 until 8)
      yield ("c", ty, tx, (ty * 5 + tx).toDouble))
      .toDF("collection", "tile_y", "tile_x", "v")
      .withColumn("t", to_timestamp(lit("2024-01-02 00:00:00")))
    graft.grid.GridStore.write(cube, dir)
    OverviewServe.writeOverviews(spark, dir, Seq(2, 4))
    val df = OverviewServe.readBbox(spark, dir, Seq(1, 2, 4),
      basePxDeg = PX, requestedPxDeg = 1.1, // level 4
      from = "2024-01-01", to = "2024-01-03",
      tx0 = -8, tx1 = 7, ty0 = -8, ty1 = 7)
    // 16x16 full-res tiles -> 4x4 level-4 blocks spanning -2..1
    assert(df.count() == 16, df.count().toString)
    val coords = df.select("tile_y", "tile_x").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(coords.forall { case (y, x) => y >= -2 && y <= 1 && x >= -2 && x <= 1 },
      coords.mkString(", "))
    // exact block-mean cascade holds across the origin too
    val servedMean = df.agg(sum(col("v") * col("n_base")) / sum("n_base"))
      .collect().head.getDouble(0)
    val fullMean = graft.grid.GridStore.readRange(spark, dir,
        "2024-01-01", "2024-01-03", -8, 7, -8, 7)
      .agg(avg("v")).collect().head.getDouble(0)
    assert(math.abs(servedMean - fullMean) < 1e-9,
      s"served $servedMean vs full-res $fullMean")
  }

  test("mid-zoom picks the intermediate level and rescales the bbox") {
    val dir = buildStore()
    val df = OverviewServe.readBbox(spark, dir, Seq(1, 2, 4),
      basePxDeg = PX, requestedPxDeg = 0.6, // level 2 (0.5) ok, level 4 (1.0) too coarse
      from = "2024-01-01", to = "2024-01-03", tx0 = 8, tx1 = 15, ty0 = 8, ty1 = 15)
    assert(df.inputFiles.forall(_.contains("_ov2")))
    // tiles 8..15 -> level-2 blocks 4..7 in each axis
    assert(df.count() == 16)
    val coords = df.select("tile_y", "tile_x").collect()
      .map(r => (r.getInt(0), r.getInt(1)))
    assert(coords.forall { case (y, x) => y >= 4 && y <= 7 && x >= 4 && x <= 7 })
  }

  test("duplicated overview levels are rejected (strictly ascending)") {
    // Seq(2, 2) passes a sorted check and 2 % 2 == 0, but a duplicate
    // level would skip persisting an intermediate consumed twice and
    // overwrite the same _ov path twice (r14 ADVICE) — must throw.
    val dir = buildStore()
    val e = intercept[IllegalArgumentException] {
      OverviewServe.writeOverviews(spark, dir, Seq(2, 2))
    }
    assert(e.getMessage.contains("strictly ascend"), e.getMessage)
  }

  test("writeOverviews caches only reused partials and unpersists everything") {
    // r14 cache policy: the corpus-sized base scan (one consumer) must
    // never enter the block manager, and every intermediate partial it
    // DOES cache must be gone when the build returns — at the 1 Gpx
    // soak decade a cached base scan is the difference between a
    // bounded build and one that evicts the whole storage pool.
    import spark.implicits._
    val sc = spark.sparkContext
    val before = sc.getPersistentRDDs.keySet
    val dir = java.nio.file.Files.createTempDirectory("ovcache").toString + "/cube"
    val cube = (for (ty <- 0 until 16; tx <- 0 until 16)
      yield ("c", ty, tx, (ty + tx).toDouble))
      .toDF("collection", "tile_y", "tile_x", "v")
      .withColumn("t", to_timestamp(lit("2024-01-02 00:00:00")))
    graft.grid.GridStore.write(cube, dir)
    var liveDuring = Set.empty[Int]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        liveDuring = liveDuring ++ sc.getPersistentRDDs.keySet.diff(before)
    }
    sc.addSparkListener(listener)
    try OverviewServe.writeOverviews(spark, dir, Seq(2, 4))
    finally sc.removeSparkListener(listener)
    // nothing lingers after the build
    assert(sc.getPersistentRDDs.keySet.diff(before).isEmpty,
      "writeOverviews left cached blocks behind")
    // and at most the ONE reused intermediate level was ever cached
    // (Seq(2, 4): level-2 partials are consumed twice; base and the
    // last level are single-consumer and must not persist). One
    // DataFrame.persist can register a small bounded number of RDDs,
    // but a cached base scan would at least double the set — pin the
    // intent loosely enough to survive internal RDD bookkeeping.
    assert(liveDuring.size <= 2,
      s"expected only the reused level-2 partials cached, saw RDD ids $liveDuring")
  }
}
