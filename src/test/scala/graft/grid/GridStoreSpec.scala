package graft.grid

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files

class GridStoreSpec extends SparkSpec {

  test("partitioned tile store prunes partitions on time and pushes tile predicates") {
    val path = Files.createTempDirectory("graft-store-").toString
    val tiles = Tile.chip(Grid.fromLineitem(spark, sf0001), 16, 16)
      .withColumn("collection", lit("chirps"))
    GridStore.write(tiles, path)

    val scoped = GridStore.readRange(spark, path,
      "1996-01-01", "1996-12-31", 0, 1, 0, 1)
    val plan = scoped.queryExecution.executedPlan.toString

    // partition pruning: only 1996 partitions survive the listing
    assert(plan.contains("PartitionFilters") &&
      plan.contains("p_date"), s"no partition filters in:\n$plan")
    // tile predicates reach the parquet scan
    assert(plan.contains("PushedFilters") && plan.contains("tile_x"),
      s"tile predicates not pushed:\n$plan")

    // and the data is right: matches an unpruned filter of the source
    val expect = tiles
      .filter(year(col("t")) === 1996 &&
        col("tile_x").between(0, 1) && col("tile_y").between(0, 1))
      .count()
    assert(scoped.count() == expect && expect > 0)
  }

  test("compaction coalesces small files per partition, content unchanged") {
    val path = Files.createTempDirectory("graft-compact-").toString
    val tiles = Tile.chip(Grid.fromLineitem(spark, sf0001), 16, 16)
      .withColumn("collection", lit("chirps"))
    // simulate incremental appends: three small writes
    for (_ <- 1 to 3)
      tiles.limit(40).withColumn("p_date", date_format(col("t"), "yyyy-MM-dd"))
        .write.mode("append").partitionBy("collection", "p_date").parquet(path)
    def parquetFiles() = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(path)).filter(_.getName.endsWith(".parquet"))
    }
    val before = spark.read.parquet(path).count()
    val filesBefore = parquetFiles().size
    GridStore.compact(spark, path)
    assert(spark.read.parquet(path).count() == before)
    assert(parquetFiles().size < filesBefore)
    // OPTIMIZE ZORDER cadence: re-clustering compaction is also
    // content-preserving and leaves files Morton-sorted
    val rows = spark.read.parquet(path)
      .select("tile_y", "tile_x", "t", "tile").collect().toSet
    GridStore.compact(spark, path, zOrdered = true)
    assert(spark.read.parquet(path)
      .select("tile_y", "tile_x", "t", "tile").collect().toSet == rows)
  }

  test("serving-mode cube cache: pins once per dir, evicts per dataset, clears fully") {
    import graft.Tables
    val dir = sf0001
    val was = Tables.cacheEnabled
    try {
      Tables.cacheEnabled = true
      Grid.clearCache()
      val a = Grid.fromLineitem(spark, dir)
      assert(Grid.fromLineitem(spark, dir) eq a,
        "same dir must serve the SAME pinned frame in serving mode")
      assert(a.storageLevel.useMemory, "serving-mode cube must be cached")
      Grid.evictCache(dir)
      assert(a.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "per-dataset eviction must unpersist the cube")
      val b = Grid.fromLineitem(spark, dir)
      assert(!(b eq a), "post-eviction access rebuilds")
      Grid.clearCache()
      assert(b.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
      Tables.cacheEnabled = false
      val c = Grid.fromLineitem(spark, dir)
      assert(c.storageLevel == org.apache.spark.storage.StorageLevel.NONE,
        "Verify mode (cache off) must keep raw derivations")
    } finally { Tables.cacheEnabled = was; Grid.clearCache() }
  }
}
