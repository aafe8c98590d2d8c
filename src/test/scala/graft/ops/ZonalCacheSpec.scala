package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Geometry-cache eviction policy: a working set of cap+1 distinct
  * geometries must NOT re-parse the whole set every pass (the old
  * clear-all-at-cap behavior). With single-entry eviction, a second
  * pass over the same set costs at most a small cascade of re-parses,
  * never a full storm. */
class ZonalCacheSpec extends SparkSpec {

  test("cap+1 working set does not trigger a full re-parse storm") {
    Zonal.cache.clear()
    Zonal.parses.set(0L)
    val n = Zonal.cacheCap + 1
    // n distinct unit triangles around distinct offsets; the probe point
    // sits inside each
    val geoms = spark.range(n).select(
      expr("concat('POLYGON((', id * 10, ' 0, ', id * 10 + 4, ' 0, ', id * 10, ' 4, ', id * 10, ' 0))')").as("geom_wkt"),
      (col("id") * 10 + 1).cast("double").as("lon"),
      lit(1.0).as("lat"))
      .coalesce(1) // one partition = one executor thread = one shared cache, deterministic accounting
      .cache()
    def pass() = geoms
      .filter(Zonal.containsPoint(col("geom_wkt"), col("lon"), col("lat")))
      .count()
    assert(pass() == n)
    val afterFirst = Zonal.parses.get()
    assert(afterFirst == n, s"first pass should parse each geometry once, got $afterFirst")
    assert(pass() == n)
    val total = Zonal.parses.get()
    // clear-all-at-cap would re-parse ~all n on the second pass
    // (total ≈ 2n); single eviction allows only a small cascade
    assert(total <= n + n / 8,
      s"second pass re-parsed ${total - n} of $n geometries — eviction is thrashing")
    Zonal.cache.clear()
  }
}
