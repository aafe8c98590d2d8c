package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

import graft.functions.{Haversine, QDotProduct, SpanHashWindows, SpanHashWindowsLong, TileMaskedStats, TileStatsPartial}

/** Deployment-grade wiring for the engine's native expressions:
  * `--conf spark.sql.extensions=graft.GraftExtensions` makes
  * `haversine_km`, `tile_stats_partial`, `tile_masked_stats` and
  * `span_hash_windows` available to pure-SQL users on every session of
  * the cluster, with no driver code. `Sessions.build` registers the
  * same builders imperatively for embedded use (`functions.Registry`);
  * this class is the injection path a spark-submit / Thrift-server
  * deployment uses.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions._

  override def apply(ext: SparkSessionExtensions): Unit = {
    builders.foreach { case (name, usage, builder) =>
      // 5-arg ctor is (className, db, name, usage, extended) — the
      // 3-arg one binds (className, db, name) and would file the usage
      // string as the function NAME in DESCRIBE FUNCTION output
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, null, name, usage, ""),
        builder))
    }
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
  }
}

object GraftExtensions {
  /** (name, usage, builder) triples shared by the extension injection
    * and the imperative registry so both paths stay in sync. */
  val builders: Seq[(String, String, Seq[Expression] => Expression)] = Seq(
    ("haversine_km", "haversine_km(lat1, lon1, lat2, lon2) - great-circle km",
      exprs => Haversine(exprs(0), exprs(1), exprs(2), exprs(3))),
    ("tile_stats_partial", "tile_stats_partial(tile) - per-tile stat partials",
      exprs => TileStatsPartial(exprs.head)),
    ("tile_masked_stats", "tile_masked_stats(tile, mask) - masked tile stats",
      exprs => TileMaskedStats(exprs(0), exprs(1))),
    ("span_hash_windows", "span_hash_windows(tokens, w) - md5 of every w-token window",
      exprs => SpanHashWindows(exprs(0), exprs(1))),
    ("span_hash_windows_long",
      "span_hash_windows_long(tokens, w) - 60-bit integer md5 of every w-token window",
      exprs => SpanHashWindowsLong(exprs(0), exprs(1))),
    ("q_dot", "q_dot(a, b) - exact integer dot product of two quantized vectors",
      exprs => QDotProduct(exprs(0), exprs(1))))
}
