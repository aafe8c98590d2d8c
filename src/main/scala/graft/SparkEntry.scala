package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.QueryModule

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Aggregates every engine module's registered queries. Each query has a
  * matching DuckDB oracle SQL (same column names — the driver's compare
  * sorts columns by name before hashing) unless the operator is not
  * SQL-expressible, in which case the driver records a rows-only check.
  */
object SparkEntry {

  /** All engine modules contributing verified queries. */
  def modules: Seq[QueryModule] = Seq(
    graft.catalog.Search,
    graft.ops.ScalarQueries,
    graft.ops.AggQueries,
    graft.grid.GridQueries,
    graft.llm.TextQueries,
    graft.llm.DedupQueries,
    graft.llm.SimilarityQueries,
    graft.llm.CurationQueries,
    graft.llm.PipelineQueries,
    graft.engine.EngineQueries,
    graft.ops.GeoCalQueries,
    graft.llm.MultimodalQueries,
    graft.catalog.Sql,
    graft.serve.DocQueries
  )

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Star join lineitem ⋈ orders ⋈ customer ⋈ nation ⋈ region with
    * broadcast dims + exact-integer pricing aggregation — the engine's
    * bread-and-butter plan shape. */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    val li = Tables.lineitem(spark, dir)
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity")).cast("double").as("sum_qty"))
  }

  /** One per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    modules.flatMap(_.queries).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    modules.flatMap(_.oracleSql).toMap

  /** Cache lifecycle: release every module's per-dataset materialized
    * frames (the shared-index pattern) for one dataset / for all.
    * Harnesses call this between datasets; a long-lived service calls
    * evict when a dataset is retired. */
  def evictCaches(dir: String): Unit = {
    modules.foreach(_.evictCaches(dir))
    Tables.evictCache(dir)
  }
  def clearCaches(): Unit = {
    modules.foreach(_.clearCaches())
    Tables.clearCache()
  }
}
