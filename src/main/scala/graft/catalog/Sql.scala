package graft.catalog

import graft.Tables
import graft.model.QueryModule
import org.apache.spark.sql.SparkSession

/** SQL entry surface: the driver tables registered as temp views so
  * users query the engine with `spark.sql` directly — same Catalyst
  * plans as the DataFrame API. The verified query below runs the
  * near-identical text on both engines (modulo the exact-integer
  * summation discipline). */
object Sql extends QueryModule {

  def registerViews(spark: SparkSession, dir: String): Unit =
    Seq("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
      .foreach { t =>
        val df = if (t == "events") Tables.events(spark, dir)
                 else Tables.read(spark, dir, t)
        df.createOrReplaceTempView(t)
      }

  override def queries = Map(
    "sql_pricing_summary" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT l_returnflag, l_linestatus,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
          |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base,
          |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc,
          |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
          |  count(*) AS count_order
          |FROM lineitem
          |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
          |GROUP BY l_returnflag, l_linestatus""".stripMargin)
    })
  )

  override def oracleSql = Map(
    "sql_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) AS sum_qty,
        |  CAST(sum(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_base,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_disc,
        |  CAST(sum(CAST(l_quantity AS BIGINT)) AS DOUBLE) / count(*) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '2000-09-02'
        |GROUP BY l_returnflag, l_linestatus""".stripMargin
  )
}
