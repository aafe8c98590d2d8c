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
    }),

    // TPC-H Q3 shape (shipping priority): broadcast the filtered
    // customer dim, shuffle-join orders↔lineitem on the order key,
    // deterministic top-10 (ties broken on l_orderkey) via
    // TakeOrderedAndProject — no global sort materializes.
    "sql_shipping_priority" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT l_orderkey,
          |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
          |  o_orderdate, o_orderpriority
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |WHERE c_mktsegment = 'BUILDING'
          |  AND o_orderdate < TIMESTAMP '1998-03-15'
          |  AND l_shipdate > TIMESTAMP '1998-03-15'
          |GROUP BY l_orderkey, o_orderdate, o_orderpriority
          |ORDER BY revenue DESC, l_orderkey ASC
          |LIMIT 10""".stripMargin)
    }),

    // TPC-H Q5 shape (local supplier volume): intra-nation commerce in
    // one region-year — five joins, every dimension broadcast, ONE
    // fact-table shuffle (orders↔lineitem on the order key; the
    // customer=supplier nation equality folds into join conditions).
    "sql_local_volume" -> ((s, dir) => {
      registerViews(s, dir)
      s.sql(
        """SELECT n_name,
          |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
          |FROM customer
          |JOIN orders ON c_custkey = o_custkey
          |JOIN lineitem ON l_orderkey = o_orderkey
          |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          |JOIN nation ON s_nationkey = n_nationkey
          |JOIN region ON n_regionkey = r_regionkey
          |WHERE r_name = 'ASIA'
          |  AND o_orderdate >= TIMESTAMP '1997-01-01'
          |  AND o_orderdate < TIMESTAMP '1998-01-01'
          |GROUP BY n_name""".stripMargin)
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
        |GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "sql_shipping_priority" ->
      """SELECT l_orderkey,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |  AND o_orderdate < TIMESTAMP '1998-03-15'
        |  AND l_shipdate > TIMESTAMP '1998-03-15'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, l_orderkey ASC
        |LIMIT 10""".stripMargin,
    "sql_local_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(floor(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1997-01-01'
        |  AND o_orderdate < TIMESTAMP '1998-01-01'
        |GROUP BY n_name""".stripMargin
  )
}
