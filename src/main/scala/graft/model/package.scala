package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object model {
  /** A registered engine query: (session, data dir) => result.
    * The driver's correctness gate runs each of these at sf0.01 and
    * compares against the DuckDB oracle SQL with the same name. */
  type QueryFn = (SparkSession, String) => DataFrame

  /** One module's contribution to the engine surface. */
  trait QueryModule {
    def queries: Map[String, QueryFn]
    def oracleSql: Map[String, String]
  }
}
