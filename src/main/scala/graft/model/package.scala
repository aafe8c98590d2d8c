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

    /** Release any per-dataset cached frames this module holds (the
      * materialized shared-index pattern). A long-lived service calls
      * this when a dataset is retired; Verify/Bench call it between
      * datasets so storage blocks never outlive the run that built
      * them. Default: nothing cached. */
    def evictCaches(dir: String): Unit = ()

    /** Release ALL cached frames this module holds. */
    def clearCaches(): Unit = ()
  }

  /** Shared helper for the module-level materialized-frame caches:
    * unpersist + drop every entry (or one dataset's entry). */
  private[graft] object FrameCache {
    // blocking unpersist: "evicted" must mean the storage blocks are
    // GONE when the call returns, not queued for async removal — a
    // service evicts precisely because it needs the memory back now
    def evict(m: java.util.concurrent.ConcurrentHashMap[String, DataFrame], dir: String): Unit =
      Option(m.remove(dir)).foreach(_.unpersist(blocking = true))
    def clear(m: java.util.concurrent.ConcurrentHashMap[String, DataFrame]): Unit = {
      m.values().forEach(df => { df.unpersist(blocking = true); () })
      m.clear()
    }
  }
}
