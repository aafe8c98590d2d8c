package graft

import org.apache.spark.sql.SparkSession

/** Shared SparkSession construction for the engine's entry points.
  * local[N] here; on a real cluster the same configs apply (AQE on,
  * shuffle partitions sized to cores, UTC session time).
  */
object Sessions {
  def build(cpus: String): SparkSession = {
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("georivaspark")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", cpus))
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.sql.session.timeZone", "UTC")
      // let AQE re-plan (and in particular coalesce) the shuffle that
      // feeds a cached relation: the default false pins every .cache()d
      // frame at spark.sql.shuffle.partitions even when the data is a
      // few MB, so each downstream stage pays shuffle-partition-count
      // task launches against tiny cached partitions (measured: the
      // 230k-row pinned grid cube aggregated 4x faster once its cache
      // landed in AQE-coalesced partitions; the whole pinned-frame
      // serving family shares the win). On a real cluster the same
      // advisory-size coalescing applies — cached partitions track data
      // volume, not the static shuffle width.
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // ~100 registered queries × several codegen stages each evicts the
      // default 100-entry generated-class cache mid-run, forcing
      // recompiles of plans that will run again (static conf — must be
      // set before the first session)
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .config("spark.ui.enabled", "false")
      // events.parquet carries TIMESTAMP(NANOS); read as long + convert.
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // partition keys are STRING by contract everywhere (unit_id,
      // collection, date); inference would silently retype "2" → int
      // and break ledger/unit joins on read-back
      .config("spark.sql.sources.partitionColumnTypeInference.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.Registry.register(spark)
    if (!spark.experimental.extraStrategies.contains(graft.plans.AsofJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ graft.plans.AsofJoinStrategy
    spark
  }
}
