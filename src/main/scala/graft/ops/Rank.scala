package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructType}
import org.apache.spark.rdd.RDD

/** Global total-order ranking and running sums without a
  * single-partition window.
  *
  * `row_number()/sum() OVER (ORDER BY ...)` plans one partition holding
  * the whole dataset — the driver-visible anti-pattern for 10⁹-row
  * curriculum ordering or token-budget selection. These are the
  * scalable equivalents: range-repartition on the sort key (sampled
  * range bounds, the same mechanism as a global ORDER BY), sort within
  * partitions, then a two-pass prefix sum — one job reduces each
  * partition to a single long, the offsets broadcast (numPartitions
  * longs), and each partition stamps `offset + local accumulation`
  * map-side. Total cost: the range shuffle + one reduce pass; no
  * partition ever holds more than its range slice.
  *
  * The sort must be a TOTAL order (include a unique tiebreaker column)
  * or values at tied rows are partition-placement-dependent. */
object Rank {

  /** Shared preamble: range-sorted, persisted rows + the widened
    * schema. Persisting matters: both passes would otherwise re-run
    * the reduce-side sort and the InternalRow→Row decode; blocks are
    * dropped by the ContextCleaner when the RDD is unreferenced. */
  private def sortedRows(df: DataFrame, sortExprs: Seq[Column],
                         outCol: String, numPartitions: Option[Int])
      : (RDD[Row], StructType) = {
    require(!df.columns.contains(outCol),
      s"input already has a '$outCol' column — pass a different output column")
    // the localCheckpoint below materializes EVERY input column to
    // executor storage and cuts lineage (executor loss re-fails instead
    // of recomputing) — acceptable only for a slim (keys, value)
    // projection, which is the module's contract. A wide frame at the
    // stated 10^9-row scale would double storage and risk
    // eviction-driven failure, so refuse it loudly: rank the projection,
    // then join the payload back on the unique tiebreaker column.
    require(df.schema.fields.length <= 8,
      s"Rank input has ${df.schema.fields.length} columns — pass a slim " +
        "(sort keys, value) projection and join payload columns back on " +
        "the unique tiebreaker after ranking")
    val parts = numPartitions.getOrElse(
      df.sparkSession.sparkContext.defaultParallelism)
    // materialize the input ONCE: repartitionByRange runs a sampling
    // job that would otherwise re-evaluate the whole upstream plan
    // (here typically a regex/kernel-heavy scoring projection) a second
    // time just to pick range bounds. The checkpointed rows are the
    // slim (key, value) projection, so this is cheap at any scale.
    val mat = df.localCheckpoint(true)
    val sorted = mat.repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val rows = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (rows, sorted.schema.add(outCol, LongType, nullable = false))
  }

  /** Dense 1..n ranks in `sortExprs` order — the scalable
    * `row_number() OVER (ORDER BY ...)`. */
  def globalRank(df: DataFrame, sortExprs: Seq[Column],
                 rankCol: String = "rank",
                 numPartitions: Option[Int] = None): DataFrame = {
    val (rows, schema) = sortedRows(df, sortExprs, rankCol, numPartitions)
    // zipWithIndex IS the two-pass prefix sum with value ≡ 1
    val ranked = rows.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    df.sparkSession.createDataFrame(ranked, schema)
  }

  /** Global running sum of `valueCol` (long, non-null) in `sortExprs`
    * order — the scalable `sum(v) OVER (ORDER BY ...)`. */
  def prefixSum(df: DataFrame, sortExprs: Seq[Column], valueCol: String,
                cumCol: String = "cum",
                numPartitions: Option[Int] = None): DataFrame = {
    val (rows, schema) = sortedRows(df, sortExprs, cumCol, numPartitions)
    val vIdx = schema.fieldIndex(valueCol)
    // pass 1: one long per partition to the driver
    val partSums = rows.mapPartitionsWithIndex { (i, it) =>
      var s = 0L
      it.foreach(r => s += r.getLong(vIdx))
      Iterator.single(i -> s)
    }.collect().sortBy(_._1).map(_._2)
    val offsets = partSums.scanLeft(0L)(_ + _)
    // pass 2: stamp map-side from the broadcast offsets
    val stamped = rows.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets(i)
      it.map { r => acc += r.getLong(vIdx); Row.fromSeq(r.toSeq :+ acc) }
    }
    df.sparkSession.createDataFrame(stamped, schema)
  }
}
