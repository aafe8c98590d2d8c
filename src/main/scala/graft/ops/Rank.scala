package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.LongType

/** Global total-order ranking without a single-partition window.
  *
  * `row_number() OVER (ORDER BY ...)` plans one partition holding the
  * whole dataset — the driver-visible anti-pattern for 10⁹-row
  * curriculum ordering. This is the scalable equivalent:
  * range-repartition on the sort key (sampled range bounds, the same
  * mechanism as a global ORDER BY), sort within partitions, then
  * `zipWithIndex` — which IS the range-partitioned two-pass prefix
  * sum: one job counts the rows of every partition but the last, the
  * offsets broadcast, and each partition stamps `offset + local index`
  * map-side. Total cost: the range shuffle + one count pass; no
  * partition ever holds more than its range slice.
  *
  * The sort must be a TOTAL order (include a unique tiebreaker column)
  * or ranks within ties are partition-placement-dependent. */
object Rank {
  def globalRank(df: DataFrame, sortExprs: Seq[Column],
                 rankCol: String = "rank",
                 numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(rankCol),
      s"input already has a '$rankCol' column — pass a different rankCol")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    val sorted = df.repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val schema = sorted.schema.add(rankCol, LongType, nullable = false)
    // persist the decoded sorted rows: zipWithIndex runs TWO jobs (the
    // partition-count pass, then the stamping pass) and without this
    // both re-run the reduce-side sort and the InternalRow->Row decode;
    // blocks are dropped by the ContextCleaner when the RDD is
    // unreferenced
    val rows = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val ranked = rows.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(ranked, schema)
  }

  /** Global running sum of `valueCol` (long) in `sortExprs` order —
    * the scalable form of `sum(v) OVER (ORDER BY ...)`, which Spark
    * plans as a SINGLE-partition window. Same two-pass mechanism as
    * [[globalRank]]: range-partition on the sort key, sort within
    * partitions, one pass sums each partition, the per-partition
    * offsets broadcast (numPartitions longs), and each partition
    * stamps `offset + local running sum` map-side.
    *
    * The sort must be a TOTAL order (unique tiebreaker) or the running
    * sum at tied rows is partition-placement-dependent. */
  def prefixSum(df: DataFrame, sortExprs: Seq[Column], valueCol: String,
                cumCol: String = "cum",
                numPartitions: Option[Int] = None): DataFrame = {
    require(!df.columns.contains(cumCol),
      s"input already has a '$cumCol' column — pass a different cumCol")
    val spark = df.sparkSession
    val parts = numPartitions.getOrElse(spark.sparkContext.defaultParallelism)
    val sorted = df.repartitionByRange(parts, sortExprs: _*)
      .sortWithinPartitions(sortExprs: _*)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val schema = sorted.schema.add(cumCol, LongType, nullable = false)
    val rows = sorted.rdd
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
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
    spark.createDataFrame(stamped, schema)
  }
}
