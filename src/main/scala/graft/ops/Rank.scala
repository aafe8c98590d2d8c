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
}
