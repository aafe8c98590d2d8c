package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (latest-state) join: for every left row, the most recent right
  * row with `rightTime <= leftTime` for the same key — the generalized
  * form of the reference's latest-run-wins selection
  * (core/models/item.py:308-313, Martin's COALESCE(ref, max(ref))).
  *
  * Implemented as the union + ordered-window backfill: tag both sides,
  * sort within key by (time, side), and carry the last right payload
  * forward. One shuffle on the key, no range join explosion, no
  * per-left-row subquery — the plan a sort-merge as-of would produce,
  * expressed with built-ins (preference order (a) from the build brief).
  */
object AsofJoin {

  /** left(key, lt, ...), right(key, rt, payload cols). Returns left rows
    * + `asof_<payload>` columns (NULL when no earlier right row). */
  def asof(left: DataFrame, right: DataFrame, key: String,
           leftTime: String, rightTime: String,
           payload: Seq[String]): DataFrame = {
    val l = left.withColumn("_side", lit(1)).withColumn("_t", col(leftTime))
    val r = right.select(
      (Seq(col(key), col(rightTime).as("_t"), lit(0).as("_side")) ++
        payload.map(p => col(p).as(s"_p_$p"))): _*)
    val lAligned = l.select(
      (l.columns.filterNot(c => c == "_side" || c == "_t").map(col).toIndexedSeq ++
        Seq(col("_t"), col("_side")) ++
        payload.map(p => lit(null).as(s"_p_$p"))): _*)
    val unioned = lAligned.unionByName(r, allowMissingColumns = true)
    // right rows sort before left rows at equal time => inclusive <=
    val w = Window.partitionBy(col(key))
      .orderBy(col("_t").asc, col("_side").asc)
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = payload.foldLeft(unioned) { (df, p) =>
      df.withColumn(s"asof_$p", last(col(s"_p_$p"), ignoreNulls = true).over(w))
    }
    filled.filter(col("_side") === 1)
      .drop((Seq("_side", "_t") ++ payload.map(p => s"_p_$p")): _*)
  }
}
