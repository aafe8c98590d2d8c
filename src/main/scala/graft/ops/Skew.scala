package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot grouping keys (the 100 TB concern: a few
  * boundary ids / band keys / calendar slots owning most rows).
  *
  * Two-phase salted aggregation: phase 1 groups on (key, salt) so a hot
  * key's rows spread over `salts` reducers and combine map-side; phase 2
  * merges the tiny per-salt partials. Correct for any algebraic
  * aggregate expressed as (partial, merge) pairs — here the engine's
  * standard stats partial set. AQE's skew-join split handles *join*
  * skew; this handles *aggregation* skew, which AQE does not rebalance.
  */
object Skew {

  /** Salted stats aggregation: groupBy(keys) computing
    * n/sum/min/max over `valueCol` with `salts`-way salting. */
  def saltedStats(df: DataFrame, keys: Seq[String], valueCol: String,
                  salts: Int = 16): DataFrame = {
    val salted = df.withColumn("_salt",
      pmod(hash(col(valueCol) * monotonically_increasing_id()), lit(salts)))
    val phase1 = salted.groupBy((keys.map(col) :+ col("_salt")): _*)
      .agg(count(col(valueCol)).as("_n"),
        sum(col(valueCol)).as("_s"),
        min(col(valueCol)).as("_mn"),
        max(col(valueCol)).as("_mx"))
    phase1.groupBy(keys.map(col): _*)
      .agg(sum(col("_n")).as("n"),
        sum(col("_s")).as("vsum"),
        min(col("_mn")).as("vmin"),
        max(col("_mx")).as("vmax"))
      .withColumn("vmean", col("vsum") / col("n"))
  }
}
