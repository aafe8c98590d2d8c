package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {

  test("salted aggregation matches the direct plan on a skewed key set") {
    // l_returnflag is 3-valued over 6k rows — maximal key skew.
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_returnflag")
      .agg(count(col("l_quantity")).as("n"),
        sum(col("l_quantity")).as("vsum"),
        min(col("l_quantity")).as("vmin"),
        max(col("l_quantity")).as("vmax"))
    val salted = Skew.saltedStats(li, Seq("l_returnflag"), "l_quantity")
      .select("l_returnflag", "n", "vsum", "vmin", "vmax")
    assert(salted.count() == direct.count())
    val j = direct.as("a").join(salted.as("b"), "l_returnflag")
      .filter(col("a.n") =!= col("b.n") || col("a.vsum") =!= col("b.vsum") ||
        col("a.vmin") =!= col("b.vmin") || col("a.vmax") =!= col("b.vmax"))
    assert(j.isEmpty)
  }
}
