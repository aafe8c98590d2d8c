package graft

import org.apache.spark.sql.functions._

/** As-of operator soak: synthetic fact/state tables at millions of
  * rows, timing the composed union+window form against both native
  * execs (streaming merge; broadcast index probe).
  * Run: sbt "runMain graft.SoakAsof [nLeft] [nRightBig] [nRightSmall]". */
object SoakAsof {
  def main(args: Array[String]): Unit = {
    val nLeft = if (args.length > 0) args(0).toLong else 5000000L
    val nRightBig = if (args.length > 1) args(1).toLong else 500000L
    val nRightSmall = if (args.length > 2) args(2).toLong else 10000L
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    val nKeys = 10000L
    def mk(n: Long, payload: Boolean) = {
      val base = spark.range(n).select((col("id") % nKeys).as("k"),
        (col("id") * 2654435761L % 1000000000L).as("t"), col("id"))
      if (payload) base.select(col("k"), col("t").as("rt"), col("id").as("p"))
      else base.select(col("k"), col("t").as("lt"), col("id"))
    }
    val left = mk(nLeft, payload = false).cache()
    val rightBig = mk(nRightBig, payload = true).cache()
    val rightSmall = mk(nRightSmall, payload = true).cache()
    println(s"[soak-asof] left=${left.count()} rightBig=${rightBig.count()} rightSmall=${rightSmall.count()}")

    // aggregate the PAYLOAD, not count(*): a bare count lets the
    // optimizer prune the join work entirely (the composed form's
    // window drops out and it degenerates to counting left rows)
    def time(name: String)(f: => org.apache.spark.sql.DataFrame): Unit =
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val r = f.agg(count(col("asof_p")).as("n"), sum(col("asof_p")).as("s"))
          .collect()(0)
        println(f"[soak-asof] $name%-28s iter$i matched=${r.getLong(0)}%9d  ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      }

    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    spark.conf.set(thrKey, "-1")
    time("merge_big_right")(
      graft.plans.AsofJoinNative.asof(left, rightBig, "k", "lt", "rt", Seq("p")))
    time("composed_big_right")(
      graft.plans.AsofJoin.asof(left, rightBig, "k", "lt", "rt", Seq("p")))
    spark.conf.set(thrKey, "50MB")
    time("broadcast_small_right")(
      graft.plans.AsofJoinNative.asof(left, rightSmall, "k", "lt", "rt", Seq("p")))
    spark.conf.set(thrKey, "-1")
    time("merge_small_right")(
      graft.plans.AsofJoinNative.asof(left, rightSmall, "k", "lt", "rt", Seq("p")))
    time("composed_small_right")(
      graft.plans.AsofJoin.asof(left, rightSmall, "k", "lt", "rt", Seq("p")))
    spark.stop()
  }
}
