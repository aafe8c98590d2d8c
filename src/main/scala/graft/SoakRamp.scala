package graft

import org.apache.spark.sql.functions._
import graft.ops.{Ramps, ScalarQueries}

/** Where does f7b_ramp_configured's second actually go? Interleaved
  * variants in one JVM: full query, no-explode (1 ramp), bare scan,
  * and a quantized-LUT join form. */
object SoakRamp {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.events(spark, dir).count()
    import spark.implicits._

    val ramps = ScalarQueries.configuredRamps
    def t = least(greatest(col("value") / 300.0, lit(0.0)), lit(1.0))

    def full() = Ramps.sampleContinuous(
      Tables.events(spark, dir).select(col("event_id"), col("value")),
      t, ramps, Seq("event_id"))
      .select("event_id", "ramp_id", "r", "g", "b", "a")

    def oneRamp() = Ramps.sampleContinuous(
      Tables.events(spark, dir).select(col("event_id"), col("value")),
      t, ramps.take(1), Seq("event_id"))
      .select("event_id", "ramp_id", "r", "g", "b", "a")

    def bare() = Tables.events(spark, dir)
      .select(col("event_id"), (col("value") * 2.0).as("v"))

    def explodeOnly() = Tables.events(spark, dir)
      .select(col("event_id"),
        explode(array(ramps.map(r => lit(r.id)): _*)).as("ramp_id"), t.as("tc"))

    // 256-entry LUT per ramp (exact samples at k/255), quantized join
    def lut() = {
      val rows = ramps.flatMap { ramp =>
        (0 to 255).map { k =>
          val tv = k / 255.0
          val pos = Ramps.spreadPositions(ramp.stops)
          val rgba = ramp.stops.map(s => Ramps.hexToRgba(s.hex))
          val tc = math.min(math.max(tv, pos.head), pos.last)
          val j = (0 until pos.size - 1).find(j => tc >= pos(j) && tc <= pos(j + 1)).getOrElse(pos.size - 2)
          val frac = if (pos(j + 1) > pos(j)) (tc - pos(j)) / (pos(j + 1) - pos(j)) else 0.0
          def ch(f: ((Int, Int, Int, Int)) => Int) =
            math.floor(f(rgba(j)) + (f(rgba(j + 1)) - f(rgba(j))) * frac + 0.5).toInt
          (ramp.id, k, ch(_._1), ch(_._2), ch(_._3), ch(_._4))
        }
      }
      val lutDf = rows.toDF("ramp_id", "k", "r", "g", "b", "a")
      Tables.events(spark, dir)
        .select(col("event_id"),
          floor(t * 255.0 + 0.5).cast("int").as("k"))
        .join(broadcast(lutDf), Seq("k"))
        .select("event_id", "ramp_id", "r", "g", "b", "a")
    }

    val variants = Seq[(String, () => org.apache.spark.sql.DataFrame)](
      "full" -> (() => full()), "one_ramp" -> (() => oneRamp()),
      "bare_scan" -> (() => bare()), "explode_only" -> (() => explodeOnly()),
      "lut256" -> (() => lut()))
    // warm
    variants.foreach(v => v._2().write.mode("overwrite").format("noop").save())
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 7; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f().write.mode("overwrite").format("noop").save()
      acc(n) = (System.nanoTime() - t0) / 1e9 :: acc(n)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    variants.foreach { case (n, _) =>
      println(f"[soakramp] $n%-14s ${med(acc(n))}%.3f s")
    }
    spark.stop()
  }
}
