package graft

/** Within-JVM A/B of runtime SQL confs over the hot bench queries —
  * the only honest way to compare 10-20% deltas under ±30% host noise:
  * both arms run interleaved in the same session, same cache state.
  *   sbt "runMain graft.SoakConf /root/testdata/sf0.1 <conf> <valA> <valB> [rounds]"
  */
object SoakConf {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val conf = args.lift(1).getOrElse("spark.sql.adaptive.coalescePartitions.parallelismFirst")
    val valA = args.lift(2).getOrElse("true")
    val valB = args.lift(3).getOrElse("false")
    val rounds = args.lift(4).map(_.toInt).getOrElse(5)
    val names = sys.env.get("SOAK_QUERIES").map(_.split(",").toSeq)
      .getOrElse(Seq("d_pipeline_e2e", "d_incremental_endstate",
        "f7b_ramp_configured", "j9_gradient", "j9b_hillshade", "f14_regrid_cubic"))
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Seq("lineitem", "orders", "documents", "embeddings").foreach(t =>
      Tables.read(spark, dir, t).count())
    Tables.events(spark, dir).count()
    val qs = SparkEntry.queries.filter(kv => names.contains(kv._1)).toSeq.sortBy(_._1)
    def run(): Map[String, Double] = qs.map { case (n, fn) =>
      val t0 = System.nanoTime()
      fn(spark, dir).write.mode("overwrite").format("noop").save()
      n -> (System.nanoTime() - t0) / 1e9
    }.toMap
    // warmup both arms
    spark.conf.set(conf, valA); run()
    spark.conf.set(conf, valB); run()
    val acc = collection.mutable.Map[String, (List[Double], List[Double])]()
      .withDefaultValue((Nil, Nil))
    for (_ <- 1 to rounds) {
      spark.conf.set(conf, valA)
      run().foreach { case (n, t) => val (a, b) = acc(n); acc(n) = (t :: a, b) }
      spark.conf.set(conf, valB)
      run().foreach { case (n, t) => val (a, b) = acc(n); acc(n) = (a, t :: b) }
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    var ta = 0.0; var tb = 0.0
    acc.toSeq.sortBy(_._1).foreach { case (n, (a, b)) =>
      ta += med(a); tb += med(b)
      println(f"[soakconf] $n%-26s $conf=$valA%-6s ${med(a)}%.3f  $valB%-6s ${med(b)}%.3f")
    }
    println(f"[soakconf] TOTAL(median)             $valA%-6s $ta%.3f  $valB%-6s $tb%.3f")
    spark.stop()
  }
}
