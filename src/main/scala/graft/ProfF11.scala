package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 decomposition of `f11_input_hash` (driver r14: 1.18 s, the
  * suite's #3 row; never examined before). The query is one
  * ObjectHashAggregate over a TypedImperativeAggregate
  * (`bounded_sorted_join`) with ~150k groups at sf0.1 — two suspects,
  * each isolated as a variant (guide §1.1 empirical loop, §4 per-task
  * work):
  *
  *  - ObjectHashAggregateExec falls back to SORT-based aggregation
  *    after `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
  *    (default 128) distinct groups per task — at 150k groups every
  *    task pays an UnsafeKV sort of its whole input twice (partial +
  *    final). Variant `thresh` lifts the threshold so the hash path
  *    runs end-to-end (safe here: the agg buffer is the BOUNDED
  *    per-order checksum list, ≤7 items of 32 chars).
  *  - Partial aggregation of a collect-style aggregate reduces row
  *    COUNT but not bytes (every item still crosses the exchange inside
  *    a serialized buffer) — pure serialize/deserialize overhead.
  *    Variant `noPartial` shuffles the raw (key, checksum) rows instead
  *    (repartition by key), so the aggregation runs once, after the
  *    exchange.
  *
  * `floor` times the scan+md5 projection alone (noop sink) — the part
  * no aggregate change can remove. Protocol: one JVM, two warm rounds,
  * then N measured rounds with the variant order ROTATED each round
  * (the fixed-order JIT bias SCALE.md r14 documented); report per
  * variant med/min. Run: tools/run_main.sh graft.ProfF11 [dir] [rounds]. */
object ProfF11 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.build("32")

    def base(s: SparkSession) = Tables.lineitem(s, dir)
      .select(col("l_orderkey"),
        md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))

    def withConf[T](k: String, v: String)(f: => T): T = {
      val old = spark.conf.getOption(k)
      spark.conf.set(k, v)
      try f finally old match {
        case Some(o) => spark.conf.set(k, o)
        case None => spark.conf.unset(k)
      }
    }

    val Thresh = "spark.sql.objectHashAggregate.sortBased.fallbackThreshold"

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "shipped" -> (() => SparkEntry.queries("f11_input_hash")(spark, dir)),
      "thresh" -> (() => base(spark)
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      "noPartial" -> (() => base(spark)
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      "threshNoPartial" -> (() => base(spark)
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      // ONE exchange carrying only the narrow pre-md5 columns (12 B/row
      // vs 33 B checksums vs ~130 B partial buffers); md5 AND the
      // aggregate run post-exchange at full width — fixes the 1-2-task
      // map stage the pinned cache gives this query (guide §2.3 project
      // before the exchange + §2.5 input skew)
      "keyFirst" -> (() => Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_orderkey"))
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      // round-robin spread before the row work (the shingles idiom):
      // 2 exchanges, everything parallel
      "spreadRR" -> (() => Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      // keyFirst + lifted fallback threshold: with the key exchange
      // first, per-task group counts drop to ~150k/width, so the
      // object-hash path stays in its map
      "keyFirstThresh" -> (() => Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_linenumber"))
        .repartition(col("l_orderkey"))
        .select(col("l_orderkey"),
          md5(concat_ws("_", col("l_orderkey"), col("l_linenumber"))).as("checksum"))
        .groupBy("l_orderkey")
        .agg(graft.ops.Algebra.inputHash(col("checksum")).as("input_hash"))),
      "floor" -> (() => base(spark))
    )

    def run(name: String, mk: () => DataFrame): Double = {
      val t0 = System.nanoTime()
      val df = mk()
      val action = () => df.write.mode("overwrite").format("noop").save()
      name match {
        case "thresh" | "threshNoPartial" | "keyFirstThresh" =>
          withConf(Thresh, Int.MaxValue.toString)(action())
        case _ => action()
      }
      (System.nanoTime() - t0) / 1e9
    }

    // match the bench environment: base tables pinned (the serving
    // configuration the bench rows are measured under)
    Tables.cacheEnabled = true
    Tables.lineitem(spark, dir).count()

    val results = scala.collection.mutable.Map[String,
      scala.collection.mutable.Buffer[Double]]()
    for (r <- 0 until (rounds + 2)) {
      val order = variants.indices.map(i => (i + r) % variants.size)
      for (i <- order) {
        val (name, mk) = variants(i)
        val dt = run(name, mk)
        if (r >= 2) { // first two rounds warm JIT/codegen
          results.getOrElseUpdate(name,
            scala.collection.mutable.Buffer()) += dt
          println(f"[prof-f11] round=${r - 2}%2d $name%-16s $dt%7.3f s")
        }
      }
    }
    println("[prof-f11] ---- med/min over measured rounds ----")
    for ((name, _) <- variants) {
      val xs = results(name).sorted
      println(f"[prof-f11] $name%-16s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
