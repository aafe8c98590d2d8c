package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.llm.{Dedup, TextAnalysis}

/** End-to-end timing of d_pipeline_e2e checkpoint-placement variants,
  * interleaved in one JVM (same session, same caches — the only way to
  * see 10-20% deltas under host noise):
  *   a) current: chk(d2) + chk(d3) + chk(sh)
  *   b) merged:  chk(d3) + chk(sh) — d2 inline, its shuffles reused
  *   c) ids:     chk(d2) + chk(heavy ids) + chk(sh) — d3 recomputed
  *      from materialized d2 via a cheap anti-join at each use
  * Run: sbt "runMain graft.SoakPipeline /root/testdata/sf0.1"
  */
object SoakPipeline {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = Sessions.build("32")
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()

    def docs = Tables.documents(spark, dir)
    def quality = TextAnalysis.qualityScore(col("text"))
    def d1of(d: DataFrame) = {
      val keep1 = d
        .withColumn("fp", TextAnalysis.fingerprint(col("text")))
        .groupBy("fp").agg(min("doc_id").as("doc_id")).select("doc_id")
      d.join(keep1, "doc_id")
    }
    def heavyOf(d2: DataFrame) = Dedup.spanCoverage(
        Dedup.spanHashes(d2, "doc_id", "text", 20, spread = false), 20)
      .filter(col("coverage") > 0.5).select("doc_id")
    def finish(d3: DataFrame, sh: DataFrame) = {
      val pairs = Dedup.pairJaccard(
          Dedup.candidatePairs(Dedup.lshBands(Dedup.minhashSignature(sh))), sh)
        .filter(col("jacc") >= 0.5).select("doc_a", "doc_b")
      val dropFuzzy = Dedup.canonicalize(pairs)
        .filter(col("id") =!= col("canonical"))
        .select(col("id").as("doc_id"))
      d3.join(dropFuzzy, Seq("doc_id"), "left_anti")
        .groupBy("source").agg(
          count(lit(1)).as("n_docs"),
          sum(size(split(trim(col("text")), "\\s+")).cast("long")).as("n_tokens"))
        .write.mode("overwrite").format("noop").save()
    }

    def variantA(): Unit = {
      val d2 = d1of(docs).filter(quality >= 0.3).localCheckpoint()
      val d3 = d2.join(heavyOf(d2), Seq("doc_id"), "left_anti").localCheckpoint()
      val sh = Dedup.shingles(d3, "doc_id", "text", spread = false).localCheckpoint()
      finish(d3, sh)
    }
    def variantB(): Unit = {
      val d2 = d1of(docs).filter(quality >= 0.3)
      val d3 = d2.join(heavyOf(d2), Seq("doc_id"), "left_anti").localCheckpoint()
      val sh = Dedup.shingles(d3, "doc_id", "text", spread = false).localCheckpoint()
      finish(d3, sh)
    }
    def variantC(): Unit = {
      val d2 = d1of(docs).filter(quality >= 0.3).localCheckpoint()
      val heavy = heavyOf(d2).localCheckpoint()
      def d3 = d2.join(heavy, Seq("doc_id"), "left_anti")
      val sh = Dedup.shingles(d3, "doc_id", "text", spread = false).localCheckpoint()
      finish(d3, sh)
    }

    val variants = Seq[(String, () => Unit)](
      "a_current" -> variantA, "b_merged" -> variantB, "c_ids" -> variantC)
    variants.foreach(_._2()) // warm
    val acc = collection.mutable.Map[String, List[Double]]().withDefaultValue(Nil)
    for (_ <- 1 to 7; (n, f) <- variants) {
      val t0 = System.nanoTime()
      f()
      acc(n) = (System.nanoTime() - t0) / 1e9 :: acc(n)
    }
    def med(xs: List[Double]) = xs.sorted.apply(xs.size / 2)
    variants.foreach { case (n, _) =>
      println(f"[soakpipe] $n%-10s ${med(acc(n))}%.3f s")
    }
    spark.stop()
  }
}
