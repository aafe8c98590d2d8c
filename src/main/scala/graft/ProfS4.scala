package graft

import graft.llm.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Round-15: component timings for the endstate's stage-4 (fuzzy
  * dedup) job, over a corpus-sized input (documents ≈ k3: the endstate
  * keeps ~95% of docs at bench SFs). Isolates the verification frame's
  * cost in its two shapes:
  *
  *  - `shStrings`: shingles() — distinct (id, gram-string) rows, the
  *    shipped endstate verification frame (~50 B/row through the
  *    distinct exchange, md5 re-derived by pairJaccard);
  *  - `shHashed`: shingleHashes() — distinct (id, 60-bit long), the
  *    shape d_pipeline_e2e adopted in r9 (8 B/row, one-pass native
  *    window hasher, no gram strings ever materialize);
  *  - `verifyStrings` / `verifyHashed`: the full candidate+verify
  *    chain over each frame (candidatePairs(lshBands(minhashFromText))
  *    then pairJaccard / pairJaccardHashed).
  *
  * Same-JVM rotated protocol. Run: tools/run_main.sh graft.ProfS4. */
object ProfS4 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val rounds = if (args.length > 1) args(1).toInt else 7
    val spark = Sessions.build("32")

    def docs = Tables.documents(spark, dir)
    def cands: DataFrame =
      Dedup.candidatePairs(Dedup.lshBands(
        Dedup.minhashFromText(docs, "doc_id", "text")))

    val variants: Seq[(String, () => DataFrame)] = Seq(
      "shStrings" -> (() => Dedup.shingles(docs, "doc_id", "text", spread = false)),
      "shHashed" -> (() => Dedup.shingleHashes(docs, "doc_id", "text", spread = false)),
      "bands" -> (() => Dedup.lshBands(Dedup.minhashFromText(docs, "doc_id", "text"))),
      "verifyStrings" -> (() => Dedup.pairJaccard(cands,
        Dedup.shingles(docs, "doc_id", "text", spread = false))),
      "verifyHashed" -> (() => Dedup.pairJaccardHashed(cands,
        Dedup.shingleHashes(docs, "doc_id", "text", spread = false)))
    )

    Tables.cacheEnabled = true
    docs.count()

    val results = scala.collection.mutable.Map[String,
      scala.collection.mutable.Buffer[Double]]()
    for (r <- 0 until (rounds + 2)) {
      val order = variants.indices.map(i => (i + r) % variants.size)
      for (i <- order) {
        val (name, mk) = variants(i)
        val t0 = System.nanoTime()
        mk().write.mode("overwrite").format("noop").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (r >= 2) {
          results.getOrElseUpdate(name,
            scala.collection.mutable.Buffer()) += dt
          println(f"[prof-s4] round=${r - 2}%2d $name%-14s $dt%7.3f s")
        }
      }
    }
    println("[prof-s4] ---- med/min over measured rounds ----")
    for ((name, _) <- variants) {
      val xs = results(name).sorted
      println(f"[prof-s4] $name%-14s med ${xs(xs.size / 2)}%7.3f  min ${xs.head}%7.3f")
    }
    spark.stop()
  }
}
