package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Throwaway micro-benchmark for canonicalize variants (not driver contract). */
object BenchCanon {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = Sessions.build("32")
    import graft.llm.{Dedup, DedupQueries}

    val docs = Tables.read(spark, sfDir, "documents")
    val sh = Dedup.shingles(docs, "doc_id", "text").cache()
    sh.count()
    val sig = Dedup.minhashSignature(sh)
    val cands = Dedup.candidatePairs(Dedup.lshBands(sig))
    val pairs = Dedup.pairJaccard(cands, sh).filter(col("jacc") >= 0.5)
      .select("doc_a", "doc_b").cache()
    println(s"pairs=${pairs.count()}")

    def time(name: String)(f: => DataFrame): Unit = {
      for (i <- 1 to 3) {
        val t0 = System.nanoTime()
        val n = f.count()
        println(f"$name%-28s iter$i n=$n%6d  ${(System.nanoTime() - t0) / 1e9}%8.3f s")
      }
    }

    // v1: current (jump, hop cached)
    time("jump_hopcache")(Dedup.canonicalize(pairs, 3))

    // v2: jump, no cache (exponential re-eval)
    time("jump_nocache") {
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val nodes = edges.select(col("u").as("id")).distinct()
      val edgesPlus = edges
        .unionByName(nodes.select(col("id").as("u"), col("id").as("v")))
        .distinct().cache()
      var labels = nodes.withColumn("canonical", col("id"))
      for (_ <- 1 to 3) {
        val hop = edgesPlus
          .join(labels.withColumnRenamed("id", "v"), Seq("v"))
          .groupBy(col("u").as("id")).agg(min("canonical").as("canonical"))
        labels = hop
          .join(hop.select(col("id").as("canonical"), col("canonical").as("c2")),
            Seq("canonical"))
          .select(col("id"), col("c2").as("canonical"))
      }
      labels
    }

    // v3: jump, localCheckpoint per round
    time("jump_localckpt") {
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val nodes = edges.select(col("u").as("id")).distinct()
      val edgesPlus = edges
        .unionByName(nodes.select(col("id").as("u"), col("id").as("v")))
        .distinct().localCheckpoint()
      var labels = nodes.withColumn("canonical", col("id"))
      for (_ <- 1 to 3) {
        val hop = edgesPlus
          .join(labels.withColumnRenamed("id", "v"), Seq("v"))
          .groupBy(col("u").as("id")).agg(min("canonical").as("canonical"))
          .localCheckpoint()
        labels = hop
          .join(hop.select(col("id").as("canonical"), col("canonical").as("c2")),
            Seq("canonical"))
          .select(col("id"), col("c2").as("canonical"))
      }
      labels
    }

    // v4: plain 7 single-hop rounds (same coverage as 3 doubled), linear refs
    time("hop7_linear") {
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
      val nodes = edges.select(col("u").as("id")).distinct()
      val edgesPlus = edges
        .unionByName(nodes.select(col("id").as("u"), col("id").as("v")))
        .distinct().cache()
      var labels = nodes.withColumn("canonical", col("id"))
      for (_ <- 1 to 7) {
        labels = edgesPlus
          .join(labels.withColumnRenamed("id", "v"), Seq("v"))
          .groupBy(col("u").as("id")).agg(min("canonical").as("canonical"))
      }
      labels
    }

    // v5: pagerank as-is vs per-round localCheckpoint
    time("pagerank_asis")(Dedup.pagerankInt(pairs, 3))
    time("pagerank_ckpt") {
      val edges = pairs.select(col("doc_a").as("u"), col("doc_b").as("v"))
        .unionByName(pairs.select(col("doc_b").as("u"), col("doc_a").as("v")))
        .distinct().localCheckpoint()
      val deg = edges.groupBy(col("u").as("id")).agg(count(lit(1)).as("deg"))
        .localCheckpoint()
      var p = deg.select(col("id"), lit(1000000L).as("pr"))
      for (_ <- 1 to 3) {
        val contrib = p.join(deg, Seq("id"))
          .select(col("id").as("v"), floor(col("pr").cast("double") / col("deg")).cast("long").as("c"))
        p = edges.join(contrib, Seq("v"))
          .groupBy(col("u").as("id")).agg(sum("c").as("s"))
          .select(col("id"),
            (lit(150000L) + floor((col("s") * 17).cast("double") / 20).cast("long")).as("pr"))
          .localCheckpoint()
      }
      p
    }

    // --- span-hash windowing: Column-composed vs native expression ---
    val docsBig = Tables.read(spark,
      sys.env.getOrElse("SPARK_GRAFT_SPAN_SF", "/root/testdata/sf0.1"), "documents")
    val wsCol = split(trim(lower(col("text"))), "\\s+")
    def spanComposed(w: Int) = docsBig
      .select(col("doc_id").as("id"), wsCol.as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("id"), explode(
        transform(sequence(lit(0), size(col("ws")) - w),
          i => md5(concat_ws(" ", slice(col("ws"), i + 1, lit(w)))))).as("h"))
    def spanNative(w: Int) = docsBig
      .select(col("doc_id").as("id"), wsCol.as("ws"))
      .filter(size(col("ws")) >= w)
      .select(col("id"), explode(
        graft.functions.SpanHashWindows.spanHashWindows(col("ws"), w)).as("h"))
    time("span_composed_w20")(spanComposed(20).groupBy("h").agg(count(lit(1))))
    time("span_native_w20")(spanNative(20).groupBy("h").agg(count(lit(1))))

    spark.stop()
  }
}
