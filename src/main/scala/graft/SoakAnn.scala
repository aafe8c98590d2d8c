package graft

import graft.llm.Similarity
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ANN soak: 100 query vectors against a synthetic 100k×64 corpus —
  * brute-force cosine top-10 vs hyperplane-LSH-bucketed search.
  * Run: sbt "runMain graft.SoakAnn [nVecs]". */
object SoakAnn {
  def main(args: Array[String]): Unit = {
    val nVecs = if (args.nonEmpty) args(0).toInt else 100000
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)

    // --clustered: 200 hash-derived centers + 10% noise — realistic
    // embedding geometry (neighbors are within-cluster), vs the default
    // structureless uniform corpus (the adversarial recall floor).
    val clustered = args.contains("--clustered")
    val vecExpr =
      if (clustered)
        """transform(sequence(0, 63), i ->
          | CAST(CAST(pmod(hash(pmod(id, 200) * 64 + i), 2001) - 1000 AS DOUBLE) * 0.9 / 1000.0
          |     + CAST(pmod(hash(id * 64 + i), 2001) - 1000 AS DOUBLE) * 0.1 / 1000.0 AS FLOAT))""".stripMargin
      else
        """transform(sequence(0, 63), i ->
          | CAST(pmod(hash(id * 64 + i), 2001) - 1000 AS FLOAT) / 1000.0)""".stripMargin
    val emb = spark.range(nVecs).select(col("id").as("vec_id"),
        expr(vecExpr).as("embedding"))
      .cache()
    emb.count()
    println(s"[soak-ann] $nVecs vectors x 64 dims, 100 queries" +
      (if (clustered) " (clustered corpus)" else " (uniform corpus)"))

    def time[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[soak-ann] $name%-24s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }

    val q = Similarity.quantized(emb).cache()
    q.count()
    val queries = q.filter(col("vec_id") < 100)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)

    def topSets(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("qid", "vec_id").collect()
        .groupBy(_.getLong(0)).map { case (k, rs) => k -> rs.map(_.getLong(1)).toSet }

    val exact = time("brute-force top-10") {
      val corpus = q.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb"))
      topSets(queries.crossJoin(corpus).filter(col("qid") =!= col("vec_id"))
        .withColumn("cos", expr(Similarity.cosExpr))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10))
    }
    def recall(approx: Map[Long, Set[Long]]): Double = {
      val hits = exact.map { case (k, s) => (approx.getOrElse(k, Set.empty) & s).size }.sum
      hits.toDouble / exact.map(_._2.size).sum
    }
    time("bucket build only") {
      // map-side only: one compiled pass, zero exchanges
      Similarity.buckets(q, 8).agg(sum("bucket")).collect()
    }
    if (args.contains("--legacy-buckets")) time("bucket build (legacy)") {
      // the former 512×-posexplode + per-row md5 + two-shuffle build,
      // kept behind a flag to document the crossover
      val comps = q.select(col("vec_id"), posexplode(col("q")).as(Seq("i", "qv")))
      comps
        .select(col("vec_id"), col("i"), col("qv"),
          explode(sequence(lit(0), lit(7))).as("p"))
        .withColumn("sgn",
          expr("CASE WHEN instr('01234567', substring(md5(concat(CAST(p AS STRING), '_', CAST(i AS STRING))), 1, 1)) > 0 THEN 1 ELSE -1 END"))
        .groupBy("vec_id", "p")
        .agg(sum(col("sgn") * col("qv")).as("proj"))
        .withColumn("bit", when(col("proj") >= 0, 1L).otherwise(0L))
        .groupBy("vec_id").agg(sum(expr("shiftleft(bit, p)")).as("bucket"))
        .agg(sum("bucket")).collect()
    }
    val lsh = time("LSH-bucketed top-10") {
      val b = Similarity.buckets(q, 8).cache()
      val qb = q.join(b, "vec_id")
      val lq = qb.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"), col("bucket"))
      val corpus = qb.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb"), col("bucket"))
      topSets(lq.join(corpus, Seq("bucket")).filter(col("qid") =!= col("vec_id"))
        .withColumn("cos", expr(Similarity.cosExpr))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10))
    }
    // NOTE: this corpus is uniform-random (hash-derived) — no cluster
    // structure, cosines concentrate near 0 — so single-table 8-bit LSH
    // recall here is the adversarial floor, not the seeded-duplicate
    // recall (which is perfect; see SCALE.md / SoakDedup).
    println(f"[soak-ann] LSH recall@10          ${recall(lsh)}%8.3f")
    // --cells=N sizes the coarse quantizer (default 16; ~sqrt(n)/8 is
    // the right order at 1M+), --probe-sweep prints the recall-vs-
    // probe-budget curve — the measurement behind "probes buy recall,
    // each probe costs ~1/cells of the corpus read"
    val kCells = args.find(_.startsWith("--cells=")).map(_.drop(8).toInt).getOrElse(16)
    val (cents, assigned) = time(s"IVF build (${kCells}x2 kmeans+assign)") {
      val c = Similarity.ivfKmeansCentroids(q, kCells, 2)
      val a = Similarity.assignNearest(q, c).cache()
      a.count()
      (c, a)
    }
    def ivfAt(nProbe: Int): Map[Long, Set[Long]] = {
      val probe = queries.crossJoin(broadcast(cents))
        .withColumn("ccos",
          expr("CAST(aggregate(zip_with(qa, cq, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS DOUBLE)" +
            " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(cnrm2 AS DOUBLE)))"))
      val wc = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid").asc)
      val probed = probe.withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= nProbe).select("qid", "qa", "na", "cid")
      val corpus = assigned.select(col("cid"), col("vec_id"), col("q").as("qb"), col("nrm2").as("nb"))
      topSets(probed.join(corpus, Seq("cid")).filter(col("qid") =!= col("vec_id"))
        .withColumn("cos", expr(Similarity.cosExpr))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10))
    }
    val baseProbe = math.max(1, kCells / 4)
    val ivf = time("IVF probe+search top-10") { ivfAt(baseProbe) }
    println(f"[soak-ann] IVF recall@10 ($baseProbe/$kCells)   ${recall(ivf)}%8.3f")
    if (args.contains("--probe-sweep"))
      for (np <- Seq(1, 2, 4, 8, 16, 32).filter(n => n <= kCells && n != baseProbe)) {
        val t0 = System.nanoTime()
        val r = recall(ivfAt(np))
        println(f"[soak-ann] IVF recall@10 ($np%2d/$kCells probes) $r%8.3f  " +
          f"${(System.nanoTime() - t0) / 1e9}%6.2f s  ~${100.0 * np / kCells}%5.1f%% corpus read")
      }
    val pqK = args.find(_.startsWith("--pqk=")).map(_.drop(6).toInt).getOrElse(16)
    val (cb, codes) = time(s"PQ train+encode (8x$pqK)") {
      val sub = Similarity.pqSub(q, 8, 8)
      val cbv = Similarity.pqCodebooks(sub, pqK, 2)
      val cd = Similarity.pqAssign(sub, cbv).select("vec_id", "m", "cid").cache()
      cd.count(); (cbv, cd)
    }
    val pq = time("PQ ADC top-10") {
      val sub = Similarity.pqSub(q, 8, 8)
      val lut = sub.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("m"), col("sv"), col("snrm2"))
        .join(broadcast(cb), Seq("m"))
        .withColumn("d2", col("snrm2") + col("cnrm2") - lit(2L) *
          expr("aggregate(zip_with(sv, cq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .select("qid", "m", "cid", "d2")
      val wd = Window.partitionBy(col("qid")).orderBy(col("adist2").asc, col("vec_id").asc)
      topSets(codes.join(broadcast(lut), Seq("m", "cid"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid", "vec_id").agg(sum("d2").as("adist2"))
        .withColumn("rank", row_number().over(wd)).filter(col("rank") <= 10))
    }
    // ADC ranks by quantized distance: it reliably lands in the right
    // neighborhood but cannot fine-rank inside it (6-bit-per-subspace
    // codes); bare-ADC recall is reported as the compression floor.
    println(f"[soak-ann] PQ recall@10 (8B/vec)  ${recall(pq)}%8.3f")
    // Production two-stage shape: ADC top-100 candidates, exact-cosine
    // re-rank — raw vectors are touched for 100 rows/query instead of
    // the whole corpus (1000× less I/O at this corpus size).
    def pqLut = {
      val sub = Similarity.pqSub(q, 8, 8)
      sub.filter(col("vec_id") < 100)
        .select(col("vec_id").as("qid"), col("m"), col("sv"), col("snrm2"))
        .join(broadcast(cb), Seq("m"))
        .withColumn("d2", col("snrm2") + col("cnrm2") - lit(2L) *
          expr("aggregate(zip_with(sv, cq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .select("qid", "m", "cid", "d2")
    }
    val pqRr = time("PQ ADC top-100 + rerank") {
      topSets(Similarity.pqRerankTopK(codes, pqLut, q, queries, 10, 100))
    }
    println(f"[soak-ann] PQ+rerank recall@10    ${recall(pqRr)}%8.3f")
    // The adaptive window (α·points/cells): sized to expected cluster
    // membership, so recall holds where the fixed window collapses —
    // cells = the seeded cluster count on the clustered corpus, else
    // the coarse quantizer's k.
    val adaptiveW = Similarity.adaptiveRerankWindow(
      nVecs, if (clustered) 200L else kCells.toLong)
    val pqAd = time(s"PQ ADC + adaptive rerank@$adaptiveW") {
      topSets(Similarity.pqRerankTopK(codes, pqLut, q, queries, 10, adaptiveW))
    }
    println(f"[soak-ann] PQ+adaptive recall@10  ${recall(pqAd)}%8.3f  (window $adaptiveW)")

    // Residual IVF-PQ (the FAISS IVFPQ design): PQ quantizes x − c(x)
    // (the residual after the coarse cell centroid), so code cells are
    // sized by WITHIN-cell variance instead of corpus-wide variance —
    // bare PQ cannot fine-rank inside a cluster for any practical k
    // because its cells are sized by across-cluster spread (measured
    // above); residual codes resolve exactly that structure.
    val (rcb, rcodes) = time(s"resid-PQ train+encode") {
      val resid = assigned.join(broadcast(cents), Seq("cid"))
        .select(col("vec_id"), col("cid").as("cell"),
          expr("zip_with(q, cq, (x, y) -> x - y)").as("q"))
      val rsub = Similarity.pqSub(resid, 8, 8)
      val cbv = Similarity.pqCodebooks(rsub, pqK, 2)
      val cd = Similarity.pqAssign(rsub, cbv)
        .join(resid.select("vec_id", "cell"), Seq("vec_id"))
        .select("vec_id", "cell", "m", "cid").cache()
      cd.count(); (cbv, cd)
    }
    val ivfpqR = time("resid-PQ ADC+rerank") {
      // probe top-4 cells per query, build a PER-CELL residual LUT
      val probe = queries.crossJoin(broadcast(cents))
        .withColumn("ccos",
          expr("CAST(aggregate(zip_with(qa, cq, (x, y) -> x * y), 0L, (acc, v) -> acc + v) AS DOUBLE)" +
            " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(cnrm2 AS DOUBLE)))"))
      val wc = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid").asc)
      val probed = probe.withColumn("crank", row_number().over(wc))
        .filter(col("crank") <= 4)
        .select(col("qid"), col("qa"), col("cid").as("cell"), col("cq"))
        .withColumn("rq", expr("zip_with(qa, cq, (x, y) -> x - y)"))
      val slices = (0 until 8).map(i =>
        struct(lit(i).as("m"), expr(s"slice(rq, ${i * 8 + 1}, 8)").as("sv")))
      val qsub = probed
        .select(col("qid"), col("cell"), explode(array(slices: _*)).as("x"))
        .select(col("qid"), col("cell"), col("x.m").as("m"), col("x.sv").as("sv"))
        .withColumn("snrm2", expr("aggregate(sv, 0L, (acc, v) -> acc + v * v)"))
      val lut = qsub.join(broadcast(rcb), Seq("m"))
        .withColumn("d2", col("snrm2") + col("cnrm2") - lit(2L) *
          expr("aggregate(zip_with(sv, cq, (x, y) -> x * y), 0L, (acc, v) -> acc + v)"))
        .select("qid", "cell", "m", "cid", "d2")
      val wd = Window.partitionBy(col("qid")).orderBy(col("adist2").asc, col("vec_id").asc)
      // rerank width 400: candidates ≈ the probed cells' plausible set;
      // raw vectors are still touched for only ~0.4% of the corpus
      val cand = rcodes.join(broadcast(lut), Seq("cell", "m", "cid"))
        .filter(col("vec_id") =!= col("qid"))
        .groupBy("qid", "vec_id").agg(sum("d2").as("adist2"))
        .withColumn("rank", row_number().over(wd)).filter(col("rank") <= 400)
        .select("qid", "vec_id")
      topSets(cand
        .join(q.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb")), Seq("vec_id"))
        .join(queries, Seq("qid"))
        .withColumn("cos", expr(Similarity.cosExpr))
        .withColumn("rank", row_number().over(w)).filter(col("rank") <= 10))
    }
    println(f"[soak-ann] residIVFPQ recall@10   ${recall(ivfpqR)}%8.3f")
    spark.stop()
  }
}
