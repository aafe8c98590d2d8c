package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Embedding similarity search: brute-force cosine top-k (baseline) and
  * random-hyperplane LSH bucketing (the scale path — bucket equi-join
  * instead of all-pairs).
  *
  * Vectors are quantized to exact scaled integers (floor(x·2^20)) before
  * any arithmetic: dot products and norms then stay < 2^53, so every
  * intermediate is exact in 64-bit float OR int in any engine — results
  * are bit-deterministic and distribution-order-independent, which a raw
  * float sum would not be. Final cosine = dot/(√na·√nb) is the only
  * inexact step, an identical IEEE instruction sequence everywhere.
  */
object Similarity {

  /** (vec_id, q: array<long>, nrm2: long) quantized view. */
  def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1048576) AS BIGINT))").as("q"))
      .withColumn("nrm2", expr("aggregate(q, 0L, (acc, v) -> acc + v * v)"))

  /** Exact quantized cosine between columns qa/qb with norms na/nb. */
  val cosExpr =
    "CAST(q_dot(qa, qb) AS DOUBLE)" +
      " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(nb AS DOUBLE)))"

  /** IVF coarse quantizer: per-partition centroids as floor-quantized
    * integer vectors (exact means → deterministic across engines and
    * cluster sizes). Real IVF learns centroids with k-means; here the
    * partition key is supplied (e.g. a cluster/label column), which is
    * the serving-time shape either way: centroids are a tiny broadcast
    * table, vectors never leave their partition. */
  def ivfCentroids(q: DataFrame, partCol: String): DataFrame = {
    val comps = q.select(col(partCol), posexplode(col("q")).as(Seq("i", "qv")))
    comps.groupBy(partCol, "i")
      .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).cast("long").as("cv"))
      .groupBy(partCol)
      .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("pairs"))
      .select(col(partCol), expr("transform(pairs, p -> p.cv)").as("cq"))
      .withColumn("cnrm2", expr("aggregate(cq, 0L, (acc, v) -> acc + v * v)"))
  }

  /** Learned IVF coarse quantizer: deterministic k-means over the
    * quantized vectors. Init = the k SMALLEST vec_ids (a fixed,
    * engine-independent seed; rank-labeled, so ids need not be dense
    * or 0-based — a stream whose ids start at 10⁶ trains the same k
    * cells, and relabeling is monotone so every downstream tie-break
    * orders identically); each iteration assigns every vector to
    * its nearest centroid by EXACT integer squared-L2
    * (‖a−b‖² = ‖a‖² + ‖c‖² − 2·a·c, all BIGINT sums — bit-identical in
    * any engine; ties break on centroid id) and recomputes centroids as
    * floor-averaged integer vectors. Assignment is a broadcast of k
    * centroid rows — the corpus never shuffles for it; the centroid
    * update shuffles (k × dims) partial sums, not vectors. */
  /** Default cell count for a corpus of `n` vectors: ⌈√n⌉ clamped to
    * [8, 65536]. SemDeDup (Abbas et al. 2023) runs 10⁴–10⁵ clusters at
    * web scale (50k for ~10⁸ embeddings) — the √n curve passes through
    * that band and keeps BOTH sides of the cluster trade bounded:
    * expected cell population n/k = √n (within-cell pair work stays
    * sub-quadratic) and the per-batch pruned state read tracks cell
    * occupancy instead of the corpus (a FIXED small k makes every
    * pruned read corpus-sized as n grows — the r7 scale caveat this
    * default retires). Explicit k still wins where a product has a
    * tuned quantizer. */
  def cellCount(n: Long): Int =
    math.max(8, math.min(65536, math.ceil(math.sqrt(n.toDouble)).toInt))

  def ivfKmeansCentroids(q: DataFrame, k: Int, iters: Int): DataFrame = {
    val s = q.sparkSession
    import s.implicits._
    val seed = q.orderBy("vec_id").limit(k).select("vec_id", "q")
      .collect().map(r => r.getSeq[Long](1))
    require(seed.nonEmpty, "cannot train a quantizer on an empty corpus")
    var cents = seed.zipWithIndex
      .map { case (cq, i) => (i, cq) }.toSeq.toDF("cid", "cq")
    for (_ <- 0 until iters) {
      val assigned = assignNearest(q, withCnrm2(cents))
      cents = assigned
        .select(col("cid"), posexplode(col("q")).as(Seq("i", "qv")))
        .groupBy("cid", "i")
        .agg(floor(sum(col("qv")).cast("double") / count(lit(1))).cast("long").as("cv"))
        .groupBy("cid")
        .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("pairs"))
        .select(col("cid"), expr("transform(pairs, p -> p.cv)").as("cq"))
    }
    withCnrm2(cents)
  }

  private def withCnrm2(cents: DataFrame): DataFrame =
    cents.select(col("cid"), col("cq"),
      expr("aggregate(cq, 0L, (acc, v) -> acc + v * v)").as("cnrm2"))

  /** IVF probe: rank the (tiny, broadcast) cell table per query by
    * centroid cosine and keep the top `nprobe` cells. `queries` is
    * `(qid, qa, na)`, `cents` is `(cellCol, cq, cnrm2)`; returns
    * `(qid, qa, na, cellCol)`. One definition serves every IVF-shaped
    * query AND the incremental index — a tie-break or quantization
    * change happens in exactly one place. */
  def probeCells(queries: DataFrame, cents: DataFrame, cellCol: String,
                 nprobe: Int): DataFrame = {
    val probe = queries.crossJoin(broadcast(cents))
      .withColumn("ccos",
        expr("CAST(q_dot(qa, cq) AS DOUBLE)" +
          " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(cnrm2 AS DOUBLE)))"))
    val wc = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col(cellCol).asc)
    probe.withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nprobe).select("qid", "qa", "na", cellCol)
  }

  /** Score probed queries against their cells' members by exact
    * quantized cosine and keep the per-query top `topK`. `corpus` is
    * `(cellCol, vec_id, qb, nb)`; returns `(qid, vec_id, cos, rank)`. */
  def scoreTopK(probed: DataFrame, corpus: DataFrame, cellCol: String,
                topK: Int): DataFrame = {
    val scored = probed.join(corpus, Seq(cellCol))
      .filter(col("qid") =!= col("vec_id"))
      .withColumn("cos", expr(cosExpr))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select("qid", "vec_id", "cos", "rank")
  }

  /** (vec_id, q, nrm2, cid): nearest centroid by exact integer squared
    * L2, ties to the smaller cid. The k centroids are CONFIG-scale, so
    * they collect to the driver and the argmin folds into one map-side
    * expression — the corpus is never shuffled or row-multiplied for
    * assignment (a k× explode + per-vector window would shuffle k×10⁹
    * rows at real scale for what is a per-row reduction over k). */
  def assignNearest(q: DataFrame, cents: DataFrame): DataFrame = {
    val cl = cents.select(col("cid"), col("cq"), col("cnrm2"))
      .collect()
      .map(r => (r.getInt(0), r.getSeq[Long](1).toArray, r.getLong(2)))
      .sortBy(_._1)
    require(cl.nonEmpty, "no centroids")
    val dists = cl.map { case (cid, cq, cn) =>
      val dot = expr(s"q_dot(q, array(${cq.mkString("L,")}L))")
      struct((col("nrm2") + cn - lit(2L) * dot).as("dist"), lit(cid).as("cid"))
    }
    // array_min's lexicographic struct ordering = (dist asc, cid asc),
    // exactly the former window's tie-break — and the expression tree
    // stays LINEAR in k (a when-chain fold would re-embed the running
    // best distance twice per step: 2^k nodes by k=16)
    q.select(col("vec_id"), col("q"), col("nrm2"),
      array_min(array(dists.toIndexedSeq: _*)).getField("cid").as("cid"))
  }

  /** SemDeDup (the published cluster-then-dedup method: Abbas et al.
    * 2023, "SemDeDup: Data-efficient learning at web-scale through
    * semantic deduplication"): k-means clusters bound the comparison
    * set, then only WITHIN-cluster pairs pay an exact cosine, and a
    * document duplicates iff some earlier (smaller-id) cluster-mate
    * sits above `minCos`. Keep-min-id is this engine's deterministic
    * stand-in for the paper's keep-low-centroid-similarity choice —
    * same dedup set size, oracle-stable ordering.
    *
    * Input: `assigned` = (vec_id, q, nrm2, cid) from [[assignNearest]].
    * Output: (cid, vec_id, dup_of, max_cos) — one row per DROPPED doc.
    *
    * Scale shape: the pair join is an equi-join on cid, never
    * all-pairs; at real volume k scales with the corpus (the paper
    * uses ~10⁴–10⁵ clusters) so cluster populations stay bounded, and
    * the `maxCluster` guard excludes any cluster that still exceeds
    * the bound from pair generation (same cap discipline as the LSH
    * hot-bucket guard — a flooded cluster belongs to exact dedup, and
    * the cap is mirrored in the DuckDB oracle). */
  def semdedup(assigned: DataFrame, minCos: Double,
               maxCluster: Int = 4096): DataFrame = {
    val hot = assigned.groupBy("cid").agg(count(lit(1)).as("n"))
      .filter(col("n") > maxCluster).select("cid")
    val ok = assigned.join(hot, Seq("cid"), "left_anti")
    val a = ok.select(col("cid"), col("vec_id").as("doc_a"),
      col("q").as("qa"), col("nrm2").as("na"))
    val b = ok.select(col("cid"), col("vec_id").as("doc_b"),
      col("q").as("qb"), col("nrm2").as("nb"))
    a.join(b, Seq("cid")).filter(col("doc_a") < col("doc_b"))
      .withColumn("cos", expr(cosExpr))
      .filter(col("cos") >= minCos)
      .groupBy(col("cid"), col("doc_b").as("vec_id"))
      .agg(min("doc_a").as("dup_of"), max("cos").as("max_cos"))
  }

  /** Multi-probe LSH-blocked near-dup sweep: pairs that share `labelCol`
    * AND whose nPlanes-bit hyperplane buckets differ by at most
    * `probeDist` bits, verified by exact cosine >= minCos.
    *
    * Candidates come from pigeonhole blocking of the bucket (probeDist+1
    * contiguous blocks; <=probeDist flipped bits leave >=1 block equal),
    * so the plan is an equi-join on (label, blk, block_value) — never a
    * within-label all-pairs product, which at real scale is quadratic in
    * the hottest label. Each surviving pair is counted once, at its FIRST
    * matching block (no distinct over array columns needed).
    *
    * This is the approximate sweep by definition: recall of true
    * cos>=minCos pairs is bounded by the LSH collision probability
    * (raise nPlanes-bit probes or probeDist for more recall, at more
    * candidate cost). Input: (vec_id, q, nrm2, labelCol).
    * Output: (label, doc_a, doc_b, cos).
    */
  def neardupBlocked(q: DataFrame, labelCol: String, nPlanes: Int = 8,
                     probeDist: Int = 2, minCos: Double = 0.4): DataFrame = {
    val qb = q.join(buckets(q.select("vec_id", "q", "nrm2"), nPlanes), "vec_id")
    val nBlocks = probeDist + 1
    val bounds = (0 to nBlocks).map(i => i * nPlanes / nBlocks)
    def blockVal(bucket: org.apache.spark.sql.Column, i: Int) =
      shiftright(bucket, bounds(i)).bitwiseAND(lit((1L << (bounds(i + 1) - bounds(i))) - 1))
    val blocks = (0 until nBlocks).map(i =>
      struct(lit(i).as("blk"), blockVal(col("bucket"), i).as("bv")))
    val ex = qb.select(col(labelCol).as("label"), col("vec_id"), col("q"),
        col("nrm2"), col("bucket"), explode(array(blocks: _*)).as("b"))
      .select(col("label"), col("vec_id"), col("q"), col("nrm2"), col("bucket"),
        col("b.blk").as("blk"), col("b.bv").as("bv"))
    val a = ex.select(col("label"), col("blk"), col("bv"), col("vec_id").as("doc_a"),
      col("q").as("qa"), col("nrm2").as("na"), col("bucket").as("ba"))
    val b = ex.select(col("label"), col("blk"), col("bv"), col("vec_id").as("doc_b"),
      col("q").as("qb"), col("nrm2").as("nb"), col("bucket").as("bb"))
    // first matching block index, as a pure expression over (ba, bb)
    val firstEq = (0 until nBlocks).foldRight(lit(nBlocks): org.apache.spark.sql.Column) {
      (i, rest) => when(blockVal(col("ba"), i) === blockVal(col("bb"), i), lit(i)).otherwise(rest)
    }
    a.join(b, Seq("label", "blk", "bv")).filter(col("doc_a") < col("doc_b"))
      .filter(expr(s"bit_count(ba ^ bb) <= $probeDist"))
      .filter(col("blk") === firstEq)
      .withColumn("cos", expr(cosExpr))
      .filter(col("cos") >= minCos)
      .select("label", "doc_a", "doc_b", "cos")
  }

  /** Subspace view for product quantization: one row per (vec_id, m)
    * carrying the m-th subDim-wide slice of the quantized vector and its
    * integer squared norm. The subspace index rides as a DATA column, so
    * one k-means chain trains every codebook at once — no per-subspace
    * plan duplication. */
  def pqSub(q: DataFrame, m: Int, subDim: Int): DataFrame = {
    val slices = (0 until m).map(i =>
      struct(lit(i).as("m"), slice(col("q"), i * subDim + 1, subDim).as("sv")))
    q.select(col("vec_id"), explode(array(slices: _*)).as("x"))
      .select(col("vec_id"), col("x.m").as("m"), col("x.sv").as("sv"))
      .withColumn("snrm2", expr("aggregate(sv, 0L, (acc, v) -> acc + v * v)"))
  }

  /** Nearest codebook entry per (vec_id, m): the m×k centroid rows are
    * CONFIG-scale, so they collect to the driver and the per-subspace
    * argmin folds into one map-side CASE-over-array_min expression —
    * the corpus is never row-multiplied or shuffled for encoding (the
    * join+window alternative inflates every vector k× through an
    * exchange). Ties break to the smaller cid, same as the oracle's
    * row_number order. Output: input columns + cid. */
  def pqAssign(sub: DataFrame, cents: DataFrame): DataFrame =
    pqAssignArr(sub, collectCents(cents))

  private def collectCents(cents: DataFrame): Array[(Int, Int, Array[Long], Long)] =
    cents.select(col("m"), col("cid"), col("cq"), col("cnrm2"))
      .collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Long](2).toArray, r.getLong(3)))

  private def pqAssignArr(sub: DataFrame,
      rowsArr: Array[(Int, Int, Array[Long], Long)]): DataFrame = {
    require(rowsArr.nonEmpty, "no codebooks")
    val nM = rowsArr.map(_._1).max + 1
    val codebook = Array.tabulate(nM)(mIdx =>
      rowsArr.filter(_._1 == mIdx).sortBy(_._2)
        .map { case (_, cid, cq, cn) => (cid, cq, cn) })
    sub.withColumn("cid",
      graft.functions.PqNearestCode(col("m"), col("sv"), codebook))
  }

  /** Product-quantization codebooks: per subspace, k centroids trained
    * with `iters` rounds of the same deterministic integer k-means as
    * ivfKmeansCentroids (init = the first k vec_ids' subvectors; exact
    * integer squared-L2 assignment, ties to the smaller cid;
    * floor-averaged integer centroid update). Output (m, cid, cq,
    * cnrm2) — m·k rows, broadcast-size at any corpus scale. */
  def pqCodebooks(sub: DataFrame, k: Int, iters: Int): DataFrame = {
    import sub.sparkSession.implicits._
    // Each iteration's centroids collect to the driver (m·k tiny rows —
    // they must anyway, for the map-side argmin), so every training
    // round runs the corpus scan exactly once and the returned frame is
    // LITERAL-backed: consumers (encode, LUT build) never re-execute
    // the training lineage.
    var arr = collectCents(sub.filter(col("vec_id") < k)
      .select(col("m"), col("vec_id").cast("int").as("cid"), col("sv").as("cq"),
        col("snrm2").as("cnrm2")))
    for (_ <- 0 until iters) {
      val assigned = pqAssignArr(sub, arr)
      arr = collectCents(assigned
        .select(col("m"), col("cid"), posexplode(col("sv")).as(Seq("i", "c")))
        .groupBy("m", "cid", "i")
        .agg(floor(sum(col("c")).cast("double") / count(lit(1))).cast("long").as("cv"))
        .groupBy("m", "cid")
        .agg(array_sort(collect_list(struct(col("i"), col("cv")))).as("pairs"))
        .select(col("m"), col("cid"), expr("transform(pairs, p -> p.cv)").as("cq"))
        .withColumn("cnrm2", expr("aggregate(cq, 0L, (acc, v) -> acc + v * v)")))
    }
    arr.toSeq.map { case (m, cid, cq, cn) => (m, cid, cq.toSeq, cn) }
      .toDF("m", "cid", "cq", "cnrm2")
  }

  /** The rerank-window sizing rule measured in SCALE.md's 1M ANN soak:
    * bare-PQ ADC reliably lands in the right CLUSTER but cannot
    * fine-rank inside it (low-bit codes), so a fixed-count rerank
    * window under-samples cluster membership as the corpus grows —
    * recall collapsed at 1M clustered vectors with rerank@100 while
    * the same window was fine at 100k. Size the window to expected
    * cluster population instead: α · points / cells (α ≥ 1 absorbs
    * uneven cluster sizes), floored so tiny corpora still rerank a
    * meaningful set. Cells = the corpus's cluster count (the coarse
    * quantizer's k, or the known label cardinality). */
  def adaptiveRerankWindow(points: Long, cells: Long,
                           alpha: Double = 2.0, floor: Int = 20): Int =
    math.max(floor,
      math.ceil(alpha * points.toDouble / math.max(1L, cells)).toInt)

  /** Two-stage PQ retrieval (the production serving shape): ADC over
    * 4-byte codes picks `rerankWindow` candidates per query, exact
    * quantized cosine re-ranks them to top-`k` — raw vectors are
    * opened for rerankWindow rows/query instead of the corpus. Final
    * scores are EXACT, so the approximation only moves which rows are
    * considered, never their reported similarity.
    *
    * codes: (vec_id, m, cid) PQ-encoded corpus; lut: (qid, m, cid, d2)
    * per-query ADC lookup table (broadcast-size: queries × m × k);
    * corpus: (vec_id, q, nrm2) quantized vectors for the exact stage;
    * queries: (qid, qa, na). Pass `rerankWindow =`
    * [[adaptiveRerankWindow]] unless an oracle pins a constant. */
  def pqRerankTopK(codes: DataFrame, lut: DataFrame, corpus: DataFrame,
                   queries: DataFrame, k: Int, rerankWindow: Int): DataFrame = {
    val wd = Window.partitionBy(col("qid")).orderBy(col("adist2").asc, col("vec_id").asc)
    val cand = codes.join(broadcast(lut), Seq("m", "cid"))
      .filter(col("vec_id") =!= col("qid"))
      .groupBy("qid", "vec_id").agg(sum("d2").as("adist2"))
      .withColumn("crank", row_number().over(wd))
      .filter(col("crank") <= rerankWindow)
      .select("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .join(corpus.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb")),
        Seq("vec_id"))
      .join(queries, Seq("qid"))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "vec_id", "cos", "rank")
  }

  /** IVF-PQ retrieval with exact rerank — the full production serving
    * shape (FAISS IVFPQ + refine): rank the broadcast coarse centroids,
    * ADC-scan only the nProbe probed cells' code rows with a broadcast
    * LUT, then open raw quantized vectors for the top `rerankWindow`
    * ADC candidates per query and re-rank them by exact quantized
    * cosine to top-k. Final scores are EXACT; the approximation only
    * moves which rows are considered.
    *
    * `rerankWindow = None` (the DEFAULT) sizes the window with
    * [[adaptiveRerankWindow]] — α·points/cells, the rule the 1M
    * clustered soak measured (a fixed count under-samples cluster
    * population as the corpus grows and recall collapses). Points and
    * cells come from two counts: coarse is centroid-sized (k rows) and
    * the corpus count is one cheap job at index-serve setup — callers
    * that already know the corpus size, or whose oracle pins a
    * constant, pass `Some(w)`.
    *
    * corpus: (vec_id, q, nrm2); coarse: (cid, cq, cnrm2); cells:
    * (vec_id, cell) coarse assignment; codes: (vec_id, m, cid) PQ
    * codes; lut: (qid, m, cid, d2) per-query ADC table; queries:
    * (qid, qa, na). One corpus-sized equi-join on vec_id attaches
    * cells to codes (bucketable/co-partitionable at scale); everything
    * downstream of the probe is broadcast. */
  def ivfpqRerankTopK(corpus: DataFrame, coarse: DataFrame, cells: DataFrame,
                      codes: DataFrame, lut: DataFrame, queries: DataFrame,
                      k: Int, nProbe: Int,
                      rerankWindow: Option[Int] = None): DataFrame = {
    val window = rerankWindow.getOrElse(
      adaptiveRerankWindow(corpus.count(), coarse.count()))
    val wc = Window.partitionBy(col("qid")).orderBy(col("ccos").desc, col("cid").asc)
    val probed = queries.crossJoin(broadcast(coarse))
      .withColumn("ccos",
        expr("CAST(q_dot(qa, cq) AS DOUBLE)" +
          " / (sqrt(CAST(na AS DOUBLE)) * sqrt(CAST(cnrm2 AS DOUBLE)))"))
      .withColumn("crank", row_number().over(wc))
      .filter(col("crank") <= nProbe)
      .select(col("qid"), col("cid").as("cell"))
    val wd = Window.partitionBy(col("qid")).orderBy(col("adist2").asc, col("vec_id").asc)
    val cand = codes.join(cells, Seq("vec_id"))
      .join(broadcast(probed), Seq("cell"))
      .filter(col("vec_id") =!= col("qid"))
      .join(broadcast(lut), Seq("qid", "m", "cid"))
      .groupBy("qid", "vec_id").agg(sum("d2").as("adist2"))
      .withColumn("crank", row_number().over(wd))
      .filter(col("crank") <= window)
      .select("qid", "vec_id")
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id").asc)
    cand
      .join(corpus.select(col("vec_id"), col("q").as("qb"), col("nrm2").as("nb")),
        Seq("vec_id"))
      .join(queries, Seq("qid"))
      .withColumn("cos", expr(cosExpr))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select("qid", "vec_id", "cos", "rank")
  }

  /** Random-hyperplane LSH bucket (nPlanes bits) per vector. Signs are
    * md5-derived so both engines (and every executor) agree without a
    * shared random state; the table is precomputed once driver-side and
    * the projections fold in ONE compiled map-side pass — zero exchanges
    * in the bucket build (graft.functions.HyperplaneBucket). */
  def buckets(q: DataFrame, nPlanes: Int = 8, nDims: Int = 64): DataFrame =
    q.select(col("vec_id"),
      graft.functions.HyperplaneBucket(col("q"), nPlanes, nDims).as("bucket"))
}
