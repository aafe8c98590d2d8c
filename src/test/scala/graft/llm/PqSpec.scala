package graft.llm

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Product-quantization ANN: codebook shape, complete encoding, ADC
  * ranking contract, and the no-raw-vectors-at-query-time plan. */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val q = Similarity.quantized(Tables.embeddings(spark, sf0001)).cache()
  private lazy val sub = Similarity.pqSub(q, 4, 16).cache()
  private lazy val cents = Similarity.pqCodebooks(sub, 8, 2)

  test("codebooks: 4 subspaces, <=8 centroids each, 16-dim integer centroids") {
    val rows = cents.select("m", "cid", "cq").as[(Int, Int, Seq[Long])].collect()
    assert(rows.map(_._1).toSet == Set(0, 1, 2, 3))
    rows.groupBy(_._1).foreach { case (_, g) =>
      assert(g.length >= 2 && g.length <= 8)
      assert(g.map(_._2).distinct.length == g.length)
    }
    assert(rows.forall(_._3.length == 16))
  }

  test("encoding covers every vector with exactly one code per subspace") {
    val codes = Similarity.pqAssign(sub, cents).select("vec_id", "m", "cid")
    val n = q.count()
    assert(codes.count() == n * 4)
    assert(codes.groupBy("vec_id").count().filter(col("count") =!= 4).isEmpty)
    // every code refers to an existing codebook entry
    assert(codes.join(cents.select("m", "cid"), Seq("m", "cid"), "left_anti").isEmpty)
  }

  test("ADC distance decomposes: exact per-subspace LUT sum, deterministic ranks") {
    val res = SimilarityQueries.queries("s_ann_pq")(spark, sf0001)
      .as[(Long, Long, Long, Int)].collect()
    val byQ = res.groupBy(_._1)
    byQ.foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._4)
      assert(sorted.map(_._4).toSeq == (1 to sorted.length))
      // adist2 non-decreasing with rank; ties broken by vec_id asc
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a._3 < b._3 || (a._3 == b._3 && a._2 < b._2))
        case _ =>
      }
    }
    // repeatable: deterministic training + encode + ranking
    val res2 = SimilarityQueries.queries("s_ann_pq")(spark, sf0001)
      .as[(Long, Long, Long, Int)].collect()
    assert(res.sortBy(r => (r._1, r._4)).toSeq == res2.sortBy(r => (r._1, r._4)).toSeq)
  }

  test("ADC never joins raw vectors: plan touches codes + broadcast LUT only") {
    val plan = SimilarityQueries.queries("s_ann_pq")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(plan.contains("BroadcastHashJoin"), plan)
  }

  test("ivfpqRerankTopK: default window IS the adaptive rule; explicit window honored") {
    val coarse = Similarity.ivfKmeansCentroids(q, 8, 2)
      .collect().map(r => (r.getInt(0), r.getSeq[Long](1), r.getLong(2))).toSeq
      .toDF("cid", "cq", "cnrm2")
    val cells = Similarity.assignNearest(q, coarse)
      .select(col("vec_id"), col("cid").as("cell"))
    val codes = Similarity.pqAssign(sub, cents).select("vec_id", "m", "cid")
    val queries = q.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("q").as("qa"), col("nrm2").as("na"))
    val lut = sub.filter(col("vec_id") < 4)
      .select(col("vec_id").as("qid"), col("m"), col("sv"), col("snrm2"))
      .join(broadcast(cents), Seq("m"))
      .withColumn("d2", col("snrm2") + col("cnrm2") - lit(2L) *
        expr("q_dot(sv, cq)"))
      .select("qid", "m", "cid", "d2")
    def run(w: Option[Int]) =
      Similarity.ivfpqRerankTopK(q, coarse, cells, codes, lut, queries,
        k = 3, nProbe = 2, rerankWindow = w)
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // the no-arg default must produce exactly what an explicit
    // adaptiveRerankWindow(points, cells) value produces
    val wAdaptive = Similarity.adaptiveRerankWindow(q.count(), coarse.count())
    assert(run(None) == run(Some(wAdaptive)))
    // the window parameter is live: a 1-candidate window caps output
    // at one row per query
    val narrow = run(Some(1))
    assert(narrow.groupBy(_._1).forall(_._2.length == 1))
    assert(narrow.nonEmpty && narrow.forall(_._4 == 1))
  }
}
