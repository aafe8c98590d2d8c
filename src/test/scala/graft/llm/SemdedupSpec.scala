package graft.llm

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** SemDeDup semantics at spec scale: keep-min-id within a cluster,
  * cluster-boundedness (no cross-cluster drops however similar), and
  * the maxCluster guard (a flooded cluster generates no pairs and is
  * left to exact dedup — the LSH hot-bucket discipline). */
class SemdedupSpec extends SparkSpec {

  private def quant(vs: (Long, Int, Seq[Double])*) = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val rows = vs.map { case (id, cid, v) =>
      val q = v.map(x => math.floor(x * 1048576).toLong)
      Row(id, q, q.map(x => x * x).sum, cid)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows),
      StructType(Seq(
        StructField("vec_id", LongType), StructField("q", ArrayType(LongType)),
        StructField("nrm2", LongType), StructField("cid", IntegerType))))
  }

  test("drops later near-identical cluster-mates, keeps the earliest; never crosses clusters") {
    val df = quant(
      (1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(0.999, 0.01)), // near-dup pair in cid 0
      (3L, 0, Seq(0.0, 1.0)),                            // same cluster, orthogonal
      (4L, 1, Seq(1.0, 0.0)))                            // identical to 1 but other cluster
    val out = Similarity.semdedup(df, minCos = 0.95).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(out == Set((0, 2L, 1L)), s"got $out") // only doc 2 drops, dup_of = 1
  }

  test("clusters past maxCluster generate no pairs (flood guard)") {
    val flood = (10L to 15L).map(i => (i, 7, Seq(1.0, 0.0))) // 6 identical docs, cid 7
    val ok = Seq((1L, 0, Seq(1.0, 0.0)), (2L, 0, Seq(1.0, 0.0)))
    val df = quant(flood ++ ok: _*)
    val out = Similarity.semdedup(df, minCos = 0.95, maxCluster = 4).collect()
      .map(r => (r.getInt(0), r.getLong(1))).toSet
    assert(out == Set((0, 2L)), s"flooded cluster must be excluded, got $out")
    // with a cap that admits it, the flood dedups to its min id
    val uncapped = Similarity.semdedup(df, minCos = 0.95, maxCluster = 100).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2))).toSet
    assert(uncapped == Set((0, 2L, 1L)) ++ (11L to 15L).map(i => (7, i, 10L)).toSet)
  }
}
