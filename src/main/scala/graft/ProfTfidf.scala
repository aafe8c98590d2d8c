package graft

import org.apache.spark.sql.functions._

/** Scratch profiler: stage-by-stage timing of t_tfidf_topk so the
  * window-vs-explode cost split is measured, not guessed. Not part of
  * the driver contract. Run: sbt "runMain graft.ProfTfidf [sfDir]". */
object ProfTfidf {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = Sessions.build(
      math.min(32, Runtime.getRuntime.availableProcessors()).toString)
    Tables.cacheEnabled = true
    Tables.documents(spark, dir).count()
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $name%-24s ${(System.nanoTime() - t0) / 1e9}%7.3f s")
      r
    }
    import org.apache.spark.sql.expressions.Window
    for (round <- 1 to 2) {
      println(s"[tfidf] ---- round $round ----")
      val docs = Tables.documents(spark, dir)
      val wordsCol = split(trim(lower(col("text"))), "\\s+")
      val words = docs.select(col("doc_id"), explode(wordsCol).as("w"))
      val tf = words.groupBy("doc_id", "w").agg(count(lit(1)).as("tf"))
      t("tf agg only")(tf.write.mode("overwrite").format("noop").save())
      val tfc = tf.localCheckpoint()
      val df = tfc.groupBy("w").agg(count(lit(1)).as("df"))
      t("df from tf (ckpt)")(df.write.mode("overwrite").format("noop").save())
      val n = docs.agg(count(lit(1)).as("n"))
      val joined = tfc.join(df, Seq("w")).crossJoin(broadcast(n))
        .withColumn("score", (col("tf") * col("n")).cast("double") / col("df"))
      t("join+score")(joined.write.mode("overwrite").format("noop").save())
      val win = Window.partitionBy("doc_id").orderBy(col("score").desc, col("w").asc)
      t("window top3")(joined.withColumn("rank", row_number().over(win))
        .filter(col("rank") <= 3).write.mode("overwrite").format("noop").save())
    }
    spark.stop()
  }
}
