package graft.llm

import org.apache.spark.ml.Pipeline
import org.apache.spark.ml.feature.{HashingTF, IDF, MinHashLSH, NGram, RegexTokenizer}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** spark.ml-backed text featurization (SURVEY §7.1 llm/ plan): the
  * tokenize → n-gram → hashing-TF → IDF pipeline, and spark.ml's
  * MinHashLSH as an independent implementation to cross-validate the
  * engine's own md5-based pipeline (llm/Dedup.scala).
  */
object TfIdf {

  /** Fit + apply TF-IDF over `textCol`; returns the input plus a
    * `features` vector column. */
  def tfidf(docs: DataFrame, textCol: String, numFeatures: Int = 4096): DataFrame = {
    val pipe = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("tokens")
        .setPattern("\\s+").setToLowercase(true),
      new HashingTF().setInputCol("tokens").setOutputCol("tf")
        .setNumFeatures(numFeatures),
      new IDF().setInputCol("tf").setOutputCol("features")))
    pipe.fit(docs).transform(docs)
  }

  /** Near-dup candidate pairs via spark.ml MinHashLSH over shingle sets
    * (binarized hashing-TF of word 3-grams). Returns (doc_a, doc_b,
    * ml_jaccard_dist). */
  def mlMinhashPairs(docs: DataFrame, idCol: String, textCol: String,
                     maxJaccardDist: Double): DataFrame = {
    val prep = new Pipeline().setStages(Array(
      new RegexTokenizer().setInputCol(textCol).setOutputCol("tokens")
        .setPattern("\\s+").setToLowercase(true),
      new NGram().setInputCol("tokens").setOutputCol("shingles").setN(3),
      new HashingTF().setInputCol("shingles").setOutputCol("features")
        .setNumFeatures(1 << 18).setBinary(true)))
    val feats = prep.fit(docs).transform(docs)
      .filter(size(col("shingles")) > 0)
    val lsh = new MinHashLSH().setInputCol("features").setOutputCol("hashes")
      .setNumHashTables(8).setSeed(42)
    val model = lsh.fit(feats)
    model.approxSimilarityJoin(feats, feats, maxJaccardDist, "ml_jaccard_dist")
      .select(col(s"datasetA.$idCol").as("doc_a"),
        col(s"datasetB.$idCol").as("doc_b"), col("ml_jaccard_dist"))
      .filter(col("doc_a") < col("doc_b"))
  }
}
