package graft.operators

import org.apache.spark.ml.feature.{HashingTF, MinHashLSH, MinHashLSHModel}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** MinHash + LSH near-duplicate detection over token/shingle sets — the
  * scale path for Jaccard dedup (SURVEY §2.3 E4) built on public MLlib
  * (`MinHashLSH`, `HashingTF`): shingle → sparse binary feature vector →
  * minhash signatures → banded bucket join via `approxSimilarityJoin`.
  *
  * Everything is deterministic for a fixed seed, so results are stable
  * across runs/partitionings (candidate generation is hash-based, and the
  * final Jaccard distance MLlib reports is exact over the feature sets).
  */
object MinHashDedup {

  /** Tokenize into word n-gram shingles and hash into a binary sparse
    * vector of `numFeatures` dims (feature presence, not counts — MinHash
    * is a set similarity).
    */
  def featurize(df: DataFrame, textCol: String, n: Int = 1,
                numFeatures: Int = 1 << 18): DataFrame = {
    val withShingles = df.withColumn("__graft_shingles", Dedup.shingles(col(textCol), n))
    val tf = new HashingTF()
      .setInputCol("__graft_shingles").setOutputCol("features")
      .setNumFeatures(numFeatures).setBinary(true)
    // Empty shingle sets would make MinHash throw; they cannot be near-dups
    // of anything, so drop them (reference empty-text rows are rejected at
    // insert anyway, vectolite.py:97-98).
    tf.transform(withShingles)
      .filter(size(col("__graft_shingles")) > 0)
      .drop("__graft_shingles")
  }

  /** Fit the MinHash model (the "index build" half — cheap: the model is
    * just `numHashTables` random hash coefficients).
    */
  def fit(features: DataFrame, numHashTables: Int = 5, seed: Long = 42L): MinHashLSHModel =
    new MinHashLSH()
      .setNumHashTables(numHashTables)
      .setInputCol("features").setOutputCol("hashes")
      .setSeed(seed)
      .fit(features)

  /** Near-dup candidate pairs (a_id < b_id) with Jaccard distance ≤
    * `maxDistance`. The join is banded on minhash buckets — candidate
    * volume is governed by numHashTables, not |df|².
    */
  def nearDupPairs(df: DataFrame, idCol: String, textCol: String,
                   n: Int = 1, maxDistance: Double = 0.5,
                   numHashTables: Int = 5, seed: Long = 42L): DataFrame = {
    val feats = featurize(df, textCol, n)
    val model = fit(feats, numHashTables, seed)
    model.approxSimilarityJoin(feats, feats, maxDistance, "jaccard_dist")
      .select(
        col(s"datasetA.$idCol").cast("long").as("a_id"),
        col(s"datasetB.$idCol").cast("long").as("b_id"),
        round(lit(1.0) - col("jaccard_dist"), 6).as("jaccard"))
      .filter(col("a_id") < col("b_id"))
  }
}
