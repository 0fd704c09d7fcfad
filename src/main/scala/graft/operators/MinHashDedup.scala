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

  // ------------------------------------------------------- portable variant

  /** Integer value of the first 7 hex digits (28 bits) of `md5(s)` — the
    * same number `('0x' || substr(md5(s), 1, 7))::BIGINT` yields in any
    * SQL engine with an md5 function. 28 bits keeps every product in the
    * affine permutation below 2^56, so the arithmetic never overflows a
    * signed 64-bit integer on either side.
    */
  private[graft] def hex7(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 20) | ((d(1) & 0xffL) << 12) |
      ((d(2) & 0xffL) << 4) | ((d(3) & 0xffL) >>> 4)
  }

  private val PermMod = 1L << 28

  /** MinHash + single-row banding with a PORTABLE hash family (round-11):
    * shingle base-hash = first 7 hex digits of `md5(shingle)`; permutation
    * `p` is the affine map `h -> ((hex7("perm-a:p") | 1) * h +
    * hex7("perm-b:p")) mod 2^28` (odd multiplier, md5-derived constants).
    * Everything — signatures, candidate buckets, the exact-Jaccard verify
    * — is re-derivable in plain SQL, so the declared `minhash_pairs` row
    * hash-checks against a DuckDB twin instead of depending on MLlib's
    * JVM-seeded coefficients.
    *
    * Semantics: emits exactly the pairs (a_id < b_id) that collide on at
    * least one of the `numPerms` minhash values AND whose exact shingle-set
    * Jaccard is ≥ `threshold` (candidate recall at similarity s is
    * 1-(1-s)^numPerms — ≥ 99.6% at s = 0.5 with the default 8; precision
    * is 1.0 by the exact verify). The join is banded on (perm, sig):
    * candidate volume is governed by bucket collisions, not |df|² — the
    * same 100 TB shape as the MLlib path, all in codegen'd native
    * expressions (one md5 per shingle, no UDF in the hash path).
    */
  def nearDupPairsPortable(df: DataFrame, idCol: String, textCol: String,
                           n: Int = 1, threshold: Double = 0.5,
                           numPerms: Int = 8): DataFrame = {
    require(numPerms >= 1 && numPerms <= 64,
      s"numPerms must be in [1, 64], got $numPerms")
    // Empty shingle sets cannot be near-dups of anything (same rule as
    // featurize); dropping them also keeps array_min total.
    val sets = df.select(col(idCol).cast("long").as("id"),
        Dedup.shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
    val hv = sets.withColumn("hv",
      transform(col("sh"), x => conv(substring(md5(x), 1, 7), 16, 10).cast("long")))
    val sigCols = (0 until numPerms).map { p =>
      val a = hex7(s"perm-a:$p") | 1L
      val b = hex7(s"perm-b:$p")
      array_min(transform(col("hv"), h => (h * lit(a) + lit(b)) % lit(PermMod)))
    }
    val banded = hv
      .select(col("id"), posexplode(array(sigCols: _*)).as(Seq("perm", "sig")))
    val cand = banded.select(col("perm"), col("sig"), col("id").as("a_id"))
      .join(banded.select(col("perm"), col("sig"), col("id").as("b_id")),
        Seq("perm", "sig"))
      .filter(col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
    cand
      .join(sets.select(col("id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(sets.select(col("id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .select(col("a_id"), col("b_id"),
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double").as("common"),
        size(col("a_sh")).as("asz"), size(col("b_sh")).as("bsz"))
      .withColumn("jaccard", col("common") / (col("asz") + col("bsz") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }
}
