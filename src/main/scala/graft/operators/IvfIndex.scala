package graft.operators

import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.functions.array_to_vector
import org.apache.spark.ml.linalg.{Vector => MlVector}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** IVF (inverted-file) ANN index — the k-means twin of the hyperplane-LSH
  * path in [[AnnIndex]] (the builder brief asks for "an IVF or LSH-bucketed
  * variant"; this engine ships both):
  *
  *  - BUILD: fit a coarse quantizer (MLlib KMeans, seeded → deterministic)
  *    on the corpus, assign every vector to its nearest centroid; the
  *    index is `(cluster, id, embedding)`, written partitionBy("cluster")
  *    so probes prune partitions.
  *  - PROBE: rank centroids by cosine to the query DRIVER-side (k tiny),
  *    scan only the `nProbe` nearest clusters, exact-rerank with the
  *    codegen cosine.
  *
  * IVF vs LSH trade: IVF adapts buckets to the data distribution (better
  * recall per candidate on clustered corpora) at the cost of a training
  * pass; LSH is data-independent and build-free. Both keep probe cost
  * sub-scan: candidates ≈ |corpus| × nProbe / k.
  */
object IvfIndex {

  final case class Model(centroids: Array[Array[Float]]) {
    def nearestClusters(v: Array[Float], n: Int): Seq[Int] =
      centroids.indices
        .sortBy(i => (-VectorOps.cosine(centroids(i), v), i))
        .take(n)
  }

  /** The ~sqrt(|corpus|) rule of thumb for the number of coarse clusters,
    * clamped to [4, 4096]: at 100 TB the sqrt keeps BOTH sides of the
    * probe cost balanced — centroid ranking is O(k) driver-side, cluster
    * scan is O(|corpus|/k · nProbe) — and 4096 centroids × a few KB is
    * still a trivially broadcastable model.
    */
  def autoK(corpusSize: Long): Int =
    math.max(4L, math.min(4096L, math.round(math.sqrt(corpusSize.toDouble)))).toInt

  /** nProbe companion to [[autoK]]: probe ~1/4 of the clusters (floor 4).
    * Keeps the scanned FRACTION constant as auto-k grows with the corpus,
    * so recall holds while probe cost stays ≈ |corpus|/4 — measured on the
    * weakly-clustered fixture embeddings, where recall tracks the scanned
    * fraction closely (1/8 scan gave recall 0.3–0.5 across SFs, under the
    * declared 0.5 floor; 1/4 clears it). On a genuinely clustered corpus
    * a smaller fraction buys the same recall — this is the conservative
    * data-independent default, overridable per call.
    */
  def defaultNProbe(k: Int): Int = math.max(4, math.ceil(k / 4.0).toInt)

  /** Fit the coarse quantizer. `k <= 0` (the default) picks [[autoK]] from
    * the non-zero corpus size — one extra count job, trivial next to the
    * training pass. Trained with COSINE distance to match the cosine
    * assignment/probe metric — Euclidean centroids would separate by
    * magnitude on unnormalized corpora while assignment ignores it,
    * skewing clusters.
    */
  def fit(emb: DataFrame, embCol: String, k: Int = 0, seed: Long = 42L): Model = {
    // zero vectors are legal table content (cosine paths score them 0.0)
    // but cosine k-means rejects them — exclude from training; they are
    // assigned the reserved cluster -1 at build time and never probed.
    val vecs = emb.filter(exists(col(embCol), x => x =!= 0f))
      .select(array_to_vector(col(embCol)).as("features"))
    val kUse = if (k > 0) k else autoK(vecs.count())
    val km = new KMeans().setK(kUse).setSeed(seed)
      .setDistanceMeasure("cosine")
      .setMaxIter(10) // coarse quantizer: convergence beyond ~10 iters buys no recall
      .setFeaturesCol("features").fit(vecs)
    Model(km.clusterCenters.map(_.toArray.map(_.toFloat)))
  }

  /** Assign every vector to its nearest centroid (one narrow map pass). */
  def buildIndex(emb: DataFrame, idCol: String, embCol: String, model: Model): DataFrame = {
    val assign = udf { (v: Seq[Float]) =>
      val a = v.toArray
      if (a.forall(_ == 0f)) -1 // reserved: zero vectors match nothing
      else {
        var best = 0; var bestScore = Double.MinValue
        var i = 0
        while (i < model.centroids.length) {
          val s = VectorOps.cosine(model.centroids(i), a)
          if (s > bestScore) { bestScore = s; best = i }
          i += 1
        }
        best
      }
    }
    emb.select(col(idCol).cast("long").as("id"), col(embCol).as("embedding"))
      .withColumn("cluster", assign(col("embedding")))
      .select("cluster", "id", "embedding")
  }

  /** One task per cluster dir (see [[AnnIndex.writeIndex]] on why the
    * repartition on the partition column precedes a partitionBy write).
    */
  def writeIndex(index: DataFrame, path: String): Unit =
    index.repartition(col("cluster"))
      .write.mode("overwrite").partitionBy("cluster").parquet(path)

  /** Probe the `nProbe` nearest clusters and exact-rerank. The cluster
    * filter is a literal IN-list → partition pruning on a written index.
    */
  def queryTopK(index: DataFrame, model: Model, queryVec: Array[Float],
                k: Int, nProbe: Int): DataFrame = {
    val probes = model.nearestClusters(queryVec, nProbe)
    val candidates = index.filter(col("cluster").isin(probes: _*))
      .select("id", "embedding")
    Similarity.topK(candidates, "embedding", "id", queryVec, k)
  }

  /** Build + probe in one shot (index not persisted). */
  def approxTopK(emb: DataFrame, idCol: String, embCol: String,
                 queryVec: Array[Float], k: Int, nClusters: Int,
                 nProbe: Int, seed: Long = 42L): DataFrame = {
    val model = fit(emb, embCol, nClusters, seed)
    queryTopK(buildIndex(emb, idCol, embCol, model), model, queryVec, k, nProbe)
  }
}
