package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorOps

/** Batch embedding — the Spark mapping of the reference's injected
  * `embed_fn: List[str] -> List[List[float]]` (`/root/reference/vectolite.py:48,
  * 301-346`). The reference treats embedding as a pluggable black box; we keep
  * that design point as a trait whose implementations transform a whole
  * column in one distributed pass (vs the reference's one-document-at-a-time
  * serial loop, `vectolite.py:521-525`).
  *
  * The container has no model weights and no egress, so the built-in
  * implementation is a deterministic feature-hashing embedder (token hashing
  * into a fixed-dim float array + L2 normalization, the HashingTF idea from
  * public MLlib). Real model providers (the reference's SentenceTransformers /
  * OpenAI paths, `vectolite.py:312-346`) slot behind the same trait: heavy
  * model state belongs in a lazily-initialized per-executor singleton — the
  * distributed analogue of the reference's `lru_cache` (`vectolite.py:305`).
  */
trait Embedder extends Serializable {
  def dim: Int
  /** Embed one text (driver-side / per-row). */
  def embedOne(text: String): Array[Float]
  /** Add `outCol: array<float>` computed from `textCol`. */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame = {
    val f = udf((s: String) => embedOne(s))
    df.withColumn(outCol, f(col(textCol)))
  }
  def embedCol(text: Column): Column = udf((s: String) => embedOne(s)).apply(text)
}

/** Deterministic signed feature-hashing embedder: lowercase word tokens,
  * murmur3-hash each into one of `dim` buckets with a ±1 sign from a second
  * hash, accumulate, then L2-normalize. Stateless, so executors need no
  * model download — suitable as the offline default and for tests.
  */
final case class HashingEmbedder(dim: Int = 64, seed: Int = 42) extends Embedder {
  def embedOne(text: String): Array[Float] = {
    val v = new Array[Float](dim)
    if (text == null) return v
    val it = text.toLowerCase.split("[^a-z0-9]+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val t = it.next()
      val h = MurmurHash3.stringHash(t, seed)
      val idx = ((h % dim) + dim) % dim
      val sign = if (MurmurHash3.stringHash(t, seed + 1) >= 0) 1f else -1f
      v(idx) += sign
    }
    VectorOps.l2Normalize(v)
  }
}
