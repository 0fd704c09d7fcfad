package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.core.EmbedError
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
  *
  * Empty-text contract: the reference hard-rejects empty text before it ever
  * reaches the embed function (`vectolite.py:97-98,134-135`), so the default
  * batch path does the same — an empty/null text fails the job with
  * [[EmbedError]]. [[embedLenient]] keeps the zero-vector behavior for
  * pipelines that prefer poison-row tolerance over parity.
  */
trait Embedder extends Serializable {
  def dim: Int

  /** Embed one non-validated text (null → zero vector). */
  def embedOne(text: String): Array[Float]

  // Hoisted once per Embedder instance — not re-allocated per query build.
  @transient private lazy val strictUdf = udf { (s: String) =>
    if (s == null || s.trim.isEmpty)
      throw new EmbedError("Text cannot be empty.")
    embedOne(s)
  }
  @transient private lazy val lenientUdf = udf((s: String) => embedOne(s))

  /** Add `outCol: array<float>` computed from `textCol`; empty/null text
    * fails the job (reference parity, `vectolite.py:97-98`).
    */
  def embed(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, embedCol(col(textCol)))

  /** Column form of the strict path. */
  def embedCol(text: Column): Column = strictUdf(text)

  /** Lenient column form: empty/null text → zero vector (no job failure). */
  def embedLenientCol(text: Column): Column = lenientUdf(text)

  def embedLenient(df: DataFrame, textCol: String, outCol: String): DataFrame =
    df.withColumn(outCol, embedLenientCol(col(textCol)))
}

/** Wrapper giving any embedder a lazily-initialized PER-EXECUTOR-JVM
  * model — the distributed analogue of the reference's `lru_cache`-cached
  * SentenceTransformer (`vectolite.py:304-310`). The model lives in a
  * JVM-wide cache keyed by [[modelKey]], NOT in an instance field: task
  * closures deserialize a fresh wrapper per task, so an instance-level
  * lazy val would rebuild the model per task — the exact cost this class
  * amortizes. Model-backed embedders (ONNX/JNI/etc.) extend this and
  * implement `buildModel` + `embedWithModel`.
  */
abstract class CachedModelEmbedder[M] extends Embedder {
  /** Expensive, executor-local construction (load weights, open session). */
  protected def buildModel(): M
  protected def embedWithModel(model: M, text: String): Array[Float]

  /** JVM-wide cache key; override when differently-configured instances of
    * one class must hold distinct models (include the config in the key).
    */
  protected def modelKey: String = getClass.getName

  private def model: M = CachedModelEmbedder.cache
    .computeIfAbsent(modelKey, _ => buildModel().asInstanceOf[AnyRef])
    .asInstanceOf[M]

  final def embedOne(text: String): Array[Float] = embedWithModel(model, text)
}

object CachedModelEmbedder {
  private val cache = new java.util.concurrent.ConcurrentHashMap[String, AnyRef]()
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
