package graft.core

/** Typed error hierarchy mirroring the reference's error model
  * (`/root/reference/vectolite.py:32-39`): a base engine error plus an
  * embedding-specific subtype. Validation helpers reproduce the reference's
  * input guards (`vectolite.py:94-98,131-138,412-421`).
  */
sealed class GraftError(msg: String, cause: Throwable = null)
    extends RuntimeException(msg, cause)

/** ↔ `VectoliteError` (`vectolite.py:32-34`). */
class EngineError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

/** ↔ `EmbeddingError` (`vectolite.py:37-39`). */
class EmbedError(msg: String, cause: Throwable = null)
    extends GraftError(msg, cause)

object Validate {
  /** ↔ empty-text rejection on insert/query (`vectolite.py:97-98,134-135`). */
  def nonEmptyText(text: String, what: String = "Text"): Unit =
    if (text == null || text.trim.isEmpty)
      throw new EngineError(s"$what cannot be empty.")

  /** ↔ `top_k <= 0` rejection (`vectolite.py:137-138`). */
  def positiveTopK(k: Int): Unit =
    if (k <= 0) throw new EngineError("top_k must be positive.")

  /** ↔ file-suffix whitelist (`vectolite.py:419-420`). */
  def supportedSuffix(path: String): Unit = {
    val ok = path.toLowerCase.endsWith(".txt") || path.toLowerCase.endsWith(".md")
    if (!ok) throw new EngineError("Unsupported file type. Use .txt or .md files.")
  }
}
