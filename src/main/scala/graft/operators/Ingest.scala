package graft.operators

import java.nio.charset.{CharacterCodingException, CodingErrorAction, StandardCharsets}
import java.nio.ByteBuffer

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.{EngineError, Validate}
import graft.store.DocStore

/** File-ingestion pipeline (↔ `ingest_file`, `/root/reference/vectolite.py:
  * 412-421,483-535`) — the reference's only ETL path, re-expressed as ONE
  * distributed job instead of its serial per-chunk loop (`:521-525`):
  *
  *   binaryFile scan → strict UTF-8 decode → suffix whitelist →
  *   metadata merge ({source, filename} ∪ user metadata, `:507-508`) →
  *   paragraph chunking (1→N explode with chunk_index/total_chunks,
  *   `:515-525`) → batch embed → dense id assignment → created_at stamp.
  *
  * Validation parity: unsupported suffix and malformed UTF-8 are hard
  * errors (`:419-420, :500-504`), but raised DISTRIBUTED (inside the
  * decode), so a 100 TB ingest doesn't need a driver-side pre-scan of
  * every file. The binaryFile source is used instead of `wholetext` text
  * precisely so the engine sees raw bytes and can reject malformed input
  * rather than silently replacing it.
  */
object Ingest {

  /** Strict UTF-8 decode: malformed bytes → [[EngineError]], mirroring the
    * reference's decode-error exit (`vectolite.py:500-504`).
    */
  def decodeUtf8Strict(bytes: Array[Byte], path: String): String =
    try {
      StandardCharsets.UTF_8.newDecoder()
        .onMalformedInput(CodingErrorAction.REPORT)
        .onUnmappableCharacter(CodingErrorAction.REPORT)
        .decode(ByteBuffer.wrap(bytes)).toString
    } catch {
      case e: CharacterCodingException =>
        throw new EngineError(s"File must be valid UTF-8 text: $path", e)
    }

  private val decodeUdf = udf((b: Array[Byte], path: String) => decodeUtf8Strict(b, path))

  /** Read files as (source, filename, text) with distributed validation.
    * `pathGlob` may be a directory, a glob, or a comma-free single path;
    * only `.txt`/`.md` files are admitted (`vectolite.py:419-420`) — the
    * whitelist is applied as a pushed filter on the file path AND
    * re-checked per row.
    */
  def readTextFiles(spark: SparkSession, pathGlob: String): DataFrame = {
    val suffixOk = lower(col("path")).endsWith(".txt") || lower(col("path")).endsWith(".md")
    spark.read.format("binaryFile").load(pathGlob)
      .filter(suffixOk)
      .select(
        col("path").as("source"),
        element_at(split(col("path"), "/"), -1).as("filename"),
        decodeUdf(col("content"), col("path")).as("text"))
  }

  /** Full pipeline: files → chunked, embedded, id-assigned document rows
    * ready for [[DocStore.append]]. `userMetadata` keys are merged with the
    * per-file {source, filename} and per-chunk {chunk_index, total_chunks}
    * bookkeeping exactly like the reference (`vectolite.py:507-508,523`).
    * Ids continue after `existingMaxId` (the AUTOINCREMENT analogue);
    * `createdAt` is injectable for determinism (SURVEY §7.4).
    */
  def ingestFiles(spark: SparkSession, pathGlob: String, embedder: Embedder,
                  existingMaxId: Long = 0L,
                  userMetadata: Map[String, String] = Map.empty,
                  chunk: Boolean = true, maxChars: Int = 2000, overlap: Int = 200,
                  createdAt: Column = current_timestamp()): DataFrame = {
    val files = readTextFiles(spark, pathGlob)
    val chunked =
      if (chunk) Chunker.explodeChunks(files, "text", maxChars, overlap).drop("text")
      else files
        .withColumn("chunk", trim(col("text")))
        .withColumn("chunk_index", lit(0))
        .withColumn("total_chunks", lit(1))
        .drop("text")
    // Reference semantics are a dict merge where the pipeline's keys win
    // ({**metadata, "source": ..., ...}, vectolite.py:507-508,523): drop
    // colliding user keys so the JSON has single, pipeline-valued keys.
    val reserved = Set("source", "filename", "chunk_index", "total_chunks")
    val userFields = userMetadata.toSeq.sortBy(_._1)
      .collect { case (k, v) if !reserved(k) => lit(v).as(k) }
    val withMeta = chunked.withColumn("metadata",
      DocStore.packMetadata(
        (userFields :+ col("source").as("source") :+ col("filename").as("filename") :+
          col("chunk_index").as("chunk_index") :+ col("total_chunks").as("total_chunks")): _*))
    val embedded = embedder.embed(withMeta, "chunk", "embedding") // strict: empty chunk fails
    DocStore.assignIds(embedded, Seq(col("source"), col("chunk_index")), existingMaxId)
      .withColumn("created_at", createdAt)
      .select(col("id"), col("chunk").as("text"), col("metadata"),
        col("embedding"), col("created_at"))
  }

  /** Driver-side single-path validation façade (CLI parity: exists / is a
    * file / suffix), for callers that want the reference's fail-fast
    * behavior before launching a job (`vectolite.py:412-421`).
    */
  def validatePath(path: String): Unit = {
    val f = new java.io.File(path)
    if (!f.exists()) throw new EngineError(s"File not found: $path")
    if (!f.isFile) throw new EngineError(s"Path is not a file: $path")
    Validate.supportedSuffix(path)
  }
}
