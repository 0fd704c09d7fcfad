package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
import org.apache.spark.sql.types._

/** Loaders for the driver-provided parquet fixtures (see TESTDATA.md /
  * FIXTURES.md) plus the canonical schema of the engine's own `documents`
  * store (SURVEY §1.3, mapping `/root/reference/vectolite.py:62-68`).
  */
object Tables {
  /** Read one fixture table from a scale-factor directory. Plain
    * `read.parquet` keeps the scan declarative so Catalyst pushes filters
    * and prunes columns into the parquet reader.
    */
  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def documents(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "documents")
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "embeddings")

  /** The events fixture's `ts` column has shipped in two physical
    * encodings across driver testdata generations: parquet
    * TIMESTAMP(NANOS) — which Spark 4.x rejects outright
    * (PARQUET_TYPE_ILLEGAL) unless read as raw longs via the legacy
    * `nanosAsLong` conf and truncated with `ts div 1000` — and plain
    * TIMESTAMP(MICROS), which Spark reads natively as TimestampType.
    * This reader inspects the LOADED dtype and normalizes both to a
    * microsecond TimestampType, so it is portable across fixture
    * generations. (`a div b`, not `/`: nanos exceed 2^53, double math
    * would corrupt them.)
    *
    * SIDE EFFECT (documented contract, VERDICT r7 #3): this reader SETS
    * the SESSION-GLOBAL `spark.sql.legacy.parquet.nanosAsLong` flag —
    * Spark exposes no per-read override for it — so any OTHER
    * TIMESTAMP(NANOS) parquet read in the same session will also surface
    * raw longs from then on. The flag is inert for MICROS fixtures.
    * Acceptable for this fixture harness (the events table is the only
    * potential nanos source here); a multi-tenant session embedding this
    * library should scope such reads to a dedicated session
    * (`spark.newSession()` shares the context but isolates conf).
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, sfDir, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos surfaced as raw longs under the legacy conf
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw // native micros — nothing to normalize
      case TimestampNTZType =>
        // naive micros (pyarrow timestamp[us] without tz). Cast to the
        // session-zoned TimestampType the rest of the engine speaks; all
        // graft entrypoints pin spark.sql.session.timeZone=UTC, so the
        // wall-clock values are preserved as epoch-UTC instants —
        // identical to how DuckDB treats the same naive column.
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other => throw new IllegalStateException(
        s"events.ts: unsupported parquet dtype $other (expected nanos-as-long or timestamp)")
    }
  }

  /** Raw (pre-cast) events schema with `ts` as raw LongType nanos (the
    * legacy-fixture shape under the nanosAsLong conf). Needed because
    * streaming reads require a user-supplied schema.
    */
  private val eventsRawNanosSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Events schema with `ts` as naive TimestampNTZType (micros fixtures —
    * pyarrow writes timestamp[us] without tz, which Spark 4 infers as NTZ;
    * the supplied streaming schema must match what inference would say).
    */
  private val eventsNtzSchema: StructType = StructType(
    eventsRawNanosSchema.map(f => if (f.name == "ts") f.copy(dataType = TimestampNTZType) else f))

  /** Streaming twin of [[events]]: a file-source stream over the fixture
    * parquet DIRECTLY — no normalized temp copy of the table is ever
    * written (round 3 rewrote one per run: 11 s of gate overhead + a
    * temp-disk leak). Streaming reads demand the schema up front, so the
    * `ts` encoding is sniffed from the parquet footer via a one-off batch
    * `read.parquet(...).schema` (metadata only — no data scan) and the
    * matching schema + normalization is applied. Supplying the WRONG
    * LongType schema over a micros file would silently surface raw micros
    * and then mis-divide them — sniffing makes that impossible.
    */
  def eventsStream(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = s"$sfDir/events.parquet"
    val tsIsLong = spark.read.parquet(path).schema("ts").dataType == LongType
    // `{events.parquet}` is a GLOB matching exactly that file: for a
    // non-glob path FileStreamSource force-overrides basePath with the
    // path itself, which for a bare fixture FILE fails "basePath must be
    // a directory"; a glob keeps our directory basePath in force.
    val raw = spark.readStream
      .schema(if (tsIsLong) eventsRawNanosSchema else eventsNtzSchema)
      .option("basePath", sfDir).parquet(s"$sfDir/{events.parquet}")
    if (tsIsLong) raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else raw.withColumn("ts", col("ts").cast(TimestampType)) // NTZ → UTC instant, see [[events]]
  }
  /** Fixture documents schema — the fallback for arrival-dir streams that
    * may start before any file exists ([[documentsArrivalStream]]).
    */
  private val documentsSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Streaming twin of [[documents]] — file-source stream over the fixture
    * parquet (same glob trick as [[eventsStream]]). The required schema is
    * SNIFFED from the parquet footer via a one-off batch read (metadata
    * only — no data scan) rather than hardcoded: a fixture generation
    * that drifts a column's physical type would otherwise break the
    * stream while the batch read still works — the exact failure class
    * the events `ts` column hit in round 11.
    */
  def documentsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(s"$sfDir/documents.parquet").schema)
      .option("basePath", sfDir).parquet(s"$sfDir/{documents.parquet}")

  /** Streaming twin of [[embeddings]] — the arrival shape of online ANN
    * query traffic ([[graft.streaming.Streams.annProbeStream]] serves it
    * against a static persisted index). Schema sniffed from the footer,
    * see [[documentsStream]].
    */
  def embeddingsStream(spark: SparkSession, sfDir: String): DataFrame =
    spark.readStream.schema(spark.read.parquet(s"$sfDir/embeddings.parquet").schema)
      .option("basePath", sfDir).parquet(s"$sfDir/{embeddings.parquet}")

  /** Documents-schema stream over an arbitrary arrival DIRECTORY (a staged
    * ingest drop, files appearing over time). `maxFilesPerTrigger = 1`
    * forces one micro-batch per file, so cross-batch state (dedup,
    * sessionization) is genuinely exercised even when all files pre-exist.
    */
  def documentsArrivalStream(spark: SparkSession, arrivalDir: String,
                             maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream.schema(documentsSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(arrivalDir)

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = load(spark, sfDir, "region")

  /** Engine-native document-store schema — the Spark mapping of the
    * reference's single table (`vectolite.py:62-68`): dense long id, UTF-8
    * text, schema-less JSON metadata kept as a string (values may mix types,
    * `vectolite.py:508,523`), float32 embedding vector with an explicit,
    * validated dimension, and a UTC creation timestamp.
    */
  val documentStoreSchema: StructType = StructType(Seq(
    StructField("id", LongType, nullable = false),
    StructField("text", StringType, nullable = false),
    StructField("metadata", StringType, nullable = true),
    StructField("embedding", ArrayType(FloatType, containsNull = false), nullable = false),
    StructField("created_at", TimestampType, nullable = false)
  ))
}

/** Typed views for the Dataset[T] API where type safety helps. */
object Schemas {
  case class Document(doc_id: Long, text: String, lang: String, source: String, n_chars: Long)
  case class EmbeddingRow(vec_id: Long, embedding: Array[Float], label: Int)
  case class StoredDoc(id: Long, text: String, metadata: String,
                       embedding: Array[Float], created_at: java.sql.Timestamp)
}
