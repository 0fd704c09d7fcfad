package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Paragraph-greedy text chunker — an exact semantic port of the reference
  * algorithm (`/root/reference/vectolite.py:369-409`):
  *
  *  - split on blank lines (`"\n\n"`), strip each paragraph, drop empties;
  *  - greedily pack paragraphs joined by `"\n\n"` while
  *    `len(current) + len(para) + 2 <= max_chars`;
  *  - on flush, seed the next chunk with the previous chunk's last
  *    `overlap` chars + `"\n\n"` + para — but only when `overlap > 0` and
  *    `len(current) > overlap`;
  *  - whitespace-only input → empty result;
  *  - a single paragraph longer than `max_chars` is never split.
  *
  * Lengths and the overlap slice are measured in Unicode CODEPOINTS
  * (`codePointCount`/`offsetByCodePoints`), matching the reference's
  * Python `len()`/slicing semantics — plain `String.length`/`substring`
  * count UTF-16 code units, which shifts the flush threshold on non-BMP
  * text (emoji) and can split a surrogate pair mid-character. DuckDB's
  * `len()`/`substr()` (the oracle) are codepoint-based too, so the two
  * sides agree beyond ASCII.
  *
  * The pure function is wrapped as a UDF returning `array<string>` and
  * exploded with `posexplode` — the Spark analogue of a generator/UDTF —
  * which gives `chunk_index` for free and keeps the 1→N expansion fully
  * distributed (vs the reference's serial per-chunk loop,
  * `vectolite.py:521-525`).
  */
object Chunker {

  def chunkText(text: String, maxChars: Int = 2000, overlap: Int = 200): Seq[String] = {
    if (text == null || text.trim.isEmpty) return Seq.empty
    val paragraphs = text.split("\n\n", -1).iterator.map(_.trim).filter(_.nonEmpty).toArray

    def cpLen(s: String): Int = s.codePointCount(0, s.length)

    val chunks = new ArrayBuffer[String]
    var current = ""
    for (para <- paragraphs) {
      val curLen = cpLen(current)
      if (current.nonEmpty && curLen + cpLen(para) + 2 > maxChars) {
        chunks += current.trim
        current =
          if (overlap > 0 && curLen > overlap)
            current.substring(current.offsetByCodePoints(current.length, -overlap)) +
              "\n\n" + para
          else para
      } else {
        current = if (current.nonEmpty) current + "\n\n" + para else para
      }
    }
    if (current.trim.nonEmpty) chunks += current.trim
    chunks.toSeq
  }

  /** Column form: `chunk(text)` → `array<string>`. The UDF object is built
    * once per query construction (not per row).
    */
  def chunkCol(text: Column, maxChars: Int = 2000, overlap: Int = 200): Column = {
    val f = udf((s: String) => chunkText(s, maxChars, overlap))
    f(text)
  }

  // Internal scratch column; prefixed so it cannot collide with any of the
  // driver fixtures and is vanishingly unlikely to collide with user data.
  private val TmpChunks = "__graft_chunks"

  /** Distributed 1→N chunk pipeline: each input row becomes one row per
    * chunk with `chunk_index` / `total_chunks` bookkeeping — the same
    * metadata the reference attaches per chunk (`vectolite.py:523`), but
    * produced in a single distributed pass instead of a driver loop.
    *
    * The source text column is KEPT (callers that want the reference's
    * replace-text-with-chunk shape can `.drop(textCol)` themselves); output
    * column names are parameters so callers with conflicting schemas can
    * rename. Rows whose text yields zero chunks (empty/whitespace) produce
    * no output rows, matching the reference's `[]`.
    */
  def explodeChunks(df: DataFrame, textCol: String,
                    maxChars: Int = 2000, overlap: Int = 200,
                    chunkCol_ : String = "chunk",
                    indexCol: String = "chunk_index",
                    totalCol: String = "total_chunks"): DataFrame = {
    require(!df.columns.contains(TmpChunks), s"input already has $TmpChunks")
    df.withColumn(TmpChunks, chunkCol(col(textCol), maxChars, overlap))
      .withColumn(totalCol, size(col(TmpChunks)))
      .select(col("*"), posexplode(col(TmpChunks)).as(Seq(indexCol, chunkCol_)))
      .drop(TmpChunks)
  }
}
