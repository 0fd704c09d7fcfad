package graft.operators

import scala.util.hashing.MurmurHash3

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.VectorFunctions.cosine_sim

/** Deduplication family for large text corpora (SURVEY §2.3 E4 + the
  * training-data-pipeline brief): exact (content hash), token/shingle
  * Jaccard via an inverted index, SimHash banding, and guarded
  * embedding-cosine pairs. MinHash-LSH lives in [[MinHashDedup]] (MLlib).
  *
  * The reference has no dedup; these generalize its content model
  * (`/root/reference/vectolite.py:62-68`) to the 100 TB pipeline case.
  * Every operator here is groupBy/join-shaped — no driver materialization,
  * no unbounded cross products.
  */
object Dedup {

  // ------------------------------------------------------------ exact dedup
  /** Exact-duplicate groups by content hash: one row per distinct text that
    * occurs more than once, with the surviving (minimum) id — a single
    * hash-shuffle groupBy, the canonical 100 TB exact-dedup shape.
    */
  def exactDupGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(count(lit(1)).as("n_dups"), min(col(idCol)).as("keep_id"))
      .filter(col("n_dups") > 1)

  /** Exact dedup: keep the min-id row per distinct text. `min_by` keeps the
    * whole surviving row through one aggregation — no self-join, no window.
    */
  def dedupExact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cols = df.columns
    df.groupBy(sha2(col(textCol), 256).as("text_sha"))
      .agg(min_by(struct(cols.map(col): _*), col(idCol)).as("row"))
      .select(cols.map(c => col(s"row.$c")): _*)
  }

  // ------------------------------------------- n-gram Jaccard (inverted idx)
  /** Word n-gram shingle set (distinct) of a text column. n=1 → token set. */
  def shingles(text: Column, n: Int): Column = {
    val toks = split(trim(text), "\\s+")
    val sh =
      if (n <= 1) toks
      else transform(
        sequence(lit(1), greatest(size(toks) - (n - 1), lit(0))),
        i => concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*))
    array_distinct(sh)
  }

  /** All pairs (a_id < b_id) with shingle-set Jaccard ≥ `threshold`,
    * computed with an inverted index instead of a cross join: explode
    * shingles → self-join on shingle → count common shingles per pair →
    * `jaccard = common / (|A| + |B| - common)`. Only pairs sharing ≥1
    * shingle are ever formed, so the shuffle is bounded by the posting
    * lists, not |df|². (Hot shingles can skew; at real scale drop top-df
    * shingles first — see `maxDocFreq`.)
    */
  def jaccardPairs(df: DataFrame, idCol: String, textCol: String, n: Int,
                   threshold: Double, maxDocFreq: Long = Long.MaxValue): DataFrame = {
    val sets = df.select(col(idCol).cast("long").as("id"),
                         shingles(col(textCol), n).as("sh"))
      .withColumn("set_size", size(col("sh")))
    val posting = sets
      .select(col("id"), col("set_size"), explode(col("sh")).as("shingle"))
    val filtered =
      if (maxDocFreq == Long.MaxValue) posting
      else {
        val hot = posting.groupBy("shingle").count().filter(col("count") > maxDocFreq)
        posting.join(broadcast(hot.select("shingle")), Seq("shingle"), "left_anti")
      }
    val a = filtered.select(col("shingle"), col("id").as("a_id"), col("set_size").as("a_size"))
    val b = filtered.select(col("shingle"), col("id").as("b_id"), col("set_size").as("b_size"))
    a.join(b, Seq("shingle"))
      .filter(col("a_id") < col("b_id"))
      .groupBy("a_id", "b_id", "a_size", "b_size")
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard",
        col("common") / (col("a_size") + col("b_size") - col("common")))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
  }

  // ------------------------------------------------------------------ simhash
  /** 64-bit SimHash of a token stream: per-token 64-bit hash (two seeded
    * murmur32 halves), signed bit-count accumulation, sign → bit.
    */
  def simhash64(text: String, seed: Int = 42): Long = {
    if (text == null) return 0L
    val counts = new Array[Int](64)
    val it = text.toLowerCase.split("\\s+").iterator.filter(_.nonEmpty)
    while (it.hasNext) {
      val t = it.next()
      val h = (MurmurHash3.stringHash(t, seed).toLong << 32) |
        (MurmurHash3.stringHash(t, seed + 7) & 0xffffffffL)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
    }
    var sig = 0L
    var b = 0
    while (b < 64) { if (counts(b) > 0) sig |= (1L << b); b += 1 }
    sig
  }

  private val simhashUdf = udf((s: String) => simhash64(s))

  /** Near-dup pairs by SimHash banding: 4 bands of 16 bits; by pigeonhole,
    * any pair within Hamming distance ≤ 3 shares at least one full band, so
    * the band self-join generates a complete candidate set for `maxHamming
    * ≤ 3` (larger radii require more bands). Candidates are then verified
    * with an exact popcount — no cross join anywhere.
    */
  def simhashPairs(df: DataFrame, idCol: String, textCol: String,
                   maxHamming: Int = 3): DataFrame = {
    val sigs = df.select(col(idCol).cast("long").as("id"),
                         simhashUdf(col(textCol)).as("sig"))
    val banded = sigs.select(
      col("id"), col("sig"),
      explode(array((0 until 4).map { b =>
        struct(lit(b).as("band"), (shiftright(col("sig"), b * 16) bitwiseAND lit(0xffffL)).as("key"))
      }: _*)).as("bk"))
      .select(col("id"), col("sig"), col("bk.band"), col("bk.key"))
    val a = banded.select(col("band"), col("key"), col("id").as("a_id"), col("sig").as("a_sig"))
    val b = banded.select(col("band"), col("key"), col("id").as("b_id"), col("sig").as("b_sig"))
    a.join(b, Seq("band", "key"))
      .filter(col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("a_sig") bitwiseXOR col("b_sig")).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  // ----------------------------------------- embedding-cosine (guarded exact)
  /** All pairs (a < b) with cosine above a threshold — exact O(n²) form,
    * guarded: refuses to run beyond `maxRows` rows so the quadratic path
    * can never be launched on a table that should use [[AnnIndex]]/LSH
    * bucketing instead.
    */
  def nearDupPairsExact(emb: DataFrame, idCol: String, embCol: String,
                        threshold: Double, maxRows: Long = 100000): DataFrame = {
    val n = emb.count()
    require(n <= maxRows,
      s"nearDupPairsExact: $n rows exceeds maxRows=$maxRows — use the LSH-bucketed path (AnnIndex) for large tables")
    val a = emb.select(col(idCol).as("a_id"), col(embCol).as("a_emb"))
    val b = emb.select(col(idCol).as("b_id"), col(embCol).as("b_emb"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("score", cosine_sim(col("a_emb"), col("b_emb")))
      .filter(col("score") > threshold)
      .select(col("a_id"), col("b_id"), col("score"))
  }
}
