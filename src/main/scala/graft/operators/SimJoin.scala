package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

import graft.core.Validate
import graft.functions.VectorFunctions.cosine_sim

/** Batch similarity join: top-k corpus rows for EVERY query row — the
  * many-query generalization of the reference's single-query scan
  * (`/root/reference/vectolite.py:118-174`, SURVEY §2.3 E3).
  *
  * Scale story (the reason this is not a rank window): scoring is a
  * broadcast nested-loop product (small query side broadcast against the
  * huge corpus — the corpus never shuffles), and per-query top-k runs as a
  * *k-bounded typed Aggregator* under `groupByKey(qId)`. Spark plans typed
  * aggregators with partial aggregation, so each map task reduces its slice
  * of the cross product to ≤k rows per query BEFORE the shuffle — the
  * exchange moves O(|queries|·k·partitions) rows, not the raw
  * |corpus|×|queries| product a `row_number()` window would shuffle.
  */
object SimJoin {

  /** One scored candidate row. */
  case class Scored(q_id: Long, c_id: Long, score: Double)

  /** Bounded top-k accumulator: keeps at most 2k candidates between
    * compactions, ordered by (score desc, c_id asc) — the deterministic
    * tie-break of SURVEY O11.
    */
  class TopKAgg(k: Int)
      extends Aggregator[Scored, ArrayBuffer[(Long, Double)], Seq[(Long, Double)]] {

    private def compact(b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] =
      if (b.length <= k) b
      else {
        val sorted = b.sortBy { case (id, s) => (-s, id) }
        sorted.takeInPlace(k)
      }

    override def zero: ArrayBuffer[(Long, Double)] = new ArrayBuffer(k + 1)

    override def reduce(b: ArrayBuffer[(Long, Double)], row: Scored): ArrayBuffer[(Long, Double)] = {
      b += ((row.c_id, row.score))
      if (b.length >= 2 * k + 4) compact(b) else b
    }

    override def merge(a: ArrayBuffer[(Long, Double)], b: ArrayBuffer[(Long, Double)]): ArrayBuffer[(Long, Double)] =
      compact(a ++= b)

    override def finish(b: ArrayBuffer[(Long, Double)]): Seq[(Long, Double)] =
      b.sortBy { case (id, s) => (-s, id) }.take(k).toSeq

    override def bufferEncoder: Encoder[ArrayBuffer[(Long, Double)]] =
      ExpressionEncoder[ArrayBuffer[(Long, Double)]]()
    override def outputEncoder: Encoder[Seq[(Long, Double)]] =
      ExpressionEncoder[Seq[(Long, Double)]]()
  }

  /** Top-k by (score desc, c_id asc), in place. */
  private def topKOf(b: ArrayBuffer[(Long, Double)], k: Int): ArrayBuffer[(Long, Double)] =
    if (b.length <= k) b
    else { val s = b.sortBy { case (id, sc) => (-sc, id) }; s.takeInPlace(k) }

  /** Exact top-k matches for every query row. Output columns:
    * `(q_id, c_id, score, rank)` with rank 1..k by (score desc, c_id asc).
    *
    * `queries` must be the bounded side (it is broadcast); the corpus side
    * streams through scoring + partial top-k without ever shuffling in
    * full. For corpus×corpus workloads use [[Dedup]]/[[AnnIndex]] to bound
    * candidates first.
    *
    * Two-level reduction: a `mapPartitions` pass first collapses each
    * corpus partition to ≤2k candidates per query (bounded per-query
    * heaps in a hash map — memory is O(|queries|·k) per task, fine for
    * any broadcastable query side), and only that reduced stream enters
    * the typed Aggregator. Without the pre-pass, `ObjectHashAggregate`
    * silently switches to SORT-BASED aggregation once a task sees more
    * than `spark.sql.objectHashAggregate.sortBased.fallbackThreshold`
    * (default 128) distinct keys — at 500 queries that meant sorting the
    * full |corpus|×|queries| score stream per partition, measured 5×
    * slower at the 100k-vector rehearsal (186 s → 36 s). The pre-pass
    * makes the aggregator's input ≤2k rows per (query, partition), so
    * the fallback can never bite regardless of query count.
    */
  def topKPerQuery(queries: DataFrame, corpus: DataFrame, k: Int,
                   qId: String = "q_id", qEmb: String = "q_emb",
                   cId: String = "c_id", cEmb: String = "c_emb"): DataFrame = {
    Validate.positiveTopK(k)
    val spark = corpus.sparkSession
    import spark.implicits._

    val scored = corpus.crossJoin(broadcast(queries))
      .select(
        col(qId).cast("long").as("q_id"),
        col(cId).cast("long").as("c_id"),
        cosine_sim(col(cEmb), col(qEmb)).as("score"))
      .as[Scored]

    rankTopK(scored, k)
  }

  /** Per-query top-k over ANY scored candidate stream — the two-level
    * reduction shared by [[topKPerQuery]] and
    * [[AnnIndex.queryTopKBatch]]: a mapPartitions pre-pass collapses each
    * partition to ≤2k candidates per query (so the typed Aggregator's
    * sort-based fallback can never bite), then the k-bounded Aggregator
    * finishes under `groupByKey(q_id)`. The exchange moves
    * O(|queries|·k·partitions) rows regardless of candidate volume.
    * Callers must pass at most one row per (q_id, c_id) — duplicate
    * candidates would occupy two heap slots.
    */
  private[operators] def rankTopK(scored: Dataset[Scored], k: Int): DataFrame = {
    val spark = scored.sparkSession
    import spark.implicits._
    val reduced = scored.mapPartitions { it =>
      val heaps = scala.collection.mutable.HashMap.empty[Long, ArrayBuffer[(Long, Double)]]
      it.foreach { s =>
        val b = heaps.getOrElseUpdate(s.q_id, new ArrayBuffer[(Long, Double)](k + 1))
        b += ((s.c_id, s.score))
        // topKOf returns a NEW buffer (sortBy copies) — reassign, or the
        // buffer never shrinks and compaction degrades to O(n² log n).
        if (b.length >= 2 * k + 4) heaps(s.q_id) = topKOf(b, k)
      }
      heaps.iterator.flatMap { case (q, b) =>
        topKOf(b, k).iterator.map { case (c, sc) => Scored(q, c, sc) }
      }
    }

    val agg = new TopKAgg(k).toColumn.name("hits")
    reduced
      .groupByKey(_.q_id)
      .agg(agg)
      .flatMap { case (q, hits) =>
        hits.iterator.zipWithIndex.map { case ((c, s), i) => (q, c, s, (i + 1).toLong) }
      }
      .toDF("q_id", "c_id", "score", "rank")
  }
}
