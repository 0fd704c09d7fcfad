package graft.operators

import org.apache.spark.sql.{DataFrame, Encoder}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Frequency sketches for corpus monitoring at 100 TB — the approximate
  * face of [[CountTable]]: where the count table maintains EXACT
  * per-term state (vocabulary-sized — the right artifact when you serve
  * lookups from it), a heavy-hitters sketch answers "what dominates this
  * corpus/batch/stream" with O(k) state per partition and a
  * partial-aggregation-friendly merge, so the exchange carries k
  * counters per task instead of a vocabulary.
  *
  * Algorithm: Misra–Gries (Misra & Gries 1982, "Finding repeated
  * elements"; merge rule from Agarwal et al. 2013, "Mergeable summaries").
  * The sketch keeps at most `k` counters. Guarantees, for a stream of N
  * items:
  *  - every item with true frequency > N/(k+1) IS in the sketch
  *    (no false negatives above the threshold);
  *  - each reported estimate satisfies `f − N/(k+1) <= est <= f`
  *    (underestimates only, error bounded by N/(k+1)).
  * Both survive arbitrary merge trees, so the bound holds under Spark's
  * partial → final aggregation regardless of partitioning — the property
  * the declared invariant row checks mechanically against exact counts.
  */
object Sketches {

  /** Misra–Gries state: at most `k` counters, as an immutable map at the
    * API seam (callers hold summaries, not buffers).
    */
  type MG = Map[String, Long]

  /** One Misra–Gries update. Classic rule: increment a present counter;
    * insert while there is room; otherwise decrement ALL counters (the
    * "pairing" step — one occurrence of each tracked item and the new
    * item annihilate), dropping zeros.
    */
  private[graft] def mgUpdate(m: MG, x: String, k: Int): MG =
    m.get(x) match {
      case Some(c) => m.updated(x, c + 1)
      case None if m.size < k => m.updated(x, 1L)
      case None =>
        m.flatMap { case (t, c) =>
          if (c - 1 <= 0L) None else Some(t -> (c - 1)) }
    }

  /** Mergeable-summaries combine: sum counters pointwise, then if more
    * than `k` survive, subtract the (k+1)-th largest value from every
    * counter and drop non-positives — the multi-decrement generalization
    * of the pairing step, preserving both MG guarantees.
    */
  private[graft] def mgMerge(a: MG, b: MG, k: Int): MG = {
    val s = b.foldLeft(a) { case (acc, (t, c)) =>
      acc.updated(t, acc.getOrElse(t, 0L) + c) }
    if (s.size <= k) s
    else {
      val cut = s.values.toArray.sorted(Ordering[Long].reverse).apply(k)
      s.flatMap { case (t, c) =>
        if (c - cut <= 0L) None else Some(t -> (c - cut)) }
    }
  }

  /** In-place MG update on the aggregation buffer — the hot path: one
    * hash lookup per stream item, O(k) only on the (rare once saturated)
    * pairing step. Semantics identical to [[mgUpdate]]; the spec pins
    * the two against each other on adversarial streams.
    */
  private[graft] def mgUpdateInPlace(m: scala.collection.mutable.HashMap[String, Long],
                                     x: String, k: Int): Unit =
    m.get(x) match {
      case Some(c) => m.update(x, c + 1)
      case None if m.size < k => m.update(x, 1L)
      case None =>
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        m.mapValuesInPlace { (_, c) => c - 1 }
        m.foreach { case (t, c) => if (c <= 0L) dead += t }
        dead.foreach(m.remove)
    }

  /** Typed Aggregator over a string column: `k`-counter Misra–Gries,
    * planned by Spark with partial aggregation (each task reduces its
    * slice to ≤k counters BEFORE the exchange — the [[SimJoin.TopKAgg]]
    * discipline applied to frequency counting). The buffer is a MUTABLE
    * hash map under a Kryo encoder: within a task Spark feeds `reduce`
    * the same buffer object, so the per-token cost is one in-place hash
    * update — an immutable-map buffer would allocate a persistent-map
    * node per token, which at 10⁸ tokens per task is the whole runtime.
    * Serialization (Kryo) happens only at the partial→final exchange,
    * carrying ≤k counters. Output: surviving `(term, estimate)` pairs
    * sorted by (estimate desc, term asc).
    */
  class HeavyHittersAgg(k: Int)
      extends Aggregator[String, scala.collection.mutable.HashMap[String, Long],
                         Seq[(String, Long)]] {
    require(k >= 1, s"sketch capacity must be >= 1, got $k")
    override def zero: scala.collection.mutable.HashMap[String, Long] =
      scala.collection.mutable.HashMap.empty
    override def reduce(m: scala.collection.mutable.HashMap[String, Long],
                        x: String): scala.collection.mutable.HashMap[String, Long] = {
      mgUpdateInPlace(m, x, k); m
    }
    override def merge(a: scala.collection.mutable.HashMap[String, Long],
                       b: scala.collection.mutable.HashMap[String, Long])
        : scala.collection.mutable.HashMap[String, Long] = {
      val merged = mgMerge(a.toMap, b.toMap, k)
      val out = scala.collection.mutable.HashMap.empty[String, Long]
      merged.foreach { case (t, c) => out.update(t, c) }
      out
    }
    override def finish(m: scala.collection.mutable.HashMap[String, Long])
        : Seq[(String, Long)] =
      m.toSeq.sortBy { case (t, c) => (-c, t) }
    override def bufferEncoder: Encoder[scala.collection.mutable.HashMap[String, Long]] =
      org.apache.spark.sql.Encoders.kryo[scala.collection.mutable.HashMap[String, Long]]
    override def outputEncoder: Encoder[Seq[(String, Long)]] =
      ExpressionEncoder[Seq[(String, Long)]]()
  }

  /** Heavy-hitter TOKENS of a text column: one distributed MG pass over
    * the exploded token stream. Returns `(term, est)` rows (≤ k), sorted
    * by (est desc, term asc). The exact twin is
    * `CountTable.counts(...)` — vocabulary-sized state; this is the
    * bounded-state form for monitoring and triage.
    */
  def heavyHitterTokens(df: DataFrame, textCol: String, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    // Scan-parallelism floor (r21, guide §2.5 "input skew — one huge
    // unsplittable file"): the tokenize+sketch pass is charged to the
    // SCAN's tasks, and a single-row-group parquet (the fixture shape;
    // any small-file corpus) yields one task no matter how many cores
    // the session has — the whole pass runs serial. A round-robin
    // repartition of the raw text rows (bytes-cheap next to the
    // tokenize) restores parallelism; no-op whenever the scan already
    // meets the session's parallelism (any real corpus) or the frame is
    // streaming. The MG invariants hold under ANY split/merge order, so
    // the declared invariant rows are partition-count-independent.
    val src = {
      val base = df.select(col(textCol).as("__hh_text"))
      val target = spark.sparkContext.defaultParallelism
      if (base.isStreaming || base.rdd.getNumPartitions >= target) base
      else base.repartition(target)
    }
    val toks = src.select(explode(TextAnalysis.tokens(col("__hh_text"))).as("t"))
      .as[String]
    val agg = new HeavyHittersAgg(k).toColumn.name("hh")
    toks.groupByKey(_ => 0) // one logical group; partial agg still runs per task
      .agg(agg)
      .flatMap(_._2)
      .toDF("term", "est")
      .orderBy(desc("est"), col("term"))
  }

  /** The MG error bound `N/(k+1)` for a given stream length. */
  def mgErrorBound(n: Long, k: Int): Double = n.toDouble / (k + 1)
}
