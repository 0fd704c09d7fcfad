package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.core.Validate

/** BM25 keyword retrieval + reciprocal-rank fusion — the LEXICAL half of
  * hybrid search. The reference engine serves only vector similarity
  * (`/root/reference/vectolite.py:471-512`, the `query` verb); a complete
  * retrieval surface pairs it with keyword scoring over the same corpus
  * and fuses the two rankings, so both live here as first-class operators
  * (SURVEY §2.3 extension surface, same adjudication as ANN/dedup).
  *
  * Scoring is standard Okapi BM25 (Robertson et al., TREC-3):
  * `score(d,q) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b+b·|d|/avgdl))`
  * with `idf(t) = ln(1 + (N − df + 0.5)/(df + 0.5))`.
  *
  * Two serving forms, one scorer:
  *  - [[topK]] — direct scan. In-row `tf` per query term (a `filter` HOF
  *    over the token array — NO token-level explode/shuffle); the only
  *    exchange carries docs matching ≥1 term, and the final ranking is a
  *    k-bounded TakeOrderedAndProject.
  *  - [[IndexedBm25]] — a persisted INVERTED INDEX partitioned by term
  *    hash, with the same build/APPEND lifecycle as the engine's other
  *    maintained artifacts (LSH/IVF, shingle postings, count table): a
  *    probe reads only the query terms' partitions (pruned at the scan)
  *    plus a rows-of-scalars meta table — no corpus scan at query time.
  */
object Bm25 {

  val DefaultK1 = 1.2
  val DefaultB = 0.75

  /** `(doc_id, dl, term, tf)` for ONLY the query terms, computed IN ROW:
    * per term, `tf = |filter(tokens, _ == term)|` — |q| codegen passes
    * over each token array instead of a corpus-token explode. Nothing
    * leaves the row until the tf>0 postings themselves.
    */
  private def matchedPostings(docs: DataFrame, idCol: String, textCol: String,
                              terms: Seq[String]): DataFrame = {
    val perTerm = array(terms.map(t =>
      struct(lit(t).as("term"),
        size(filter(col("__t"), x => x === lit(t))).cast("long").as("tf"))): _*)
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(filter(perTerm, s => s.getField("tf") > 0)).as("p"))
      .select(col("doc_id"), col("dl"),
        col("p.term").as("term"), col("p.tf").as("tf"))
  }

  /** Score postings `(doc_id, dl, term, tf)` against 1-row `stats(n,
    * total)` and rank. `df` comes from the postings themselves (for the
    * probed terms they ARE the full posting lists, so the count is the
    * exact corpus df) and broadcasts at |q| rows; stats broadcast at one
    * row. Ranking cuts on the ROUNDED score with a doc_id tiebreak so the
    * emitted order is reproducible bit-for-bit by any engine computing
    * the same rational-plus-ln arithmetic.
    */
  private def scoreAndTopK(postings: DataFrame, stats: DataFrame, k: Int,
                           k1: Double, b: Double): DataFrame =
    Bm25Scorer.score(postings, stats, k, k1, b)

  private def checkedTerms(terms: Seq[String]): Seq[String] = {
    require(terms.nonEmpty, "bm25: query terms must be non-empty")
    require(terms.distinct == terms, s"bm25: duplicate query terms in $terms")
    terms
  }

  /** Direct-scan BM25 top-k. Corpus stats (N, Σ|d|) are an inline
    * aggregate here — the self-contained form; a deployment probing daily
    * serves them from [[IndexedBm25]]'s maintained meta instead of the
    * second scan.
    */
  def topK(docs: DataFrame, idCol: String, textCol: String,
           terms: Seq[String], k: Int,
           k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    Validate.positiveTopK(k)
    val q = checkedTerms(terms)
    val base = docs.select(col(idCol).cast("long").as("doc_id"),
      col(textCol).as("__text"))
    val stats = base
      .select(TextAnalysis.tokenCount(col("__text")).cast("long").as("__dl"))
      .agg(count(lit(1)).cast("double").as("n"),
        sum(col("__dl")).cast("double").as("total"))
    scoreAndTopK(matchedPostings(base, "doc_id", "__text", q), stats, k, k1, b)
  }

  /** BM25 of one text column against a STANDING query with FROZEN corpus
    * statistics — `(term, df)` pairs plus `(n, total)` baked in as
    * literals (collected once from [[IndexedBm25.frozenStats]] or any
    * maintained stats source). Pure `functions._` Column — fully codegen,
    * no UDF, no join, no aggregation — so it works as a STREAMING
    * projection (ingest-time routing/alerting: score each arriving
    * document against the standing profile) and costs a scan in batch.
    * The idf literals constant-fold at plan time.
    */
  def scoreColumn(text: org.apache.spark.sql.Column,
                  termStats: Seq[(String, Long)], n: Long, total: Long,
                  k1: Double = DefaultK1, b: Double = DefaultB)
      : org.apache.spark.sql.Column =
    scoreTokens(TextAnalysis.tokens(text), termStats, n, total, k1, b)

  /** [[scoreColumn]] over an ALREADY-TOKENIZED array column.
    *
    * Round-13 performance note: the first draft wrapped each term in
    * `when(tf > 0, …)`. CaseWhen BRANCHES are excluded from codegen
    * subexpression elimination (their evaluation must stay conditional),
    * so every one of the 3 references to each term's tf filter re-ran the
    * HOF — measured 2.6× the whole-pass cost at 2.5M docs. The guard is
    * algebraically redundant (tf=0 ⇒ the term is exactly 0.0), and with
    * it gone CSE collapses the duplicated filters: this form now measures
    * scan-speed, within noise of the explicitly-staged [[withScore]]
    * (94.1 vs 95.2 s at 2.5M docs, SCALE.md). Keep guards out of hot
    * expression trees.
    */
  def scoreTokens(toks: org.apache.spark.sql.Column,
                  termStats: Seq[(String, Long)], n: Long, total: Long,
                  k1: Double = DefaultK1, b: Double = DefaultB)
      : org.apache.spark.sql.Column = {
    require(termStats.nonEmpty, "bm25: standing query terms must be non-empty")
    val dlNorm = size(toks).cast("double") * lit(n.toDouble) / lit(total.toDouble)
    termStats.map { case (term, df) =>
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - lit(df.toDouble) + lit(0.5)) / (lit(df.toDouble) + lit(0.5)))
      val tf = size(filter(toks, x => x === lit(term))).cast("double")
      // no tf>0 guard needed: tf=0 makes the term exactly 0.0 (0/(0+C))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
    }.reduce(_ + _)
  }

  /** Standing-query scoring of a whole FRAME: three chained projections
    * materialize the token array once, then the per-term tf vector once,
    * then combine them in closed form (every tf an O(1) `element_at`,
    * every further token reference an O(1) `size`). Semantically equal to
    * `withColumn(score, scoreColumn(...))` and currently equal in speed
    * too (95.2 vs 94.1 s at 2.5M docs — codegen CSE already collapses the
    * guard-free single Column); this form makes the one-evaluation-per-
    * row property STRUCTURAL instead of CSE-dependent, so it can't regress
    * if a future caller re-introduces a conditional around a term (the
    * round-13 2.6× trap — see [[scoreTokens]]). CollapseProject keeps the
    * stages separate because the duplicated expressions are non-cheap.
    */
  def withScore(df: DataFrame, textCol: String,
                termStats: Seq[(String, Long)], n: Long, total: Long,
                scoreName: String = "score",
                k1: Double = DefaultK1, b: Double = DefaultB): DataFrame = {
    require(termStats.nonEmpty, "bm25: standing query terms must be non-empty")
    val tfArr = array(termStats.map { case (term, _) =>
      size(filter(col("__toks"), x => x === lit(term))).cast("double") }: _*)
    val dlNorm = size(col("__toks")).cast("double") *
      lit(n.toDouble) / lit(total.toDouble)
    val score = termStats.zipWithIndex.map { case ((_, dfT), i) =>
      val idf = log(lit(1.0) +
        (lit(n.toDouble) - lit(dfT.toDouble) + lit(0.5)) / (lit(dfT.toDouble) + lit(0.5)))
      val tf = element_at(col("__tf"), i + 1)
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * dlNorm))
    }.reduce(_ + _)
    df.withColumn("__toks", TextAnalysis.tokens(col(textCol)))
      .withColumn("__tf", tfArr)
      .withColumn(scoreName, score)
      .drop("__toks", "__tf")
  }

  /** Reciprocal-rank fusion (Cormack et al., SIGIR'09) of two ranked
    * lists `(doc_id, rank)` — lexical and semantic top-m: `rrf(d) =
    * Σ_lists 1/(kRrf + rank_d)`, absent list contributes 0. Pure rational
    * arithmetic over integer ranks — deterministic to the last bit, so
    * the fused ranking is oracle-exact with no float caveats. Both inputs
    * are k-bounded (top-m) frames: the join is trivially broadcast and
    * the fusion costs nothing at any corpus size.
    */
  def rrfFuse(lexical: DataFrame, semantic: DataFrame, k: Int,
              kRrf: Int = 60): DataFrame = {
    Validate.positiveTopK(k)
    require(kRrf >= 1, s"rrf constant must be >= 1, got $kRrf")
    lexical.select(col("doc_id"), col("rank").cast("double").as("__rl"))
      .join(semantic.select(col("doc_id"), col("rank").cast("double").as("__rs")),
        Seq("doc_id"), "full_outer")
      .select(col("doc_id"),
        (coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rl")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(kRrf.toDouble) + col("__rs")), lit(0.0)))
          .as("rrf"))
      .orderBy(round(col("rrf"), 9).desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("rrf"), 9).as("rrf"))
  }
}

/** Persisted inverted index for [[Bm25]] — build / APPEND / probe with the
  * engine's standard maintained-artifact lifecycle.
  *
  * Layout under `path`:
  *  - `postings/` — `(doc_id, dl, tf)` partitioned by `pt =
  *    pmod(xxhash64(term), Partitions)` then carrying `term` as a data
  *    column: a probe's terms resolve to partition-dir literals, so the
  *    scan reads only the touched partitions (the AnnIndex bucket-pruning
  *    pattern applied to a keyword index).
  *  - `meta/` — delta rows of `(n, total)` partial doc/token counts,
  *    summed on read (the CountTable merge-on-read discipline): append
  *    writes only the batch's own 1-row delta, deletes a negative one —
  *    state is never rewritten outside [[compact]].
  *  - `doclens/` — `(doc_id, dl)` sidecar, so [[delete]] can price a
  *    deletion without touching the corpus or the postings.
  *  - `tombstones/` — deleted ids; probes anti-join them (merge-on-read),
  *    [[compact]] folds them into a physical rewrite under the atomic
  *    swap.
  *
  * APPEND is linear in the batch: new postings land as new files in the
  * partitions their terms hash to (old files untouched), and `df`/stats
  * stay exact because a document arrives in exactly one batch — probing
  * an appended index is value-identical to probing a from-scratch rebuild
  * over old ∪ new, the parity the `bm25_index_topk` oracle row pins.
  * DELETE is tombstone-cheap and probe-exact: df comes from surviving
  * posting rows, (n, total) from the negative meta delta — probing after
  * delete (or after delete+compact) is value-identical to probing a
  * rebuild over the surviving docs, the `bm25_delete_parity` oracle row.
  */
object IndexedBm25 {

  val Partitions = 64

  private def postingsDir(path: String) = s"$path/postings"
  private def metaDir(path: String) = s"$path/meta"

  /** Full postings of a frame: one token-level aggregation — the honest
    * one-time cost of building an inverted index (the probe side never
    * pays it again).
    */
  private def postingsOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
        TextAnalysis.tokens(col(textCol)).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("dl"),
        explode(col("__t")).as("term"))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .withColumn("pt", pmod(xxhash64(col("term")), lit(Partitions.toLong)))

  private def statsOf(docs: DataFrame, textCol: String): DataFrame =
    docs.select(TextAnalysis.tokenCount(col(textCol)).cast("long").as("__dl"))
      .agg(count(lit(1)).cast("long").as("n"), sum(col("__dl")).as("total"))

  private def doclensDir(path: String) = s"$path/doclens"
  private def tombstonesDir(path: String) = s"$path/tombstones"

  private def doclensOf(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      TextAnalysis.tokenCount(col(textCol)).cast("long").as("dl"))

  private def hasTombstones(spark: SparkSession, path: String): Boolean = {
    val p = new org.apache.hadoop.fs.Path(tombstonesDir(path))
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  /** Merge-on-read view of deletions: anti-join a frame against the
    * tombstone set (broadcast — bounded by deletions since the last
    * [[compact]]). No tombstone dir → the frame passes through untouched.
    */
  private def applyTombstones(spark: SparkSession, path: String,
                              frame: DataFrame): DataFrame =
    if (!hasTombstones(spark, path)) frame
    else frame.join(
      broadcast(spark.read.parquet(tombstonesDir(path)).select(col("doc_id"))),
      Seq("doc_id"), "left_anti")

  /** Query-term postings: partition-pruned scan (`pt IN (...)` over dir
    * literals, computed by the same `xxhash64` the writer used, via a
    * one-row-per-term local frame), then the tombstone anti-join ABOVE
    * the pruned scan. df computed downstream from these rows is therefore
    * automatically delete-aware.
    */
  private def prunedPostings(spark: SparkSession, path: String,
                             terms: Seq[String]): DataFrame = {
    import spark.implicits._
    val pts = terms.toDF("term")
      .select(pmod(xxhash64(col("term")), lit(Partitions.toLong)))
      .as[Long].collect().distinct.toSeq
    applyTombstones(spark, path,
      spark.read.parquet(postingsDir(path))
        .filter(col("pt").isin(pts: _*) && col("term").isin(terms: _*))
        .select(col("doc_id"), col("dl"), col("term"), col("tf")))
  }

  /** Merged `(n, total)` as doubles: the meta deltas sum — build row +
    * per-append rows + NEGATIVE per-delete rows.
    */
  private def mergedStats(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(metaDir(path))
      .agg(sum(col("n")).cast("double").as("n"),
        sum(col("total")).cast("double").as("total"))

  def build(docs: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    postingsOf(docs, idCol, textCol)
      .repartition(col("pt"))
      .write.mode("overwrite").partitionBy("pt").parquet(postingsDir(path))
    statsOf(docs, textCol).write.mode("overwrite").parquet(metaDir(path))
    doclensOf(docs, idCol, textCol)
      .write.mode("overwrite").parquet(doclensDir(path))
  }

  /** APPEND a batch: new postings files into the term-hash partitions +
    * one new meta delta row + the batch's doclen rows. Linear in the
    * batch; prior files untouched.
    */
  def append(batch: DataFrame, idCol: String, textCol: String, path: String): Unit = {
    postingsOf(batch, idCol, textCol)
      .repartition(col("pt"))
      .write.mode("append").partitionBy("pt").parquet(postingsDir(path))
    statsOf(batch, textCol).write.mode("append").parquet(metaDir(path))
    doclensOf(batch, idCol, textCol)
      .write.mode("append").parquet(doclensDir(path))
  }

  /** DELETE documents from the index WITHOUT touching postings files —
    * the O4 verb honored by the maintained artifact: the ids land in a
    * tombstone sidecar (probes anti-join it, merge-on-read) and the meta
    * gets one NEGATIVE delta row (−n, −Σdl for the ids that exist, read
    * from the doclens sidecar — never from the corpus). df needs no
    * bookkeeping at all: probes compute it from the surviving posting
    * rows. Cost: one doclens filter + two tiny writes, independent of
    * index size. [[compact]] later folds tombstones into a physical
    * rewrite. Ids deleted twice are counted once (already-tombstoned ids
    * are excluded from the new delta); unknown ids are literal no-ops
    * (never written to the tombstone set). Caveat: a tombstone
    * suppresses its id's rows regardless of when they were appended —
    * re-appending a DELETED id before [[compact]] clears the tombstones
    * silently filters the new rows. Ids must not be reused within a
    * compact cycle (the store's monotone id assignment never reuses
    * them).
    */
  def delete(spark: SparkSession, path: String, ids: Seq[Long]): Unit = {
    require(ids.nonEmpty, "bm25 delete: empty id list")
    import spark.implicits._
    // only ids the index actually holds are tombstoned (collect bounded
    // by |ids|) — so "unknown ids are no-ops" holds literally, and a
    // later append REUSING a never-ingested id is not silently filtered
    val matched = applyTombstones(spark, path,
        spark.read.parquet(doclensDir(path)))
      .filter(col("doc_id").isin(ids: _*))
      .select(col("doc_id"), col("dl"))
      .collect()
    if (matched.nonEmpty) {
      Seq((-matched.length.toLong, -matched.map(_.getLong(1)).sum))
        .toDF("n", "total")
        .write.mode("append").parquet(metaDir(path))
      matched.map(_.getLong(0)).toSeq.toDF("doc_id")
        .write.mode("append").parquet(tombstonesDir(path))
    }
  }

  /** COMPACT: physically drop tombstoned docs from postings and doclens,
    * collapse the meta deltas to one row, clear the tombstones — all
    * under the store's single-writer atomic swap. Content afterwards ==
    * a from-scratch [[build]] over the surviving documents (the
    * `bm25_delete_parity` oracle row pins probe-equality).
    */
  def compact(spark: SparkSession, path: String): Unit =
    graft.store.DocStore.swapDirContents(spark, path) { tmp =>
      applyTombstones(spark, path, spark.read.parquet(postingsDir(path)))
        .repartition(col("pt"))
        .write.partitionBy("pt").parquet(postingsDir(tmp))
      mergedStats(spark, path)
        .select(col("n").cast("long").as("n"),
          col("total").cast("long").as("total"))
        .write.parquet(metaDir(tmp))
      applyTombstones(spark, path, spark.read.parquet(doclensDir(path)))
        .write.parquet(doclensDir(tmp))
    }

  /** Probe the persisted index: reads ONLY the query terms' hash
    * partitions plus the scalar meta deltas (both delete-aware — see
    * [[prunedPostings]]/[[mergedStats]]). No corpus scan; same scorer as
    * the direct form, so results match it exactly.
    */
  def topK(spark: SparkSession, path: String, terms: Seq[String], k: Int,
           k1: Double = Bm25.DefaultK1, b: Double = Bm25.DefaultB): DataFrame = {
    Validate.positiveTopK(k)
    require(terms.nonEmpty, "bm25: query terms must be non-empty")
    // private access via the companion: same scorer as the direct scan
    Bm25Scorer.score(prunedPostings(spark, path, terms.distinct),
      mergedStats(spark, path), k, k1, b)
  }

  /** BATCH probe at query volume — the keyword twin of the ANN indexes'
    * `queryTopKBatch`: many keyword queries `(q_id, terms)` served from
    * the persisted index in ONE plan. The workload's distinct terms are
    * collected once (driver-side, bounded by the query vocabulary — the
    * same touched-set discipline as the ANN batch probes) and pushed as
    * partition + term filters; the query table broadcasts onto the pruned
    * postings; per-(query, doc) scores aggregate postings-bounded rows;
    * ranking is a PARTITIONED window (parallel across queries, row_number
    * ≤ k — never an unpartitioned sort).
    */
  def topKBatch(spark: SparkSession, path: String, queries: DataFrame,
                k: Int, k1: Double = Bm25.DefaultK1,
                b: Double = Bm25.DefaultB): DataFrame = {
    Validate.positiveTopK(k)
    import spark.implicits._
    // in-row distinct: a duplicated term inside one query's array would
    // otherwise join its postings twice and double-count the contribution
    val qt = queries.select(col("q_id").cast("long").as("q_id"),
      explode(array_distinct(col("terms"))).as("term"))
    val terms = qt.select(col("term")).distinct().as[String].collect().toSeq
    require(terms.nonEmpty, "bm25: batch query terms must be non-empty")
    val postings = prunedPostings(spark, path, terms)
    val df = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val stats = mergedStats(spark, path)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("q_id"))
      .orderBy(round(col("score"), 6).desc, col("doc_id"))
    postings
      .join(broadcast(qt), Seq("term"))
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", Bm25Scorer.contrib(k1, b))
      .groupBy(col("q_id"), col("doc_id")).agg(sum(col("__contrib")).as("score"))
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("doc_id"),
        round(col("score"), 6).as("score"), col("rank"))
  }

  /** FROZEN statistics for a standing query, read from the maintained
    * index: per-term df (a count over the terms' pruned partitions) and
    * the meta (n, total). Driver-side scalars — |terms|+2 numbers — for
    * [[Bm25.scoreColumn]]'s literal-folded streaming scorer.
    */
  def frozenStats(spark: SparkSession, path: String, termsRaw: Seq[String])
      : (Seq[(String, Long)], Long, Long) = {
    require(termsRaw.nonEmpty, "bm25: standing query terms must be non-empty")
    val terms = termsRaw.distinct // a dup would be scored twice downstream
    import spark.implicits._
    val dfMap = prunedPostings(spark, path, terms)
      .groupBy(col("term")).agg(count(lit(1)).as("df"))
      .as[(String, Long)].collect().toMap
    val meta = mergedStats(spark, path)
      .select(col("n").cast("long"), col("total").cast("long")).head
    (terms.map(t => t -> dfMap.getOrElse(t, 0L)), meta.getLong(0), meta.getLong(1))
  }
}

/** Internal seam so [[IndexedBm25]] shares [[Bm25]]'s private scorer. */
private[operators] object Bm25Scorer {

  /** The per-posting BM25 contribution over columns `tf, df, dl, n,
    * total` — ONE definition of the arithmetic (and its evaluation
    * order: `((idf·tf)·(k1+1))/denom`, `dl·n/total` length norm) shared
    * by every serving form, so the oracle twins replay a single shape.
    */
  def contrib(k1: Double, b: Double): org.apache.spark.sql.Column =
    log(lit(1.0) + (col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5))) *
      col("tf").cast("double") * lit(k1 + 1.0) /
      (col("tf").cast("double") +
        lit(k1) * (lit(1.0 - b) +
          lit(b) * col("dl").cast("double") * col("n") / col("total")))

  def score(postings: DataFrame, stats: DataFrame, k: Int,
            k1: Double, b: Double): DataFrame = {
    val df = postings.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    postings
      .join(broadcast(df), Seq("term"))
      .crossJoin(broadcast(stats))
      .withColumn("__contrib", contrib(k1, b))
      .groupBy(col("doc_id")).agg(sum(col("__contrib")).as("score"))
      .orderBy(round(col("score"), 6).desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), round(col("score"), 6).as("score"))
  }
}
