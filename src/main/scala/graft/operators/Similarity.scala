package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Validate
import graft.functions.VectorFunctions.cosine_sim

/** Similarity search operators.
  *
  * The reference's flagship operation is a brute-force exact top-k cosine
  * scan (`/root/reference/vectolite.py:118-174`): embed the query, score
  * every row, sort desc, slice k. On Spark the same semantics become
  * `withColumn(score) → orderBy(desc).limit(k)`, which Catalyst plans as
  * `TakeOrderedAndProjectExec` — per-partition top-k heaps merged on the
  * driver, so no global sort and no shuffle of the corpus. That is the plan
  * shape that survives 100 TB: each executor reduces its split to k rows.
  *
  * Ties: Python's stable sort keeps scan order for equal scores
  * (`vectolite.py:171`); distributed scan order is not stable, so we make
  * the ordering total explicitly with an id tiebreak (SURVEY O11).
  */
object Similarity {

  /** Exact brute-force top-k for one query vector (↔ O10).
    * The query vector travels as a literal in the plan — the degenerate
    * "broadcast" of a 1-row build side.
    */
  def topK(corpus: DataFrame, embCol: String, idCol: String,
           queryVec: Array[Float], k: Int): DataFrame = {
    Validate.positiveTopK(k)
    corpus
      .withColumn("score", cosine_sim(col(embCol), typedlit(queryVec.toSeq)))
      .orderBy(desc("score"), col(idCol).asc)
      .limit(k)
  }

  /** Exact batch similarity join: top-k corpus rows for EVERY query row
    * (↔ SURVEY E3, generalizing the 1-query scan).
    *
    * Plan shape: broadcast the (small) query side against the (huge) corpus
    * — a broadcast nested-loop product scored by the codegen'd cosine —
    * then per-query top-k via a rank window partitioned by query id. The
    * corpus never shuffles; only `|queries| * k` rows survive the window.
    * At 100 TB corpus scale the broadcast side must stay bounded (it is the
    * query batch, typically thousands of rows); for corpus×corpus joins use
    * the LSH path in [[graft.operators.Dedup]] instead.
    */
  def simJoinTopK(queries: DataFrame, corpus: DataFrame, k: Int,
                  qId: String = "q_id", qEmb: String = "q_emb",
                  cId: String = "c_id", cEmb: String = "c_emb"): DataFrame = {
    Validate.positiveTopK(k)
    val scored = corpus.crossJoin(broadcast(queries))
      .withColumn("score", cosine_sim(col(cEmb), col(qEmb)))
    val w = Window.partitionBy(col(qId)).orderBy(desc("score"), col(cId).asc)
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col(qId), col(cId), col("score"), col("rank"))
  }

  /** All pairs (a < b) with cosine above a threshold — the exact
    * embedding-near-duplicate primitive. Broadcast-join form; for corpora
    * too large to pair exactly, the LSH-bucketed variant in
    * [[graft.operators.AnnIndex]] bounds the candidate set first.
    */
  def nearDupPairs(emb: DataFrame, idCol: String, embCol: String,
                   threshold: Double): DataFrame = {
    val a = emb.select(col(idCol).as("a_id"), col(embCol).as("a_emb"))
    val b = emb.select(col(idCol).as("b_id"), col(embCol).as("b_emb"))
    a.join(broadcast(b), col("a_id") < col("b_id"))
      .withColumn("score", cosine_sim(col("a_emb"), col("b_emb")))
      .filter(col("score") > threshold)
      .select(col("a_id"), col("b_id"), col("score"))
  }
}
