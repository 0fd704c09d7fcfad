package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines (SURVEY §2.3 E5 +
  * the builder brief): token counting, quality scoring, language ID, and
  * document fingerprinting. All pure Column expressions built from
  * `org.apache.spark.sql.functions` — fully codegen'd, no UDFs on the hot
  * path, so they run at scan speed over 100 TB.
  *
  * Reference analogues: `full_text_length` (`/root/reference/vectolite.py:249`)
  * and the stats verb (`vectolite.py:538-555`); everything else generalizes
  * the same content model.
  */
object TextAnalysis {

  /** Whitespace tokens of trimmed text ("" → empty array, not [""]). */
  def tokens(text: Column): Column =
    filter(split(trim(text), "\\s+"), t => t =!= "")

  /** Token count — whitespace tokenization, the universal baseline. */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword count approximation: whitespace tokens plus an extra
    * unit per 4 chars of long tokens (public rule of thumb: ~4 chars per
    * subword token for English-like text).
    */
  def approxSubwordCount(text: Column): Column =
    aggregate(tokens(text), lit(0L),
      (acc, t) => acc + greatest(ceil(length(t) / 4.0).cast("long"), lit(1L)))

  private val punctPattern = "[^a-zA-Z0-9\\s]"

  /** Punctuation character ratio over total length (0 for empty text). */
  def punctRatio(text: Column): Column = {
    val len = length(text)
    when(len === 0, 0.0)
      .otherwise((len - length(regexp_replace(text, punctPattern, ""))) / len.cast("double"))
  }

  /** Mean token length (0 for empty text). */
  def avgTokenLen(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      aggregate(t, lit(0L), (acc, x) => acc + length(x)) / size(t).cast("double"))
  }

  /** Ratio of tokens found in a (lowercased) stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(lower(text))
    when(size(t) === 0, 0.0).otherwise(
      size(filter(t, x => x.isin(stopwords.map(lit(_)): _*))) / size(t).cast("double"))
  }

  /** English-ish stopwords present in typical corpora (public list subset). */
  val EnStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "for", "on", "with")

  /** Heuristic document quality score in [0,1]: rewards reasonable length,
    * moderate token size, low punctuation noise, and some stopword mass —
    * the standard cheap pre-filter shape for web-scale corpus cleaning.
    * Components are each clamped to [0,1] and averaged, so the score is
    * interpretable and monotone in each signal.
    */
  def qualityScore(text: Column): Column = {
    val lenScore = least(length(text) / 200.0, lit(1.0))
    val tokScore = least(tokenCount(text) / 40.0, lit(1.0))
    val punctScore = greatest(lit(1.0) - punctRatio(text) * 4.0, lit(0.0))
    val stopScore = least(stopwordRatio(text, EnStopwords) * 5.0, lit(1.0))
    round((lenScore + tokScore + punctScore + stopScore) / 4.0, 6)
  }

  /** Stopword-hit language ID: counts hits against per-language marker
    * lists and takes the argmax via struct-max over (hits, lang) — ties
    * therefore resolve to the LEXICOGRAPHICALLY LARGEST lang code (the
    * declared oracle encodes the same rule). Languages with zero hits
    * fall through to "und" (undetermined).
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "with", "for"),
    "de" -> Seq("der", "die", "und", "ist", "mit", "für"),
    "es" -> Seq("el", "la", "los", "es", "con", "para"),
    "fr" -> Seq("le", "la", "les", "est", "avec", "pour"))

  def langId(text: Column): Column = {
    val t = tokens(lower(text))
    val hits = LangMarkers.map { case (lang, ms) =>
      struct(size(filter(t, x => x.isin(ms.map(lit(_)): _*))).as("hits"), lit(lang).as("lang"))
    }
    val best = array_max(array(hits: _*))
    when(best.getField("hits") === 0, "und").otherwise(best.getField("lang"))
  }

  /** Word n-grams of the token stream as a Column (pure codegen: one
    * `transform` over index positions + dynamic `slice`). Fewer than `n`
    * tokens → empty array.
    */
  def wordNgrams(text: Column, n: Int): Column = {
    require(n >= 1, s"n must be >= 1, got $n")
    val t = tokens(text)
    when(size(t) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(t) - n),
        i => concat_ws(" ", slice(t, i + 1, lit(n)))))
  }

  /** Fraction of duplicate tokens within a document (0 for empty text):
    * `1 - |distinct| / |tokens|` — the cheapest of the within-document
    * repetition signals the Gopher/MassiveText quality filters use to
    * catch degenerate (looping, boilerplate, keyword-stuffed) docs that
    * CROSS-document dedup never sees.
    */
  def dupTokenFrac(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, 0.0).otherwise(
      (size(t) - size(array_distinct(t))) / size(t).cast("double"))
  }

  /** Fraction of duplicate word n-grams within a document (0 when fewer
    * than n tokens) — the n-gram generalization of [[dupTokenFrac]]:
    * repeated phrases/sentences inflate it long before token-level
    * repetition shows.
    */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val ng = wordNgrams(text, n)
    when(size(ng) === 0, 0.0).otherwise(
      (size(ng) - size(array_distinct(ng))) / size(ng).cast("double"))
  }

  /** Quality FILTER with an audit trail: instead of silently dropping
    * rows, emit the comma-joined names of every rule a document fails
    * ("" = keep). A 100 TB cleaning pass must be explainable — per-rule
    * drop rates are the first thing anyone asks of a corpus build, and
    * rerunning the pipeline to find out why a doc vanished is a
    * full-corpus scan. `concat_ws` skips the NULL (passing) branches, so
    * this stays one codegen'd projection.
    */
  def filterReasons(text: Column, minChars: Int = 50, minTokens: Int = 10,
                    maxDupTokenFrac: Double = 0.5,
                    minQuality: Double = 0.3): Column =
    concat_ws(",",
      when(length(text) < minChars, lit("too_short")),
      when(tokenCount(text) < minTokens, lit("too_few_tokens")),
      when(dupTokenFrac(text) > maxDupTokenFrac, lit("repetitive")),
      when(qualityScore(text) < minQuality, lit("low_quality")))

  /** Content fingerprint: md5 over the first `k` sorted distinct lowercase
    * tokens — a stable, order-insensitive near-identity key (the cheap
    * cousin of a rolling-hash fingerprint; md5 is used because it is
    * bit-identical across engines, making the operator oracle-checkable).
    */
  def fingerprint(text: Column, k: Int = 8): Column =
    md5(concat_ws(" ", slice(array_sort(array_distinct(tokens(lower(text)))), 1, k)))

  /** Per-group rollups over a corpus (E5): doc counts, char/token mass,
    * quality aggregates. One hash-shuffle groupBy — partial aggregation
    * makes this scan-bound at any scale.
    */
  def corpusStats(docs: DataFrame, textCol: String, groupCols: Seq[String]): DataFrame =
    docs.groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_docs"),
        sum(length(col(textCol))).as("total_chars"),
        round(avg(length(col(textCol))), 6).as("avg_chars"),
        sum(tokenCount(col(textCol))).as("total_tokens"),
        round(avg(qualityScore(col(textCol))), 6).as("avg_quality"))
}
