package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.RollingHashMin

/** Text-analysis operators for large-scale training-data pipelines, over a
  * `documents(doc_id, text, lang, source, n_chars)`-shaped table.
  *
  * Everything here is pure `Column` expressions over codegen'd built-ins
  * (split/filter/aggregate/regexp) or a native Catalyst Expression
  * ([[RollingHashMin]]) — no Scala UDFs in the hot path, so plans stay
  * inside whole-stage codegen and scale linearly with partitions.
  */
object TextOps {

  /** Whitespace token count (0 for blank). */
  def tokensWs(text: Column): Column =
    when(trim(text) === "", lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword-boundary token count: word pieces + standalone
    * punctuation, the usual pre-tokenizer regex shape. */
  def tokensBpe(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  private val enStop = Seq("the", "and", "of", "to", "a", "in", "is", "it",
    "that", "for", "was", "on", "with", "as", "be")
  private val deStop = Seq("der", "die", "das", "und", "ist", "nicht", "ein",
    "eine", "zu", "mit", "den", "von", "im", "auf", "sich")

  private def stopHits(text: Column, stops: Seq[String]): Column =
    size(filter(split(lower(text), "[^a-zäöüß]+"),
      w => w.isInCollection(stops)))

  /** Language-ID heuristic: stopword-hit ratio per language, pick argmax;
    * "und" (unknown) when no signal. Deterministic tie-break: en > de. */
  def langIdScore(text: Column): (Column, Column, Column) = {
    val n = tokensWs(text).cast("double")
    val en = stopHits(text, enStop).cast("double") / greatest(n, lit(1.0))
    val de = stopHits(text, deStop).cast("double") / greatest(n, lit(1.0))
    (en, de,
      when(en === 0 && de === 0, lit("und"))
        .when(en >= de, lit("en")).otherwise(lit("de")))
  }

  def langId(text: Column): Column = langIdScore(text)._3

  /** Quality score in [0,1]: blends length signal, alpha ratio, punctuation
    * ratio and mean word length — the standard cheap pre-filter features for
    * web-corpus curation. Deterministic, pure. */
  def qualityScore(text: Column): Column = {
    val len = length(text).cast("double")
    val alpha = length(regexp_replace(text, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(text, "[^.,;:!?]", "")).cast("double")
    val nTok = tokensWs(text).cast("double")
    val meanWord = alpha / greatest(nTok, lit(1.0))
    val lenScore = least(len / lit(500.0), lit(1.0))
    val alphaRatio = alpha / greatest(len, lit(1.0))
    val punctPenalty = least(punct * lit(10.0) / greatest(len, lit(1.0)), lit(1.0))
    val wordScore = lit(1.0) - least(abs(meanWord - lit(5.0)) / lit(5.0), lit(1.0))
    round(greatest(
      lit(0.4) * lenScore + lit(0.3) * alphaRatio +
        lit(0.2) * wordScore - lit(0.1) * punctPenalty,
      lit(0.0)), 6)
  }

  /** Deterministic 64-bit rolling-hash document fingerprint
    * (custom Catalyst expression, min Karp–Rabin over 16-byte windows). */
  def fingerprint(text: Column): Column = RollingHashMin(text, 16)

  /** documents → per-doc analysis frame. */
  def analyze(documents: DataFrame): DataFrame = {
    val t = col("text")
    documents.select(
      col("doc_id"),
      tokensWs(t).as("n_tokens_ws"),
      tokensBpe(t).as("n_tokens_bpe"),
      length(t).as("n_chars"),
      langId(t).as("lang_pred"),
      qualityScore(t).as("quality"),
      fingerprint(t).as("fingerprint"))
  }
}
