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

  /** Overlapping token-window chunks: doc → one row per chunk of
    * `chunkSize` tokens advancing by `chunkSize - overlap` (the
    * context-window preparation step every LM training pipeline runs
    * before packing). Returns (passthrough cols, chunk_id, chunk_tokens
    * array); the final chunk may be shorter. Pure column program —
    * tokenize once, `sequence` + `explode` + `slice` — narrow end to
    * end, no shuffle, no UDF. Empty docs produce no chunks. */
  def chunkify(docs: org.apache.spark.sql.DataFrame, textCol: String,
               chunkSize: Int, overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkSize,
      s"chunkify needs 0 <= overlap < chunkSize, got $overlap/$chunkSize")
    val step = chunkSize - overlap
    docs
      .withColumn("__toks", tokensCol(col(textCol)))
      .filter(size(col("__toks")) > 0)
      // last chunk index: the largest i with i*step + overlap < ntok, so
      // every chunk contributes ≥1 new token (a naive ceil(ntok/step)
      // emits a trailing runt fully contained in its predecessor). For
      // docs longer than `overlap` every chunk therefore holds > overlap
      // tokens; a doc at or under `overlap` tokens yields its single
      // full chunk
      .withColumn("chunk_id",
        explode(sequence(lit(0),
          greatest(lit(0),
            floor((size(col("__toks")) - overlap - 1).cast("double") / step)
              .cast("int")))))
      .withColumn("chunk_tokens",
        slice(col("__toks"), col("chunk_id") * step + 1, lit(chunkSize)))
      .drop("__toks")
  }

  /** Positional postings (id, pos, term), pos 1-based: the relation an
    * inverted index materializes, and the input to [[phraseSearch]].
    * Pure column program: the token array becomes an attribute in its
    * own projection so canon runs once per document, then one Generate
    * (posexplode) — narrow, no shuffle; writing this relation out
    * partitioned/sorted by term IS the index build. */
  def positionalPostings(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("id"), tokensCol(col(textCol)).as("__t"))
      .select(col("id"), posexplode(col("__t")))
      .select(col("id"), (col("pos") + 1).cast("long").as("pos"), col("col").as("term"))

  /** Exact phrase occurrences over positional postings: filter the
    * postings to each phrase term (a selective predicate the scan
    * absorbs — with term-partitioned postings it prunes to one
    * partition per term), then chain position-adjacency EQUALITY joins
    * anchored on the first term: term i must sit at anchor pos + i.
    * Catalyst extracts (id, pos + i) as join keys, so every step is a
    * hash join on (id, pos) — never a broadcast-nested-loop, and the
    * intermediate cardinality only ever shrinks. Returns one row per
    * occurrence (id, pos of the anchor term). */
  def phraseSearch(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phraseSearch needs a non-empty phrase")
    val anchor = postings.filter(col("term") === phrase.head).select("id", "pos")
    phrase.zipWithIndex.drop(1).foldLeft(anchor) { case (acc, (term, i)) =>
      val p = postings.filter(col("term") === term)
        .select(col("id").as(s"__id$i"), col("pos").as(s"__pos$i"))
      acc.join(p, col("id") === col(s"__id$i") &&
          col(s"__pos$i") === col("pos") + i)
        .drop(s"__id$i", s"__pos$i")
    }
  }

  /** A subword proxy: count of alnum runs via regex split. Kept for
    * continuity (ta_token_count pins it), but the REAL budget counter
    * is [[graft.functions.bpeCount]] / [[graft.core.Bpe]] — a
    * deterministic BPE over the committed merges fixture; this proxy
    * counts words, which under-counts exactly the rare multi-piece
    * words a token budget overruns on. */
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
    * ID; [[langMarkers]] is the word half): high-frequency character
    * trigrams of each language, as published in classic n-gram
    * language-ID work (Cavnar–Trenkle-style profiles over common
    * corpora such as the UDHR translations). ASCII-only so the counts
    * are identical before/after canon. A production deployment trains
    * longer profiles the same way; the operator shape is unchanged. */
  val langTrigramProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "ing", "and", "ion", "ent"),
    "de" -> Seq("sch", "ein", "ich", "der", "und"),
    "es" -> Seq("que", "ado", "ent", "los", "est"),
    "fr" -> Seq("les", "ent", "que", "ion", "eur"),
    "it" -> Seq("che", "ent", "del", "lla", "zio"))

  /** Per-language char-trigram occurrence scores. */
  def trigramScores(text: Column): Seq[(String, Column)] =
    langTrigramProfiles.map { case (lang, tris) =>
      s"t_$lang" -> tris.map(t => substrCount(text, t)).reduce(_ + _).cast("long")
    }

  /** Ordered language marker lists: the top function words (stopwords)
    * of five Latin-script languages — the standard word-level
    * language-ID signal, drawn from published frequency lists (the same
    * words every UDHR/Leipzig-corpora ranking puts first). Ambiguous
    * short words shared across Romance languages are genuinely ambiguous
    * in the wild; the deterministic first-listed tie order resolves
    * them. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in", "is", "that", "for", "it", "as"),
    "de" -> Seq("der", "die", "und", "das", "ist", "nicht", "von", "mit", "ein", "zu"),
    "es" -> Seq("el", "la", "de", "que", "los", "en", "por", "con", "una", "para"),
    "fr" -> Seq("le", "la", "les", "et", "des", "est", "dans", "pour", "une", "que"),
    "it" -> Seq("il", "di", "che", "per", "con", "del", "una", "sono", "non", "alla"))

  /** Unicode language profiles: distinctive lowercase substrings over 12
    * languages / 6 scripts (Latin, Cyrillic, Arabic, Han, Kana, Hangul) —
    * space-padded function words for space-delimited scripts,
    * high-frequency particles/characters for CJK, drawn from the UDHR
    * translations' own frequency ranks (the standard public multilingual
    * sample; Cavnar–Trenkle-style profile construction).
    *
    * Counted on the RAW text with [[substrCount]] (no canon, no lower):
    * F1 `canon` strips non-ASCII BY DESIGN (both engines agree — that
    * parity is pinned by g1), so canon'd tokens can never carry a
    * non-Latin signal; literal replace/length arithmetic is exactly
    * portable across engines with no regex or locale surface, which is
    * what lets a DuckDB oracle hash-check CJK scoring bit-for-bit.
    * List order is the deterministic tie order (first listed wins). */
  val langProfilesU: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " are ", " of ", " is "),
    "de" -> Seq(" und ", " sind ", " der ", " die ", " nicht "),
    "es" -> Seq(" los ", " que ", " en ", " y ", " con "),
    "fr" -> Seq(" les ", " et ", " des ", " dans ", " une "),
    "it" -> Seq(" gli ", " che ", " di ", " ed ", " della "),
    "pt" -> Seq(" os ", " em ", " não ", " uma ", " dos "),
    "nl" -> Seq(" en ", " van ", " het ", " een ", " worden "),
    "ru" -> Seq(" и ", " не ", " в ", " на ", " что "),
    "ar" -> Seq("ال", " في ", " من ", " على ", "ون"),
    "zh" -> Seq("的", "在", "是", "人", "一"),
    "ja" -> Seq("の", "は", "に", "して", "である"),
    "ko" -> Seq("은 ", "며 ", " 그 ", "하다", "에 "))

  /** Per-language Unicode substring scores (occurrence counts, exact in
    * any engine — see [[langProfilesU]]). */
  def langScoresU(text: Column): Seq[(String, Column)] =
    langProfilesU.map { case (lang, ms) =>
      lang -> ms.map(m => substrCount(text, m)).reduce(_ + _).cast("long")
    }

  /** Argmax over precomputed per-language score COLUMNS, first-listed
    * wins ties, 'und' when nothing scores. Callers should pass plain
    * attribute references (project the scores first): handing the raw
    * score EXPRESSIONS here re-evaluates each one ~n_langs× inside the
    * greatest + comparison chain — the measured cost of the pre-round-5
    * ta_lang_unicode (60 substring counts re-derived per comparison). */
  def langGuessFromScores(scores: Seq[(String, Column)]): Column = {
    val best = greatest(scores.map(_._2): _*)
    scores.foldRight(lit("und"): Column) { case ((lang, sc), acc) =>
      when(sc === best && best > 0, lit(lang)).otherwise(acc)
    }
  }

  /** Unicode language guess: argmax over [[langScoresU]], first-listed
    * wins ties, 'und' when nothing scores. Prefer projecting
    * [[langScoresU]] once and using [[langGuessFromScores]] on the
    * resulting attributes (see its scaladoc). */
  def langGuessU(text: Column): Column =
    langGuessFromScores(langScoresU(text))

  /** Count of marker tokens (with multiplicity) in a precomputed token
    * array — lets one tokenization feed every language's score. */
  def markerHitsTok(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => markers.map(m => t === m).reduce(_ || _)))

  /** Count of marker tokens (with multiplicity) present in the text. */
  def markerHits(text: Column, markers: Seq[String]): Column =
    markerHitsTok(tokensCol(text), markers)

  /** Per-language marker scores over one shared token array. */
  def langScores(toks: Column): Seq[(String, Column)] =
    langMarkers.map { case (lang, ms) => lang -> markerHitsTok(toks, ms) }

  /** Language guess = argmax over marker-hit scores, first-listed wins
    * ties (greatest-chain keeps the comparison deterministic). */
  def langGuessTok(toks: Column): Column =
    langGuessFromScores(langScores(toks))

  /** [[langGuessTok]] with tokenization inline. Callers scoring MANY
    * languages should project [[tokensCol]] once and use the Tok forms
    * (one canon+split in the plan instead of one per language). */
  def langGuess(text: Column): Column = langGuessTok(tokensCol(text))

  /** Document fingerprint: stable content hash of the canonical text —
    * the exact-dedup key. */
  def fingerprint(text: Column): Column = md5(Norm.canon(text))
}
