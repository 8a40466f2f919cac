package graft.queries

import graft.ext.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Text-analysis inventory over `documents`: token counting, quality
  * scoring, language ID, fingerprinting. All narrow per-row column
  * programs — zero shuffles before the final order.
  */
object TextQueries {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  /** DuckDB twin of Norm.canon over the `text` column (single source:
    * [[WRatioSql.canonOf]] — three copies of this regex chain once
    * existed and would drift independently). */
  private[queries] val canonSql = WRatioSql.canonOf("text")

  val taTokens = Q("ta_token_count",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        TextAnalysis.subwordCount(col("text")).as("n_subwords"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id,
               len(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS n_tokens,
               len(list_filter(regexp_split_to_array(lower(coalesce(text, '')), '[^a-z0-9]+'), x -> x <> '')) AS n_subwords
             FROM documents ORDER BY doc_id"""))

  val taQuality = Q("ta_quality",
    (s, dir) => {
      val cols = TextAnalysis.qualityColumns(col("text"))
      docs(s, dir)
        .select((col("doc_id") +: cols.map { case (n, c) => c.as(n) }): _*)
        .orderBy("doc_id")
    },
    Some {
      val stopList = TextAnalysis.Stopwords.map(w => s"'$w'").mkString(", ")
      s"""SELECT doc_id,
               length(coalesce(text, '')) AS n_chars,
               len(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS n_tokens,
               round((length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[^[:alnum:][:space:]]', '', 'g')))::DOUBLE
                     / greatest(length(coalesce(text, '')), 1)::DOUBLE, 6) AS punct_ratio,
               round(length(regexp_replace(coalesce(text, ''), '\\s+', '', 'g'))::DOUBLE
                     / greatest(len(list_filter(string_split($canonSql, ' '), x -> x <> '')), 1)::DOUBLE, 6) AS avg_word_len,
               round(len(list_filter(string_split($canonSql, ' '), x -> x IN ($stopList)))::DOUBLE
                     / greatest(len(list_filter(string_split($canonSql, ' '), x -> x <> '')), 1)::DOUBLE, 6) AS stopword_ratio
             FROM documents ORDER BY doc_id"""
    })

  /** Char-trigram language scoring — the n-gram half of language ID
    * (replace-based substring counting, portable to any engine). */
  val taLangTrigram = Q("ta_lang_trigram",
    (s, dir) => {
      val scores = TextAnalysis.trigramScores(col("text"))
      docs(s, dir)
        .select((col("doc_id") +: scores.map { case (n, c) => c.as(n) }): _*)
        .orderBy("doc_id")
    },
    Some {
      val cols = TextAnalysis.langTrigramProfiles.map { case (lang, tris) =>
        val sum = tris.map(t =>
          s"(length(coalesce(text, '')) - length(replace(coalesce(text, ''), '$t', ''))) / ${t.length}")
          .mkString(" + ")
        s"CAST($sum AS BIGINT) AS t_$lang"
      }.mkString(",\n               ")
      s"""SELECT doc_id,
               $cols
             FROM documents ORDER BY doc_id"""
    })

  val taLangId = Q("ta_lang_id",
    (s, dir) => {
      // one tokenization feeds all 5 score columns AND the guess
      val scoreCols = TextAnalysis.langScores(col("toks")).map {
        case (lang, c) => c.as(s"s_$lang")
      }
      val langs = TextAnalysis.langMarkers.map(_._1)
      docs(s, dir)
        .withColumn("toks", TextAnalysis.tokensCol(col("text")))
        .select((Seq(col("doc_id")) ++ scoreCols ++ Seq(col("lang"))): _*)
        // guess reads the score ATTRIBUTES — same two-step shape as
        // ta_lang_unicode (the argmax chain would otherwise re-run each
        // marker filter ~6×)
        .withColumn("lang_guess", TextAnalysis.langGuessFromScores(
          langs.map(l => l -> col(s"s_$l"))))
        .select((Seq(col("doc_id")) ++ langs.map(l => col(s"s_$l")) ++
          Seq(col("lang_guess"), col("lang"))): _*)
        .orderBy("doc_id")
    },
    Some {
      val scores = TextAnalysis.langMarkers.map { case (lang, ms) =>
        val inList = ms.map(m => s"'$m'").mkString(", ")
        s"len(list_filter(string_split($canonSql, ' '), x -> x IN ($inList))) AS s_$lang"
      }.mkString(",\n               ")
      val langs = TextAnalysis.langMarkers.map(_._1)
      val best = langs.map(l => s"s_$l").mkString("greatest(", ", ", ")")
      val guessCase = langs.map(l => s"WHEN s_$l = best AND best > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH scored AS (
            SELECT doc_id, lang,
               $scores
            FROM documents),
          b AS (SELECT *, $best AS best FROM scored)
          SELECT doc_id, ${langs.map(l => s"s_$l").mkString(", ")},
                 $guessCase AS lang_guess, lang
          FROM b ORDER BY doc_id"""
    })

  val taFingerprint = Q("ta_fingerprint",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, md5($canonSql) AS fp FROM documents ORDER BY doc_id"""))

  /** Corpus curation report: per corpus-language — document count, total
    * tokens, exact-dup groups (distinct fingerprints vs docs = the dup
    * rate), and source diversity. The summary table a dataset card is
    * built from; one grouped aggregate, partial-agg friendly. */
  val taCorpusReport = Q("ta_corpus_report",
    (s, dir) => docs(s, dir)
      .groupBy(col("lang"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(TextAnalysis.tokenCount(col("text")).cast("long")).as("total_tokens"),
        countDistinct(TextAnalysis.fingerprint(col("text"))).as("n_distinct"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy("lang"),
    Some(s"""SELECT lang,
               count(*) AS n_docs,
               CAST(sum(len(list_filter(string_split($canonSql, ' '), x -> x <> ''))) AS BIGINT) AS total_tokens,
               count(DISTINCT md5($canonSql)) AS n_distinct,
               count(DISTINCT source) AS n_sources
             FROM documents GROUP BY lang ORDER BY lang"""))

  /** Per-language heavy hitters: top-5 tokens by frequency with a total
    * tiebreak — the vocabulary/boilerplate inspection every corpus
    * audit runs. Shape: explode → (lang, tok) count → two-phase top-k
    * ([[graft.ext.TopK]]): the group-by absorbs the token fan-out, then
    * per-partition prune → tiny merge ranks without ever sorting a
    * language's whole vocabulary in one task (the round-2 window
    * formulation did exactly that). */
  val taTopTokens = Q("ta_top_tokens",
    (s, dir) => {
      val counted = docs(s, dir)
        .select(col("lang"), explode(TextAnalysis.tokensCol(col("text"))).as("tok"))
        .groupBy("lang", "tok").agg(count(lit(1)).as("n"))
      // (-n, tok) ascending == (n desc, tok asc); (lang, tok) is unique so
      // the struct is a total order
      graft.ext.TopK.perGroupTopK(counted, Seq("lang"),
          struct((-col("n")).as("negn"), col("tok"), col("n")), 5)
        .select(col("lang"), col("col.tok").as("tok"), col("col.n").as("n"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("lang", "rank")
    },
    Some(s"""WITH toks AS (
               SELECT lang, unnest(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS tok
               FROM documents),
             counted AS (SELECT lang, tok, count(*) AS n FROM toks GROUP BY 1, 2),
             ranked AS (
               SELECT lang, tok, n, row_number() OVER (PARTITION BY lang
                        ORDER BY n DESC, tok ASC) AS rank
               FROM counted)
             SELECT lang, tok, n, rank FROM ranked WHERE rank <= 5
             ORDER BY lang, rank"""))

  /** Deterministic stratified sample: 10 documents per language chosen
    * by smallest salted hash — the reproducible subsample every eval/
    * inspection pipeline needs (same membership on every run, engine,
    * and partitioning, unlike rand()-based sampling). */
  val taSampleStratified = Q("ta_sample_stratified",
    (s, dir) => {
      val h = graft.ext.Dedup.tokenHash(
        concat(lit("sample:"), col("doc_id").cast("string")))
      val hashed = docs(s, dir).select(col("lang"), col("doc_id"), h.as("hash"))
      // two-phase top-k by smallest salted hash — no per-language
      // full-corpus sort (see [[graft.ext.TopK]]); doc_id makes the
      // struct a total order under hash collisions
      graft.ext.TopK.perGroupTopK(hashed, Seq("lang"),
          struct(col("hash"), col("doc_id")), 10)
        .select(col("lang"), col("col.doc_id").as("doc_id"))
        .orderBy("lang", "doc_id")
    },
    Some("""WITH h AS (
              SELECT lang, doc_id,
                     ('0x' || substr(md5('sample:' || doc_id), 1, 8))::BIGINT AS hash
              FROM documents),
            ranked AS (
              SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
                       ORDER BY hash ASC, doc_id ASC) AS rank
              FROM h)
            SELECT lang, doc_id FROM ranked WHERE rank <= 10
            ORDER BY lang, doc_id"""))

  /** UDHR Article 1 in the 12 profiled languages (public-domain UN
    * text) — the multilingual sample rows `ta_lang_unicode` unions into
    * the corpus so non-Latin scoring is exercised with REAL text in both
    * engines, not just zero columns over an ASCII corpus. Ids sit far
    * above any fixture doc_id. */
  private[graft] val udhrSamples: Seq[(Long, String, String)] = Seq(
    (9000001L, "en", "All human beings are born free and equal in dignity and rights."),
    (9000002L, "de", "Alle Menschen sind frei und gleich an Würde und Rechten geboren."),
    (9000003L, "es", "Todos los seres humanos nacen libres e iguales en dignidad y derechos."),
    (9000004L, "fr", "Tous les êtres humains naissent libres et égaux en dignité et en droits."),
    (9000005L, "it", "Tutti gli esseri umani nascono liberi ed eguali in dignità e diritti."),
    (9000006L, "pt", "Todos os seres humanos nascem livres e iguais em dignidade e em direitos."),
    (9000007L, "nl", "Alle mensen worden vrij en gelijk in waardigheid en rechten geboren."),
    (9000008L, "ru", "Все люди рождаются свободными и равными в своем достоинстве и правах."),
    (9000009L, "ar", "يولد جميع الناس أحرارا متساوين في الكرامة والحقوق."),
    (9000010L, "zh", "人人生而自由，在尊严和权利上一律平等。"),
    (9000011L, "ja", "すべての人間は、生まれながらにして自由であり、かつ、尊厳と権利とについて平等である。"),
    (9000012L, "ko", "모든 인간은 태어날 때부터 자유로우며 그 존엄과 권리에 있어 동등하다."))

  /** Unicode language ID over corpus ∪ UDHR samples: 12 languages, 6
    * scripts, scored with engine-exact substring arithmetic
    * ([[TextAnalysis.langProfilesU]]); `n_tokens` rides along to pin
    * canon's strip-non-ASCII parity (\p{Alnum} vs [[:alnum:]], both
    * ASCII-only) on real non-Latin text cross-engine. Narrow per-row
    * column program — no shuffle before the final order. */
  val taLangUnicode = Q("ta_lang_unicode",
    (s, dir) => {
      import s.implicits._
      val extra = udhrSamples.map { case (id, _, t) => (id, t) }.toDF("doc_id", "text")
      val base = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(extra)
      // scores projected ONCE, then the argmax chain reads the score
      // ATTRIBUTES — inlining the 60 substring counts into the guess
      // expression re-evaluated each ~13× (greatest + 12 comparisons);
      // CollapseProject keeps non-cheap multiply-referenced aliases in
      // their own projection, so the two-step form stays two-step
      val scoreCols = TextAnalysis.langScoresU(col("text")).map {
        case (lang, c) => c.as(s"u_$lang")
      }
      val langs = TextAnalysis.langProfilesU.map(_._1)
      base.select((col("doc_id") +: scoreCols) :+
          TextAnalysis.tokenCount(col("text")).as("n_tokens"): _*)
        .withColumn("lang_guess", TextAnalysis.langGuessFromScores(
          langs.map(l => l -> col(s"u_$l"))))
        .select((col("doc_id") +: langs.map(l => col(s"u_$l"))) ++
          Seq(col("lang_guess"), col("n_tokens")): _*)
        .orderBy("doc_id")
    },
    Some {
      val valuesRows = udhrSamples
        .map { case (id, _, t) => s"(CAST($id AS BIGINT), '$t')" }
        .mkString(",\n                 ")
      val scores = TextAnalysis.langProfilesU.map { case (lang, ms) =>
        val sum = ms.map(m =>
          s"(length(coalesce(text, '')) - length(replace(coalesce(text, ''), '$m', ''))) / ${m.length}")
          .mkString(" + ")
        s"CAST($sum AS BIGINT) AS u_$lang"
      }.mkString(",\n               ")
      val langs = TextAnalysis.langProfilesU.map(_._1)
      val best = langs.map(l => s"u_$l").mkString("greatest(", ", ", ")")
      val guessCase = langs.map(l => s"WHEN u_$l = best AND best > 0 THEN '$l'")
        .mkString("CASE ", " ", " ELSE 'und' END")
      s"""WITH allrows AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT * FROM (VALUES
                 $valuesRows) AS v(doc_id, text)),
          scored AS (
            SELECT doc_id, text,
               $scores
            FROM allrows),
          b AS (SELECT *, $best AS best FROM scored)
          SELECT doc_id, ${langs.map(l => s"u_$l").mkString(", ")},
                 $guessCase AS lang_guess,
                 len(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS n_tokens
          FROM b ORDER BY doc_id"""
    })

  /** Quality gating by corpus statistics: keep documents under the 90th
    * punctuation percentile and over the 10th token-count percentile.
    * The thresholds are two scalars — a broadcast against the corpus
    * scan at any scale, not a join; exact percentiles cross-check
    * Spark's `percentile` against DuckDB's `quantile_cont` on the
    * IDENTICALLY-rounded metric (the r13 parity pattern, applied as a
    * filter). */
  val taQualityFilter = Q("ta_quality_filter",
    (s, dir) => {
      // The metric relation feeds BOTH the percentile aggregate and the
      // filter scan: materialize it once (the canon/tokenize regexes are
      // the dominant cost and ran twice per document before). The
      // explicit-width repartition first parallelizes that regex work
      // across the cluster — a small parquet scan arrives as one input
      // split — and is what the checkpoint then stores.
      val m = docs(s, dir)
        .repartition(s.sessionState.conf.numShufflePartitions, col("doc_id"))
        .select(
          col("doc_id"),
          TextAnalysis.tokenCount(col("text")).as("n_tokens"),
          TextAnalysis.qualityColumns(col("text"))
            .find(_._1 == "punct_ratio").get._2.as("punct_ratio"))
        .localCheckpoint(true)
      val cuts = m.agg(
        expr("percentile(punct_ratio, 0.9)").as("p90_punct"),
        expr("percentile(n_tokens, 0.1)").as("p10_tokens"))
      m.crossJoin(broadcast(cuts))
        .filter(col("punct_ratio") <= col("p90_punct") &&
          col("n_tokens") >= col("p10_tokens"))
        .select("doc_id", "n_tokens", "punct_ratio")
        .orderBy("doc_id")
    },
    Some {
      val punct = s"""round((length(coalesce(text, '')) - length(regexp_replace(coalesce(text, ''), '[^[:alnum:][:space:]]', '', 'g')))::DOUBLE
                     / greatest(length(coalesce(text, '')), 1)::DOUBLE, 6)"""
      val ntok = s"len(list_filter(string_split($canonSql, ' '), x -> x <> ''))"
      s"""WITH m AS (SELECT doc_id, $ntok AS n_tokens, $punct AS punct_ratio FROM documents),
            cuts AS (SELECT quantile_cont(punct_ratio, 0.9) AS p90_punct,
                            quantile_cont(n_tokens, 0.1) AS p10_tokens FROM m)
          SELECT doc_id, n_tokens, punct_ratio
          FROM m, cuts
          WHERE punct_ratio <= p90_punct AND n_tokens >= p10_tokens
          ORDER BY doc_id"""
    })

  /** True BPE token count per document ([[graft.core.Bpe]] as a native
    * codegen expression, VERDICT r14 task 3) next to the whitespace
    * count — the pair a budget dashboard plots. The oracle replays the
    * committed merges fixture through [[BpeSql]]'s recursive CTE, so
    * the encode loop itself is cross-engine hash-checked, not just the
    * plumbing. */
  val taBpeCount = Q("ta_bpe_count",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"),
        TextAnalysis.tokenCount(col("text")).as("n_tokens"),
        graft.functions.bpeCount(col("text")).as("n_bpe"))
      .orderBy("doc_id"),
    Some(s"""WITH RECURSIVE
             ${BpeSql.wordTokCtes}
           SELECT d.doc_id,
                  len(list_filter(string_split(${WRatioSql.canonOf("d.text")}, ' '), x -> x <> '')) AS n_tokens,
                  b.n_bpe
           FROM documents d JOIN doc_bpe b USING (doc_id)
           ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(taTokens, taQuality, taLangId, taLangTrigram,
    taLangUnicode, taFingerprint, taCorpusReport, taTopTokens,
    taSampleStratified, taQualityFilter, taBpeCount)
}
