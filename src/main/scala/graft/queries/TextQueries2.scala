package graft.queries

import graft.ext.TextAnalysis
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Second text-analysis batch: PII redaction, word n-grams, and BM25
  * retrieval — the remaining text operators a corpus-curation pipeline
  * runs at scale. All are built-in column composition (codegen'd, no
  * UDFs); the BM25 ranking reuses the two-phase top-k so no single task
  * ever sorts the whole corpus.
  */
object TextQueries2 {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  // ------------------------------------------------------------- redact

  /** PII patterns in the Java-regex ∩ RE2 portable subset (no
    * backreferences, no lookaround — RE2 has neither), so Spark and
    * DuckDB match identically. Order matters and is fixed: email → URL →
    * phone, each pass over the previous pass's output. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val UrlRe = "https?://[^\\s]+"
  val PhoneRe = "\\+?[0-9][0-9 ()-]{6,}[0-9]"

  /** Chained redaction: every match replaced with a typed tag. */
  def redact(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(coalesce(text, lit("")), EmailRe, "<EMAIL>"),
        UrlRe, "<URL>"),
      PhoneRe, "<PHONE>")

  /** Synthetic PII rows unioned into the corpus (the fixture corpus is
    * word-salad with no PII, so redaction must be exercised on planted
    * rows — the UDHR-sample pattern from `ta_lang_unicode`). Ids sit far
    * above any fixture doc_id. */
  private[graft] val piiSamples: Seq[(Long, String)] = Seq(
    (9200001L, "contact alice.smith+work@example.com or bob@sub.example.org today"),
    (9200002L, "see https://example.com/a/b?q=1 and http://test.example.net/x for details"),
    (9200003L, "call +1 (555) 123-4567 or 020 7946 0958 before noon"),
    (9200004L, "mixed: carol@example.com via https://example.org, fax 555 867 5309 now"),
    (9200005L, "no pii here, just plain text"))

  val taRedact = Q("ta_redact",
    (s, dir) => {
      import s.implicits._
      val extra = piiSamples.toDF("doc_id", "text")
      val base = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(extra)
      base.select(
        col("doc_id"),
        redact(col("text")).as("redacted"),
        regexp_count(col("text"), lit(EmailRe)).as("n_emails"),
        regexp_count(col("text"), lit(UrlRe)).as("n_urls"),
        regexp_count(col("text"), lit(PhoneRe)).as("n_phones"))
        .orderBy("doc_id")
    },
    Some {
      val valuesRows = piiSamples
        .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }
        .mkString(",\n                 ")
      // RE2 needs the 'g' flag for replace-all (Java replaces all by
      // default); counts via regexp_extract_all on the RAW text
      s"""WITH allrows AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT * FROM (VALUES
                 $valuesRows) AS v(doc_id, text))
          SELECT doc_id,
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(coalesce(text, ''), '$EmailRe', '<EMAIL>', 'g'),
                     '$UrlRe', '<URL>', 'g'),
                   '$PhoneRe', '<PHONE>', 'g') AS redacted,
                 len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
                 len(regexp_extract_all(text, '$UrlRe')) AS n_urls,
                 len(regexp_extract_all(text, '$PhoneRe')) AS n_phones
          FROM allrows ORDER BY doc_id"""
    })

  // ---------------------------------------------------------- pii audit

  /** Card-number CANDIDATE shape (digits with optional space/dash
    * separators, 13-19 digits once stripped — the length check happens
    * after stripping); IPv4 and SSN are format-level checks. All in the
    * Java∩RE2 portable subset like the redact patterns. */
  val CardRe = "\\b[0-9](?:[0-9 -]{11,17})[0-9]\\b"
  val Ipv4Re = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val SsnRe = "\\b[0-9]{3}-[0-9]{2}-[0-9]{4}\\b"

  /** Luhn checksum over a stripped digit string, as portable
    * higher-order-function columns (sum over digits right-to-left,
    * doubling every second, −9 when the double exceeds 9; total ≡ 0 mod
    * 10). Identical structure in the DuckDB twin below — the audit's
    * whole point is that a FORMAT match is not a card: the checksum
    * separates real leaks from phone-number-shaped noise. Column API,
    * not `expr(...)`: a `\b` inside a SQL string literal parses as a
    * BACKSPACE character and the pattern silently never matches. */
  private def luhnOk(d: Column): Column = {
    def digitAt(i: Column): Column = ascii(d.substr(length(d) - i + 1, lit(1))) - 48
    val checksum = aggregate(sequence(lit(1), length(d)), lit(0), (acc, i) => {
      val x = digitAt(i)
      acc + when(i % 2 === 0, when(x * 2 > 9, x * 2 - 9).otherwise(x * 2)).otherwise(x)
    })
    length(d) >= 13 && length(d) <= 19 && checksum % 10 === 0
  }

  /** Planted audit rows (fixture corpus is word salad): two VALID test
    * card numbers (Luhn-passing, the published test-card values), one
    * digit-flipped invalid, IPv4s, an SSN-shaped string, a clean row. */
  private[graft] val piiAuditSamples: Seq[(Long, String)] = Seq(
    (9300001L, "card 4539 1488 0343 6467 on file"),          // valid visa-shape
    (9300002L, "amex 3782 822463 10005 expires soon"),       // valid amex-shape
    (9300003L, "typo card 4539 1488 0343 6468 rejected"),    // Luhn-invalid
    (9300004L, "hosts 192.168.0.1 and 10.0.0.255 internal"),
    (9300005L, "ref 123-45-6789 filed yesterday"),
    (9300006L, "no identifiers in this row at all"))

  /** PII audit: candidate/validated card counts (Luhn), IPv4 and SSN
    * format counts, and a per-doc `has_pii` flag — the governance
    * sweep a corpus runs BEFORE redaction decides what to strip.
    * Everything is codegen'd column composition (regexp + HOFs); at
    * 100 TB this is one narrow pass, no shuffle. */
  val taPiiAudit = Q("ta_pii_audit",
    (s, dir) => {
      import s.implicits._
      val base = docs(s, dir).select(col("doc_id").cast("long").as("doc_id"), col("text"))
        .unionByName(piiAuditSamples.toDF("doc_id", "text"))
      val cands = regexp_extract_all(col("text"), lit(CardRe), lit(0))
      val digits = transform(cands, c => regexp_replace(c, lit("[^0-9]"), lit("")))
      base.select(
        col("doc_id"),
        size(cands).cast("long").as("n_card_candidates"),
        size(filter(digits, luhnOk(_))).cast("long").as("n_cards_valid"),
        size(regexp_extract_all(col("text"), lit(Ipv4Re), lit(0))).cast("long").as("n_ipv4"),
        size(regexp_extract_all(col("text"), lit(SsnRe), lit(0))).cast("long").as("n_ssn"))
        .withColumn("has_pii",
          col("n_cards_valid") + col("n_ipv4") + col("n_ssn") > 0)
        .orderBy("doc_id")
    },
    Some {
      val valuesRows = piiAuditSamples
        .map { case (id, t) => s"(CAST($id AS BIGINT), '$t')" }
        .mkString(",\n                 ")
      val luhn =
        s"""len(list_filter(
              list_transform(regexp_extract_all(text, '$CardRe'),
                             c -> regexp_replace(c, '[^0-9]', '', 'g')),
              d -> length(d) >= 13 AND length(d) <= 19 AND
                   list_sum(list_transform(range(1, length(d) + 1), i ->
                     CASE WHEN i % 2 = 0
                       THEN CASE WHEN 2 * (ascii(substring(d, length(d) - i + 1, 1)) - 48) > 9
                            THEN 2 * (ascii(substring(d, length(d) - i + 1, 1)) - 48) - 9
                            ELSE 2 * (ascii(substring(d, length(d) - i + 1, 1)) - 48) END
                       ELSE ascii(substring(d, length(d) - i + 1, 1)) - 48 END)) % 10 = 0))"""
      s"""WITH allrows AS (
            SELECT doc_id, text FROM documents
            UNION ALL
            SELECT * FROM (VALUES
                 $valuesRows) AS v(doc_id, text))
          SELECT doc_id,
                 CAST(len(regexp_extract_all(text, '$CardRe')) AS BIGINT) AS n_card_candidates,
                 CAST($luhn AS BIGINT) AS n_cards_valid,
                 CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT) AS n_ipv4,
                 CAST(len(regexp_extract_all(text, '$SsnRe')) AS BIGINT) AS n_ssn,
                 (CAST($luhn AS BIGINT)
                   + CAST(len(regexp_extract_all(text, '$Ipv4Re')) AS BIGINT)
                   + CAST(len(regexp_extract_all(text, '$SsnRe')) AS BIGINT)) > 0 AS has_pii
          FROM allrows ORDER BY doc_id"""
    })

  // ------------------------------------------------------------- ngrams

  /** Word bigrams over a PRE-MATERIALIZED token array column. The
    * argument must be an attribute (e.g. via `.withColumn("toks", ...)`),
    * not a derived expression — Spark inlines derived expressions into
    * each lambda evaluation (the HOF re-evaluation trap: canon+split
    * would run once per element). `sequence` needs the size guard:
    * Spark's `sequence(0, -1)` generates a DESCENDING sequence. */
  def bigramsOf(toks: Column): Column =
    when(size(toks) >= 2,
      transform(sequence(lit(0), size(toks) - 2),
        i => concat_ws(" ", element_at(toks, i + 1), element_at(toks, i + 2))))
      .otherwise(array().cast("array<string>"))

  /** Per-language bigram heavy hitters: explode → count → two-phase
    * top-k (the `ta_top_tokens` shape one n-gram order up — the group-by
    * absorbs the fan-out; no per-language vocabulary sort in one task). */
  val taNgrams = Q("ta_ngrams",
    (s, dir) => {
      val counted = docs(s, dir)
        .withColumn("toks", TextAnalysis.tokensCol(col("text")))
        .select(col("lang"), explode(bigramsOf(col("toks"))).as("bigram"))
        .groupBy("lang", "bigram").agg(count(lit(1)).as("n"))
      graft.ext.TopK.perGroupTopK(counted, Seq("lang"),
          struct((-col("n")).as("negn"), col("bigram"), col("n")), 5)
        .select(col("lang"), col("col.bigram").as("bigram"), col("col.n").as("n"),
          (col("pos") + 1).cast("int").as("rank"))
        .orderBy("lang", "rank")
    },
    Some {
      val canon = TextQueries.canonSql
      // DuckDB generate_series(1, n) is empty when n < 1 (no descending
      // surprise); lists are 1-based
      s"""WITH toks AS (
            SELECT lang, list_filter(string_split($canon, ' '), x -> x <> '') AS t
            FROM documents),
          grams AS (
            SELECT lang,
                   unnest(list_transform(generate_series(1, len(t) - 1),
                     i -> t[i] || ' ' || t[i + 1])) AS bigram
            FROM toks),
          counted AS (SELECT lang, bigram, count(*) AS n FROM grams GROUP BY 1, 2),
          ranked AS (
            SELECT lang, bigram, n, row_number() OVER (PARTITION BY lang
                     ORDER BY n DESC, bigram ASC) AS rank
            FROM counted)
          SELECT lang, bigram, n, rank FROM ranked WHERE rank <= 5
          ORDER BY lang, rank"""
    })

  // -------------------------------------------------------------- bm25

  /** The standing example query for `ta_bm25` (terms from the fixture
    * vocabulary; the operator takes any term set). */
  val Bm25Terms: Seq[String] = Seq("spark", "scan", "merge", "window")
  val Bm25K1 = 1.2
  val Bm25B = 0.75

  /** BM25 document retrieval with a LOG-FREE rational idf:
    * `idf = (N - df + 0.5) / (df + 0.5)` — monotone in df exactly like
    * the classic `ln`-form, but built from IEEE basic ops only (+,-,*,/
    * are correctly rounded and therefore bit-identical in every engine;
    * `ln` is not, and a 1-ulp ln drift breaks cross-engine hashing).
    * Per-term scores are scaled to integer micros BEFORE the per-doc
    * sum, so the sum is order-free — the same reproducibility design as
    * the quantized cosine ([[graft.ext.Similarity]]).
    *
    * Shape at 100 TB: tf is one token-explode + grouped count (partial
    * agg absorbs the fan-out); df and the corpus stats are tiny
    * broadcast sides; ranking is the two-phase top-k — no corpus-wide
    * single-task sort anywhere. */
  val taBm25 = Q("ta_bm25",
    (s, dir) => {
      // tokenization (the regex-heavy part) materialized ONCE — it feeds
      // the corpus stats aggregate AND the tf relation below; without
      // this, both subplans re-scan and re-tokenize the corpus.
      // Only QUERY-TERM tokens survive into the checkpoint (dl is taken
      // over the full array first): the stats side needs (count, dl)
      // and the tf side only the Bm25Terms hits, so materializing every
      // corpus token serialized orders of magnitude more array bytes
      // than any reader consumes (guide §2.3: project before you
      // materialize/shuffle)
      val toks = docs(s, dir)
        .withColumn("toks", TextAnalysis.tokensCol(col("text")))
        .select(col("doc_id"), size(col("toks")).as("dl"),
          filter(col("toks"), t => t.isInCollection(Bm25Terms)).as("toks"))
        .localCheckpoint(true)
      // one row per (doc, query-term): materialized once — it feeds BOTH
      // the df aggregate and the scoring join (shared-subplan re-execution
      // would otherwise re-explode the token arrays). The isin filter is
      // already applied inside the checkpointed array above.
      val tf = toks
        .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
        .groupBy("doc_id", "dl", "term").agg(count(lit(1)).as("tf"))
        .localCheckpoint(true)
      val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
      val stats = toks.agg(
        count(lit(1)).as("n_docs"),
        (sum(col("dl")).cast("double") / count(lit(1)).cast("double")).as("avgdl"))
      // scoring + ranking tail shared with the persisted-index serving
      // path (graft.ext.TextIndex.bm25TopK) — one body for the idf/tf
      // arithmetic and tie contract their common oracle pins
      graft.ext.TextIndex.bm25Rank(tf, dfreq, stats, Bm25K1, Bm25B, 20)
    },
    Some(bm25Sql()))

  /** The BM25 oracle SQL, templated on a corpus predicate so the
    * persisted-index journeys (append, tombstone delete) can pin their
    * final live-doc set with the SAME arithmetic/tie contract. */
  def bm25Sql(corpusWhere: String = ""): String = {
      val canon = TextQueries.canonSql
      val termList = Bm25Terms.map(t => s"'$t'").mkString(", ")
      s"""WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split($canon, ' '), x -> x <> '') AS t
            FROM documents $corpusWhere),
          sized AS (SELECT doc_id, len(t) AS dl, t FROM toks),
          tf AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(t) AS term FROM sized)
            WHERE term IN ($termList)
            GROUP BY 1, 2, 3),
          dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          stats AS (SELECT count(*) AS n_docs,
                           sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
                    FROM sized),
          scored AS (
            SELECT tf.doc_id,
                   CAST(round((((CAST(s.n_docs - d.df AS DOUBLE) + 0.5::DOUBLE)
                                / (CAST(d.df AS DOUBLE) + 0.5::DOUBLE))
                               * ((CAST(tf.tf AS DOUBLE) * ${Bm25K1 + 1.0}::DOUBLE)
                                  / (CAST(tf.tf AS DOUBLE) + ${Bm25K1}::DOUBLE
                                     * (${1.0 - Bm25B}::DOUBLE + ${Bm25B}::DOUBLE
                                        * (CAST(tf.dl AS DOUBLE) / s.avgdl)))))
                              * 1000000.0::DOUBLE) AS BIGINT) AS micro
            FROM tf, dfreq d, stats s WHERE tf.term = d.term),
          perdoc AS (SELECT doc_id, CAST(sum(micro) AS BIGINT) AS score_micro FROM scored GROUP BY 1),
          ranked AS (
            SELECT doc_id, score_micro,
                   row_number() OVER (ORDER BY score_micro DESC, doc_id ASC) AS rank
            FROM perdoc)
          SELECT doc_id, score_micro, rank FROM ranked WHERE rank <= 20
          ORDER BY rank"""
  }

  /** BM25 served from the persisted inverted index
    * ([[graft.ext.TextIndex]]): build → probe stored postings → rank,
    * never re-scanning document text at query time. Same oracle as
    * `ta_bm25` — the hash match pins the index as lossless. */
  /** The shared built-once text index (WITH positions, so the phrase
    * serving queries probe the same build — bm25's three tables are
    * byte-identical either way): the bench measures SERVING, the
    * one-time build lands in the cold pass ([[Fixtures.indexPath]]). */
  def builtTextIndex(s: SparkSession, dir: String): String =
    Fixtures.indexPath(s, dir, "tindex") { p =>
      graft.ext.TextIndex.write(docs(s, dir), p, withPositions = true)
    }

  val taBm25Persisted = Q("ta_bm25_persisted",
    (s, dir) => graft.ext.TextIndex.bm25TopK(
      s, builtTextIndex(s, dir), Bm25Terms, 20, Bm25K1, Bm25B),
    Some(bm25Sql()))

  /** The full index-evolution journey: build over the even doc_ids,
    * [[graft.ext.TextIndex.append]] the odd ones as a second committed
    * shard, tombstone-[[graft.ext.TextIndex.delete]] every doc_id
    * ≡ 3 (mod 7), serve. The oracle recomputes BM25 over exactly the
    * surviving corpus — pinning shard-summed df/stats AND the exact
    * subtraction of tombstoned doc-count and length mass. */
  val taBm25Evolve = Q("ta_bm25_evolve",
    (s, dir) => {
      val d = docs(s, dir)
      // the even-half base build is the fixture ([[Fixtures.clonedIndex]]);
      // the measured subject is the append + tombstone + serve journey
      val path = Fixtures.clonedIndex(s, dir, "tindex-even") { p =>
        graft.ext.TextIndex.write(d.filter(col("doc_id") % 2 === 0), p)
      }
      // evolve appends are generation-sized: the one-file sorted layout
      // skips the range-bounds sampling job, the tombstone publish is a
      // driver-side write ([[graft.ext.IndexIO.publishIdShard]]), and
      // the journey's shuffles (append's posting groupBy, the serve's
      // df aggregate) run at generation width, not session width
      Q.withShuffleWidth(s, 4) { cs =>
        val dc = Q.rebind(d, cs)
        graft.ext.TextIndex.append(dc.filter(col("doc_id") % 2 === 1), path,
          partitions = 1)
        graft.ext.TextIndex.delete(
          dc.filter(col("doc_id") % 7 === 3).select("doc_id"), path)
        graft.ext.TextIndex.bm25TopK(cs, path, Bm25Terms, 20, Bm25K1, Bm25B)
          .localCheckpoint(true) // materialize inside the width scope
      }
    },
    Some(bm25Sql("WHERE doc_id % 7 <> 3")))

  /** The standing query batch for `ta_bm25_batch`: three queries over
    * the fixture vocabulary, overlapping terms on purpose (the shared
    * postings probe is the point of the batch form). */
  val Bm25Batch: Seq[(Long, String)] = Seq(
    1L -> "spark", 1L -> "scan", 2L -> "merge", 2L -> "window",
    3L -> "spark", 3L -> "window")

  /** BULK BM25 retrieval from the persisted index
    * ([[graft.ext.TextIndex.bm25TopKBatch]]): a (query_id, term) batch
    * served by ONE postings probe over the union vocabulary + a
    * broadcast query join + per-query top-k — the text twin of the g11
    * bulk geocode join. The oracle replays the same per-query ranking
    * over a VALUES query relation with the shared-corpus df/stats —
    * pinning that batch serving is score-identical to running
    * `ta_bm25_persisted` per query. */
  val taBm25Batch = Q("ta_bm25_batch",
    (s, dir) => {
      import s.implicits._
      graft.ext.TextIndex.bm25TopKBatch(s, builtTextIndex(s, dir),
        Bm25Batch.toDF("query_id", "term"), 20, Bm25K1, Bm25B)
    },
    Some {
      val canon = TextQueries.canonSql
      val termList = Bm25Batch.map(_._2).distinct.map(t => s"'$t'").mkString(", ")
      val valuesRows = Bm25Batch.map { case (q, t) => s"($q, '$t')" }.mkString(", ")
      s"""WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split($canon, ' '), x -> x <> '') AS t
            FROM documents),
          sized AS (SELECT doc_id, len(t) AS dl, t FROM toks),
          qterms(query_id, term) AS (VALUES $valuesRows),
          tf AS (
            SELECT doc_id, dl, term, count(*) AS tf
            FROM (SELECT doc_id, dl, unnest(t) AS term FROM sized)
            WHERE term IN ($termList)
            GROUP BY 1, 2, 3),
          dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
          stats AS (SELECT count(*) AS n_docs,
                           sum(dl)::DOUBLE / count(*)::DOUBLE AS avgdl
                    FROM sized),
          scored AS (
            SELECT tf.doc_id, tf.term,
                   CAST(round((((CAST(s.n_docs - d.df AS DOUBLE) + 0.5::DOUBLE)
                                / (CAST(d.df AS DOUBLE) + 0.5::DOUBLE))
                               * ((CAST(tf.tf AS DOUBLE) * ${Bm25K1 + 1.0}::DOUBLE)
                                  / (CAST(tf.tf AS DOUBLE) + ${Bm25K1}::DOUBLE
                                     * (${1.0 - Bm25B}::DOUBLE + ${Bm25B}::DOUBLE
                                        * (CAST(tf.dl AS DOUBLE) / s.avgdl)))))
                              * 1000000.0::DOUBLE) AS BIGINT) AS micro
            FROM tf, dfreq d, stats s WHERE tf.term = d.term),
          perdoc AS (
            SELECT q.query_id, sc.doc_id,
                   CAST(sum(sc.micro) AS BIGINT) AS score_micro
            FROM scored sc JOIN qterms q ON sc.term = q.term
            GROUP BY 1, 2),
          ranked AS (
            SELECT query_id, doc_id, score_micro,
                   row_number() OVER (PARTITION BY query_id
                     ORDER BY score_micro DESC, doc_id ASC) AS rank
            FROM perdoc)
          SELECT query_id, doc_id, score_micro, rank FROM ranked
          WHERE rank <= 20 ORDER BY query_id, rank"""
    })

  // ------------------------------------------------------- gopher rules

  /** Gopher-style document-quality rules (Rae et al. 2021, "Scaling
    * Language Models" §A1.1 — public paper): word count bounds, mean
    * word length band, alphabetic-word fraction, stopword presence, and
    * the repetition signal (most-frequent-bigram mass). Thresholds are
    * the paper's where applicable, loosened to the fixture's word-salad
    * register where the paper assumes web prose.
    *
    * All metrics are rational arithmetic on integer counts (no ln — the
    * BM25 lesson), so both engines produce bit-identical doubles. Shape:
    * two explode→grouped-aggregate passes (words, bigrams) that partial-
    * aggregate map-side, left-joined back to the doc spine — no windows,
    * no corpus-wide sort. */
  val GopherStops: Seq[String] = TextAnalysis.Stopwords

  val taGopher = Q("ta_gopher_quality",
    (s, dir) => {
      val toks = docs(s, dir)
        .withColumn("toks", TextAnalysis.tokensCol(col("text")))
        .select(col("doc_id"), col("toks"))
      val words = toks
        .select(col("doc_id"), explode(col("toks")).as("tok"))
        .groupBy("doc_id").agg(
          count(lit(1)).as("n_words"),
          sum(length(col("tok"))).as("sum_len"),
          sum(when(col("tok").rlike("[a-z]"), 1L).otherwise(0L)).as("n_alpha"),
          sum(when(col("tok").isin(GopherStops: _*), 1L).otherwise(0L)).as("n_stop"))
      val bigrams = toks
        .select(col("doc_id"), explode(bigramsOf(col("toks"))).as("bg"))
        .groupBy("doc_id", "bg").agg(count(lit(1)).as("n"))
        .groupBy("doc_id").agg(max(col("n")).as("top_n"), sum(col("n")).as("tot_n"))
      val m = toks.select("doc_id")
        .join(words, Seq("doc_id"), "left")
        .join(bigrams, Seq("doc_id"), "left")
        .select(
          col("doc_id"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          round(coalesce(col("sum_len"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_words"), lit(0L)), lit(1L)).cast("double"), 6)
            .as("mean_word_len"),
          round(coalesce(col("n_alpha"), lit(0L)).cast("double") /
            greatest(coalesce(col("n_words"), lit(0L)), lit(1L)).cast("double"), 6)
            .as("alpha_frac"),
          coalesce(col("n_stop"), lit(0L)).as("n_stop"),
          coalesce(
            round(col("top_n").cast("double") / col("tot_n").cast("double"), 6),
            lit(0.0)).as("top_bigram_frac"))
      m.withColumn("keep",
          (col("n_words") >= 3 && col("n_words") <= 100000 &&
            col("mean_word_len") >= 2.0 && col("mean_word_len") <= 12.0 &&
            col("alpha_frac") >= 0.8 && col("n_stop") >= 1 &&
            col("top_bigram_frac") <= 0.2).cast("int"))
        .orderBy("doc_id")
    },
    Some {
      val canon = TextQueries.canonSql
      val stopList = GopherStops.map(w => s"'$w'").mkString(", ")
      s"""WITH toks AS (
            SELECT doc_id,
                   list_filter(string_split($canon, ' '), x -> x <> '') AS t
            FROM documents),
          words AS (
            SELECT doc_id, count(*) AS n_words, sum(len(tok)) AS sum_len,
                   sum(CASE WHEN regexp_matches(tok, '[a-z]') THEN 1 ELSE 0 END) AS n_alpha,
                   sum(CASE WHEN tok IN ($stopList) THEN 1 ELSE 0 END) AS n_stop
            FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1),
          bigrams AS (
            SELECT doc_id, max(n) AS top_n, sum(n) AS tot_n
            FROM (SELECT doc_id, bg, count(*) AS n
                  FROM (SELECT doc_id,
                               unnest(list_transform(generate_series(1, len(t) - 1),
                                 i -> t[i] || ' ' || t[i + 1])) AS bg
                        FROM toks)
                  GROUP BY 1, 2)
            GROUP BY 1),
          m AS (
            SELECT toks.doc_id,
                   coalesce(n_words, 0) AS n_words,
                   round(coalesce(sum_len, 0)::DOUBLE
                         / greatest(coalesce(n_words, 0), 1)::DOUBLE, 6) AS mean_word_len,
                   round(coalesce(n_alpha, 0)::DOUBLE
                         / greatest(coalesce(n_words, 0), 1)::DOUBLE, 6) AS alpha_frac,
                   coalesce(n_stop, 0) AS n_stop,
                   coalesce(round(top_n::DOUBLE / tot_n::DOUBLE, 6), 0.0::DOUBLE) AS top_bigram_frac
            FROM toks
            LEFT JOIN words USING (doc_id)
            LEFT JOIN bigrams USING (doc_id))
          SELECT doc_id, n_words, mean_word_len, alpha_frac,
                 CAST(n_stop AS BIGINT) AS n_stop, top_bigram_frac,
                 CAST(CASE WHEN n_words >= 3 AND n_words <= 100000
                            AND mean_word_len >= 2.0::DOUBLE AND mean_word_len <= 12.0::DOUBLE
                            AND alpha_frac >= 0.8::DOUBLE AND n_stop >= 1
                            AND top_bigram_frac <= 0.2::DOUBLE
                       THEN 1 ELSE 0 END AS INT) AS keep
          FROM m ORDER BY doc_id"""
    })

  // ------------------------------------------------------------ rarity

  /** Unigram-LM rarity score — the shape of a perplexity quality filter
    * without the `ln` (which is not correctly rounded and would break
    * cross-engine hashing): each token contributes its inverse corpus
    * frequency `T / n_tok` in INTEGER micros via exact integer division,
    * the per-doc sum is order-free INT64, and only the final mean is one
    * deterministic float divide. High score = rare vocabulary (a real
    * perplexity filter would threshold exactly this way).
    *
    * Shape at 100 TB: the frequency table is vocabulary-sized (heavy-
    * hitter counts partial-aggregate map-side) and broadcasts back onto
    * the token stream; per-doc reduce is one grouped aggregate. The
    * corpus total rides the frequency table as a broadcast scalar. */
  val taRarity = Q("ta_rarity",
    (s, dir) => {
      val toks = docs(s, dir)
        .withColumn("toks", TextAnalysis.tokensCol(col("text")))
        .select(col("doc_id"), explode(col("toks")).as("tok"))
      val freq = toks.groupBy("tok").agg(count(lit(1)).as("n_tok"))
      val total = freq.agg(sum(col("n_tok")).as("t_total"))
      val scored = toks
        .join(broadcast(freq), Seq("tok"))
        .crossJoin(broadcast(total))
        .select(col("doc_id"),
          expr("(t_total * 1000000L) div n_tok").as("micro"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_words"), sum(col("micro")).as("sum_micro"))
      docs(s, dir).select("doc_id").join(scored, Seq("doc_id"), "left")
        .select(col("doc_id"),
          coalesce(col("n_words"), lit(0L)).as("n_words"),
          coalesce(
            round(col("sum_micro").cast("double") / col("n_words").cast("double"), 6),
            lit(0.0)).as("rarity"))
        .orderBy("doc_id")
    },
    Some {
      val canon = TextQueries.canonSql
      s"""WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split($canon, ' '), x -> x <> '')) AS tok
            FROM documents),
          freq AS (SELECT tok, count(*) AS n_tok FROM toks GROUP BY 1),
          total AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t_total FROM freq),
          scored AS (
            SELECT doc_id, count(*) AS n_words,
                   sum((t.t_total * 1000000) // f.n_tok) AS sum_micro
            FROM toks JOIN freq f USING (tok), total t
            GROUP BY 1)
          SELECT d.doc_id,
                 CAST(coalesce(s.n_words, 0) AS BIGINT) AS n_words,
                 coalesce(round(s.sum_micro::DOUBLE / s.n_words::DOUBLE, 6), 0.0::DOUBLE) AS rarity
          FROM documents d LEFT JOIN scored s ON d.doc_id = s.doc_id
          ORDER BY d.doc_id"""
    })

  /** The MAINTENANCE-POLICY path ([[graft.ext.TextIndex.maintain]],
    * round 10): the evolve journey plus a `maintain` call whose shard
    * bound (maxShards = 1 against 2 live shards) forces a fold, then
    * serve. Same oracle as ta_bm25_evolve — the hash match pins the
    * policy's compactSmall/compact decisions as pure layout operations
    * (serving results unchanged through whatever action fires). */
  val taBm25Maintain = Q("ta_bm25_maintain",
    (s, dir) => {
      // bounded corpus window, and the SPLIT state (base + appended
      // shard) is the fixture — the append protocol is ta_bm25_evolve's
      // subject; what this query uniquely pins is the POLICY deciding
      // and running the fold (maxShards = 1 forces it) over a
      // tombstoned two-shard index, then serving the folded layout
      val d = docs(s, dir).filter(col("doc_id") < 2000)
      val path = Fixtures.clonedIndex(s, dir, "tindex-even-maint") { p =>
        graft.ext.TextIndex.write(d.filter(col("doc_id") % 2 === 0), p,
          partitions = 1)
        graft.ext.TextIndex.append(d.filter(col("doc_id") % 2 === 1), p,
          partitions = 1)
      }
      Q.withShuffleWidth(s, 4) { cs =>
        graft.ext.TextIndex.delete(
          Q.rebind(d, cs).filter(col("doc_id") % 7 === 3).select("doc_id"), path)
        graft.ext.TextIndex.maintain(cs, path, maxShards = 1, partitions = 1)
        graft.ext.TextIndex.bm25TopK(cs, path, Bm25Terms, 20, Bm25K1, Bm25B)
          .localCheckpoint(true)
      }
    },
    Some(bm25Sql("WHERE doc_id < 2000 AND doc_id % 7 <> 3")))

  val all: Seq[Q] = Seq(taRedact, taPiiAudit, taNgrams, taBm25, taBm25Persisted,
    taBm25Evolve, taBm25Batch, taGopher, taRarity, taBm25Maintain)
}
