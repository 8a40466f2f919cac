package graft.queries

import graft.ext.{Dedup, TextAnalysis, TopK}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Third text-analysis batch: positional-index phrase search, a
  * per-domain document cap, and hashed-feature linear classifier
  * scoring — retrieval and curation shapes a corpus pipeline runs at
  * scale. The phrase search is all equality joins over a postings
  * relation; the domain cap reuses the two-phase top-k (no per-domain
  * window sort); the classifier is a broadcast model join + one
  * partial-aggregatable sum.
  */
object TextQueries3 {

  private def docs(s: SparkSession, dir: String) = Tables.table(s, dir, "documents")

  private val canonSql = TextQueries.canonSql

  /** The searched phrase: present at every fixture scale factor
    * (9/3/10 occurrences at sf0.001/0.01/0.1 — the registry spec
    * requires non-empty results at sf0.001 too); within-doc
    * multiplicity is pinned separately in `SpanPhraseSpec`. */
  private[queries] val Phrase = Seq("big", "order", "scan")

  /** Exact phrase search over the positional-postings relation:
    * per-doc occurrence counts of a 3-token phrase via position-
    * adjacency equality joins ([[graft.ext.TextAnalysis.phraseSearch]]).
    * The oracle rebuilds the postings with zipped unnests and runs the
    * same adjacency join. */
  val taPhraseSearch = Q("ta_phrase_search",
    (s, dir) => TextAnalysis.phraseSearch(
        TextAnalysis.positionalPostings(docs(s, dir), "doc_id", "text"), Phrase)
      .groupBy("id")
      .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
      .orderBy("id"),
    Some(s"""WITH t AS (
               SELECT doc_id,
                      list_filter(string_split($canonSql, ' '), x -> x <> '') AS t
               FROM documents),
             p AS (
               SELECT doc_id AS id,
                      unnest(generate_series(1, len(t))) AS pos,
                      unnest(t) AS term
               FROM t WHERE len(t) >= 1)
           SELECT p0.id AS id, count(*) AS n_hits, min(p0.pos) AS first_pos
           FROM p p0
           JOIN p p1 ON p1.id = p0.id AND p1.pos = p0.pos + 1
           JOIN p p2 ON p2.id = p0.id AND p2.pos = p0.pos + 2
           WHERE p0.term = '${Phrase(0)}' AND p1.term = '${Phrase(1)}'
             AND p2.term = '${Phrase(2)}'
           GROUP BY p0.id ORDER BY 1"""))

  /** Phrase search served from the persisted positional index
    * ([[graft.ext.TextIndex.phraseHits]]): build with positions, probe
    * only the phrase terms' stored slivers, same adjacency-join body as
    * the corpus-scan form — and the SAME oracle, so the hash pins the
    * stored positional postings as lossless. */
  val taPhrasePersisted = Q("ta_phrase_persisted",
    (s, dir) =>
      // probes the shared built-once positional index (the serving-vs-
      // build split of Fixtures.indexPath; positions ride the same build)
      graft.ext.TextIndex.phraseHits(
          s, TextQueries2.builtTextIndex(s, dir), Phrase)
        .groupBy("id")
        .agg(count(lit(1)).as("n_hits"), min("pos").as("first_pos"))
        .orderBy("id"),
    taPhraseSearch.oracle)

  private val DomainCap = 10

  /** Per-domain document cap — keep the top `DomainCap` docs per source
    * by token count (longest-first, doc_id tiebreak), the standard
    * "no single domain dominates the corpus" curation rule. Uses the
    * two-phase [[graft.ext.TopK]] (bounded per-partition heaps → tiny
    * merge), so no task ever sorts a whole domain — the shape that
    * survives a domain with a billion pages. The oracle is the
    * row_number window formulation the engine deliberately avoids. */
  val taDomainCap = Q("ta_domain_cap",
    (s, dir) => {
      val d = docs(s, dir).select(col("source"), col("doc_id"),
        TextAnalysis.tokenCount(col("text")).cast("long").as("n_tokens"))
      TopK.perGroupTopK(d, Seq("source"),
          struct((-col("n_tokens")).as("neg_tokens"), col("doc_id"),
            col("n_tokens")),
          DomainCap)
        .select(col("source"), col("pos"),
          col("col.doc_id").as("doc_id"), col("col.n_tokens").as("n_tokens"))
        .orderBy("source", "pos")
    },
    Some(s"""WITH q AS (
               SELECT source, doc_id,
                      CAST(len(list_filter(string_split($canonSql, ' '), x -> x <> ''))
                           AS BIGINT) AS n_tokens
               FROM documents),
             r AS (
               SELECT source, doc_id, n_tokens,
                      row_number() OVER (PARTITION BY source
                        ORDER BY n_tokens DESC, doc_id) AS rn
               FROM q)
           SELECT source, CAST(rn - 1 AS INT) AS pos, doc_id, n_tokens
           FROM r WHERE rn <= $DomainCap ORDER BY source, pos"""))

  private val ClassifierBuckets = 512

  /** Hashed-feature linear classifier scoring — the fastText-shaped
    * APPLY path of a quality classifier at corpus scale: tokens →
    * hashed feature buckets → weight lookup → per-doc margin sum in
    * integer micro units, keep = margin > 0. The weight table here is a
    * deterministic hash-derived FIXTURE standing in for trained
    * parameters (training is out of scope); the operator under test is
    * the serving plumbing — feature hashing, a broadcast model join
    * (the model moves to the tasks, the corpus never shuffles for the
    * lookup), and one partial-aggregatable sum per doc. Integer micro
    * weights keep the margin order-independent and engine-exact. */
  val taClassifierScore = Q("ta_classifier_score",
    (s, dir) => {
      val w = s.range(ClassifierBuckets).select(col("id").as("bucket"),
        (Dedup.tokenHash(concat(lit("w:"), col("id").cast("string"))) % 2001 - 1000)
          .as("w"))
      Dedup.docTokens(docs(s, dir), "doc_id", "text", distinct = false)
        .select(col("id"),
          pmod(Dedup.tokenHash(col("tok")), lit(ClassifierBuckets.toLong)).as("bucket"))
        .join(broadcast(w), "bucket")
        .groupBy("id")
        .agg(count(lit(1)).as("n_feats"), sum("w").as("score_micro"))
        .select(col("id"), col("n_feats"), col("score_micro"),
          (col("score_micro") > 0).as("keep"))
        .orderBy("id")
    },
    Some(s"""WITH toks AS (
               SELECT doc_id AS id,
                      unnest(list_filter(string_split($canonSql, ' '), x -> x <> '')) AS tok
               FROM documents),
             w AS (
               SELECT i AS bucket,
                      (${DedupQueries.portableHash("'w:' || i")} % 2001) - 1000 AS w
               FROM (SELECT unnest(generate_series(0, ${ClassifierBuckets - 1})) AS i)),
             f AS (
               SELECT id, ${DedupQueries.portableHash("tok")} % $ClassifierBuckets AS bucket
               FROM toks)
           SELECT id, count(*) AS n_feats, CAST(sum(w) AS BIGINT) AS score_micro,
                  (CAST(sum(w) AS BIGINT) > 0) AS keep
           FROM f JOIN w USING (bucket)
           GROUP BY 1 ORDER BY id"""))

  /** Per-doc n-gram multiplicity stats: total / distinct / max-count
    * over the doc's n-grams. Two chained hash aggregates — the first
    * (id, gram) group absorbs the shingle fan-out map-side, so the
    * second only ever sees distinct grams per doc. */
  private def repStats(d: org.apache.spark.sql.DataFrame, n: Int) =
    Dedup.docShingles(d, "doc_id", "text", n, distinct = false)
      .groupBy("id", "tok").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(sum("c").as(s"n$n"), count(lit(1)).as(s"d$n"),
        max("c").as(s"top$n"))

  private val Top2MaxPpm = 200000L // Gopher-style: top 2-gram ≤ 20% of 2-grams
  private val Dup3MaxPpm = 300000L // duplicate 3-grams ≤ 30%

  /** Repetition signals (the Gopher repetition filters, token-count
    * form): per document, the most-frequent-2-gram fraction and the
    * duplicate-3-gram fraction, in integer ppm (integral division —
    * exact and order-free cross-engine), plus the keep verdict at the
    * standard thresholds. Boilerplate/spam ("buy now buy now buy now")
    * scores high and is cut before training. Docs need ≥ 3 tokens to
    * have both gram sizes (inner join — same on both sides). */
  val taRepetition = Q("ta_repetition",
    (s, dir) => {
      val d = docs(s, dir)
      repStats(d, 2).join(repStats(d, 3), "id")
        .select(col("id"), col("n2"),
          expr("(top2 * 1000000) DIV n2").as("top2_ppm"),
          col("n3"),
          expr("((n3 - d3) * 1000000) DIV n3").as("dup3_ppm"))
        .withColumn("keep",
          col("top2_ppm") < Top2MaxPpm && col("dup3_ppm") < Dup3MaxPpm)
        .orderBy("id")
    },
    Some {
      def grams(n: Int) =
        s"""SELECT doc_id AS id,
                   unnest(list_transform(generate_series(1, len(t) - ${n - 1}),
                          i -> array_to_string(t[i : i + ${n - 1}], ' '))) AS tok
            FROM (SELECT doc_id,
                         list_filter(string_split($canonSql, ' '), x -> x <> '') AS t
                  FROM documents)"""
      def stats(n: Int) =
        s"""SELECT id, CAST(sum(c) AS BIGINT) AS n$n, count(*) AS d$n,
                   CAST(max(c) AS BIGINT) AS top$n
            FROM (SELECT id, tok, count(*) AS c FROM (${grams(n)}) GROUP BY 1, 2)
            GROUP BY 1"""
      s"""WITH s2 AS (${stats(2)}), s3 AS (${stats(3)})
          SELECT id, n2,
                 CAST((top2 * 1000000) // n2 AS BIGINT) AS top2_ppm,
                 n3,
                 CAST(((n3 - d3) * 1000000) // n3 AS BIGINT) AS dup3_ppm,
                 ((top2 * 1000000) // n2 < $Top2MaxPpm
                   AND ((n3 - d3) * 1000000) // n3 < $Dup3MaxPpm) AS keep
          FROM s2 JOIN s3 USING (id) ORDER BY id"""
    })

  /** Deterministic messy-URL fixture over the documents table — the
    * same page identity arrives under five surface variants keyed by
    * `doc_id % 5` (mixed-case scheme/host + www + default port +
    * tracking param + trailing slash; plain http with a fragment;
    * https with `:443` and duplicate slashes; the clean form; a
    * non-URL line that must canonicalize to NULL). Page identity uses
    * moduli coprime with 5 (site `%3`, path `%7`, id-param `%4`) so
    * canonical COLLISIONS genuinely occur across variants at every
    * scale factor. Spark and SQL forms sit together so they cannot
    * drift. */
  private[queries] def urlFixture: org.apache.spark.sql.Column = {
    val site = concat(lit("site"), (col("doc_id") % 3).cast("string"))
    val pb = (col("doc_id") % 7).cast("string")
    val idp = (col("doc_id") % 4).cast("string")
    when(col("doc_id") % 5 === 0,
      concat(lit("HTTP://WWW."), site, lit(".example.org:80/a/"), pb,
        lit("/?utm_source=feed&id="), idp))
      .when(col("doc_id") % 5 === 1,
        concat(lit("http://"), site, lit(".example.org/a/"), pb,
          lit("?id="), idp, lit("&utm_campaign=x#frag")))
      .when(col("doc_id") % 5 === 2,
        concat(lit("https://"), site, lit(".Example.org:443/b/"), pb, lit("//c/")))
      .when(col("doc_id") % 5 === 3,
        concat(lit("https://"), site, lit(".example.org/b/"), pb, lit("/c")))
      .otherwise(concat(lit("doc "), col("doc_id").cast("string"),
        lit(" has no url")))
  }

  // a def, NOT a val: DedupQueries reads this during ITS init, which
  // taClassifierScore's DedupQueries.portableHash reference can trigger
  // while THIS object is still mid-init — a val would read back null
  // (Scala object-cycle semantics); a literal-only def cannot.
  private[queries] def urlFixtureSql: String =
    """CASE
         WHEN doc_id % 5 = 0 THEN 'HTTP://WWW.site' || CAST(doc_id % 3 AS VARCHAR)
           || '.example.org:80/a/' || CAST(doc_id % 7 AS VARCHAR)
           || '/?utm_source=feed&id=' || CAST(doc_id % 4 AS VARCHAR)
         WHEN doc_id % 5 = 1 THEN 'http://site' || CAST(doc_id % 3 AS VARCHAR)
           || '.example.org/a/' || CAST(doc_id % 7 AS VARCHAR)
           || '?id=' || CAST(doc_id % 4 AS VARCHAR) || '&utm_campaign=x#frag'
         WHEN doc_id % 5 = 2 THEN 'https://site' || CAST(doc_id % 3 AS VARCHAR)
           || '.Example.org:443/b/' || CAST(doc_id % 7 AS VARCHAR) || '//c/'
         WHEN doc_id % 5 = 3 THEN 'https://site' || CAST(doc_id % 3 AS VARCHAR)
           || '.example.org/b/' || CAST(doc_id % 7 AS VARCHAR) || '/c'
         ELSE 'doc ' || CAST(doc_id AS VARCHAR) || ' has no url'
       END"""

  /** URL canonicalization pinned cross-engine ([[graft.ext.Urls]]):
    * the full rule chain (case, www, default ports, duplicate/trailing
    * slashes, fragment, tracking-param drop, param sort, NULL for
    * non-absolute input) re-derived independently in DuckDB SQL over
    * the same fixture — the g1_canon treatment for URLs. */
  val taUrlCanon = Q("ta_url_canon",
    (s, dir) => docs(s, dir)
      .select(col("doc_id"), urlFixture.as("url"))
      .withColumn("canon_url", graft.ext.Urls.canonicalUrl(col("url")))
      .orderBy("doc_id"),
    Some(s"""SELECT doc_id, url, ${graft.ext.Urls.canonicalUrlSql("url")} AS canon_url
             FROM (SELECT doc_id, $urlFixtureSql AS url FROM documents)
             ORDER BY doc_id"""))

  val all: Seq[Q] = Seq(taPhraseSearch, taPhrasePersisted, taDomainCap,
    taClassifierScore, taRepetition, taUrlCanon)
}
