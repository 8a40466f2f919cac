package graft.queries

import graft.core.Bpe

/** DuckDB twin of [[graft.core.Bpe]]: replays the committed merges
  * fixture in pure SQL via a recursive CTE, so `ta_bpe_*` results are
  * hash-checked against an INDEPENDENT replay of the encode loop — the
  * same cross-engine-twin discipline as [[WRatioSql]].
  *
  * Encoding trick: a word's token sequence is one VARCHAR with a
  * `chr(31)` unit separator at every boundary (`␟t␟a␟b␟`), so
  * "merge pair (l,r)" is `replace(state, '␟l␟r␟', '␟lr␟')`. One
  * replace() call merges the left-to-right non-overlapping STRING
  * occurrences; back-to-back pair occurrences share a separator char
  * and survive one round — but the pair then still has the minimum
  * rank, so the next recursion step picks it again. This fixpoint
  * equals the canonical "merge ALL occurrences of the min-rank pair"
  * loop because a merge can only create pairs involving the NEW token,
  * whose merges were necessarily learned later (higher rank) — nothing
  * can preempt the in-flight pair. Verified against the reference
  * encoder over the whole corpus vocabulary + adversarial repeats
  * (aaaa, ababab, …) in BpeSpec and tools/gen_bpe_merges.py.
  *
  * The recursion is per DISTINCT word (the corpus vocabulary), never
  * per occurrence — the same dictionary-shape the Scala side's word
  * cache exploits.
  */
object BpeSql {

  private val mergesValues: String = Bpe.merges.zipWithIndex
    .map { case ((a, b), i) => s"('$a','$b',$i)" }.mkString(", ")

  /** Word extraction matching [[Bpe.words]] (lowercase, `[^a-z0-9]+`). */
  def wordsOf(textExpr: String): String =
    s"list_filter(regexp_split_to_array(lower(coalesce($textExpr, '')), '[^a-z0-9]+'), x -> x <> '')"

  /** CTE chain (for splicing after `WITH RECURSIVE`) defining
    * `wtok(word, wtok)` — BPE token count per distinct corpus word —
    * and `dw(doc_id, word)` — per-doc word occurrences. */
  val wordTokCtes: String =
    s"""mg(lhs, rhs, rank) AS (VALUES $mergesValues),
       mp AS (SELECT chr(31)||lhs||chr(31)||rhs||chr(31) AS pat,
                     chr(31)||lhs||rhs||chr(31) AS rep, rank FROM mg),
       bpe_words AS (SELECT DISTINCT unnest(${wordsOf("text")}) AS word
                     FROM documents),
       rec(word, state) AS (
         SELECT word, chr(31) || regexp_replace(word, '(.)', '\\1' || chr(31), 'g')
         FROM bpe_words
         UNION ALL
         SELECT word, (SELECT replace(rec.state, m.pat, m.rep) FROM mp m
                       WHERE contains(rec.state, m.pat) ORDER BY m.rank LIMIT 1)
         FROM rec
         WHERE EXISTS (SELECT 1 FROM mp m WHERE contains(rec.state, m.pat))),
       wtok AS (
         SELECT word,
                CAST(length(state) - length(replace(state, chr(31), '')) - 1 AS INT) AS wtok
         FROM rec
         WHERE NOT EXISTS (SELECT 1 FROM mp m WHERE contains(rec.state, m.pat))),
       dw AS (SELECT doc_id, unnest(${wordsOf("text")}) AS word FROM documents),
       doc_bpe AS (
         SELECT d.doc_id, CAST(coalesce(s.n, 0) AS INT) AS n_bpe
         FROM documents d
         LEFT JOIN (SELECT doc_id, sum(wtok) AS n FROM dw JOIN wtok USING (word)
                    GROUP BY doc_id) s USING (doc_id))"""
}
