package graft.queries

/** DuckDB-side WRatio — the oracle's independent implementation of F14
  * (`graft.core.Fuzz`), expressed as a single-statement SQL CTE chain so
  * the driver's plain `execute(sql)` oracle can hash-check the flagship
  * forward-geocode queries (g8/g9) instead of a rows-only pass.
  *
  * Shape: every WRatio component — base/token_sort/token_set ratios and
  * every partial-ratio window — reduces to `ratio(s1, s2) =
  * 200·LCS/(|s1|+|s2|)` over a derived string pair, so the chain (1)
  * expands each (query, candidate) pair into its component string-pair
  * tasks, (2) computes LCS once per DISTINCT task pair with a recursive
  * anti-diagonal wavefront (diagonal `d` depends only on diagonals `d-1`
  * and `d-2`, so each recursion step is one vectorized `list_transform`
  * — no sequential inner loop, |s1|+|s2| steps total), and (3) folds the
  * component maxima through the published length-ratio weighting.
  *
  * Numeric parity: both engines compute `200.0 * lcs / (n+m)` and the
  * same left-associated double products/maxima, so scores are
  * bit-identical, not approximately equal.
  *
  * Parity is pinned three ways: the Scala engine and an independent
  * Python reference (`tools/wratio_ref.py`, classic DP, no shared code)
  * agree on the committed golden vectors
  * (`src/test/resources/wratio_golden.tsv`, `FuzzSpec`), and this SQL
  * agrees with the Python reference on the same vectors
  * (`tools/wratio_sql_proto.py` — keep that prototype textually in sync
  * with [[ctes]]).
  */
object WRatioSql {

  /** `Norm.canon` over an arbitrary SQL expression (DuckDB dialect). */
  def canonOf(expr: String): String =
    s"""trim(lower(regexp_replace(regexp_replace(coalesce($expr, ''), '[^[:alnum:][:space:]]', ' ', 'g'), '\\s+', ' ', 'g')))"""

  /** `Norm.normCol` (F2 — query-text normalization: lowercase, punct
    * minus hyphen → space, collapse runs) over an arbitrary SQL
    * expression. The translate target is all-spaces, then runs collapse;
    * the doubled '' is SQL escaping for the single quote in the
    * punctuation set. */
  def normOf(expr: String): String = {
    val punct = """!"$%&''()*+,./:;<=>?@[\]^_`{|}~#"""
    val spaces = " " * (punct.length - 1) // '' counts as ONE char
    s"""trim(regexp_replace(translate(lower(coalesce($expr, '')), '$punct', '$spaces'), '\\s+', ' ', 'g'))"""
  }

  /** CTE chain mapping `pairsRel(pid, a, b)` → `wr_final(pid, wr)`.
    * Must be spliced into a `WITH RECURSIVE` list. `a`/`b` must be
    * non-null; callers exclude empty-target pairs (the engine scores
    * them 0 without calling wratio). `coalesce(array_to_string(...))`
    * everywhere: DuckDB 1.0 stringifies an EMPTY list to NULL, and a
    * NULL token-join would otherwise poison the concatenations. */
  def ctes(pairsRel: String): String = s"""
wr_tok AS (
  -- inputs capped to Fuzz.MaxLen chars, mirroring the engine's
  -- pathological-length guard (part of the F14 definition)
  SELECT pid, a, b,
    list_filter(string_split(a, ' '), x -> x <> '') AS wa,
    list_filter(string_split(b, ' '), x -> x <> '') AS wb
  FROM (SELECT pid, left(a, ${graft.core.Fuzz.MaxLen}) AS a,
               left(b, ${graft.core.Fuzz.MaxLen}) AS b FROM $pairsRel)
),
wr_tok2 AS (
  SELECT pid, a, b,
    coalesce(array_to_string(list_sort(wa), ' '), '') AS sa_sorted,
    coalesce(array_to_string(list_sort(wb), ' '), '') AS sb_sorted,
    coalesce(array_to_string(list_sort(list_distinct(list_filter(wa, x -> list_contains(wb, x)))), ' '), '') AS sect,
    coalesce(array_to_string(list_sort(list_distinct(list_filter(wa, x -> NOT list_contains(wb, x)))), ' '), '') AS da,
    coalesce(array_to_string(list_sort(list_distinct(list_filter(wb, x -> NOT list_contains(wa, x)))), ' '), '') AS db,
    coalesce(array_to_string(list_sort(list_distinct(wa)), ' '), '') AS sa_dset,
    coalesce(array_to_string(list_sort(list_distinct(wb)), ' '), '') AS sb_dset,
    CASE WHEN least(length(a), length(b)) = 0 THEN 0.0
         ELSE greatest(length(a), length(b))::DOUBLE / least(length(a), length(b)) END AS len_ratio
  FROM wr_tok
),
wr_prep AS (
  SELECT *,
    CASE WHEN sect = '' THEN da WHEN da = '' THEN sect ELSE sect || ' ' || da END AS ab,
    CASE WHEN sect = '' THEN db WHEN db = '' THEN sect ELSE sect || ' ' || db END AS ba,
    (sect <> '') AS has_inter
  FROM wr_tok2
),
wr_stasks AS (
  SELECT pid, 'base' AS variant, a AS s1, b AS s2 FROM wr_prep
  UNION ALL SELECT pid, 'tok', sa_sorted, sb_sorted FROM wr_prep WHERE len_ratio < 1.5
  UNION ALL SELECT pid, 'tok', ab, ba FROM wr_prep WHERE len_ratio < 1.5
  UNION ALL SELECT pid, 'tok', sect, ab FROM wr_prep WHERE len_ratio < 1.5
  UNION ALL SELECT pid, 'tok', sect, ba FROM wr_prep WHERE len_ratio < 1.5
),
wr_wsrc AS (
  SELECT pid, 'part' AS variant,
         CASE WHEN length(a) <= length(b) THEN a ELSE b END AS s,
         CASE WHEN length(a) <= length(b) THEN b ELSE a END AS l
  FROM wr_prep WHERE len_ratio >= 1.5
  UNION ALL
  SELECT pid, 'ptok',
         CASE WHEN length(sa_sorted) <= length(sb_sorted) THEN sa_sorted ELSE sb_sorted END,
         CASE WHEN length(sa_sorted) <= length(sb_sorted) THEN sb_sorted ELSE sa_sorted END
  FROM wr_prep WHERE len_ratio >= 1.5
  UNION ALL
  SELECT pid, 'ptok',
         CASE WHEN length(sa_dset) <= length(sb_dset) THEN sa_dset ELSE sb_dset END,
         CASE WHEN length(sa_dset) <= length(sb_dset) THEN sb_dset ELSE sa_dset END
  FROM wr_prep WHERE len_ratio >= 1.5 AND NOT has_inter
),
wr_wtasks AS (
  SELECT pid, variant, s AS s1,
         substr(l, greatest(0, i) + 1,
                least(length(l), i + length(s)) - greatest(0, i)) AS s2
  FROM (SELECT pid, variant, s, l,
               unnest(generate_series(-(length(s) - 1), length(l) - 1)) AS i
        FROM wr_wsrc WHERE length(s) > 0)
),
wr_tasks AS (SELECT * FROM wr_stasks UNION ALL SELECT * FROM wr_wtasks),
wr_uniq AS (SELECT DISTINCT s1, s2 FROM wr_tasks),
wr_wave AS (
  SELECT s1, s2, length(s1) AS n, length(s2) AS m, 1 AS d,
         list_transform(generate_series(1, length(s1)), x -> 0) AS cur,
         list_transform(generate_series(1, length(s1)), x -> 0) AS prv
  FROM wr_uniq WHERE length(s1) > 0 AND length(s2) > 0
  UNION ALL
  SELECT s1, s2, n, m, d + 1,
    list_transform(generate_series(1, n), i ->
      CASE WHEN d + 1 - i BETWEEN 1 AND m THEN
        CASE WHEN substr(s1, i, 1) = substr(s2, d + 1 - i, 1)
          THEN coalesce(prv[i - 1], 0) + 1
          ELSE greatest(coalesce(cur[i - 1], 0), coalesce(cur[i], 0))
        END
      ELSE 0 END) AS cur,
    cur AS prv
  FROM wr_wave WHERE d < n + m
),
wr_lcs AS (
  SELECT s1, s2, cur[n] AS lcs FROM wr_wave WHERE d = n + m
  UNION ALL
  SELECT s1, s2, 0 FROM wr_uniq WHERE length(s1) = 0 OR length(s2) = 0
),
wr_r AS (
  SELECT t.pid, t.variant,
         CASE WHEN length(t.s1) + length(t.s2) = 0 THEN 100.0
              ELSE 200.0 * l.lcs / (length(t.s1) + length(t.s2)) END AS r
  FROM wr_tasks t JOIN wr_lcs l ON t.s1 = l.s1 AND t.s2 = l.s2
),
wr_agg AS (
  SELECT pid,
         max(CASE WHEN variant = 'base' THEN r END) AS base_r,
         max(CASE WHEN variant = 'tok' THEN r END) AS tok_r,
         max(CASE WHEN variant = 'part' THEN r END) AS part_r,
         max(CASE WHEN variant = 'ptok' THEN r END) AS ptok_r
  FROM wr_r GROUP BY pid
),
wr_final AS (
  SELECT p.pid,
    CASE WHEN length(p.a) = 0 OR length(p.b) = 0 THEN 0.0
         WHEN p.len_ratio < 1.5 THEN greatest(g.base_r, 0.95 * g.tok_r)
         ELSE greatest(
           greatest(g.base_r,
                    (CASE WHEN p.len_ratio < 8.0 THEN 0.9 ELSE 0.6 END) * g.part_r),
           0.95 * (CASE WHEN p.len_ratio < 8.0 THEN 0.9 ELSE 0.6 END) *
             (CASE WHEN p.has_inter THEN 100.0 ELSE coalesce(g.ptok_r, 0.0) END))
    END AS wr
  FROM wr_prep p JOIN wr_agg g USING (pid)
)"""
}
