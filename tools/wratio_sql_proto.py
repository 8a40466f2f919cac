#!/usr/bin/env python3
"""Prototype/parity-test for the DuckDB WRatio oracle fragment.

Builds the same SQL text that graft.queries.WRatioSql generates (keep the
two in sync — the Scala side is the one the driver runs), executes it
over the committed golden pairs, and compares against tools/wratio_ref.py.

Usage: python3 tools/wratio_sql_proto.py [N]

With N, additionally sweeps N seeded-random pairs (token phrases and
dense char-soup) through both implementations — the fuzz half of the
parity pin (the committed goldens are the fixed half).
"""
import random
import sys
from pathlib import Path

import duckdb

sys.path.insert(0, str(Path(__file__).parent))
import wratio_ref as W


def wratio_ctes(pairs: str) -> str:
    """CTE chain mapping {pairs}(pid, a, b) -> wr_final(pid, wr).

    a and b must be non-null; b non-empty per the engine's sim-target
    guard (empty-target pairs must be excluded by the caller, as the
    engine scores them 0 without calling wratio).
    """
    return f"""
wr_tok AS (
  -- inputs capped to 512 chars, mirrors graft.core.Fuzz.MaxLen
  SELECT pid, a, b,
    list_filter(string_split(a, ' '), x -> x <> '') AS wa,
    list_filter(string_split(b, ' '), x -> x <> '') AS wb
  FROM (SELECT pid, left(a, 512) AS a, left(b, 512) AS b FROM {pairs})
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


def rand_pairs(n):
    rng = random.Random(424242)
    toks = ["small", "ring", "grand", "hotel", "st", "kl", "a", "bb", "plaza",
            "x", "north", "1", "22", "anzac", "q"]
    out = []
    while len(out) < n:
        out.append((" ".join(rng.choice(toks) for _ in range(rng.randint(1, 7))),
                    " ".join(rng.choice(toks) for _ in range(rng.randint(1, 7)))))
        ca = "".join(rng.choice("abc x") for _ in range(rng.randint(1, 40))).strip()
        cb = "".join(rng.choice("abc x") for _ in range(rng.randint(1, 40))).strip()
        if ca and cb:
            out.append((" ".join(ca.split()), " ".join(cb.split())))
    return out[:n]


def main() -> int:
    golden = Path(__file__).parent.parent / "src/test/resources/wratio_golden.tsv"
    rows = [ln.split("\t") for ln in golden.read_text().splitlines()[1:]]
    if len(sys.argv) > 1:
        rows += [[a, b] for a, b in rand_pairs(int(sys.argv[1]))]
    con = duckdb.connect()
    con.execute("CREATE TABLE pairs(pid BIGINT, a VARCHAR, b VARCHAR)")
    exp = {}
    for i, f in enumerate(rows):
        a, b = f[0], f[1]
        con.execute("INSERT INTO pairs VALUES (?, ?, ?)", [i, a, b])
        exp[i] = W.wratio(a, b)
    sql = "WITH RECURSIVE " + wratio_ctes("pairs")[1:] + "\nSELECT pid, wr FROM wr_final ORDER BY pid"
    got = dict(con.execute(sql).fetchall())
    bad = 0
    for i, f in enumerate(rows):
        g = got.get(i)
        if g is None or abs(g - exp[i]) > 1e-12:
            bad += 1
            print(f"MISMATCH pid={i} a={f[0]!r} b={f[1]!r} sql={g} ref={exp[i]}")
    print(f"{len(rows) - bad}/{len(rows)} exact")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
