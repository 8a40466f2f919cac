#!/usr/bin/env python3
"""Compare engine bench timings against the DuckDB oracle wall-clock.

Usage: python3 tools/bench_compare.py <bench_json> <sfDir> [oracle_sql.json] [runs]

Reads the one-line JSON emitted by `graft.Bench`, times each oracle SQL
in DuckDB over the same parquet tables, and prints per-query and total
ratios — the local view of BASELINE.md's "within 2x of DuckDB" bound.
Queries without oracle SQL are reported engine-side only.

Variance handling: each oracle SQL runs `runs` times (default 3) after
one warm-up; the per-query number is the MEDIAN, and the headline is a
ratio RANGE computed from the per-query min/max sums. Motivation: the
g11 recursive-CTE WRatio twin shows 2x run-to-run swings (22.8s vs
47.3s observed same-day), which whipsawed single-run headline ratios
across rounds.
"""
import json
import statistics
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(bench_path: str, sf_dir: str, oracle_path: str = None,
         runs: str = "3") -> int:
    runs = max(1, int(runs))
    bench = json.loads(Path(bench_path).read_text())
    if "per_query_file" in bench and Path(bench["per_query_file"]).exists():
        # round-16 Bench emits the (driver-size-capped) summary line with
        # the full per-query map — and the tier membership — in a sidecar
        # file. Fall back to the sidecar for WHATEVER the compact line
        # lacks: the round-16 compare artifacts silently lost their
        # per-tier rows because only `queries` was backfilled here.
        side = json.loads(Path(bench["per_query_file"]).read_text())
        if isinstance(side, dict) and "queries" in side:
            bench.setdefault("queries", side["queries"])
            if "tiers" in side:
                bench.setdefault("tiers", side["tiers"])
        elif "queries" not in bench:
            bench["queries"] = side
    if oracle_path:
        oracle = json.loads(Path(oracle_path).read_text())
    else:
        # regenerate oracle SQL from the last Verify dump if present
        cands = sorted(Path("/tmp").glob("v*/oracle_sql.json"))
        if not cands:
            print("no oracle_sql.json; pass one explicitly")
            return 2
        oracle = json.loads(cands[-1].read_text())

    con = duckdb.connect()
    con.execute("PRAGMA threads=32")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    # per-query: (median, min, max) over `runs` timed executions
    duck = {}
    for name, sql in oracle.items():
        try:
            con.execute(sql).fetchall()  # warm (parity with Bench's warmed JVM)
            ts = []
            for _ in range(runs):
                t0 = time.time()
                con.execute(sql).fetchall()
                ts.append(time.time() - t0)
            duck[name] = (statistics.median(ts), min(ts), max(ts))
        except Exception as e:
            print(f"{name}: duckdb FAIL {str(e)[:80]}")

    rows = []
    for name, eng in bench["queries"].items():
        d = duck.get(name)
        med = d[0] if d else None
        rows.append((name, eng, d, (eng / med) if med and med > 0 else None))
    rows.sort(key=lambda r: -(r[3] or 0))

    print(f"{'query':28s} {'spark':>8s} {'duck-med':>8s} {'spread':>13s} {'ratio':>7s}")
    for name, eng, d, ratio in rows:
        if d is not None:
            med, lo, hi = d
            ds, ss = f"{med:8.3f}", f"{lo:6.3f}-{hi:6.3f}"
        else:
            ds, ss = "      --", "           --"
        rs = f"{ratio:7.1f}" if ratio is not None else "     --"
        print(f"{name:28s} {eng:8.3f} {ds} {ss} {rs}")

    covered = [r for r in rows if r[2] is not None]
    te = sum(r[1] for r in covered)
    td_med = sum(r[2][0] for r in covered)
    td_min = sum(r[2][1] for r in covered)
    td_max = sum(r[2][2] for r in covered)
    print(f"\noracle-covered total: spark {te:.1f}s vs duckdb median {td_med:.1f}s"
          f" (spread {td_min:.1f}-{td_max:.1f}s over {runs} runs)")
    # ratio RANGE: engine total against the best and worst oracle totals
    print(f"ratio: {te/td_med:.2f}x median  (range {te/td_max:.2f}x-{te/td_min:.2f}x)")
    print(f"engine full total: {bench['value']:.1f}s over {bench.get('n_queries', len(bench['queries']))} queries")

    # per-tier ratios (VERDICT r14 task 7): tier membership comes from
    # the bench artifact (one source of truth — graft.Bench classifies);
    # 147-query grand totals drown a scan-tier regression in VM drift on
    # ~100 floor-bound numbers, so the tier rows are the real signal.
    tiers = bench.get("tiers")
    if tiers:
        print(f"\n{'tier':10s} {'n':>4s} {'spark':>8s} {'duck-med':>9s} "
              f"{'ratio':>7s}  (oracle-covered members only)")
        for tname in ("floor", "lifecycle", "scan"):
            t = tiers.get(tname)
            if not t:
                continue
            members = set(t["queries"])
            cov = [r for r in covered if r[0] in members]
            ts, td = sum(r[1] for r in cov), sum(r[2][0] for r in cov)
            rs = f"{ts/td:7.2f}" if td > 0 else "     --"
            print(f"{tname:10s} {len(cov):4d} {ts:8.1f} {td:9.1f} {rs}")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
