#!/usr/bin/env python3
"""Compare engine bench timings against the DuckDB oracle wall-clock.

Usage: python3 tools/bench_compare.py <bench_json> <sfDir> [oracle_sql.json]

Reads the one-line JSON emitted by `graft.Bench`, times each oracle SQL
in DuckDB over the same parquet tables, and prints per-query and total
ratios — the local view of BASELINE.md's "within 2x of DuckDB" bound.
Queries without oracle SQL are reported engine-side only.
"""
import json
import sys
import time
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(bench_path: str, sf_dir: str, oracle_path: str = None) -> int:
    bench = json.loads(Path(bench_path).read_text())
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

    duck = {}
    for name, sql in oracle.items():
        # warm once, time second run (parity with Bench's warmed JVM)
        try:
            con.execute(sql).fetchall()
            t0 = time.time()
            con.execute(sql).fetchall()
            duck[name] = time.time() - t0
        except Exception as e:
            print(f"{name}: duckdb FAIL {str(e)[:80]}")

    rows = []
    for name, eng in bench["queries"].items():
        d = duck.get(name)
        rows.append((name, eng, d, (eng / d) if d and d > 0 else None))
    rows.sort(key=lambda r: -(r[3] or 0))

    print(f"{'query':28s} {'spark':>8s} {'duckdb':>8s} {'ratio':>8s}")
    for name, eng, d, ratio in rows:
        ds = f"{d:8.3f}" if d is not None else "      --"
        rs = f"{ratio:8.1f}" if ratio is not None else "      --"
        print(f"{name:28s} {eng:8.3f} {ds} {rs}")
    oracle_named = [r for r in rows if r[2] is not None]
    te = sum(r[1] for r in oracle_named)
    td = sum(r[2] for r in oracle_named)
    print(f"\noracle-covered total: spark {te:.1f}s vs duckdb {td:.1f}s -> {te/td:.1f}x")
    print(f"engine full total: {bench['value']:.1f}s over {bench.get('n_queries', len(bench['queries']))} queries")
    return 0


if __name__ == "__main__":
    sys.exit(main(*sys.argv[1:]))
