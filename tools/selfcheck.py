#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads <verifyOutDir>/oracle_sql.json (written by graft.Verify), runs each
oracle SQL in DuckDB over the same parquet tables, and compares against
the engine's parquet dumps: columns sorted by name, rows compared in
order, floats exactly (determinism is engineered in-query; any drift is
reported with max abs diff). Queries without oracle SQL get a rows>0
check.
"""
import json
import math
import sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.is_dir():  # Spark-written table (e.g. a ScaleUp output)
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    results = {}
    for qdir in sorted(Path(out_dir).iterdir()):
        if not qdir.is_dir():
            continue
        name = qdir.name
        try:
            eng = con.execute(
                f"SELECT * FROM read_parquet('{qdir}/*.parquet')").df()
        except Exception as e:
            results[name] = f"ENGINE-READ-FAIL {e}"
            continue
        if name not in oracle:
            results[name] = f"rows-only rows={len(eng)}" + (" OK" if len(eng) > 0 else " EMPTY!")
            continue
        try:
            ora = con.execute(oracle[name]).df()
        except Exception as e:
            results[name] = f"ORACLE-SQL-FAIL {str(e)[:160]}"
            continue
        eng = eng[sorted(eng.columns)]
        ora = ora[sorted(ora.columns)]
        if list(eng.columns) != list(ora.columns):
            results[name] = f"SCHEMA-MISMATCH eng={list(eng.columns)} ora={list(ora.columns)}"
            continue
        if len(eng) != len(ora):
            results[name] = f"ROWCOUNT-MISMATCH eng={len(eng)} ora={len(ora)}"
            continue
        mismatch = None
        for c in eng.columns:
            a, b = eng[c], ora[c]
            try:
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    aa, bb = a.astype(float), b.astype(float)
                    bad = ~((aa == bb) | (aa.isna() & bb.isna()))
                    if bad.any():
                        d = (aa - bb).abs().max()
                        mismatch = f"col {c}: {int(bad.sum())} float diffs, maxabs={d}"
                        break
                else:
                    av = a.astype(str).where(~a.isna(), "<NA>")
                    bv = b.astype(str).where(~b.isna(), "<NA>")
                    bad = av != bv
                    if bad.any():
                        i = bad.idxmax()
                        mismatch = f"col {c}: {int(bad.sum())} diffs, first@{i}: {av[i]!r} vs {bv[i]!r}"
                        break
            except Exception as e:
                mismatch = f"col {c}: compare error {e}"
                break
        results[name] = mismatch or f"OK rows={len(eng)}"

    # Scope: oracle_sql.json always carries EVERY declared query, but a
    # name-filtered Verify run only dumps the selection (registry.json).
    reg_path = Path(out_dir) / "registry.json"
    scope = set(json.loads(reg_path.read_text())) if reg_path.exists() else None
    for n in oracle:
        if n not in results and (scope is None or n in scope):
            results[n] = "ENGINE-OUTPUT-MISSING (query failed in Verify?)"

    # Completeness guard (round-7 lesson: 15 erroring queries were simply
    # absent from the report — nothing failed loudly). Every name Verify
    # declared in registry.json must have produced a verdict; absentees
    # are hard failures. verify_failures.json carries the engine-side
    # error message when Verify caught one.
    if reg_path.exists():
        registry = sorted(scope)
        fail_path = Path(out_dir) / "verify_failures.json"
        errs = json.loads(fail_path.read_text()) if fail_path.exists() else {}
        for n in registry:
            if n not in results:
                results[n] = f"NO-VERDICT engine-error: {errs.get(n, 'no dump written')[:160]}"
        # belt-and-braces: a name Verify RECORDED as failed must fail here
        # even if a (stale) dump compared clean
        for n, msg in errs.items():
            if n in results and not results[n].startswith("NO-VERDICT"):
                results[n] = f"ENGINE-ERRORED (stale dump ignored): {msg[:160]}"
    else:
        print("WARN: no registry.json in out dir (old Verify?) — "
              "completeness guard skipped", file=sys.stderr)

    fails = 0
    for name in sorted(results):
        r = results[name]
        ok = r.startswith("OK") or (r.startswith("rows-only") and r.endswith("OK"))
        if not ok:
            fails += 1
        print(f"{'PASS' if ok else 'FAIL'}  {name}: {r}")
    print(f"\n{len(results) - fails}/{len(results)} pass")
    return 1 if fails else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
