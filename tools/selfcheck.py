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

# Fixture contract (rounds 7 and 8 were each bitten by a silent driver
# fixture regeneration — ts re-encoded NANOS->MICROS, layout flipped
# file<->directory): the expected DuckDB-visible schema per table, plus
# the accepted parquet encodings for events.ts. A regeneration that
# violates any of this fails HERE, loudly, at verify time — not as 15
# red queries with no explanation.
EXPECTED_SCHEMA = {
    "region": {"r_regionkey": "INTEGER", "r_name": "VARCHAR"},
    "nation": {"n_nationkey": "INTEGER", "n_name": "VARCHAR",
               "n_regionkey": "INTEGER"},
    "customer": {"c_custkey": "BIGINT", "c_name": "VARCHAR",
                 "c_nationkey": "INTEGER", "c_acctbal": "DOUBLE",
                 "c_mktsegment": "VARCHAR"},
    "supplier": {"s_suppkey": "BIGINT", "s_name": "VARCHAR",
                 "s_nationkey": "INTEGER", "s_acctbal": "DOUBLE"},
    "part": {"p_partkey": "BIGINT", "p_name": "VARCHAR", "p_brand": "VARCHAR",
             "p_type": "VARCHAR", "p_size": "INTEGER",
             "p_retailprice": "DOUBLE"},
    "orders": {"o_orderkey": "BIGINT", "o_custkey": "BIGINT",
               "o_orderstatus": "VARCHAR", "o_totalprice": "DOUBLE",
               "o_orderdate": "TIMESTAMP", "o_orderpriority": "VARCHAR"},
    "lineitem": {"l_orderkey": "BIGINT", "l_partkey": "BIGINT",
                 "l_suppkey": "BIGINT", "l_linenumber": "INTEGER",
                 "l_quantity": "DOUBLE", "l_extendedprice": "DOUBLE",
                 "l_discount": "DOUBLE", "l_tax": "DOUBLE",
                 "l_returnflag": "VARCHAR", "l_linestatus": "VARCHAR",
                 "l_shipdate": "TIMESTAMP"},
    # ts: BIGINT is the NANOS-era encoding DuckDB surfaces as INT64; the
    # engine loader accepts both (Tables.rawEvents), so both pass here
    "events": {"event_id": "BIGINT", "ts": ("TIMESTAMP", "TIMESTAMP_NS", "BIGINT"),
               "user_id": "BIGINT", "event_type": "VARCHAR",
               "value": "DOUBLE", "props": "VARCHAR"},
    "documents": {"doc_id": "BIGINT", "text": "VARCHAR", "lang": "VARCHAR",
                  "source": "VARCHAR", "n_chars": "BIGINT"},
    "embeddings": {"vec_id": "BIGINT", "embedding": "FLOAT[]",
                   "label": "INTEGER"},
}

# parquet-level encodings of events.ts the engine loader handles: the
# MICROS/NANOS timestamp units. Anything else (MILLIS, INT32 seconds,
# strings) is a NEW fixture generation the loader has never seen.
EVENTS_TS_ACCEPTED = ("MicroSeconds", "NanoSeconds")


def check_fixture_contract(con, sf_dir: str) -> list:
    """Schema/encoding assertions over the fixture tables; returns a
    list of violation strings (empty = contract holds)."""
    bad = []
    for t, expected in EXPECTED_SCHEMA.items():
        p = Path(sf_dir) / f"{t}.parquet"
        glob = f"{p}/*.parquet" if p.is_dir() else str(p)
        if not p.exists():
            bad.append(f"{t}: fixture missing at {p} (file OR directory layout)")
            continue
        try:
            got = dict(con.execute(
                f"DESCRIBE SELECT * FROM read_parquet('{glob}')").df()
                [["column_name", "column_type"]].itertuples(index=False, name=None))
        except Exception as e:
            bad.append(f"{t}: unreadable fixture: {str(e)[:160]}")
            continue
        for c, want in expected.items():
            allowed = want if isinstance(want, tuple) else (want,)
            if c not in got:
                bad.append(f"{t}.{c}: column missing (regenerated fixture dropped it?)")
            elif got[c] not in allowed:
                bad.append(f"{t}.{c}: type {got[c]}, contract allows {allowed}")
        for c in got:
            if c not in expected:
                bad.append(f"{t}.{c}: unexpected new column (contract update needed)")
    # events.ts parquet logical type: the loader branches on MICROS vs
    # NANOS; any other unit would silently mis-decode every time query
    p = Path(sf_dir) / "events.parquet"
    if p.exists():
        glob = f"{p}/*.parquet" if p.is_dir() else str(p)
        try:
            rows = con.execute(
                "SELECT DISTINCT logical_type FROM parquet_schema("
                f"'{glob}') WHERE name = 'ts'").fetchall()
            for (lt,) in rows:
                lt = str(lt)
                if "Timestamp" in lt and not any(u in lt for u in EVENTS_TS_ACCEPTED):
                    bad.append(f"events.ts: parquet logical type {lt} — loader only "
                               f"handles units {EVENTS_TS_ACCEPTED}")
        except Exception as e:
            bad.append(f"events.ts: parquet_schema probe failed: {str(e)[:160]}")
    return bad


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    violations = check_fixture_contract(con, sf_dir)
    for v in violations:
        print(f"FAIL  FIXTURE-CONTRACT {v}")
    if violations:
        print(f"\nfixture contract violated ({len(violations)} findings) — "
              "the driver regenerated fixtures outside the loader's contract; "
              "fix the loader (Tables.scala) and EXPECTED_SCHEMA together")
        return 1
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
    if sys.argv[1] == "--contract":
        # standalone fixture-contract check: selfcheck.py --contract <sfDir>
        vs = check_fixture_contract(duckdb.connect(), sys.argv[2])
        for v in vs:
            print(f"FAIL  FIXTURE-CONTRACT {v}")
        print("contract OK" if not vs else f"{len(vs)} violations")
        sys.exit(1 if vs else 0)
    sys.exit(main(sys.argv[1], sys.argv[2]))
