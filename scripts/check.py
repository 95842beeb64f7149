#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet dump (written by `graft.Verify`),
runs the matching oracle SQL from oracle_sql.json in DuckDB over the same
source tables, and compares: schema (column names), row count, and a hash
of the values with columns sorted by name (the driver's documented
comparison). Exits non-zero on any mismatch.
"""
import json, math, sys
from pathlib import Path

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # NOTE: -0.0 is deliberately NOT normalized — the driver's hash
        # distinguishes it, so the local mirror must be exactly as strict.
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(norm(x) for x in v) + "]"
    return str(v)


def table_repr(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return [tuple(norm(r[i]) for i in order) for r in rows]


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    dumped = {d.name for d in Path(out_dir).iterdir() if d.is_dir()}
    # a query that failed in Verify writes no dump dir — that must FAIL
    # the gate, not silently drop out of the comparison
    names = sorted(dumped | set(oracle))
    failures = []
    for name in sorted(set(oracle) - dumped):
        failures.append((name, "oracle entry exists but Spark dump is missing (query failed in Verify?)"))
    names = [n for n in names if n in dumped]
    for name in names:
        try:
            got_rel = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'")
            got_cols = list(got_rel.columns)
            got = got_rel.fetchall()
        except Exception as e:
            failures.append((name, f"spark dump unreadable: {e}"))
            continue
        if name not in oracle:
            print(f"SKIP {name}: no oracle (rows-only check) rows={len(got)}")
            if len(got) == 0:
                failures.append((name, "no oracle AND zero rows"))
            continue
        try:
            exp_rel = con.sql(oracle[name])
            exp_cols = list(exp_rel.columns)
            exp = exp_rel.fetchall()
        except Exception as e:
            failures.append((name, f"oracle SQL failed: {e}"))
            continue
        if sorted(got_cols) != sorted(exp_cols):
            failures.append((name, f"schema mismatch: spark={sorted(got_cols)} oracle={sorted(exp_cols)}"))
            continue
        if len(got) != len(exp):
            failures.append((name, f"row count: spark={len(got)} oracle={len(exp)}"))
            continue
        g, e = table_repr(got_cols, got), table_repr(exp_cols, exp)
        if g != e:
            bad = next(i for i in range(len(g)) if g[i] != e[i])
            failures.append((name, f"value mismatch at row {bad}:\n  spark : {g[bad]}\n  oracle: {e[bad]}"))
            continue
        print(f"OK   {name}: rows={len(got)} cols={len(got_cols)}")
    for name, why in failures:
        print(f"FAIL {name}: {why}")
    print(f"\n{len(names) - len(failures)}/{len(names)} queries match")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
