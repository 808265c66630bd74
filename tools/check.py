#!/usr/bin/env python3
"""Local stand-in for the driver's t2 correctness gate (NOT part of the
Scala library): run graft.Verify, then execute each oracle SQL in DuckDB
over the same parquet tables and compare values with columns sorted by
name — mirroring the driver's hash compare so mismatches surface before
the round gate.

Usage: python3 tools/check.py [sfDir] [outDir] [--skip-verify]
"""
import json, math, subprocess, sys
from pathlib import Path

import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = Path(sys.argv[2] if len(sys.argv) > 2 else "/tmp/graft_verify")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def run_verify():
    cmd = ["sbt", "-batch", f'runMain graft.Verify {SF_DIR} {OUT}']
    r = subprocess.run(cmd, cwd="/root/repo", capture_output=True, text=True)
    sys.stdout.write("\n".join(l for l in r.stdout.splitlines()
                               if "error" in l.lower() or "[verify]" in l) + "\n")
    if r.returncode != 0:
        print(r.stdout[-3000:], r.stderr[-2000:])
        sys.exit(1)


def norm(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    return v


def compare(name, con, sql):
    got = con.sql(f"SELECT * FROM '{OUT}/{name}/*.parquet'").df()
    exp = con.sql(sql).df()
    got = got[sorted(got.columns)]
    exp = exp[sorted(exp.columns)]
    if list(got.columns) != list(exp.columns):
        return f"SCHEMA got={list(got.columns)} exp={list(exp.columns)}"
    if len(got) != len(exp):
        return f"ROWS got={len(got)} exp={len(exp)}"
    for c in got.columns:
        g, e = got[c].tolist(), exp[c].tolist()
        for i, (a, b) in enumerate(zip(g, e)):
            a, b = norm(a), norm(b)
            if a is None and b is None:
                continue
            if isinstance(a, float) and isinstance(b, float):
                if a != b:
                    return f"VAL col={c} row={i}: {a!r} != {b!r}"
            elif str(a) != str(b):
                return f"VAL col={c} row={i}: {a!r} != {b!r}"
    return None


def main():
    if "--skip-verify" not in sys.argv:
        run_verify()
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    oracle = json.loads((OUT / "oracle_sql.json").read_text())
    # a SPARK_GRAFT_VERIFY_ONLY subset run refreshes only the selected
    # queries' dumps — comparing the rest would diff STALE parquet from
    # an earlier (possibly different-SF) run and print phantom FAILs
    import os
    only = os.environ.get("SPARK_GRAFT_VERIFY_ONLY")
    if only:
        prefixes = tuple(p.strip() for p in only.split(",") if p.strip())
        oracle = {k: v for k, v in oracle.items() if k.startswith(prefixes)}
    n_ok = 0
    for name in sorted(oracle):
        try:
            err = compare(name, con, oracle[name])
        except Exception as ex:
            err = f"EXC {ex}"
        if err:
            print(f"FAIL {name}: {err}")
        else:
            n_ok += 1
            print(f"ok   {name}")
    # queries without oracle: rows-only
    for d in sorted(OUT.iterdir()):
        if d.is_dir() and d.name not in oracle:
            if only and not d.name.startswith(prefixes):
                continue
            n = con.sql(f"SELECT COUNT(*) FROM '{d}/*.parquet'").fetchone()[0]
            print(f"rows {d.name}: {n}")
    print(f"{n_ok}/{len(oracle)} oracle-matched")


if __name__ == "__main__":
    main()
