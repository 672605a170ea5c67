#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (dev tool only; the
Scala library has no Python dependency).

Usage: python3 tools/check.py <outDir> <sfDir>
  1. expects `sbt "runMain graft.Verify <sfDir> <outDir>"` to have run
  2. registers every parquet table of sfDir in DuckDB
  3. runs each oracle_sql.json entry, compares against outDir/<name>/ parquet
     (columns sorted by name, rows sorted, exact value compare)
"""
import json, sys, glob
import duckdb
import pandas as pd

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].removesuffix(".parquet")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        want = con.execute(sql).fetchdf()
        got = con.execute(
            f"SELECT * FROM '{outdir}/{name}/*.parquet'").fetchdf()
        want = want[sorted(want.columns)]
        got = got[sorted(got.columns)]
        if list(want.columns) != list(got.columns):
            fails.append((name, f"cols {list(got.columns)} != {list(want.columns)}"))
            continue
        ws = want.sort_values(by=list(want.columns), ignore_index=True)
        gs = got.sort_values(by=list(got.columns), ignore_index=True)
        if len(ws) != len(gs):
            fails.append((name, f"rows {len(gs)} != {len(ws)}"))
            continue
        if not ws.equals(gs):
            # pinpoint first diff
            diff = (ws != gs) & ~(ws.isna() & gs.isna())
            bad = diff.any(axis=1)
            idx = bad[bad].index[0] if bad.any() else None
            detail = f"value diff at row {idx}:\n  want {ws.loc[idx].to_dict() if idx is not None else '?'}\n  got  {gs.loc[idx].to_dict() if idx is not None else '?'}"
            fails.append((name, detail))
            continue
        print(f"OK   {name} ({len(gs)} rows)")
    except Exception as e:
        fails.append((name, f"error: {e}"))
# rows-only check for queries without an oracle (mirrors the driver's
# weaker gate): the dump must exist and SHOULD be non-empty.
import os
for d in sorted(os.listdir(outdir)):
    if d in oracle or not os.path.isdir(f"{outdir}/{d}"):
        continue
    try:
        n = con.execute(f"SELECT count(*) FROM '{outdir}/{d}/*.parquet'").fetchone()[0]
        print(f"{'OK  ' if n > 0 else 'WARN'} {d} (rows-only, {n} rows)")
        if n == 0:
            fails.append((d, "rows-only query returned 0 rows"))
    except Exception as e:
        fails.append((d, f"rows-only read error: {e}"))

for name, why in fails:
    print(f"FAIL {name}: {why}")
print(f"\n{len(oracle) - len([f for f in fails if f[0] in oracle])}/{len(oracle)} oracle queries match")
sys.exit(1 if fails else 0)
