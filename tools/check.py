#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev loop only;
not part of the shipped library). Usage:
  python3 tools/check.py <sfDir> <outDir> [query ...]
Reads <outDir>/<name>/ parquet (written by graft.Verify), runs the oracle
SQL from <outDir>/oracle_sql.json in DuckDB against <sfDir> tables, and
compares sorted rows/columns exactly."""
import duckdb, sys, json, glob, os
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        mine = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").df()
        ref = con.sql(sql).df()
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails += 1
        continue
    if sorted(mine.columns) != sorted(ref.columns):
        print(f"{name}: COLUMN MISMATCH spark={sorted(mine.columns)} oracle={sorted(ref.columns)}")
        fails += 1
        continue
    mine = mine[sorted(mine.columns)].astype(str)
    ref = ref[sorted(ref.columns)].astype(str)
    mine = mine.sort_values(by=list(mine.columns)).reset_index(drop=True)
    ref = ref.sort_values(by=list(ref.columns)).reset_index(drop=True)
    if len(mine) != len(ref):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(mine)} oracle={len(ref)}")
        fails += 1
        continue
    if mine.equals(ref):
        print(f"{name}: OK ({len(ref)} rows)")
    else:
        neq = (mine != ref).any(axis=1)
        print(f"{name}: VALUE MISMATCH on {int(neq.sum())}/{len(ref)} rows")
        print("  spark:", mine[neq].head(3).to_dict("records"))
        print("  oracle:", ref[neq].head(3).to_dict("records"))
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
