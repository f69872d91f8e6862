#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle compare (dev loop only;
not part of the shipped library). Usage:
  python3 tools/check.py <sfDir> <outDir> [query ...]
Reads <outDir>/<name>/ parquet (written by graft.Verify), runs the oracle
SQL from <outDir>/oracle_sql.json in DuckDB against <sfDir> tables, and
compares sorted rows/columns exactly.

IMPORTANT (round-1 lesson): the compare is SCALE-PRESERVING. Both sides
are read as Arrow and stringified with to_pylist() — a Spark
DECIMAL(38,2) value renders '51.20' while DuckDB DOUBLE renders '51.2',
and the driver's hash sees that difference. The old pandas .df() path
collapsed decimals to float64 and masked exactly the defect that turned
29/46 queries red in CORRECTNESS_r01.json. Never compare via pandas.
"""
import duckdb, sys, json, glob, os

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
oracle = json.load(open(f"{outdir}/oracle_sql.json"))


def canon(arrow_table):
    """Sorted-by-name columns -> row tuples of scale-preserving strings,
    sorted: the same canonicalization idea as the driver's hash."""
    cols = sorted(arrow_table.column_names)
    data = {c: arrow_table.column(c).to_pylist() for c in cols}
    n = arrow_table.num_rows
    rows = [tuple(str(data[c][i]) for c in cols) for i in range(n)]
    rows.sort()
    return cols, rows


fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    try:
        mine_t = con.sql(
            f"SELECT * FROM read_parquet('{outdir}/{name}/*.parquet')").arrow()
        ref_t = con.sql(sql).arrow()
    except Exception as e:
        print(f"{name}: ERROR {e}")
        fails += 1
        continue
    mc, mrows = canon(mine_t)
    rc, rrows = canon(ref_t)
    if mc != rc:
        print(f"{name}: COLUMN MISMATCH spark={mc} oracle={rc}")
        fails += 1
        continue
    if len(mrows) != len(rrows):
        print(f"{name}: ROWCOUNT MISMATCH spark={len(mrows)} oracle={len(rrows)}")
        fails += 1
        continue
    if mrows == rrows:
        print(f"{name}: OK ({len(rrows)} rows)")
    else:
        bad = [i for i, (a, b) in enumerate(zip(mrows, rrows)) if a != b]
        print(f"{name}: VALUE MISMATCH on {len(bad)}/{len(rrows)} rows")
        for i in bad[:3]:
            print(f"  spark:  {dict(zip(mc, mrows[i]))}")
            print(f"  oracle: {dict(zip(rc, rrows[i]))}")
        fails += 1
print("FAILURES:", fails)
sys.exit(1 if fails else 0)
