#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify first
(`SPARK_GRAFT_ONLY=... sbt "runMain graft.Verify <sfDir> <outDir>"`), then
  python3 tools/oracle_check.py <sfDir> <outDir> [names...]
Compares each <outDir>/<name>/ parquet result against the DuckDB oracle in
<outDir>/oracle_sql.json the same way the driver does: columns sorted by
name, row multisets compared as sorted stringified tuples.
"""
import json, sys, glob, os
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for t in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(t)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{t}')")

oracles = json.load(open(f"{out}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    if only and name not in only:
        continue
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"{name}: MISSING spark output")
        fail += 1
        continue
    try:
        spark_rows = con.execute(
            f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").fetchdf()
        oracle_rows = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"{name}: ERR {e}")
        fail += 1
        continue
    s = spark_rows[sorted(spark_rows.columns)]
    o = oracle_rows[sorted(oracle_rows.columns)]
    if sorted(s.columns) != sorted(o.columns):
        print(f"{name}: SCHEMA mismatch {sorted(s.columns)} vs {sorted(o.columns)}")
        fail += 1
        continue
    sm = sorted(map(str, s.itertuples(index=False)))
    om = sorted(map(str, o.itertuples(index=False)))
    ok = len(sm) == len(om) and sm == om
    print(f"{name}: {'OK' if ok else 'MISMATCH'} rows={len(sm)}/{len(om)}")
    if not ok:
        fail += 1
        for a, b in list(zip(sm, om))[:200]:
            if a != b:
                print(f"  spark:  {a}\n  oracle: {b}")
                break
sys.exit(1 if fail else 0)
