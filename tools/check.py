#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: reads Verify output
(outDir/<name> parquet dirs + oracle_sql.json), runs each oracle SQL in
DuckDB over the same sf tables, and compares row count, schema shape, and
value hash (columns sorted by name, rows sorted by all columns)."""
import sys, json, glob
import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_files = glob.glob(f"{out_dir}/{name}/*.parquet")
    if not spark_files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        o = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL {name}: oracle error {e}"); fails += 1; continue
    s = con.sql(f"SELECT * FROM read_parquet({spark_files!r})").df()
    o = o.reindex(sorted(o.columns), axis=1)
    s = s.reindex(sorted(s.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL {name}: columns oracle={list(o.columns)} spark={list(s.columns)}"); fails += 1; continue
    if len(o) != len(s):
        print(f"FAIL {name}: rows oracle={len(o)} spark={len(s)}"); fails += 1; continue
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    oh = [tuple(str(v) for v in r) for r in o.itertuples(index=False)]
    sh = [tuple(str(v) for v in r) for r in s.itertuples(index=False)]
    if oh != sh:
        diff = [(a, b) for a, b in zip(oh, sh) if a != b][:3]
        print(f"FAIL {name}: value mismatch, first diffs: {diff}"); fails += 1; continue
    print(f"PASS {name}: {len(s)} rows")
print(f"\n{len(oracle) - fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)
