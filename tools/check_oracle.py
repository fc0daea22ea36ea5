#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: runs each oracle SQL in
DuckDB against the sf tables and compares (rows+schema) with the parquet the
Verify main dumped. Usage: check_oracle.py <sfDir> <verifyOutDir>."""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"[MISS] {name}: no spark output"); fails += 1; continue
    got = pq.read_table(glob.glob(f"{spark_path}/*.parquet")[0])
    try:
        want = con.execute(sql).fetch_arrow_table()
    except Exception as e:
        print(f"[ERR ] {name}: duckdb: {e}"); fails += 1; continue
    gcols, wcols = sorted(got.column_names), sorted(want.column_names)
    if gcols != wcols:
        print(f"[FAIL] {name}: columns {gcols} != {wcols}"); fails += 1; continue
    def norm(tbl):
        rows = [tuple(str(tbl.column(c)[i].as_py()) for c in gcols)
                for i in range(tbl.num_rows)]
        return sorted(rows)
    g, w = norm(got), norm(want)
    if g == w:
        print(f"[ OK ] {name}: {len(g)} rows")
    else:
        fails += 1
        diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
        print(f"[FAIL] {name}: {len(g)} vs {len(w)} rows; first diffs: {diff}")
sys.exit(1 if fails else 0)
