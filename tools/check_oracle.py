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
# DECLARED per-query numeric tolerance (SparkEntry.oracleTolerance, dumped
# by Verify): absolute bound on float cells for the two analyzed
# cross-engine rounding-boundary flips. Absent file / unlisted query =
# exact match, as before.
tol_path = f"{out_dir}/oracle_tolerance.json"
tolerances = json.load(open(tol_path)) if os.path.exists(tol_path) else {}


def close_enough(a, b, tol):
    if a == b:
        return True
    try:
        return abs(float(a) - float(b)) <= tol
    except (TypeError, ValueError):
        return False


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
    tol = tolerances.get(name)

    def norm(tbl):
        rows = []
        for i in range(tbl.num_rows):
            cells = []
            for c in gcols:
                v = tbl.column(c)[i].as_py()
                if tol is not None and isinstance(v, float):
                    # sort key on a coarser grid so a within-tolerance
                    # flip cannot reorder the row match-up
                    cells.append(f"{v:.5f}")
                else:
                    cells.append(str(v))
            rows.append((tuple(cells),
                         tuple(str(tbl.column(c)[i].as_py()) for c in gcols)))
        return [full for _, full in sorted(rows)]
    def key_aligned_ok(got, want, tol):
        # Second-chance alignment for tolerance queries: the 5-decimal
        # sort key above only REDUCES reorder risk — a within-tolerance
        # pair straddling a 1e-5 grid line still sorts the two tables
        # differently and the positional zip then compares mismatched
        # rows. Align on the exact non-float columns instead, then match
        # float cells within each group after a numeric sort.
        import pyarrow as pa
        fcols = [c for c in gcols
                 if (c in got.column_names
                     and pa.types.is_floating(got.schema.field(c).type))
                 or (c in want.column_names
                     and pa.types.is_floating(want.schema.field(c).type))]
        kcols = [c for c in gcols if c not in fcols]

        def groups(tbl):
            d = {}
            for i in range(tbl.num_rows):
                k = tuple(str(tbl.column(c)[i].as_py()) for c in kcols)
                v = tuple(tbl.column(c)[i].as_py() for c in fcols)
                d.setdefault(k, []).append(v)
            return d

        def skey(t):
            return tuple((v is None, 0.0 if v is None else float(v))
                         for v in t)
        G, W = groups(got), groups(want)
        if set(G) != set(W):
            return False
        for k in G:
            a, b = sorted(G[k], key=skey), sorted(W[k], key=skey)
            if len(a) != len(b):
                return False
            for ra, rb in zip(a, b):
                if not all(close_enough(x, y, tol) for x, y in zip(ra, rb)):
                    return False
        return True

    g, w = norm(got), norm(want)
    if len(g) == len(w) and all(
            (a == b) if tol is None else
            (len(a) == len(b) and all(close_enough(x, y, tol)
                                      for x, y in zip(a, b)))
            for a, b in zip(g, w)):
        suffix = "" if tol is None else f" (declared tol {tol})"
        print(f"[ OK ] {name}: {len(g)} rows{suffix}")
    elif tol is not None and len(g) == len(w) and key_aligned_ok(got, want, tol):
        print(f"[ OK ] {name}: {len(g)} rows (declared tol {tol}, key-aligned)")
    else:
        fails += 1
        diff = [(a, b) for a, b in zip(g, w) if a != b][:3]
        print(f"[FAIL] {name}: {len(g)} vs {len(w)} rows; first diffs: {diff}")
sys.exit(1 if fails else 0)
