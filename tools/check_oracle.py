#!/usr/bin/env python3
"""Local simulation of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [boardJson]

For each query in <out>/oracle_sql.json: run the SQL in DuckDB with views
named after the test tables, load the Spark parquet result, sort columns
by name and rows by value, and compare multisets.

With [boardJson], additionally append per-query results in the driver's
CORRECTNESS shape to that file (merging with existing content) — the
LOCAL board gen_coverage.py folds so a new query verified locally does
not dangle as "pending" until the next driver round.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
board_path = sys.argv[3] if len(sys.argv) > 3 else None
board = {}
if board_path and os.path.exists(board_path):
    board = json.load(open(board_path))

def record(name, ok, nrows, err=None):
    if board_path:
        board[name] = {"rows_match": ok, "schema_match": ok,
                       "hash_match": ok, "spark_rows": nrows,
                       "oracle_rows": nrows, "err": err}
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata ships single-file tables; GenScale output (sf1/
    # sf10) is Spark directory-layout parquet — glob the part files
    path = f"{sfdir}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetch_df()
    except Exception as e:
        print(f"FAIL {name}: oracle SQL error: {e}")
        record(name, False, 0, f"oracle SQL error: {e}"[:200])
        fails += 1
        continue
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output")
        record(name, False, 0, "no spark output")
        fails += 1
        continue
    got = con.execute(
        f"SELECT * FROM read_parquet({files!r})").fetch_df()
    ec = sorted(exp.columns)
    gc = sorted(got.columns)
    if ec != gc:
        print(f"FAIL {name}: columns {gc} != oracle {ec}")
        record(name, False, len(got), "schema mismatch")
        fails += 1
        continue
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    g = got[ec].sort_values(ec).reset_index(drop=True)
    if len(e) != len(g):
        print(f"FAIL {name}: rows {len(g)} != oracle {len(e)}")
        record(name, False, len(g), "row count mismatch")
        fails += 1
        continue
    if not e.equals(g):
        # dtype-tolerant compare
        import pandas as pd
        eq = True
        for c in ec:
            a, b = e[c], g[c]
            try:
                if not (a.astype("float64").fillna(-9e99) == b.astype("float64").fillna(-9e99)).all():
                    eq = False
            except (ValueError, TypeError):
                if not (a.astype(str) == b.astype(str)).all():
                    eq = False
            if not eq:
                bad = (a.astype(str) != b.astype(str))
                print(f"FAIL {name}: col {c} first diff:\n{e[bad].head(3)}\nvs\n{g[bad].head(3)}")
                break
        if not eq:
            record(name, False, len(g), "value mismatch")
            fails += 1
            continue
        print(f"ok   {name}  ({len(g)} rows, value-equal after dtype coercion)")
        record(name, True, len(g))
        continue
    print(f"ok   {name}  ({len(g)} rows)")
    record(name, True, len(g))
if board_path:
    json.dump(board, open(board_path, "w"), indent=1, sort_keys=True)
print("ALL OK" if fails == 0 else f"{fails} FAILURES")
sys.exit(1 if fails else 0)
