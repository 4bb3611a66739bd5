#!/usr/bin/env python3
"""Chunked, per-query-timed variant of check_oracle.py (VERDICT r15 items 1+7).

Usage: python3 tools/check_oracle_timed.py <sfDir> <verifyOutDir> \
           [--chunk I/N] [--only a,b,c] [--json out.json] [--threads T]

Same three checks as the driver gate (rows + schema + value-equality on
name-sorted columns), plus a measured oracle wall time per query so the
oracle-cost profile becomes a committed artifact. --chunk I/N takes the
I-th of N alphabetical slices (1-based) so quarters can run as parallel
background jobs, each with its own DuckDB connection.
"""
import sys, json, glob, time, argparse

import duckdb

ap = argparse.ArgumentParser()
ap.add_argument("sfdir")
ap.add_argument("outdir")
ap.add_argument("--chunk", default=None, help="I/N alphabetical slice")
ap.add_argument("--only", default=None, help="comma list of query names")
ap.add_argument("--json", default=None, help="write per-query results here")
ap.add_argument("--threads", type=int, default=8)
args = ap.parse_args()

con = duckdb.connect()
con.execute(f"SET threads={args.threads}")
import os
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    # driver testdata ships single-file tables; GenScale output (sf1/
    # sf10) is Spark directory-layout parquet — glob the part files
    path = f"{args.sfdir}/{t}.parquet"
    src = f"{path}/*.parquet" if os.path.isdir(path) else path
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

oracle = json.load(open(f"{args.outdir}/oracle_sql.json"))
names = sorted(oracle)
if args.only:
    want = {s.strip() for s in args.only.split(",") if s.strip()}
    names = [n for n in names if n in want]
if args.chunk:
    i, n = (int(x) for x in args.chunk.split("/"))
    names = [q for k, q in enumerate(names) if k % n == i - 1]

results, fails = [], 0
for name in names:
    t0 = time.time()
    row = {"name": name}
    try:
        exp = con.execute(oracle[name]).fetch_df()
        row["oracle_wall"] = round(time.time() - t0, 3)
    except Exception as e:
        row.update(ok=False, err=f"oracle SQL error: {e}",
                   oracle_wall=round(time.time() - t0, 3))
        print(f"FAIL {name}: oracle SQL error: {e}", flush=True)
        results.append(row); fails += 1
        continue
    files = glob.glob(f"{args.outdir}/{name}/*.parquet")
    if not files:
        row.update(ok=False, err="no spark output")
        print(f"FAIL {name}: no spark output", flush=True)
        results.append(row); fails += 1
        continue
    got = con.execute(f"SELECT * FROM read_parquet({files!r})").fetch_df()
    ec, gc = sorted(exp.columns), sorted(got.columns)
    if ec != gc:
        row.update(ok=False, err=f"columns {gc} != oracle {ec}")
        print(f"FAIL {name}: columns {gc} != oracle {ec}", flush=True)
        results.append(row); fails += 1
        continue
    e = exp[ec].sort_values(ec).reset_index(drop=True)
    g = got[ec].sort_values(ec).reset_index(drop=True)
    if len(e) != len(g):
        row.update(ok=False, err=f"rows {len(g)} != oracle {len(e)}")
        print(f"FAIL {name}: rows {len(g)} != oracle {len(e)}", flush=True)
        results.append(row); fails += 1
        continue
    ok = e.equals(g)
    if not ok:
        ok = True
        for c in ec:
            a, b = e[c], g[c]
            try:
                if not (a.astype("float64").fillna(-9e99)
                        == b.astype("float64").fillna(-9e99)).all():
                    ok = False
            except (ValueError, TypeError):
                if not (a.astype(str) == b.astype(str)).all():
                    ok = False
            if not ok:
                bad = (a.astype(str) != b.astype(str))
                print(f"FAIL {name}: col {c} first diff:\n{e[bad].head(3)}"
                      f"\nvs\n{g[bad].head(3)}", flush=True)
                break
    row.update(ok=ok, rows=len(g))
    if not ok:
        fails += 1
        row["err"] = "value mismatch"
    else:
        print(f"ok   {name}  ({len(g)} rows, oracle {row['oracle_wall']}s)",
              flush=True)
    results.append(row)

if args.json:
    with open(args.json, "w") as f:
        json.dump(results, f, indent=1)
print("ALL OK" if fails == 0 else f"{fails} FAILURES", flush=True)
sys.exit(1 if fails else 0)
