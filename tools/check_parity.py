#!/usr/bin/env python3
"""Parallelism-invariance board (VERDICT r17 item 1).

Usage: python3 tools/check_parity.py <outDirA> <outDirB> <parityJson>

The DuckDB oracle validates ONE engine configuration; this board
proves the full registry is configuration-independent: <outDirA> and
<outDirB> are two graft.Verify dumps of the same sfDir produced under
DIFFERENT core / shuffle-partition counts (e.g. the board config vs
local[2] + spark.sql.shuffle.partitions=17 — odd, non-divisor). For
every query present in either dump the checker compares

  - schema (column name -> type, order-insensitive),
  - row count,
  - an order-independent multiset hash: sum over rows of the DuckDB
    hash of the whole row struct (floats hash by bits, so any
    accumulation-order ULP drift is a loud mismatch, which is the
    point — every registered kernel is integer-exact or
    order-canonicalized and must stay that way).

Writes <parityJson> with one entry per query and exits non-zero on any
divergence or missing output.
"""
import sys, json, os
import duckdb

a_dir, b_dir, out_path = sys.argv[1], sys.argv[2], sys.argv[3]
con = duckdb.connect()

def stats(d, name):
    """(schema dict, row count, multiset hash as str) or None."""
    qdir = os.path.join(d, name)
    files = sorted(
        os.path.join(qdir, f) for f in os.listdir(qdir)
        if f.endswith(".parquet")) if os.path.isdir(qdir) else []
    if not files:
        return None
    schema = {r[0]: r[1] for r in con.execute(
        f"DESCRIBE SELECT * FROM read_parquet({files!r})").fetchall()}
    n, h = con.execute(
        f"SELECT count(*), sum(hash(t)) FROM "
        f"(SELECT t FROM read_parquet({files!r}) t)").fetchone()
    return schema, int(n), str(h)

names = sorted(
    {e for d in (a_dir, b_dir) for e in os.listdir(d)
     if os.path.isdir(os.path.join(d, e))})
board, fails = {}, 0
for name in names:
    a, b = stats(a_dir, name), stats(b_dir, name)
    if a is None or b is None:
        board[name] = {"equal": False,
                       "err": f"missing output in {'A' if a is None else 'B'}"}
        print(f"FAIL {name}: missing output")
        fails += 1
        continue
    (sa, na, ha), (sb, nb, hb) = a, b
    entry = {"rows_a": na, "rows_b": nb, "hash_a": ha, "hash_b": hb,
             "schema_match": sa == sb, "rows_match": na == nb,
             "hash_match": ha == hb}
    entry["equal"] = (entry["schema_match"] and entry["rows_match"]
                      and entry["hash_match"])
    board[name] = entry
    if not entry["equal"]:
        why = ("schema" if not entry["schema_match"] else
               "rows" if not entry["rows_match"] else "hash")
        print(f"FAIL {name}: {why} diverges "
              f"(rows {na}/{nb}, hash {ha}/{hb})")
        fails += 1
    else:
        print(f"ok   {name}  ({na} rows)")

summary = {"queries": len(names), "equal": len(names) - fails,
           "diverged": fails, "per_query": board}
json.dump(summary, open(out_path, "w"), indent=1, sort_keys=True)
print(f"{len(names) - fails}/{len(names)} configuration-invariant"
      + ("" if fails == 0 else f" — {fails} DIVERGED"))
sys.exit(1 if fails else 0)
