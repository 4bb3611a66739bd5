#!/usr/bin/env python3
"""Plan-fingerprint regression checker (VERDICT r18 item 1).

Diffs two plan boards produced by `graft.tools.DumpPlans` and fails on
any unexplained signature change, so a lost pushdown, a
broadcast->sort-merge flip, or a new exchange from an innocuous
refactor surfaces as a named per-query diff instead of hiding inside
bench-window noise.

Usage:
  python3 tools/check_plans.py NEW_BOARD OLD_BOARD [--allow q1,q2,...]

Semantics:
  - a query present in both boards with a different signature is a
    REGRESSION unless named in --allow (changes made deliberately this
    round get allowed here AND a PLANS.md row explaining them);
  - a query present only in NEW is reported as added (not a failure —
    new operators land every round);
  - a query present only in OLD is a failure unless allowed (operators
    must not silently vanish);
  - a query whose signature is {"error": ...} in NEW is a failure.

Exit 0 = no unexplained diffs. Exit 1 otherwise.
"""
import argparse
import json
import sys


def main() -> int:
    ap = argparse.ArgumentParser(
        description=__doc__,
        formatter_class=argparse.RawDescriptionHelpFormatter)
    ap.add_argument("new_board")
    ap.add_argument("old_board")
    ap.add_argument("--allow", default="", metavar="q1,q2,...",
                    help="comma list of queries whose signature diff / "
                         "removal is deliberate this round")
    ns = ap.parse_args()
    allow = {q.strip() for q in ns.allow.split(",") if q.strip()}
    new = json.load(open(ns.new_board))
    old = json.load(open(ns.old_board))

    failures = 0

    def fail(msg: str) -> None:
        nonlocal failures
        failures += 1
        print(f"FAIL {msg}")

    for q in sorted(new):
        if "error" in new[q]:
            fail(f"{q}: signature errored: {new[q]['error']}")
    added = sorted(set(new) - set(old))
    for q in added:
        print(f"ADDED {q}")
    for q in sorted(set(old) - set(new)):
        if q in allow:
            print(f"ALLOWED removed {q}")
        else:
            fail(f"{q}: present in old board, missing from new")

    changed = []
    for q in sorted(set(new) & set(old)):
        if new[q] == old[q]:
            continue
        fields = []
        for k in sorted(set(new[q]) | set(old[q])):
            a, b = old[q].get(k), new[q].get(k)
            if a != b:
                fields.append(f"  {k}: {a} -> {b}")
        detail = f"{q}:\n" + "\n".join(fields)
        if q in allow:
            print(f"ALLOWED {detail}")
        else:
            changed.append(q)
            fail(detail)

    same = len(set(new) & set(old)) - len(changed) - len(
        [q for q in set(new) & set(old) if q in allow and new[q] != old[q]])
    print(f"\n{same} unchanged, {len(added)} added, "
          f"{len(changed)} unexplained changes, {failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main())
