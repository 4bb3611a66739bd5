#!/usr/bin/env bash
# Compile gate before any source commit (round-13 lesson: a snapshot
# commit containing one uncompiled file zeroed the round's entire
# correctness/bench signal). Usage: tools/precommit.sh [--smoke|--plans]
#   default  : sbt compile + Test/compile must both succeed
#   --smoke  : additionally runs the sf0.001 flagship entry query
#   --plans  : additionally regenerates the plan-fingerprint board at
#              sf0.01 and diffs it against the committed round board —
#              a lost pushdown / strategy flip / new exchange fails
#              here instead of hiding in bench noise (VERDICT r18
#              item 1). Deliberate plan changes: rerun check_plans.py
#              by hand with --allow and commit the regenerated board
#              with a PLANS.md row.
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
if [[ "${1:-}" == "--smoke" ]]; then
  SPARK_GRAFT_ONLY=q1_agg sbt -batch \
    'runMain graft.Verify /root/testdata/sf0.001 /tmp/precommit_smoke'
fi
if [[ "${1:-}" == "--plans" ]]; then
  board=$(ls artifacts/PLAN_BOARD_r*.json | sort -V | tail -1)
  sbt -batch 'runMain graft.tools.DumpPlans /root/testdata/sf0.01 /tmp/precommit_plans.json'
  python3 tools/check_plans.py /tmp/precommit_plans.json "$board"
fi
echo "precommit: green"
