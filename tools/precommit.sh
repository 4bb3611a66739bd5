#!/usr/bin/env bash
# Compile gate before any source commit (round-13 lesson: a snapshot
# commit containing one uncompiled file zeroed the round's entire
# correctness/bench signal). Usage: tools/precommit.sh [--smoke]
#   default  : sbt compile + Test/compile must both succeed
#   --smoke  : additionally runs the sf0.001 flagship entry query
set -euo pipefail
cd "$(dirname "$0")/.."
sbt -batch compile Test/compile
if [[ "${1:-}" == "--smoke" ]]; then
  SPARK_GRAFT_ONLY=q1_agg sbt -batch \
    'runMain graft.Verify /root/testdata/sf0.001 /tmp/precommit_smoke'
fi
echo "precommit: green"
