#!/usr/bin/env bash
# Round-open counterpart of round_close.sh (verdict r10 #3): the driver
# writes BENCH_r{N}.json / CORRECTNESS_r{N}.json / LEAKCHECK.json /
# bench_out.json AFTER the close commit, so round_close.sh structurally
# cannot track them. Running this as the FIRST action of a round commits
# whatever the previous round's driver left behind, closing the loop.
#
# Files are added one at a time: `git add` with MULTIPLE pathspecs is
# all-or-nothing (one unmatched glob aborts the whole add with exit 128),
# which would silently skip the commit in exactly the fresh-round state
# this script exists for.
#
# Usage: scripts/round_open.sh
set -euo pipefail
cd "$(dirname "$0")/.."

for f in BENCH_r*.json CORRECTNESS_r*.json LEAKCHECK.json bench_out.json \
    VERDICT.md ADVICE.md; do
  [ -f "$f" ] && git add -- "$f" || true
done
if ! git diff --cached --quiet; then
  git commit -m "Round open: track previous round's driver artifacts"
fi
git status --short
