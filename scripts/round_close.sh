#!/usr/bin/env bash
# Round-close gate (verdict r9 #6): run the full correctness diff at all
# three SFs + the full bench, then COMMIT the round's driver artifacts so
# they stop landing untracked (a recurring judge note in r7/r8/r9).
#
# Usage: scripts/round_close.sh [round_number]
set -euo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:-}"

sbt -batch compile

for sf in 0.001 0.01 0.1; do
  out="/tmp/verify_out_sf${sf}"
  rm -rf "$out"
  scripts/run.sh graft.Verify "/root/testdata/sf${sf}" "$out" 2>/dev/null | tail -1
  python3 scripts/check.py "/root/testdata/sf${sf}" "$out" | tail -1
done

SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 scripts/run.sh graft.Bench 2>/dev/null | tail -1

# track everything the driver/judge reads at round close
# one file per add: a multi-pathspec `git add` is all-or-nothing (one
# unmatched spec aborts the whole add); COPYCHECK.json is gitignored and
# deliberately not tracked
for f in bench_out.json bench_budget.json; do
  [ -f "$f" ] && git add -- "$f" || true
done
if [ -n "$ROUND" ]; then
  for f in "BENCH_r${ROUND}.json" "CORRECTNESS_r${ROUND}.json" LEAKCHECK.json; do
    [ -f "$f" ] && git add -- "$f" || true
  done
fi
if ! git diff --cached --quiet; then
  git commit -m "Round${ROUND:+-$ROUND} close: correctness + bench artifacts"
fi
git status --short
