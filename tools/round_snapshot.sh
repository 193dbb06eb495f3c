#!/bin/sh
# Round-end evidence snapshot: stage and commit every bench/correctness
# artifact so the round's numbers are IN history when the judge reads it
# (the r7–r10 verdicts each flagged untracked BENCH_r*/CORRECTNESS_r*
# files — this script makes the staging structural instead of a manual
# step that keeps being forgotten).
#
# Usage: tools/round_snapshot.sh [message]
set -e
cd "$(dirname "$0")/.."
# r14 lesson: the round-close commit armed PlanGoldenSpec with 13 new
# headline queries and never fired it, shipping a red sbt test. Run the
# (fast, single-suite) gate here and refuse to snapshot on failure.
echo "[round-snapshot] running PlanGoldenSpec gate..."
if ! sbt -batch "testOnly graft.PlanGoldenSpec" >/tmp/round_snapshot_gate.log 2>&1; then
  echo "[round-snapshot] REFUSING to commit: PlanGoldenSpec failed." >&2
  grep -E "missing from golden|plan-shape drift|\*\*\* FAILED" \
    /tmp/round_snapshot_gate.log | head -20 >&2 || true
  echo "[round-snapshot] full log: /tmp/round_snapshot_gate.log" >&2
  exit 1
fi
echo "[round-snapshot] PlanGoldenSpec green."
git add -A -- BENCH_r*.json CORRECTNESS_r*.json BENCH_LOCAL.json \
  BENCH_LOCAL_partial.json BENCH_SCALE.json LEAKCHECK.json COPYCHECK.json \
  2>/dev/null || true
if git diff --cached --quiet; then
  echo "[round-snapshot] nothing to commit (artifacts already in history)"
else
  git commit -m "${1:-round evidence snapshot: bench + correctness artifacts}"
  echo "[round-snapshot] committed:"
  git show --stat --oneline -s HEAD
fi
