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
