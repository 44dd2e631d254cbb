#!/usr/bin/env bash
# Interleaved worktree A/B (the BASELINE.md receipt discipline):
# alternate fresh ab_gate.py processes between a base worktree (A) and
# the working tree (B), N rounds each, so ambient drift hits both arms
# equally. Usage: ab_worktree.sh <base_worktree_dir> <rounds> gate...
set -euo pipefail
BASE="$1"; ROUNDS="$2"; shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
# ADVICE r14: arm A always runs THE WORKING TREE's ab_gate.py (a
# pre-ab_gate base revision lacks the script) pointed at the base
# checkout via AB_GATE_ROOT; stderr goes to a log instead of /dev/null
# so a failing arm leaves a diagnostic rather than a silent abort.
ERRLOG="${AB_WORKTREE_ERRLOG:-/tmp/ab_worktree_stderr.log}"
run_A() {
  local r="$1"; shift
  echo "== round $r arm A (base) =="
  (cd "$BASE" && AB_GATE_ROOT="$BASE" python "$REPO/scripts/ab_gate.py" \
      "$@" 2>>"$ERRLOG" | tail -1)
}
run_B() {
  local r="$1"; shift
  echo "== round $r arm B (working tree) =="
  (cd "$REPO" && python scripts/ab_gate.py "$@" 2>>"$ERRLOG" | tail -1)
}
# r15: ping-pong arm order (A,B / B,A / A,B ...) — with a fixed order,
# ambient that ramps WITHIN each round lands systematically on the
# second arm (measured: the control gate read 1.3x on arm B across two
# fixed-order batches while interleaved medians disagreed).
for i in $(seq 1 "$ROUNDS"); do
  if [ $((i % 2)) -eq 1 ]; then
    run_A "$i" "$@" --runs=3
    run_B "$i" "$@" --runs=3
  else
    run_B "$i" "$@" --runs=3
    run_A "$i" "$@" --runs=3
  fi
done
