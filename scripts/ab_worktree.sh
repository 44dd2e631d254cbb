#!/usr/bin/env bash
# Interleaved worktree A/B (the BASELINE.md receipt discipline):
# alternate fresh ab_gate.py processes between a base worktree (A) and
# the working tree (B), N rounds each, so ambient drift hits both arms
# equally. Usage: ab_worktree.sh <base_worktree_dir> <rounds> gate...
set -euo pipefail
BASE="$1"; ROUNDS="$2"; shift 2
REPO="$(cd "$(dirname "$0")/.." && pwd)"
for i in $(seq 1 "$ROUNDS"); do
  echo "== round $i arm A (base) =="
  (cd "$BASE" && python scripts/ab_gate.py "$@" --runs=3 2>/dev/null | tail -1)
  echo "== round $i arm B (working tree) =="
  (cd "$REPO" && python scripts/ab_gate.py "$@" --runs=3 2>/dev/null | tail -1)
done
