#!/usr/bin/env bash
# The whole round gate in one command — the executable form of
# .claude/skills/verify/SKILL.md:
#   1. full pytest (unit + golden fixtures + plan sweeps)
#   2. differential gate vs DuckDB at sf0.01 AND sf0.1 (the 10x
#      rounding-boundary check)
#   3. headline + extended bench (one JSON line)
#   4. per-query bench regression gate vs the last committed
#      BENCH_r*.json (±15% band, fail at >1.5x — VERDICT r6 item 6)
# Fails fast; ~25 min total on this container.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== differential gate sf0.01 =="
python scripts/check_correctness.py --json /tmp/check_sf001.json

echo "== differential gate sf0.1 =="
CHECK_SF_DIR=/root/testdata/sf0.1 python scripts/check_correctness.py \
    --json /tmp/check_sf01.json

echo "== bench =="
bench_out=$(mktemp /tmp/bench_now.XXXXXX.json)
# tee -a: /dev/stderr may be a redirected log file, and tee's default
# O_TRUNC would wipe everything the gate printed before this point.
# grep, not tail: since r11 bench prints a compact truncation-proof
# summary as its LAST line (VERDICT r10 item 5); the full artifact is
# the line carrying "metric".
python bench.py | tee -a /dev/stderr | grep '"metric"' | tail -n 1 > "$bench_out"

echo "== bench regression gate (per-query medians vs last round) =="
python scripts/bench_compare.py "$bench_out"
