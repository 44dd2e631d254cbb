#!/usr/bin/env bash
# The whole round gate in one command — the executable form of
# .claude/skills/verify/SKILL.md:
#   1. full pytest (unit + golden fixtures + plan sweeps)
#   2. differential gate vs DuckDB at sf0.01 AND sf0.1 (the 10x
#      rounding-boundary check)
#   3. headline + extended bench (one JSON line)
# Fails fast; ~25 min total on this container.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== pytest =="
python -m pytest tests/ -q

echo "== differential gate sf0.01 =="
python scripts/check_correctness.py

echo "== differential gate sf0.1 =="
CHECK_SF_DIR=/root/testdata/sf0.1 python scripts/check_correctness.py

echo "== bench =="
python bench.py
