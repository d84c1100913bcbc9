#!/usr/bin/env bash
# Full local gate — run before any end-of-round commit.
#
# Ordered cheapest-first so the registry/import failure class (which
# emptied round 2's scoreboard) dies in seconds, not after the suite.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/5 registry import guard"
python -m pytest tests/test_registry.py -q

echo "== 2/5 full test suite"
python -m pytest tests/ -q

echo "== 3/5 oracle gate (sf0.01, every declared query vs DuckDB)"
python tools/oracle_check.py /root/testdata/sf0.01

echo "== 4/5 plan audit"
python tools/plan_audit.py

echo "== 5/5 bench (fails loudly on any query error)"
python bench.py

echo "CI: all gates green"
