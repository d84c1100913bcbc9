#!/usr/bin/env bash
# Full local gate — run before any end-of-round commit.
#
# Ordered cheapest-first so the registry/import failure class (which
# emptied round 2's scoreboard) dies in seconds, not after the suite.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/6 registry import guard"
python -m pytest tests/test_registry.py -q

echo "== 2/6 full test suite"
python -m pytest tests/ -q

echo "== 3/6 oracle result-type lint (no HUGEINT/exotic types in any oracle output)"
python tools/oracle_check.py --typelint /root/testdata/sf0.01

echo "== 4/6 oracle gate (sf0.01, every declared query vs DuckDB)"
python tools/oracle_check.py /root/testdata/sf0.01

echo "== 5/6 plan audit"
python tools/plan_audit.py

echo "== 6/6 bench (fails loudly on any query error)"
python bench.py

echo "CI: all gates green"
