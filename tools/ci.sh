#!/usr/bin/env bash
# Full local gate — run before any end-of-round commit.
#
# Ordered cheapest-first so the registry/import failure class (which
# emptied round 2's scoreboard) dies in seconds, not after the suite.
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== 1/7 registry import guard"
python -m pytest tests/test_registry.py -q

echo "== 2/7 full test suite"
python -m pytest tests/ -q

echo "== 3/7 oracle result-type lint (no HUGEINT/exotic types in any oracle output)"
python tools/oracle_check.py --typelint /root/testdata/sf0.01

echo "== 4/7 oracle gate (sf0.01, every declared query vs DuckDB)"
python tools/oracle_check.py /root/testdata/sf0.01

echo "== 5/7 plan audit (includes srclint sum-over-hash)"
python tools/plan_audit.py

echo "== 6/7 shuffle-partition shake (iterative/ANSI-overflow-prone queries)"
python tools/oracle_check.py --shake /root/testdata/sf0.01

echo "== 7/7 bench (fails loudly on any query error)"
python bench.py

echo "CI: all gates green"
