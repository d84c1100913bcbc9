"""Registry import guard — the round-2 failure class.

Round 2 shipped a SyntaxError in one plan module; `all_specs()` (and
therefore the driver's `queries()` / `oracle_sql()`) raised on import
while `pytest tests/` stayed green, because nothing imported the
registry. These tests make that impossible: they import the FULL
registry and the driver entry module Spark-session-free and assert the
contract shape the driver depends on.
"""

from __future__ import annotations

import ast
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_all_specs_imports_and_is_large():
    from demo_flink_spark.plans import all_specs

    specs = all_specs()
    assert len(specs) >= 130, f"registry shrank: {len(specs)}"


def test_spec_shape():
    from demo_flink_spark.plans import all_specs

    specs = all_specs()
    for key, s in specs.items():
        assert s.name == key
        assert callable(s.fn), s.name
        assert s.oracle is None or isinstance(s.oracle, str), s.name


def test_driver_entry_contract():
    """__spark_entry__.queries()/oracle_sql() — the exact driver surface."""
    import importlib.util

    path = os.path.join(REPO, "__spark_entry__.py")
    spec = importlib.util.spec_from_file_location("__spark_entry__", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)

    q = mod.queries()
    o = mod.oracle_sql()
    assert len(q) >= 130
    assert set(o) <= set(q), "oracle keys must be a subset of query keys"
    for name, fn in q.items():
        assert callable(fn), name
    for name, sql in o.items():
        assert isinstance(sql, str) and sql.strip(), name
    assert callable(mod.entry)


def test_every_plan_module_parses():
    """Catch syntax errors in ANY package file, imported or not."""
    pkg = os.path.join(REPO, "demo_flink_spark")
    bad = []
    for root, _dirs, files in os.walk(pkg):
        for f in files:
            if not f.endswith(".py"):
                continue
            p = os.path.join(root, f)
            try:
                with open(p, encoding="utf-8") as fh:
                    ast.parse(fh.read(), filename=p)
            except SyntaxError as e:
                bad.append(f"{p}: {e}")
    assert not bad, "\n".join(bad)
