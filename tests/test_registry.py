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


def test_rotation_orders_by_driver_evidence(tmp_path):
    """Never-sampled first, then stale fail records, then green
    oldest-round-first; unreadable files degrade to declaration
    order without raising."""
    import json

    from demo_flink_spark.plans import _rotate_by_driver_evidence

    class Spec:  # stand-in; rotation only touches dict keys
        pass

    collected = {n: Spec() for n in ("a", "b", "c", "d", "e")}
    (tmp_path / "CORRECTNESS_r01.json").write_text(json.dumps({
        "a": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": False, "err": None},
    }))
    (tmp_path / "CORRECTNESS_r02.json").write_text(json.dumps({
        "c": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
        "d": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": "no_oracle"},
    }))
    out = list(_rotate_by_driver_evidence(dict(collected), root=str(tmp_path)))
    # e never sampled; b (r1 fail) before d (r2 err); a (r1 green)
    # before c (r2 green)
    assert out == ["e", "b", "d", "a", "c"]

    # a later green record supersedes an earlier fail
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({
        "b": {"rows_match": True, "schema_match": True,
              "hash_match": True, "err": None},
    }))
    out = list(_rotate_by_driver_evidence(dict(collected), root=str(tmp_path)))
    assert out == ["e", "d", "a", "c", "b"]

    # corrupt file: skipped, not fatal
    (tmp_path / "CORRECTNESS_r04.json").write_text("{not json")
    out = list(_rotate_by_driver_evidence(dict(collected), root=str(tmp_path)))
    assert out == ["e", "d", "a", "c", "b"]

    # no files at all: declaration order
    empty = tmp_path / "none"
    empty.mkdir()
    out = list(_rotate_by_driver_evidence(dict(collected), root=str(empty)))
    assert out == ["a", "b", "c", "d", "e"]
