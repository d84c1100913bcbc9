"""Scale-conditional broadcast hints (operators/hints.py).

A forced F.broadcast on an O(|V|) relation becomes an executor OOM —
not a slow plan — once |V| outgrows memory, because it bypasses
autoBroadcastJoinThreshold. These tests pin the conditional hint's
flip behavior and that both join strategies produce identical results
in the iterative operators that use it (PageRank, dedup keep-lists).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.operators.dedup import dedup_keep_list
from demo_flink_spark.operators.graph import pagerank
from demo_flink_spark.operators.hints import (
    broadcast_if_small,
    broadcast_threshold_bytes,
)


def _has_broadcast_hint(df) -> bool:
    return "UnresolvedHint" in df._jdf.queryExecution().logical().toString()


def test_hint_applied_under_threshold(spark):
    df = spark.range(10)
    assert _has_broadcast_hint(broadcast_if_small(df, est_rows=10))


def test_hint_skipped_over_threshold(spark):
    df = spark.range(10)
    out = broadcast_if_small(df, est_rows=1 << 40)
    assert out is df  # unhinted: planner free to pick shuffle join


def test_threshold_parses_suffixed_and_disabled(spark):
    df = spark.range(1)
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "1m")
        assert broadcast_threshold_bytes(df) == 1 << 20
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        # auto-broadcast disabled: nothing force-broadcasts either
        assert broadcast_threshold_bytes(df) == 0
        assert broadcast_if_small(df, est_rows=1) is df
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        assert broadcast_threshold_bytes(df) == 10485760
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("b", "d")]


def test_pagerank_identical_on_both_join_strategies(spark):
    """One run per strategy — broadcast (default threshold) vs shuffle
    (threshold disabled) — must agree bit-for-bit: the Q52 fixed-point
    accumulation is order-independent, so the join strategy cannot
    change the ranks."""
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        via_broadcast = {
            r["node"]: r["rank"]
            for r in pagerank(edges, n_iter=4).collect()
        }
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        via_shuffle = {
            r["node"]: r["rank"]
            for r in pagerank(edges, n_iter=4).collect()
        }
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert via_broadcast == via_shuffle  # exact, not approx


def test_pagerank_plan_strategy_flips(spark):
    """The physical join strategy must actually change with the
    threshold — broadcast hash join under the default, none when the
    hint is withheld (pre-AQE initial plan)."""
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        hinted_plan = pagerank(edges, n_iter=1)._jdf.queryExecution().logical().toString()
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        unhinted_plan = pagerank(edges, n_iter=1)._jdf.queryExecution().logical().toString()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    # nested hints surface as ResolvedHint once the child plan is
    # analyzed; either form proves the hint is present
    assert "ResolvedHint" in hinted_plan or "UnresolvedHint" in hinted_plan
    assert "Hint" not in unhinted_plan


def test_dedup_keep_list_identical_on_both_join_strategies(spark):
    docs = spark.createDataFrame(
        [(i,) for i in range(1, 8)], "doc_id long"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "doc_a long, doc_b long"
    )
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        kept_b = sorted(map(tuple, dedup_keep_list(docs, pairs).collect()))
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        kept_s = sorted(map(tuple, dedup_keep_list(docs, pairs).collect()))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
    assert kept_b == kept_s
    kept = dict((r[0], (r[1], r[2])) for r in kept_b)
    assert kept[1] == (1, True) and kept[3] == (1, False)
    assert kept[4] == (4, True)  # unpaired doc keeps itself
    assert kept[5] == (5, True) and kept[6] == (5, False)
