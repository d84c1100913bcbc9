"""Round-11 additions (ADVICE r10 closures).

1. `_check_components` selects the pair id columns by NAME (src/dst
   params, `connected_components` convention) — a pairs frame with
   extra leading columns used to be validated against the wrong
   columns under SPARK_GRAFT_VALIDATE_COMPONENTS.
2. The eager memo-build materialization is gated behind
   SPARK_GRAFT_MEMO_EAGER (bench sets it): non-bench sessions keep
   lazy builds and pay no extra pass over the built frame.
3. A nested child build that FAILS no longer charges the parent's
   accumulator: a build callable that catches the child failure and
   continues keeps memo_builds summing to true wall cost.
"""

from __future__ import annotations

import time as _t

import pytest
from pyspark.sql import functions as F


def test_components_guard_selects_pair_ids_by_name(spark, monkeypatch):
    """A pairs frame with extra LEADING columns (valid for the default
    `connected_components(pairs)` path, which selects doc_a/doc_b by
    name) must be validated against doc_a/doc_b — not positionally
    against the leading extras."""
    from demo_flink_spark.operators import dedup as dd

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    # leading score/tag columns carry values that LOOK like node ids;
    # the positional form would validate against (score, tag)
    pairs = spark.createDataFrame(
        [(9, 9, 0, 1), (8, 8, 2, 3)],
        "score long, tag long, doc_a long, doc_b long",
    )
    good = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2)], "node long, comp long"
    )
    monkeypatch.setenv("SPARK_GRAFT_VALIDATE_COMPONENTS", "1")

    # the correct label frame for (doc_a, doc_b) passes
    out = {
        r["doc_id"]: r
        for r in dd.dedup_keep_list(docs, pairs, components=good).collect()
    }
    assert out[1]["canonical_id"] == 0 and not out[1]["is_kept"]
    assert out[4]["is_kept"]

    # and a frame labeling the WRONG node set still fails — proving
    # the guard reads doc_a/doc_b, not the leading columns
    wrong = spark.createDataFrame(
        [(8, 8), (9, 8)], "node long, comp long"
    )
    with pytest.raises(ValueError, match="paired nodes unlabeled"):
        dd.dedup_keep_list(docs, pairs, components=wrong)

    # the default (no components) path accepts the same frame shape
    monkeypatch.delenv("SPARK_GRAFT_VALIDATE_COMPONENTS")
    out = {
        r["doc_id"]: r for r in dd.dedup_keep_list(docs, pairs).collect()
    }
    assert out[3]["canonical_id"] == 2 and not out[3]["is_kept"]


def test_memo_builds_are_lazy_by_default(spark, monkeypatch):
    """Without SPARK_GRAFT_MEMO_EAGER, session_memo must NOT run the
    built plan: a frame whose materialization would fail is returned
    lazily (the failure belongs to the consumer), and the build event
    is still recorded for the hit/build distinction."""
    from demo_flink_spark.plans import memo

    monkeypatch.delenv("SPARK_GRAFT_MEMO_EAGER", raising=False)
    memo.clear_session_memos()
    memo.drain_memo_events()

    df = memo.session_memo(
        "t11lazy",
        ("k",),
        lambda: spark.range(3).select(
            F.assert_true(F.col("id") < 0).alias("x")
        ),
    )
    # lazy: session_memo returned without executing the plan
    evs = memo.drain_memo_events()
    assert [e["event"] for e in evs] == ["build"]
    with pytest.raises(Exception):
        df.count()  # the failure surfaces at the consumer
    memo.clear_session_memos()


def test_memo_eager_mode_materializes(spark, monkeypatch):
    """With the bench flag set, the same failing build raises INSIDE
    session_memo (the eager path test_round10 exercises in depth)."""
    from demo_flink_spark.plans import memo

    monkeypatch.setenv("SPARK_GRAFT_MEMO_EAGER", "1")
    memo.clear_session_memos()
    memo.drain_memo_events()
    with pytest.raises(Exception):
        memo.session_memo(
            "t11eager",
            ("k",),
            lambda: spark.range(3).select(
                F.assert_true(F.col("id") < 0).alias("x")
            ),
        )
    assert memo.drain_memo_events() == []
    memo.clear_session_memos()


def test_memo_failed_child_build_stays_in_parent_exclusive(spark):
    """A build callable that catches a FAILED child build and
    continues: the child records no build event, so its elapsed must
    remain inside the parent's exclusive seconds — the recorded
    events still sum to true wall cost (ADVICE r10)."""
    from demo_flink_spark.plans import memo

    memo.clear_session_memos()
    memo.drain_memo_events()

    def bad_child():
        _t.sleep(0.2)
        raise RuntimeError("child build failed")

    def parent():
        try:
            memo.session_memo("t11child", ("c",), bad_child)
        except RuntimeError:
            pass  # fall back to building without the child
        _t.sleep(0.1)
        return spark.range(3)

    t0 = _t.time()
    memo.session_memo("t11parent", ("p",), parent)
    wall = _t.time() - t0
    evs = {e["cache"]: e for e in memo.drain_memo_events()}
    # only the parent recorded a build (the child failed)
    assert set(evs) == {"t11parent"}
    # the failed child's 0.2 s stays in the parent's exclusive time:
    # the single recorded event accounts for the whole wall cost
    assert evs["t11parent"]["secs"] >= 0.29
    # loose wall bound: secs is timed inside session_memo, wall
    # outside it, so scheduler jitter on a loaded box widens the gap
    # (ADVICE r11 — the tight 0.05 margin could flake); the hard
    # accounting guarantee is the 0.29 s relative bound above
    assert evs["t11parent"]["secs"] >= wall - 0.3
    memo.clear_session_memos()


def test_memo_grandchild_charge_survives_child_failure(spark):
    """Review finding (r11): a grandchild build that SUCCEEDS before
    its parent (the child) fails must not be double-counted — the
    child's popped accumulator passes the recorded-descendant time up
    on failure, so all recorded events still sum to true wall cost."""
    from demo_flink_spark.plans import memo

    memo.clear_session_memos()
    memo.drain_memo_events()

    def grandchild():
        _t.sleep(0.2)
        return spark.range(2)

    def child():
        memo.session_memo("t11gc", ("g",), grandchild)
        _t.sleep(0.1)
        raise RuntimeError("child build failed after grandchild")

    def outer():
        try:
            memo.session_memo("t11mid", ("c",), child)
        except RuntimeError:
            pass
        _t.sleep(0.1)
        return spark.range(3)

    t0 = _t.time()
    memo.session_memo("t11outer", ("p",), outer)
    wall = _t.time() - t0
    evs = {e["cache"]: e for e in memo.drain_memo_events()}
    # grandchild + outer recorded; the failed child records nothing
    assert set(evs) == {"t11gc", "t11outer"}
    assert evs["t11gc"]["secs"] >= 0.19
    total = evs["t11gc"]["secs"] + evs["t11outer"]["secs"]
    # no double count: events sum to wall (the old code charged the
    # outer level nothing for the failed child, leaving the
    # grandchild's 0.2 s inside outer's exclusive AND its own event)
    assert total <= wall + 0.05
    # and nothing is lost either: outer's exclusive keeps the failed
    # child's own 0.1 s. Loose wall bound (ADVICE r11): jitter
    # between the outer t0 and the inner timing spans can exceed a
    # tight margin on a loaded box; the double-count regression this
    # test exists for trips the <= bound above, not this one
    assert total >= wall - 0.3
    memo.clear_session_memos()


def test_memo_eager_env_disable_spellings(spark, monkeypatch):
    """'0' / 'false' must DISABLE eager mode (review finding: any
    non-empty string used to enable it)."""
    from demo_flink_spark.plans import memo

    for off in ("0", "false", "no", "", "off", "disabled", "maybe"):
        # unknown spellings default to LAZY too — _eager() is an
        # explicit allowlist, not a deny-list (ADVICE r11: "off"
        # used to enable eager mode)
        monkeypatch.setenv("SPARK_GRAFT_MEMO_EAGER", off)
        assert memo._eager() is False, f"{off!r} must mean lazy"
    for on in ("1", "true", "yes", "on", " TRUE "):
        monkeypatch.setenv("SPARK_GRAFT_MEMO_EAGER", on)
        assert memo._eager() is True, f"{on!r} must mean eager"


def test_keep_resolvers_accept_custom_pair_columns(spark, monkeypatch):
    """Review finding (r11): src/dst flow through BOTH resolver paths
    (component build and guard), and a wrong name raises a clear
    ValueError instead of an AnalysisException."""
    from demo_flink_spark.operators import dedup as dd

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")

    # default path with custom names
    out = {
        r["doc_id"]: r
        for r in dd.dedup_keep_list(docs, pairs, src="a", dst="b").collect()
    }
    assert out[1]["canonical_id"] == 0 and not out[1]["is_kept"]
    assert out[4]["is_kept"]

    # guard path with custom names, gated check on
    monkeypatch.setenv("SPARK_GRAFT_VALIDATE_COMPONENTS", "1")
    good = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2)], "node long, comp long"
    )
    out = {
        r["doc_id"]: r
        for r in dd.dedup_keep_list(
            docs, pairs, components=good, src="a", dst="b"
        ).collect()
    }
    assert out[3]["canonical_id"] == 2 and not out[3]["is_kept"]

    # wrong/default names against (a, b) pairs: clear ValueError
    with pytest.raises(ValueError, match="missing id column"):
        dd.dedup_keep_list(docs, pairs, components=good)
