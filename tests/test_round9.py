"""Round-9 tests.

1. The shared session-memo module (plans/memo.py): LRU recency
   refresh on hit (the r8 advisor's FIFO-thrash finding), bounded
   eviction with unpersist, and clear_session_memos() forcing a
   rebuild — the hook the shake gate uses to exercise memoized build
   stages under every partitioning.
2. The shared ngram-pair / connected-components memos: both cluster-
   resolution policies must consume ONE label frame, and the
   memo-fed results must equal the memo-free operator outputs.
3. zorder_locality_report on a constant column: reports 0 widths
   instead of an ANSI divide-by-zero crash (r8 advisor finding).
"""

from __future__ import annotations


def _clear():
    from demo_flink_spark.plans.memo import clear_session_memos

    clear_session_memos()


def test_session_memo_lru_hit_refreshes_recency(spark):
    from demo_flink_spark.plans import memo

    _clear()
    builds: list[str] = []

    def build(k: str):
        def _b():
            builds.append(k)
            return spark.range(1).withColumnRenamed("id", f"c_{k}")

        return _b

    try:
        for i in range(memo._MAX_ENTRIES):
            memo.session_memo("t9", (f"k{i}",), build(f"k{i}"))
        # hit k0: must move it to most-recent, so the next insert
        # evicts k1, not k0
        memo.session_memo("t9", ("k0",), build("k0"))
        assert builds.count("k0") == 1  # hit, not rebuild
        memo.session_memo("t9", ("new",), build("new"))
        memo.session_memo("t9", ("k0",), build("k0"))
        assert builds.count("k0") == 1  # k0 survived the eviction
        memo.session_memo("t9", ("k1",), build("k1"))
        assert builds.count("k1") == 2  # k1 was the evicted one
    finally:
        _clear()


def test_session_memo_eviction_unpersists(spark):
    from demo_flink_spark.plans import memo

    _clear()
    try:
        first = memo.session_memo("t9e", ("a",), lambda: spark.range(3))
        assert first.storageLevel.useMemory
        for i in range(memo._MAX_ENTRIES):
            memo.session_memo("t9e", (f"f{i}",), lambda: spark.range(2))
        # "a" was least-recently-used → evicted and unpersisted
        assert not first.storageLevel.useMemory
    finally:
        _clear()


def test_clear_session_memos_forces_rebuild(spark):
    from demo_flink_spark.plans import memo

    _clear()
    n = [0]

    def build():
        n[0] += 1
        return spark.range(5)

    try:
        a = memo.session_memo("t9c", ("x",), build)
        assert memo.session_memo("t9c", ("x",), build) is a
        assert n[0] == 1
        memo.clear_session_memos()
        assert not a.storageLevel.useMemory
        b = memo.session_memo("t9c", ("x",), build)
        assert n[0] == 2 and b is not a
    finally:
        _clear()


def test_shared_components_single_frame_and_parity(spark):
    """Both cluster-resolution queries consume the SAME memoized CC
    label frame, and the memo-fed results are row-identical to the
    memo-free operator path."""
    from pyspark.sql import functions as F

    from demo_flink_spark.operators import dedup as dd
    from demo_flink_spark.operators.textstats import _tokens
    from demo_flink_spark.plans.dedup import (
        _shared_components,
        _shared_ngram_pairs,
    )
    from demo_flink_spark.sources import load_table

    sf = "/root/testdata/sf0.001"
    comp1 = _shared_components(spark, sf)
    assert comp1 is _shared_components(spark, sf)
    pairs = _shared_ngram_pairs(spark, sf)
    assert pairs is _shared_ngram_pairs(spark, sf)

    docs = load_table(spark, sf, "documents")
    score = F.size(_tokens(F.col("text"))).cast("long")
    with_memo = sorted(
        map(tuple, dd.dedup_keep_best(docs, pairs, score, components=comp1).collect())
    )
    without = sorted(
        map(tuple, dd.dedup_keep_best(docs, pairs, score).collect())
    )
    assert with_memo == without
    kl_memo = sorted(
        map(tuple, dd.dedup_keep_list(docs, pairs, components=comp1).collect())
    )
    kl_plain = sorted(map(tuple, dd.dedup_keep_list(docs, pairs).collect()))
    assert kl_memo == kl_plain


def test_remove_repeated_ngrams_hand_cases(spark):
    """Hand-computed removal semantics, plus the zero-shuffle claim
    (the plan must contain no Exchange — it's a per-row narrow map)."""
    from demo_flink_spark.operators.textstats import remove_repeated_ngrams

    docs = spark.createDataFrame(
        [
            # g6 == g0 ('a b c d e'): covered 0-based positions 6-10
            (1, "a b c d e X a b c d e Y"),
            # degenerate repetition: every window repeats window 0 →
            # positions 1..9 covered, one token survives
            (2, "w w w w w w w w w w"),
            # shorter than n: untouched
            (3, "no repeats here"),
            # no repeated 5-gram: untouched
            (4, "one two three four five six seven"),
            (5, ""),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_repeated_ngrams(docs, n=5).collect()
    }
    assert out[1] == (12, 5, "a b c d e x y")
    assert out[2] == (10, 9, "w")
    assert out[3] == (3, 0, "no repeats here")
    assert out[4] == (7, 0, "one two three four five six seven")
    assert out[5] == (0, 0, "")
    plan = remove_repeated_ngrams(docs, n=5)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_zorder_locality_report_constant_column(spark):
    """A constant input column used to crash the report with an ANSI
    divide-by-zero; it must now report zero width for that axis."""
    from demo_flink_spark.operators.layout import zorder_locality_report

    df = spark.createDataFrame(
        [(i, 7, i * 3 % 101) for i in range(200)], "id long, x long, y long"
    )
    rows = {
        r["layout"]: (r["avg_width_x_micros"], r["avg_width_y_micros"])
        for r in zorder_locality_report(df, "x", "y", n_files=8).collect()
    }
    assert set(rows) == {"lexicographic", "zorder"}
    for wx, _wy in rows.values():
        assert wx == 0  # constant column: zero width, no crash

# --------------------------- hypothesis: repetition removal vs Python


def _ref_remove_repeats(tokens, n):
    """Pure-Python reference for remove_repeated_ngrams: window i is a
    repeat iff its n-gram's first occurrence is earlier; covered token
    positions are the union of [i, i+n-1] over repeat windows."""
    m = len(tokens)
    grams = (
        [" ".join(tokens[i : i + n]) for i in range(m - n + 1)]
        if m >= n
        else []
    )
    first = {}
    rep = []
    for i, g in enumerate(grams):
        if g in first:
            rep.append(i)
        else:
            first[g] = i
    cov = set()
    for i in rep:
        cov.update(range(i, i + n))
    kept = [t for p, t in enumerate(tokens) if p not in cov]
    return m, len(cov), " ".join(kept)


from hypothesis import HealthCheck, given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(["a", "b", "c"]), min_size=0, max_size=18),
        min_size=1,
        max_size=6,
    ),
    n=st.sampled_from([2, 3, 5]),
)
def test_remove_repeated_ngrams_matches_python(spark, docs, n):
    """Random small-alphabet token sequences (repeats are common at
    |Σ|=3) across n ∈ {2,3,5}: Spark output must equal the pure-Python
    reference per document, including the m<n and empty-doc edges."""
    from demo_flink_spark.operators.textstats import remove_repeated_ngrams

    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_removed"], r["cleaned_text"])
        for r in remove_repeated_ngrams(df, n=n).collect()
    }
    want = {i: _ref_remove_repeats(toks, n) for i, toks in enumerate(docs)}
    assert got == want
