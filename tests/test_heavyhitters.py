"""Two-pass exact heavy hitters (operators/heavyhitters.py): the
declared query's corpus has a tiny vocabulary, so these tests force the
interesting regime — distinct keys >> m — and check exactness,
completeness, and the candidate-set bound."""

from __future__ import annotations

from collections import Counter

from demo_flink_spark.operators.heavyhitters import topk_frequent_exact


def _skewed_rows():
    # 20 heavy keys (300..~110 occurrences) + 5000 singletons:
    # distinct = 5020 >> m = 64
    rows = []
    for h in range(20):
        rows += [f"hot-{h:02d}"] * (300 - 10 * h)
    rows += [f"cold-{i}" for i in range(5000)]
    return rows


def test_topk_exact_matches_full_count(spark):
    rows = _skewed_rows()
    truth = Counter(rows).most_common()
    # deterministic tie-break: (cnt desc, value asc)
    truth.sort(key=lambda kv: (-kv[1], kv[0]))
    df = spark.createDataFrame([(v,) for v in rows], "word string").repartition(8)
    got = [
        (r.value, r.cnt, r.rk)
        for r in topk_frequent_exact(df, "word", k=10, m=64)
        .orderBy("rk")
        .collect()
    ]
    want = [(v, c, i + 1) for i, (v, c) in enumerate(truth[:10])]
    assert got == want


def test_counts_are_exact_not_estimates(spark):
    rows = _skewed_rows()
    df = spark.createDataFrame([(v,) for v in rows], "word string").repartition(8)
    out = {r.value: r.cnt for r in topk_frequent_exact(df, "word", k=5, m=64).collect()}
    truth = Counter(rows)
    for v, c in out.items():
        assert c == truth[v], (v, c, truth[v])


def test_threshold_is_completeness_bar(spark):
    # threshold = N div (m+1) over non-null rows; every hot key's count
    # clears it here, so the returned top-k is provably the true top-k.
    rows = _skewed_rows()
    df = spark.createDataFrame([(v,) for v in rows], "word string").repartition(8)
    out = topk_frequent_exact(df, "word", k=10, m=64).collect()
    n = len(rows)
    assert all(r.threshold == n // 65 for r in out)
    assert all(r.cnt > r.threshold for r in out)


def test_none_values_ignored(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "word string"
    )
    got = [(r.value, r.cnt) for r in topk_frequent_exact(df, "word", k=2, m=8).collect()]
    assert sorted(got) == [("a", 2), ("b", 1)]
