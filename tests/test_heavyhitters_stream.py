"""Streaming Misra-Gries heavy hitters: the per-bucket summary must
carry the classic MG guarantees across REAL micro-batch boundaries —
every sufficiently-frequent value present, estimates within
[true − n_b/(m+1), true] — and converge independently of how the
stream is split into batches."""

from __future__ import annotations

from collections import Counter

from demo_flink_spark.streaming.harness import run_stateful
from demo_flink_spark.streaming.heavyhitters_stream import (
    bucket_of,
    misra_gries_op,
)

N_BUCKETS = 4
M = 8


def _words():
    # skewed multiset: a few heavy words + a long tail
    words = []
    heavy = {"alpha": 120, "beta": 80, "gamma": 50, "delta": 30}
    for w, c in heavy.items():
        words += [w] * c
    for i in range(100):
        words += [f"tail{chr(97 + i % 26)}{i}"] * (1 + i % 3)
    return words


def _final(streamed):
    pdf = streamed.toPandas()
    last_seq = pdf.groupby("bucket")["seq"].transform("max")
    return pdf[pdf["seq"] == last_seq]


def _run(spark, words, batch_of):
    rows = [
        (i, bucket_of(w, N_BUCKETS), w, batch_of(i))
        for i, w in enumerate(words)
    ]
    src = spark.createDataFrame(
        rows, "row_id long, bucket int, value string, batch int"
    )
    n_b = max(b for *_, b in rows) + 1
    return _final(
        run_stateful(
            spark, src, ["bucket"], misra_gries_op(m=M),
            n_batches=n_b, batch_col="batch",
        )
    )


def _check_guarantees(final, words):
    true = Counter(words)
    bucket_n = Counter(bucket_of(w, N_BUCKETS) for w in words)
    # value=NULL rows are retraction sentinels (summary emptied by the
    # decrement step) — they carry seq/n_seen but no candidate
    est = {
        r["value"]: int(r["est"])
        for _, r in final.iterrows()
        if r["value"] is not None
    }
    # per-bucket n_seen must equal the bucket's true row count
    for _, r in final.iterrows():
        assert int(r["n_seen"]) == bucket_n[int(r["bucket"])]
    for w, c in true.items():
        bound = bucket_n[bucket_of(w, N_BUCKETS)] // (M + 1)
        if c > bound:
            assert w in est, f"{w} (count {c} > bound {bound}) missing"
        if w in est:
            assert c - bound <= est[w] <= c, (w, est[w], c, bound)
    # the heavy words clear every bucket's bound by construction
    for w in ("alpha", "beta", "gamma", "delta"):
        assert w in est


def test_mg_stream_guarantees_across_batches(spark):
    words = _words()
    final = _run(spark, words, lambda i: i * 3 // len(words))  # 3 batches
    _check_guarantees(final, words)


def test_mg_stream_order_independent_guarantees(spark):
    """A different interleaving (round-robin batches) must satisfy the
    same guarantees — MG summaries are merge-order robust."""
    words = _words()
    final = _run(spark, words, lambda i: i % 3)
    _check_guarantees(final, words)


def test_mg_state_bounded(spark):
    """No bucket's candidate set ever exceeds m entries."""
    words = _words()
    final = _run(spark, words, lambda i: i % 2)
    per_bucket = final.groupby("bucket").size()
    assert (per_bucket <= M).all()
