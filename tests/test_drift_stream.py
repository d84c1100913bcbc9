"""Streaming PSI drift monitor: softln_py must equal the Spark column
expression bit-for-bit; the streamed report must equal the batch
operator exactly under in-order AND shuffled arrival orders (bin
counts are algebraic — order cannot matter)."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from demo_flink_spark.operators.quality_checks import psi_drift_report
from demo_flink_spark.streaming.drift_stream import (
    bin_of,
    drift_op,
    softln_py,
)
from demo_flink_spark.streaming.harness import run_stateful


def test_softln_py_matches_spark_column(spark):
    """Bit-for-bit equality of the Python twin against the engine's
    portable softln column expression over a spread of integer pairs."""
    from demo_flink_spark.operators.relational import softln_ratio

    pairs = [
        (1, 1), (1, 2), (2, 3), (7, 10), (99, 100), (1, 10**6),
        (123457, 10**9), (3, 7), (10, 11), (1, 3),
    ]
    df = spark.createDataFrame(pairs, "num long, den long").select(
        "num", "den", softln_ratio(F.col("num"), F.col("den")).alias("ln")
    )
    got = {(r["num"], r["den"]): r["ln"] for r in df.collect()}
    for num, den in pairs:
        assert got[(num, den)] == softln_py(num, den), (num, den)


@settings(max_examples=200, deadline=None)
@given(
    num=st.integers(min_value=1, max_value=10**12),
    den=st.integers(min_value=1, max_value=10**12),
)
def test_softln_py_accuracy_property(num, den):
    """Pure-Python property: the series approximates math.log to ~1e-9
    relative over 12 decades (no Spark needed)."""
    import math

    if num > den:
        num, den = den, num
    got = softln_py(num, den)
    want = math.log(num / den)
    assert abs(got - want) <= 1e-9 * max(1.0, abs(want))


def _ref_profile(rows):
    """Reference profile exactly as the batch operator derives it:
    edges = rank-selected elements at (n*i) div 10 under (v, tb)."""
    srt = sorted(rows)  # (v, tb)
    n = len(srt)
    ranks = sorted({(n * i) // 10 for i in range(1, 10)})
    edges = sorted(srt[r - 1][0] for r in ranks if r >= 1)
    counts = [0] * 10
    for v, _ in rows:
        counts[bin_of(v, edges) - 1] += 1
    return edges, counts, n


def _mk_rows(seed_mult, n):
    # deterministic pseudo-values with 2 decimals
    return [
        (round(((i * seed_mult) % 997) / 4.0, 2), i) for i in range(n)
    ]


def test_streaming_psi_bit_exact_vs_batch(spark):
    ref_rows = _mk_rows(31, 200)
    cur_rows = _mk_rows(57, 150)  # different distribution
    edges, ref_counts, n_ref = _ref_profile(ref_rows)

    data = [
        (v, tb, "m", tb % 3)  # 3 interleaved batches
        for v, tb in cur_rows
    ]
    src = spark.createDataFrame(
        data, "value double, event_id long, key string, batch int"
    )
    out = run_stateful(
        spark, src, ["key"], drift_op(edges, ref_counts, n_ref),
        n_batches=3, batch_col="batch",
    ).toPandas()
    last = out[out["seq"] == out["seq"].max()].sort_values("bin")
    got = list(
        zip(last["bin"], last["c_cur"], last["term_micros"],
            last["psi_total_micros"])
    )

    # batch operator over the same rows
    ref_df = spark.createDataFrame(ref_rows, "value double, event_id long")
    cur_df = spark.createDataFrame(cur_rows, "value double, event_id long")
    want_pdf = (
        psi_drift_report(ref_df, cur_df, "value", "event_id", n_bins=10)
        .toPandas()
        .sort_values("bin")
    )
    want = list(
        zip(want_pdf["bin"], want_pdf["c_cur"], want_pdf["term_micros"],
            want_pdf["psi_total_micros"])
    )
    assert [tuple(map(int, g)) for g in got] == [
        tuple(map(int, w)) for w in want
    ]


def test_streaming_psi_order_independent(spark):
    """A different batch interleaving converges to the SAME integers —
    the algebraic-aggregate property."""
    ref_rows = _mk_rows(31, 200)
    cur_rows = _mk_rows(57, 150)
    edges, ref_counts, n_ref = _ref_profile(ref_rows)

    def final(batch_rule):
        data = [(v, tb, "m", batch_rule(tb)) for v, tb in cur_rows]
        src = spark.createDataFrame(
            data, "value double, event_id long, key string, batch int"
        )
        out = run_stateful(
            spark, src, ["key"], drift_op(edges, ref_counts, n_ref),
            n_batches=3, batch_col="batch",
        ).toPandas()
        last = out[out["seq"] == out["seq"].max()].sort_values("bin")
        return [
            (int(b), int(c), int(t), int(p))
            for b, c, t, p in zip(
                last["bin"], last["c_cur"], last["term_micros"],
                last["psi_total_micros"]
            )
        ]

    a = final(lambda tb: tb % 3)
    b = final(lambda tb: (2 - tb % 3))  # reversed interleave
    assert a == b
