"""Streaming OLS trend: bit-exact convergence to the batch fit under
in-order AND out-of-order replay (the algebraic re-base path)."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from demo_flink_spark.operators.timeseries import linear_trend
from demo_flink_spark.streaming.harness import run_stateful
from demo_flink_spark.streaming.trend_stream import trend_op


def _rows():
    t0 = datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        rows.append(
            (
                i,
                "a" if i % 2 == 0 else "b",
                t0 + timedelta(minutes=7 * i),
                float((i * 31) % 97) / 4.0,
            )
        )
    return rows


def _final(streamed):
    pdf = streamed.toPandas().sort_values("seq")
    return {
        r["event_type"]: (r["n"], r["slope_per_hour"], r["intercept"])
        for _, r in pdf.groupby("event_type").tail(1).iterrows()
    }


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    return {
        r["event_type"]: (r["n"], r["slope_per_hour"], r["intercept"])
        for r in linear_trend(df).collect()
    }


def _run(spark, rows, batch_of):
    data = [(i, k, t, v, batch_of(i)) for i, k, t, v in rows]
    src = spark.createDataFrame(
        data,
        "event_id long, event_type string, ts timestamp, value double, batch int",
    )
    n_b = max(batch_of(i) for i, *_ in rows) + 1
    return _final(
        run_stateful(
            spark, src, ["event_type"], trend_op(),
            n_batches=n_b, batch_col="batch",
        )
    )


def test_streaming_trend_in_order_bit_exact(spark):
    rows = _rows()
    got = _run(spark, rows, lambda i: 0 if i < 20 else 1)
    want = _batch(spark, rows)
    assert got == want  # exact tuple equality, doubles included


def test_streaming_trend_rebase_on_early_late_arrival(spark):
    rows = _rows()
    # the EARLIEST reading of each key arrives LAST: the kernel must
    # re-base its accumulated sums algebraically and still match batch
    got = _run(spark, rows, lambda i: 1 if i < 2 else 0)
    want = _batch(spark, rows)
    assert got == want


def test_streaming_trend_halfcent_tie_matches_batch(spark):
    """Values whose v*100 is an exactly representable .5 double
    (0.125 -> 12.5 cents) are the case where Python's banker's
    round() diverges from the batch F.round (HALF_UP): 12 vs 13.
    The kernel's half-away _cents must match batch bit-for-bit."""
    from demo_flink_spark.streaming.trend_stream import _cents

    assert _cents(0.125) == 13  # round() would give 12
    assert _cents(0.375) == 38  # round() would give 38 too, but via even
    assert _cents(-0.125) == -13
    t0 = datetime(2024, 1, 1)
    rows = [
        (i, "a", t0 + timedelta(minutes=3 * i), v)
        for i, v in enumerate([0.125, 0.375, 1.625, 2.125, 0.875, 3.125])
    ]
    got = _run(spark, rows, lambda i: 0 if i < 3 else 1)
    want = _batch(spark, rows)
    assert got == want
