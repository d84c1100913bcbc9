"""Streaming EWMA twin: bit-exact parity with the batch operator
under in-order replay, convergence under bounded disorder (correction
rows), and the explicit late side-output past the horizon."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from demo_flink_spark.operators.timeseries import ewma_trailing
from demo_flink_spark.streaming.ewma_stream import ewma_op
from demo_flink_spark.streaming.harness import run_stateful


def _rows(n=24, keys=("a", "b")):
    from datetime import datetime, timedelta

    rows = []
    for i in range(n):
        rows.append(
            (
                i,
                keys[i % len(keys)],
                datetime(2024, 1, 1) + timedelta(seconds=10 * i),
                float((i * 37) % 100) / 4.0,
            )
        )
    return rows


def _final(df):
    """Converged answer: highest-seq non-late row per event_id."""
    pdf = df.filter(~F.col("late")).toPandas()
    return (
        pdf.sort_values("seq").groupby("event_id").tail(1).set_index("event_id")
    )


def _batch_twin(spark, rows):
    src = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    return {
        r["event_id"]: (r["n_win"], r["ewma"])
        for r in ewma_trailing(src, n_trailing=4).collect()
    }


def test_in_order_replay_is_bit_exact(spark):
    rows = _rows()
    data = [(i, k, t, v, 0 if i < 12 else 1) for i, k, t, v in rows]
    src = spark.createDataFrame(
        data,
        "event_id long, event_type string, ts timestamp, value double, batch int",
    )
    got = _final(
        run_stateful(
            spark, src, ["event_type"], ewma_op(n_trailing=4),
            n_batches=2, batch_col="batch",
        )
    )
    want = _batch_twin(spark, rows)
    assert set(got.index) == set(want)
    for ev, row in got.iterrows():
        wn, we = want[ev]
        assert int(row["n_win"]) == wn
        assert row["ewma"] == we, f"event {ev}: {row['ewma']} != {we}"


def test_bounded_disorder_corrects_to_batch(spark):
    rows = _rows()
    # hold back a MID-stream reading of key 'a' to the last batch: its
    # insertion must correct the EWMA of the readings after it
    held = 8  # key 'a', middle of the series
    data = [(i, k, t, v, 1 if i == held else 0) for i, k, t, v in rows]
    src = spark.createDataFrame(
        data,
        "event_id long, event_type string, ts timestamp, value double, batch int",
    )
    streamed = run_stateful(
        spark, src, ["event_type"], ewma_op(n_trailing=4),
        n_batches=2, batch_col="batch",
    )
    got = _final(streamed)
    want = _batch_twin(spark, rows)
    for ev, row in got.iterrows():
        assert row["ewma"] == want[ev][1], f"event {ev} diverged"
    # corrections genuinely happened: some event has >1 emission and
    # its value CHANGED between first and last
    pdf = streamed.toPandas().sort_values("seq")
    multi = pdf.groupby("event_id")["ewma"].agg(["first", "last", "count"])
    corrected = multi[(multi["count"] > 1) & (multi["first"] != multi["last"])]
    assert len(corrected) > 0, "expected correction rows after late insert"


def test_past_horizon_is_late_side_output_not_wrong(spark):
    rows = _rows(n=30, keys=("a",))
    # tiny horizon: by the time the held-back FIRST reading arrives,
    # its window predecessors are evicted -> must flag late, not emit
    # a wrong number
    held = 1
    data = [(i, k, t, v, 1 if i == held else 0) for i, k, t, v in rows]
    src = spark.createDataFrame(
        data,
        "event_id long, event_type string, ts timestamp, value double, batch int",
    )
    streamed = run_stateful(
        spark, src, ["event_type"], ewma_op(n_trailing=4, horizon=8),
        n_batches=2, batch_col="batch",
    ).toPandas()
    late = streamed[streamed["late"]]
    assert list(late["event_id"]) == [held]
    assert late["ewma"].isna().all()
    # everything that WAS emitted non-late matches the batch answer
    # computed over the non-late subset (the stream's effective corpus)
    sub = [r for r in rows if r[0] != held]
    want = _batch_twin(spark, sub)
    got = _final(
        run_stateful(
            spark,
            spark.createDataFrame(
                [(i, k, t, v, 0) for i, k, t, v in sub],
                "event_id long, event_type string, ts timestamp, value double, batch int",
            ),
            ["event_type"],
            ewma_op(n_trailing=4, horizon=8),
        )
    )
    for ev, row in got.iterrows():
        assert row["ewma"] == want[ev][1]
