"""Streaming CUSUM: bit-exact convergence to the batch detector under
in-order replay across real micro-batch boundaries; late arrivals
routed to the side output without touching state."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from demo_flink_spark.operators.timeseries import cusum_drift
from demo_flink_spark.streaming.cusum_stream import cusum_op
from demo_flink_spark.streaming.harness import run_stateful

TARGET, SLACK, H = 10.0, 1.0, 15.0


def _rows():
    t0 = datetime(2024, 1, 1)
    vals = [9.5, 10.25, 13.5, 18.0, 19.75, 8.0, 30.5, 31.0, 2.25, 40.0]
    return [
        (i, "a" if i % 2 == 0 else "b", t0 + timedelta(minutes=i), v)
        for i, v in enumerate(vals * 3)
    ]


def _batch(spark, rows):
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = cusum_drift(
        df, target=TARGET, slack=SLACK, h=H
    ).withColumn("first_alarm_us", F.unix_micros("first_alarm_ts"))
    return {
        r["event_type"]: (
            r["n"], r["n_alarms"], r["max_cusum_micros"], r["first_alarm_us"]
        )
        for r in out.collect()
    }


def _stream(spark, rows, batch_of):
    data = [(i, k, t, v, batch_of(j)) for j, (i, k, t, v) in enumerate(rows)]
    src = spark.createDataFrame(
        data,
        "event_id long, event_type string, ts timestamp, value double, batch int",
    )
    n_b = max(batch_of(j) for j in range(len(rows))) + 1
    return run_stateful(
        spark, src, ["event_type"], cusum_op(TARGET, SLACK, H),
        n_batches=n_b, batch_col="batch",
    ).toPandas()


def _final(pdf):
    live = pdf[~pdf["late"]].sort_values("seq")
    return {
        r["event_type"]: (
            int(r["n"]), int(r["n_alarms"]), int(r["max_cusum_micros"]),
            None if r["first_alarm_us"] is None or r["first_alarm_us"] != r["first_alarm_us"]
            else int(r["first_alarm_us"]),
        )
        for _, r in live.groupby("event_type").tail(1).iterrows()
    }


def test_streaming_cusum_in_order_bit_exact(spark):
    rows = _rows()
    got = _final(_stream(spark, rows, lambda j: j * 3 // len(_rows())))
    want = _batch(spark, rows)
    # normalize pandas NaN for keys that never alarmed
    want = {
        k: (n, a, m, None if fa != fa else int(fa)) if fa is not None else (n, a, m, None)
        for k, (n, a, m, fa) in want.items()
    }
    assert got == want  # exact integers, including alarm timestamps


def test_streaming_cusum_late_side_output(spark):
    """An out-of-order arrival lands on the late channel and leaves
    the statistic exactly where the in-order prefix put it."""
    rows = _rows()
    # hold back one EARLY reading of key 'a' to the last batch
    late_idx = 4  # the 5th row overall, key 'a', early ts
    order = [j for j in range(len(rows)) if j != late_idx] + [late_idx]
    batch_of = {j: (0 if pos < len(rows) - 1 else 1) for pos, j in enumerate(order)}
    pdf = _stream(spark, rows, lambda j: batch_of[j])
    late = pdf[pdf["late"]]
    assert len(late) == 1
    assert late.iloc[0]["event_type"] == rows[late_idx][1]
    # live statistic equals batch over the rows EXCLUDING the late one
    kept = [r for j, r in enumerate(rows) if j != late_idx]
    want = _batch(spark, kept)
    want = {
        k: (n, a, m, None if fa != fa else int(fa)) if fa is not None else (n, a, m, None)
        for k, (n, a, m, fa) in want.items()
    }
    assert _final(pdf) == want
