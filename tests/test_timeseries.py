"""Boundary semantics for the regular-grid time-series operators."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from demo_flink_spark.operators.timeseries import gapfill_locf, zscore_anomalies


def _ts(h: int, m: int = 0) -> datetime:
    return datetime(2024, 1, 1, h, m)


def test_gapfill_grid_and_locf(spark):
    rows = [
        ("a", _ts(1, 30), 10.0),  # bucket 01:00
        ("a", _ts(4, 5), 40.0),   # bucket 04:00 -> gaps at 02:00, 03:00
        ("a", _ts(4, 50), 35.0),  # same bucket: max = 40
        ("b", _ts(2), 7.0),       # single-bucket key: no gaps
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = gapfill_locf(df, key_col="k", ts_col="ts", value_col="value")
    got = {(r.k, r.bucket_ts.hour): (r.value_filled, r.is_gap)
           for r in out.collect()}
    assert got == {
        ("a", 1): (10.0, False),
        ("a", 2): (10.0, True),   # LOCF carries 10 forward
        ("a", 3): (10.0, True),
        ("a", 4): (40.0, False),  # in-bucket max, not last
        ("b", 2): (7.0, False),
    }


def test_gapfill_spans_day_chunks(spark):
    # 2024-01-01 23:00 -> 2024-01-02 01:00 crosses the day-chunk seam;
    # the grid must be continuous across midnight with no dup/missing
    rows = [
        ("a", datetime(2024, 1, 1, 23, 10), 1.0),
        ("a", datetime(2024, 1, 2, 1, 20), 3.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
    out = gapfill_locf(df, key_col="k", ts_col="ts", value_col="value")
    buckets = [r.bucket_ts for r in out.orderBy("bucket_ts").collect()]
    assert buckets == [
        datetime(2024, 1, 1, 23),
        datetime(2024, 1, 2, 0),
        datetime(2024, 1, 2, 1),
    ]


def test_zscore_warmup_guard_and_flag(spark):
    # 8 flat readings never flag (window < 8 is guarded; and a single
    # outlier's |z| is capped at (n-1)/sqrt(n) = 2.47 < 2.5 at n=8, so
    # the spike needs a 9-row window to clear the threshold); the 9th
    # row is a spike and must flag; a flat 10th must not
    rows = [("k", _ts(0, i), 100.0 + (i % 2) * 0.1, i) for i in range(8)]
    rows.append(("k", _ts(0, 8), 500.0, 8))
    rows.append(("k", _ts(0, 9), 100.0, 9))
    df = spark.createDataFrame(
        rows, "k string, ts timestamp, value double, event_id long"
    )
    out = zscore_anomalies(
        df, key_col="k", ts_col="ts", order_tiebreak="event_id",
        value_col="value", n_trailing=100, threshold=2.5,
    ).collect()
    assert [r.event_id for r in out] == [8]
    assert out[0].z > 2.5


def test_bucket_generic_step_floors_pre1970(spark):
    # ADVICE r2: double division + truncate-toward-zero cast mis-floors
    # negative epochs; the floor-division path must floor (toward -inf)
    from demo_flink_spark.operators.timeseries import bucket

    df = spark.createDataFrame(
        [("1969-12-31 23:59:00",), ("1970-01-01 00:01:00",)], "s string"
    ).select(F.to_timestamp("s").alias("ts"))
    got = [
        str(r.b)
        for r in df.select(bucket(F.col("ts"), "15 minutes").alias("b"))
        .orderBy("b")
        .collect()
    ]
    assert got == ["1969-12-31 23:45:00", "1970-01-01 00:00:00"]


def test_ohlc_bars_semantics(spark):
    from datetime import datetime

    from demo_flink_spark.operators.timeseries import ohlc_bars

    def t(m, s):
        return datetime(2024, 1, 1, 0, m, s)

    rows = [
        # bucket 00:00 — open decided by ts, close by ts; high/low inside
        (1, t(0, 10), "a", 5.0),
        (2, t(3, 0), "a", 9.0),
        (3, t(14, 59), "a", 2.0),
        # same ts as event 3: event_id tiebreak decides close
        (4, t(14, 59), "a", 7.0),
        # bucket 00:15
        (5, t(15, 0), "a", 4.0),
        # other key, same buckets
        (6, t(0, 30), "b", 100.0),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, event_type string, value double"
    )
    out = {
        (r["key"], str(r["bucket_ts"])): r
        for r in ohlc_bars(df, step="15 minutes").collect()
    }
    a0 = out[("a", "2024-01-01 00:00:00")]
    assert a0["n_ticks"] == 4
    assert a0["open"] == 5.0 and a0["close"] == 7.0  # id 4 wins the tie
    assert a0["high"] == 9.0 and a0["low"] == 2.0
    assert a0["vsum"] == 23.0
    a1 = out[("a", "2024-01-01 00:15:00")]
    assert a1["n_ticks"] == 1 and a1["open"] == a1["close"] == 4.0
    assert out[("b", "2024-01-01 00:00:00")]["n_ticks"] == 1


def test_acf_exact_matches_numpy_plugin_estimator(spark):
    """acf_exact must equal the textbook plug-in estimator
    r_k = sum((y_t-m)(y_{t-k}-m)) / sum((y_t-m)^2) to float tolerance
    on an AR(1)-ish series, and be EXACTLY 1-adjacent on a constant
    offset pattern; a constant series (den=0) yields acf=0."""
    import numpy as np

    from demo_flink_spark.operators.timeseries import acf_exact

    vals = []
    v = 50.0
    for i in range(200):
        v = 0.8 * v + ((i * 37) % 11 - 5)  # deterministic AR(1)
        vals.append(round(v, 2))
    rows = [(i, "a", float(x)) for i, x in enumerate(vals)]
    rows += [(i, "const", 7.0) for i in range(10)]
    df = spark.createDataFrame(
        [(eid, k, x, eid) for eid, k, x in rows],
        "event_id long, event_type string, value double, seq long",
    ).select(
        "event_id",
        "event_type",
        "value",
        F.timestamp_seconds(F.col("seq") + 1_600_000_000).alias("ts"),
    )
    got = {
        (r["event_type"], r["lag"]): (r["n"], r["acf"])
        for r in acf_exact(df, max_lag=3).collect()
    }
    y = np.array([round(x * 100) for x in vals], dtype=object)  # cents
    m = y.sum() / len(y)
    den = ((y - m) ** 2).sum()
    for k in (1, 2, 3):
        want = (((y[k:] - m) * (y[:-k] - m)).sum()) / den
        n, acf = got[("a", k)]
        assert n == 200
        assert abs(acf - float(want)) < 1e-12, (k, acf, want)
        assert got[("const", k)] == (10, 0.0)


def test_seasonal_naive_eval_exact_metrics(spark):
    """A perfectly period-4 series has MAE=sMAPE=MASE=0 at season=4;
    a hand-computed tiny series pins the exact integer micros."""
    from demo_flink_spark.operators.timeseries import seasonal_naive_eval

    per = [10.0, 20.0, 30.0, 40.0] * 6
    rows = [(i, "periodic", v, i) for i, v in enumerate(per)]
    # key "tiny": values 1,2,4,8,9,11 at season=4 -> pairs (9,1),(11,2)
    tiny = [1.0, 2.0, 4.0, 8.0, 9.0, 11.0]
    rows += [(100 + i, "tiny", v, 100 + i) for i, v in enumerate(tiny)]
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, value double, seq long"
    ).select(
        "event_id", "event_type", "value",
        F.timestamp_seconds(F.col("seq") + 1_600_000_000).alias("ts"),
    )
    got = {
        r["event_type"]: r
        for r in seasonal_naive_eval(df, season=4).collect()
    }
    p = got["periodic"]
    assert (p["n_eval"], p["mae_micros"], p["smape_micros"]) == (20, 0, 0)
    assert p["mase_micros"] == 0

    t = got["tiny"]
    # errors in cents: |900-100|=800, |1100-200|=900 -> MAE = 850 cents
    assert t["n_eval"] == 2 and t["mae_micros"] == 8_500_000
    # smape terms (micros): 2*800e6/(1000) = 1_600_000, 2*900e6/1300
    # = 1384615.38 -> half-away 1384615; mean = (1600000+1384615+1)//2
    assert t["smape_micros"] == (2 * (1_600_000 + 1_384_615) + 2) // 4
    # lag-1 errors: 100,200,400,100,200 cents -> se1=1000, n1=5
    # MASE = (1700/2)/(1000/5) = 4.25
    assert t["mase_micros"] == 4_250_000
