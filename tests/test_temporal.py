"""Semantics tests for the temporal operators (as-of / range / rollup)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.operators import temporal as tp


def _ts(s):
    return F.to_timestamp(F.lit(s))


def test_asof_join_at_or_before_semantics(spark):
    # right row exactly at the left ts IS visible (at-or-before);
    # later right rows are not; keys with no prior right row get NULL
    left = spark.createDataFrame(
        [
            (1, 100, "2024-01-01 00:10:00"),
            (1, 101, "2024-01-01 00:20:00"),
            (2, 200, "2024-01-01 00:05:00"),
        ],
        "user_id long, event_id long, ts_s string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, "2024-01-01 00:10:00", 10.0),  # simultaneous with event 100
            (1, "2024-01-01 00:15:00", 20.0),
            (2, "2024-01-01 00:30:00", 99.0),  # after key 2's only click
        ],
        "user_id long, ts_s string, value double",
    ).select("user_id", F.to_timestamp("ts_s").alias("ts"), "value")
    got = {
        r["event_id"]: r["asof_value"]
        for r in tp.asof_join(left, right, "user_id", value_cols=["value"]).collect()
    }
    assert got == {100: 10.0, 101: 20.0, 200: None}


def test_range_join_window_exact_and_no_dupes(spark):
    left = spark.createDataFrame(
        [(1, 1, "2024-01-01 00:10:00")],
        "user_id long, event_id long, ts_s string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    right = spark.createDataFrame(
        [
            (1, 2, "2024-01-01 00:05:00"),  # exactly -300s: included
            (1, 3, "2024-01-01 00:15:00"),  # exactly +300s: included
            (1, 4, "2024-01-01 00:15:00.001"),  # 1ms past: excluded
            (1, 5, "2024-01-01 00:10:30"),  # same bucket: included once
        ],
        "user_id long, event_id long, ts_s string",
    ).select("user_id", "event_id", F.to_timestamp("ts_s").alias("ts"))
    rows = tp.range_join_window(left, right, "user_id", 300_000).collect()
    pairs = sorted((r["event_id"], r["r_event_id"], r["delta_ms"]) for r in rows)
    assert pairs == [(1, 2, 300000), (1, 3, -300000), (1, 5, -30000)]


def test_rollup_reaggregation_consistency(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    ev = ev.withColumn("ts", F.timestamp_micros((F.col("ts") / 1000).cast("long"))) \
        if dict(ev.dtypes)["ts"] == "bigint" else ev
    out = tp.rollup_time_multi(ev, "ts", "event_type", "value").collect()
    hourly = [r for r in out if r["granularity"] == "1 hour"]
    daily = [r for r in out if r["granularity"] == "1 day"]
    # daily counts must equal the sum of their hourly constituents;
    # sums are scale-6 integer micros so re-aggregation is EXACT
    assert sum(r["cnt"] for r in daily) == sum(r["cnt"] for r in hourly)
    assert sum(r["sum_micros"] for r in daily) == sum(r["sum_micros"] for r in hourly)


def test_asof_forward_at_or_after_semantics(spark):
    from demo_flink_spark.operators import temporal as tp
    from pyspark.sql import functions as F

    left = spark.createDataFrame(
        [("u", 100, 1), ("u", 200, 2), ("u", 300, 3)],
        "k string, ts long, id long",
    )
    right = spark.createDataFrame(
        [("u", 200, 20.0), ("u", 250, 25.0)], "k string, ts long, v double"
    )
    out = {
        r.id: r.asof_v
        for r in tp.asof_join(
            left, right, key="k", value_cols=["v"], direction="forward"
        ).collect()
    }
    # ts=100 -> next right at 200; ts=200 -> the simultaneous row IS
    # visible (at-or-after); ts=300 -> nothing follows
    assert out == {1: 20.0, 2: 20.0, 3: None}


def test_interval_overlap_join_exact_pairs_and_boundaries(spark):
    from demo_flink_spark.operators.temporal import interval_overlap_join

    # grid 10: a1 spans 3 buckets; touching intervals (end == start) do
    # NOT overlap (half-open); a3/b3 overlap within one bucket
    left = spark.createDataFrame(
        [(1, 5, 35), (2, 40, 50), (3, 100, 104)],
        "id long, start_ms long, end_ms long",
    )
    right = spark.createDataFrame(
        [(10, 30, 41), (11, 50, 60), (12, 101, 102), (13, 0, 5)],
        "id long, start_ms long, end_ms long",
    )
    out = interval_overlap_join(left, right, grid_ms=10)
    rows = {(r["a_id"], r["b_id"]): r["overlap_ms"] for r in out.collect()}
    # a1 x b10: [5,35) x [30,41) -> 5; a2 x b10: [40,50) x [30,41) -> 1;
    # a3 x b12 -> 1. a2 x b11 touch at 50 (no); a1 x b13 touch at 5 (no).
    assert rows == {(1, 10): 5, (2, 10): 1, (3, 12): 1}
    # exactly-once: no duplicate pair rows even when spans share
    # multiple buckets
    assert out.count() == out.select("a_id", "b_id").distinct().count()


def test_cep_pattern_strict_contiguity_and_within(spark):
    from datetime import datetime

    from demo_flink_spark.operators.temporal import sequence_pattern_matches

    def t(m):
        return datetime(2024, 1, 1, 0, m, 0)

    rows = [
        # user a: clean view->click->purchase run inside the window
        (1, t(0), "a", "view"),
        (2, t(1), "a", "click"),
        (3, t(2), "a", "purchase"),
        # user b: pattern broken by an interleaved error (strict!)
        (4, t(0), "b", "view"),
        (5, t(1), "b", "error"),
        (6, t(2), "b", "click"),
        (7, t(3), "b", "purchase"),
        # user c: right sequence but too slow (within=5 minutes)
        (8, t(0), "c", "view"),
        (9, t(2), "c", "click"),
        (10, t(20), "c", "purchase"),
        # user d: overlapping double match (view click view... no)
        (11, t(0), "d", "view"),
        (12, t(1), "d", "click"),
        (13, t(2), "d", "purchase"),
        (14, t(3), "d", "view"),
        (15, t(4), "d", "click"),
        (16, t(5), "d", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id string, event_type string"
    )
    out = sequence_pattern_matches(
        df, ["view", "click", "purchase"], within="5 minutes"
    ).collect()
    got = {(r["user_id"], r["start_event_id"]) for r in out}
    assert got == {("a", 1), ("d", 11), ("d", 14)}
    # boundary: span exactly equal to `within` is INCLUDED (<=)
    edge = spark.createDataFrame(
        [
            (1, t(0), "e", "view"),
            (2, t(1), "e", "click"),
            (3, t(5), "e", "purchase"),
        ],
        "event_id long, ts timestamp, user_id string, event_type string",
    )
    hit = sequence_pattern_matches(
        edge, ["view", "click", "purchase"], within="5 minutes"
    ).collect()
    assert len(hit) == 1 and str(hit[0]["end_ts"]).endswith("00:05:00")
