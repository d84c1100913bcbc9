"""End-to-end tests for the reference-job parity module."""

from __future__ import annotations

from demo_flink_spark import jobs
from tests.test_stateful import F3_TXS, F4_EVENTS, F5_CLICKS


def test_user_click_counter_job(spark):
    src = spark.createDataFrame(F5_CLICKS, "seq long, user_id string, action string")
    out = jobs.user_click_counter(spark, src)
    assert {r["seq"]: r["clicks"] for r in out.collect()} == {
        1: 1, 2: 1, 3: 2, 4: 1, 5: 2, 6: 3,
    }


def test_user_event_list_job(spark):
    src = spark.createDataFrame(F4_EVENTS, "seq long, user_id string, event string")
    out = jobs.user_event_list(spark, src)
    assert {r["seq"]: r["history"] for r in out.collect()}[5] == "login,click,purchase"


def test_fraud_detector_job(spark):
    src = spark.createDataFrame(
        F3_TXS, "seq long, user_id string, amount double, ts_ms long"
    )
    alerts = jobs.fraud_detector(spark, src).collect()
    assert sorted((r["user_id"], r["ts_ms"]) for r in alerts) == [
        ("user1", 2500),
        ("user2", 19000),
    ]


def test_streaming_jobs_build_plans(spark):
    """The socket jobs must at least produce valid streaming plans
    (isStreaming=True with the expected schema) without a live server."""
    for fn in (jobs.window_word_count, jobs.advanced_word_count):
        df = fn(spark, "localhost", 59999)
        assert df.isStreaming and set(df.columns) == {"word", "cnt"}
    df = jobs.event_time_word_count(spark, "localhost", 59999)
    assert df.isStreaming and set(df.columns) == {"window_start", "word", "cnt"}
