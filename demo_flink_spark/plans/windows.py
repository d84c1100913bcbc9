"""Declared queries: time-window operators over `events` (SURVEY §2.5).

Batch twins of the streaming window operators — `window()` /
`session_window()` group identically in batch and streaming, so the
oracle checks here carry over to the Structured Streaming versions in
`demo_flink_spark.streaming` (which pytest covers with real streams).

Reference parity: tumbling event-time window
(`EventTimeWordCountDebug.java:100-105`, W3), sliding window
(`AdvancedWordCount.java:40` commented, W7), session windows (engine
extension, built-in since Spark 3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators.relational import dsum
from demo_flink_spark.operators.wordcount import windowed_event_count
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """10-second tumbling count per event_type (W3)."""
    return windowed_event_count(load_table(spark, sf_dir, "events"))


def q_tumbling_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-day tumbling window, summed value per event_type."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "1 day")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.round(dsum(F.col("value")), 6).alias("sum_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "sum_value")
    )


def q_window_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Windowed Top-N (the classic streaming-SQL pattern Flink ships
    as its TopN example): per 1-hour tumbling window, the top-3 users
    by event count, rank carried in the result. Composition: windowed
    pre-aggregation (map-side combined) -> per-window rank window
    function over the (windows x users) aggregate — the full corpus
    never reaches the rank stage."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy(
        F.window("ts", "1 hour").alias("w"), "user_id"
    ).agg(F.count(F.lit(1)).alias("cnt"))
    from pyspark.sql.window import Window as W

    rk = F.row_number().over(
        W.partitionBy("w").orderBy(F.desc("cnt"), F.asc("user_id"))
    )
    return (
        counts.withColumn("rk", rk.cast("long"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("w.start").alias("window_start"), "user_id", "cnt", "rk"
        )
    )


def q_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10-minute size, 5-minute slide, count per
    event_type (W7). Each event contributes to exactly 2 windows —
    Spark's window() generator emits both assignments; no shuffle
    beyond the final agg."""
    ev = load_table(spark, sf_dir, "events")
    w = F.window("ts", "10 minutes", "5 minutes")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def q_processing_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6: processing-time tumbling window (`WindowWordCount.java:9`
    imports TumblingProcessingTimeWindows).

    Processing time = when the record reaches the operator, not its
    event timestamp. In production streaming that's a
    `current_timestamp()` stamp at arrival — no watermark, windows
    close on the wall clock. For a deterministic, oracle-checkable
    twin we stamp an explicit arrival timestamp (steady 25 ms
    inter-arrival in event_id order, epoch 2024-01-01) and window on
    it; the operator shape — stamp → window() → agg, event-time column
    ignored — is exactly the processing-time pipeline.
    """
    ev = load_table(spark, sf_dir, "events")
    arrival = F.timestamp_millis(F.lit(1704067200000) + F.col("event_id") * 25)
    w = F.window(arrival, "10 seconds")
    return (
        ev.groupBy(w.alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(F.col("w.start").alias("window_start"), "event_type", "cnt")
    )


def q_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows with a 5-minute inactivity gap per user.

    `session_window` merges events whose gaps are ≤ 5 min; the window
    end is last-event + gap. The oracle is the classic gaps-and-islands
    rewrite (lag → new-session flag → cumulative session id), proving
    the semantics equivalence rather than assuming it.
    """
    ev = load_table(spark, sf_dir, "events")
    sw = F.session_window("ts", "5 minutes")
    return (
        ev.groupBy(sw.alias("w"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(dsum(F.col("value")), 6).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "user_id",
            "n_events",
            "sum_value",
        )
    )


SPECS = [
    QuerySpec(
        "window_topn_users_hourly",
        q_window_topn,
        oracle="""
        WITH counts AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   user_id, count(*) AS cnt
            FROM events GROUP BY 1, 2
        ),
        ranked AS (
            SELECT window_start, user_id, cnt,
                   row_number() OVER (PARTITION BY window_start
                                      ORDER BY cnt DESC, user_id ASC) AS rk
            FROM counts
        )
        SELECT window_start, user_id, cnt, rk FROM ranked WHERE rk <= 3
        """,
    ),
    QuerySpec(
        "window_tumbling_10s",
        q_tumbling,
        oracle="""
        SELECT time_bucket(INTERVAL '10 seconds', ts) AS window_start,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
        """,
    ),
    QuerySpec(
        "window_tumbling_1d",
        q_tumbling_daily_value,
        oracle="""
        SELECT time_bucket(INTERVAL '1 day', ts) AS window_start,
               event_type,
               round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
        FROM events GROUP BY 1, 2
        """,
    ),
    QuerySpec(
        "window_sliding_10m_5m",
        q_sliding,
        oracle="""
        WITH assigned AS (
            SELECT unnest([
                       time_bucket(INTERVAL '5 minutes', ts),
                       time_bucket(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes'
                   ]) AS window_start,
                   event_type
            FROM events
        )
        SELECT window_start, event_type, count(*) AS cnt
        FROM assigned GROUP BY 1, 2
        """,
    ),
    QuerySpec(
        "window_processing_time_10s",
        q_processing_time,
        oracle="""
        SELECT time_bucket(INTERVAL '10 seconds',
                           epoch_ms(1704067200000 + event_id * 25)) AS window_start,
               event_type, count(*) AS cnt
        FROM events GROUP BY 1, 2
        """,
    ),
    QuerySpec(
        "window_session_5m",
        q_session,
        oracle="""
        WITH flagged AS (
            SELECT user_id, ts, value,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL '5 minutes' THEN 0 ELSE 1 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts, value,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT min(ts) AS session_start,
               max(ts) + INTERVAL '5 minutes' AS session_end,
               user_id,
               count(*) AS n_events,
               round(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS sum_value
        FROM sessions GROUP BY user_id, session_id
        """,
    ),
]
