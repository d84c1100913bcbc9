"""Boundary-semantics tests for the window operators."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F


def test_session_window_merges_exact_gap_boundary(spark):
    # An event arriving EXACTLY gap after the previous one: Spark's
    # session_window MERGES it (adjacent windows [0,5) and [5,10)
    # coalesce into one session ending last_ts+gap). The DuckDB oracle
    # in plans/windows.py uses `<= INTERVAL '5 minutes'` which matches;
    # this test pins both engines to that semantics so a regression in
    # either direction fails loudly (ADVICE r1 flagged this boundary).
    df = spark.createDataFrame(
        [
            ("u", "2024-01-01 00:00:00"),
            ("u", "2024-01-01 00:05:00"),  # exactly gap later -> merges
            ("u", "2024-01-01 00:10:00.000001"),  # 1us past gap -> new
        ],
        "user_id string, ts_s string",
    ).withColumn("ts", F.to_timestamp("ts_s"))
    out = sorted(
        (str(r["start"]), str(r["end"]), r["n"])
        for r in df.groupBy(F.session_window("ts", "5 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("w.start", "w.end", "n")
        .collect()
    )
    assert out == [
        ("2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        ("2024-01-01 00:10:00.000001", "2024-01-01 00:15:00.000001", 1),
    ]

    # the gaps-and-islands oracle rewrite groups identically
    con = duckdb.connect()
    con.execute(
        """
        CREATE TABLE events AS SELECT * FROM (VALUES
          ('u', TIMESTAMP '2024-01-01 00:00:00'),
          ('u', TIMESTAMP '2024-01-01 00:05:00'),
          ('u', TIMESTAMP '2024-01-01 00:10:00.000001')) t(user_id, ts)
        """
    )
    oracle = con.execute(
        """
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                             <= INTERVAL '5 minutes' THEN 0 ELSE 1 END AS new_session
            FROM events
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                          ROWS UNBOUNDED PRECEDING) AS session_id
            FROM flagged
        )
        SELECT min(ts), max(ts) + INTERVAL '5 minutes', count(*)
        FROM sessions GROUP BY user_id, session_id ORDER BY 1
        """
    ).fetchall()
    assert [(str(a), str(b), n) for a, b, n in oracle] == [
        ("2024-01-01 00:00:00", "2024-01-01 00:10:00", 2),
        ("2024-01-01 00:10:00.000001", "2024-01-01 00:15:00.000001", 1),
    ]
