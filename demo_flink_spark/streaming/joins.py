"""Streaming joins (SURVEY §2.3 engine extensions).

The reference has no joins; these are the streaming-native forms the
north star requires:

- **stream-static**: a stream enriched against a batch dimension —
  planned as a broadcast hash join per micro-batch (the batch twin is
  the oracle-checked `stream_static_join` query).
- **stream-stream**: both sides buffered in the state store; the
  event-time constraint + watermarks BOUND that state — without the
  time bound, both buffers grow forever. At 100 TB/day this bound is
  the difference between a runnable join and an OOM: state per side ≈
  rate × (watermark delay + join window).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def stream_static_enrich(stream: DataFrame, dim: DataFrame, on) -> DataFrame:
    """Enrich a stream with a broadcast batch dimension (inner)."""
    return stream.join(F.broadcast(dim), on)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    watermark: str = "10 seconds",
    within: str = "10 seconds",
    how: str = "inner",
) -> DataFrame:
    """Event-time-bounded stream-stream equi-join.

    Matches rows with equal `key` whose event times are within
    `within` of each other (right.ts ∈ [left.ts − within, left.ts +
    within]). Both inputs get watermarks so Spark can evict buffered
    rows once they can no longer match — bounded state, late rows
    dropped per the usual watermark contract. Outer variants emit the
    unmatched side after its watermark expires.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = (
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (
            F.col(f"r.{right_ts}")
            >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {within}")
        )
        & (
            F.col(f"r.{right_ts}")
            <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {within}")
        )
    )
    return lw.join(rw, cond, how)
