"""Late-data side output (SURVEY §2.5 W5 — the hard item).

Flink: `OutputTag("late-data")` + `.sideOutputLateData(tag)` diverts
records later than watermark+lateness to a second stream
(`EventTimeWordCountDebug.java:96-108`). Spark has no built-in — the
windowed aggregation silently DROPS post-watermark rows.

`LateRouter` recovers the semantics in `foreachBatch`: it tracks the
max event time seen in *completed* batches (exactly the quantity
Spark's own watermark is derived from — updated between batches, not
within one) and classifies each incoming batch against
`max_seen − delay`:

- on-time rows → the main handler (e.g. append to the agg input table
  or process directly);
- too-late rows → the late handler (side output), never counted.

The cutoff uses the PREVIOUS batches' max (like Spark's watermark,
which also lags one batch), so a batch's own newest rows can never
mark its older rows late — matching Flink's "watermark advances after
the element" ordering.

Scale note: the router state is one long on the driver; the filter
runs distributed. For per-key watermarks (Flink doesn't have them
either) key the state store instead.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.functions.time import epoch_ms


class LateRouter:
    """foreachBatch callable splitting each micro-batch into
    on-time/late against an observed-watermark cutoff."""

    def __init__(
        self,
        ts_col: str,
        delay_ms: int,
        on_time: Callable[[DataFrame, int], None],
        on_late: Callable[[DataFrame, int], None],
    ) -> None:
        self.ts_col = ts_col
        self.delay_ms = delay_ms
        self.on_time = on_time
        self.on_late = on_late
        self.max_seen_ms: int | None = None

    def watermark_ms(self) -> int | None:
        """Current watermark (max seen − delay), None before any data."""
        if self.max_seen_ms is None:
            return None
        return self.max_seen_ms - self.delay_ms

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        ts_ms = epoch_ms(self.ts_col)
        batch_df = batch_df.withColumn("_ts_ms", ts_ms).persist()
        try:
            wm = self.watermark_ms()
            if wm is None:
                on_time, late = batch_df, batch_df.filter(F.lit(False))
            else:
                on_time = batch_df.filter(F.col("_ts_ms") >= wm)
                late = batch_df.filter(F.col("_ts_ms") < wm)
            self.on_time(on_time.drop("_ts_ms"), batch_id)
            self.on_late(late.drop("_ts_ms"), batch_id)
            # advance AFTER routing: this batch's rows can't be late
            # against their own batch's max (Flink ordering).
            batch_max = batch_df.agg(F.max("_ts_ms")).first()[0]
            if batch_max is not None and (
                self.max_seen_ms is None or batch_max > self.max_seen_ms
            ):
                self.max_seen_ms = batch_max
        finally:
            batch_df.unpersist()
