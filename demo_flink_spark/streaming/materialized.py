"""Incrementally-maintained aggregate snapshot (continuous aggregate /
materialized view) over Structured Streaming.

The built-in stateful aggregation keeps its running totals inside the
state store, visible only through the sink's output stream. Many
pipelines instead want a QUERYABLE TABLE that any batch reader can
scan at any time — Flink users get this by writing an upsert stream
into an external keyed store. Here the same pattern is one
`foreachBatch` merge:

    per batch: aggregate the micro-batch -> combine with the current
    snapshot (full-outer merge on the keys) -> atomically publish.

Scale design: the per-batch aggregate is map-side-combined to ~|keys|
rows; the merge joins |snapshot| x |batch keys| — both aggregate-sized,
not event-sized. Publishing is write-new-generation + atomic swap, so
concurrent readers always see a complete snapshot (the same
write-audit-publish shape a 100 TB lakehouse uses; swap the directory
rename for a transactional table commit there). Restart safety comes
from foreachBatch's stable batch ids + the generation marker: a replayed
batch id is detected and skipped instead of double-counted.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


class _GenerationalSnapshot:
    """Shared write-audit-publish machinery: parquet generations at
    `path/gen-N` with an atomically-swapped `_CURRENT` marker, replay
    detection by stable batch id, and GC of superseded generations."""

    def __init__(self, spark: SparkSession, path: str) -> None:
        self.spark = spark
        self.path = path

    def _current_gen(self) -> int:
        marker = os.path.join(self.path, "_CURRENT")
        if not os.path.exists(marker):
            return -1
        with open(marker) as f:
            return int(f.read().strip().split("-")[1])

    def read_snapshot(self) -> DataFrame | None:
        gen = self._current_gen()
        if gen < 0:
            return None
        return self.spark.read.parquet(os.path.join(self.path, f"gen-{gen}"))

    def _publish(self, merged: DataFrame, batch_id: int) -> None:
        new_dir = os.path.join(self.path, f"gen-{batch_id}")
        merged.write.mode("overwrite").parquet(new_dir)
        # publish atomically: tmp marker + rename
        tmp = os.path.join(self.path, "_CURRENT.tmp")
        with open(tmp, "w") as f:
            f.write(f"gen-{batch_id}")
        os.replace(tmp, os.path.join(self.path, "_CURRENT"))
        # GC superseded generations (readers mid-scan on a local FS
        # have already opened their files; on object stores, lifecycle
        # rules handle this instead)
        for name in os.listdir(self.path):
            if name.startswith("gen-") and int(name.split("-")[1]) < batch_id:
                shutil.rmtree(os.path.join(self.path, name), ignore_errors=True)


class IncrementalAggSink(_GenerationalSnapshot):
    """foreachBatch callable maintaining `sum`-combinable aggregates
    per key as a parquet snapshot at `path`.

    `aggs` maps output column -> batch-level aggregate Column; the
    cross-batch combine is addition (counts/sums — the decomposable
    case; min/max would combine with least/greatest)."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        aggs: dict[str, Column],
    ) -> None:
        super().__init__(spark, path)
        self.key_cols = list(key_cols)
        self.aggs = dict(aggs)

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        gen = self._current_gen()
        if batch_id <= gen:
            return  # replayed batch after restart: already merged
        batch_agg = batch_df.groupBy(*self.key_cols).agg(
            *(c.alias(k) for k, c in self.aggs.items())
        )
        old = self.read_snapshot()
        if old is None:
            merged = batch_agg
        else:
            o = old.select(
                *self.key_cols,
                *(F.col(k).alias(f"_old_{k}") for k in self.aggs),
            )
            merged = (
                batch_agg.join(o, self.key_cols, "full_outer")
                .select(
                    *self.key_cols,
                    *(
                        (
                            F.coalesce(F.col(k), F.lit(0))
                            + F.coalesce(F.col(f"_old_{k}"), F.lit(0))
                        ).alias(k)
                        for k in self.aggs
                    ),
                )
            )
        self._publish(merged, batch_id)


class UpsertSink(_GenerationalSnapshot):
    """foreachBatch callable maintaining LAST-WRITE-WINS row state per
    key — the consumer of a keyed changelog (Flink's upsert-stream-
    into-keyed-store pattern; the batch twin is `cdc_upsert_snapshot`).

    Rows are ordered by `seq_col` (a monotone change sequence —
    Kafka offset, CDC LSN); the highest sequence per key wins both
    within a batch and against the snapshot (the snapshot keeps each
    key's winning seq, so replays and out-of-order batches resolve
    correctly). A `delete_col` boolean marks tombstones: a winning
    tombstone removes the key from the snapshot.

    Scale: the per-batch reduce is one max_by aggregate (map-side
    combined to |batch keys| rows); the merge unions |snapshot| +
    |batch winners| and re-reduces — aggregate-sized, not
    event-sized, exactly like the agg sink.

    Ordering contract: tombstones are dropped at publish (no retained
    seq), so an update with a LOWER seq than an applied delete that
    arrives in a LATER batch would resurrect the key. This is the
    standard compacted-topic assumption — per-key changes arrive in
    seq order across batches (Kafka partitions guarantee it); retain
    tombstones for a window instead if the source can reorder keys.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        key_cols: list[str],
        seq_col: str,
        delete_col: str | None = None,
    ) -> None:
        super().__init__(spark, path)
        self.key_cols = list(key_cols)
        self.seq_col = seq_col
        self.delete_col = delete_col

    def _reduce(self, df: DataFrame) -> DataFrame:
        value_cols = [c for c in df.columns if c not in self.key_cols]
        winner = df.groupBy(*self.key_cols).agg(
            F.max_by(F.struct(*value_cols), F.col(self.seq_col)).alias("_w")
        )
        return winner.select(
            *self.key_cols, *(F.col(f"_w.{c}").alias(c) for c in value_cols)
        )

    def __call__(self, batch_df: DataFrame, batch_id: int) -> None:
        gen = self._current_gen()
        if batch_id <= gen:
            return  # replayed batch after restart: already applied
        merged = self._reduce(batch_df)
        old = self.read_snapshot()
        if old is not None:
            merged = self._reduce(old.unionByName(merged))
        if self.delete_col:
            merged = merged.filter(
                ~F.coalesce(F.col(self.delete_col), F.lit(False))
            )
        self._publish(merged, batch_id)


def upsert_sink(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    seq_col: str,
    checkpoint_dir: str,
    delete_col: str | None = None,
    **trigger,
):
    """Start a streaming query maintaining the keyed upsert snapshot;
    returns (query, sink) — call `sink.read_snapshot()` any time."""
    sink = UpsertSink(spark, path, key_cols, seq_col, delete_col)
    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return query, sink


def incremental_agg_sink(
    stream: DataFrame,
    spark: SparkSession,
    path: str,
    key_cols: list[str],
    aggs: dict[str, Column],
    checkpoint_dir: str,
    **trigger,
):
    """Start a streaming query maintaining the snapshot; returns
    (query, sink) — call `sink.read_snapshot()` any time."""
    sink = IncrementalAggSink(spark, path, key_cols, aggs)
    query = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(**(trigger or {"availableNow": True}))
        .start()
    )
    return query, sink
