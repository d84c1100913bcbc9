"""Custom Python DataSource (Spark 4 DataSource API): a deterministic
synthetic event generator, batch + offset-tracked streaming.

The reference builds jobs on generator-style sources
(`env.fromElements(...)` / `env.socketTextStream(...)` —
`FraudDetectorExample.java:23-33`, `EventTimeWordCountDebug.java:31`);
this is the Spark-4-native way to ship such a connector: a
`pyspark.sql.datasource.DataSource` registered by name, after which
`spark.read.format("synthetic_events")` / `readStream` work like any
built-in format.

Why it matters at 100 TB: the same API surface is how a REAL custom
connector (internal feed, proprietary archive format) plugs in —
partition planning on the driver, row generation executor-side, and
for streaming an explicit offset contract (`initialOffset` /
`latestOffset` / `partitions(start, end)`) that makes every
micro-batch REPLAYABLE: re-reading the same offset range yields
byte-identical rows (event attributes are a pure hash of the event
id), which is the property exactly-once sinks need from their source.

Scale design: `partitions()` splits the id range into
`numPartitions` `RangePartition`s — generation is embarrassingly
parallel, nothing is materialized on the driver; a partition only
ever holds its own range. Everything is stdlib (md5) — no numpy in
the read path, so worker startup is cheap.

`read()` yields `pyarrow.RecordBatch`es, not per-row tuples: the
Spark 4 Python DataSource moves Arrow batches across the Python
worker boundary wholesale, so the per-row pickle/convert hop that
dominated the tuple path disappears and the connector is
batch-columnar end-to-end — the same "Arrow at every Python
boundary" rule the rest of the engine follows. Values are built by
the SAME `_row()` function, so the determinism/replay contract (and
the `pysource_event_counts` oracle hash) is unchanged.
"""

from __future__ import annotations

import hashlib
import json
from collections.abc import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    InputPartition,
    WriterCommitMessage,
)
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_EVENT_TYPES = ("view", "click", "purchase", "error")

SCHEMA = StructType(
    [
        StructField("event_id", LongType()),
        StructField("user_id", LongType()),
        StructField("event_type", StringType()),
        StructField("value", DoubleType()),
    ]
)


def _row(i: int) -> tuple[int, int, str, float]:
    """Event `i` as a pure function of `i` (md5-derived attributes):
    the determinism contract every replayed offset range relies on."""
    h = hashlib.md5(f"syn:{i}".encode()).hexdigest()
    user = int(h[:4], 16) % 100
    etype = _EVENT_TYPES[int(h[4], 16) % len(_EVENT_TYPES)]
    value = round(int(h[5:9], 16) % 20000 / 100.0, 2)
    return (i, user, etype, value)


class RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


_ARROW_CHUNK = 8192


def _arrow_batches(start: int, end: int):
    """Yield the id range [start, end) as Arrow RecordBatches of up to
    `_ARROW_CHUNK` rows, built from the same `_row()` values the tuple
    path produced (bit-identical floats — Python float -> float64)."""
    import pyarrow as pa

    fields = [
        pa.field("event_id", pa.int64()),
        pa.field("user_id", pa.int64()),
        pa.field("event_type", pa.string()),
        pa.field("value", pa.float64()),
    ]
    schema = pa.schema(fields)
    for lo in range(start, end, _ARROW_CHUNK):
        hi = min(lo + _ARROW_CHUNK, end)
        rows = [_row(i) for i in range(lo, hi)]
        cols = list(zip(*rows)) if rows else ([], [], [], [])
        yield pa.RecordBatch.from_arrays(
            [pa.array(c, type=f.type) for c, f in zip(cols, fields)],
            schema=schema,
        )


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_parts = int(options.get("numPartitions", 8))

    def partitions(self) -> list[InputPartition]:
        step = max(1, -(-self.n_rows // self.n_parts))
        return [
            RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)
        ]

    def read(self, partition: RangePartition) -> Iterator:
        yield from _arrow_batches(partition.start, partition.end)


class SyntheticEventsStreamReader(DataSourceStreamReader):
    """Offset contract: the offset is the next unread event id. Each
    `latestOffset` call advances by `rowsPerBatch` — a bounded,
    deterministic micro-batch; `partitions(start, end)` re-splits any
    committed-or-not range identically, so recovery replays exactly
    the rows the failed batch contained.

    On checkpoint recovery the reader object is fresh (`_current=0`)
    but Spark replays the WAL-committed offsets through
    `partitions(start, end)` / `commit(end)` — both fast-forward the
    cursor to the highest offset Spark has already planned, so
    `latestOffset` can never regress below a committed offset and
    re-deliver committed rows under new batch ids (which would break
    the exactly-once property the ledger sink relies on)."""

    def __init__(self, options: dict):
        self.rows_per_batch = int(options.get("rowsPerBatch", 50))
        self.n_parts = int(options.get("numPartitions", 4))
        self.max_rows = int(options.get("maxRows", 1 << 60))
        self._current = 0

    def initialOffset(self) -> dict:
        return {"next": 0}

    def latestOffset(self) -> dict:
        self._current = min(self._current + self.rows_per_batch, self.max_rows)
        return {"next": self._current}

    def partitions(self, start: dict, end: dict) -> list[InputPartition]:
        # recovery fast-forward: never fall behind a WAL-planned range
        self._current = max(self._current, end["next"])
        lo, hi = start["next"], end["next"]
        if hi <= lo:
            return [RangePartition(lo, lo)]
        step = max(1, -(-(hi - lo) // self.n_parts))
        return [
            RangePartition(p, min(p + step, hi)) for p in range(lo, hi, step)
        ]

    def read(self, partition: RangePartition) -> Iterator:
        yield from _arrow_batches(partition.start, partition.end)

    def commit(self, end: dict) -> None:
        # nothing to clean up (rows are a pure function of id), but a
        # committed offset is a floor for the cursor after recovery
        self._current = max(self._current, end["next"])

    def stop(self) -> None:
        pass


class SyntheticEventsDataSource(DataSource):
    """`spark.dataSource.register(SyntheticEventsDataSource)` then
    `spark.read.format("synthetic_events").option("n_rows", ...)`."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> StructType:
        return SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SyntheticEventsReader(self.options)

    def streamReader(self, schema: StructType) -> DataSourceStreamReader:
        return SyntheticEventsStreamReader(self.options)


def expected_rows(n: int) -> list[tuple[int, int, str, float]]:
    """Driver-side reference for tests: the first `n` events."""
    return [_row(i) for i in range(n)]


def offsets_roundtrip(offset: dict) -> dict:
    """Offsets must survive JSON serialization (Spark persists them in
    the checkpoint WAL)."""
    return json.loads(json.dumps(offset))


# --------------------------------------------------------------------------
# Custom sink half of the connector story: a manifest-committed file
# sink with the task-attempt → driver-commit protocol a REAL external
# store needs (the reference's side writes to Kafka/print, where the
# broker/console absorbs atomicity; writing to a plain directory makes
# the protocol explicit and testable).


class _PartMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


def _manifest_dir(options: dict) -> str:
    path = options.get("path")
    if not path:
        raise ValueError("ledger sink requires option('path', ...)")
    return path


class LedgerWriter(DataSourceWriter):
    """Each task writes a uniquely-named part file (attempt-isolated:
    a speculative/retried task writes a DIFFERENT uuid, so losers
    leave only orphans); the driver's `commit` publishes the manifest
    listing exactly the winning parts. Readers trust ONLY the
    manifest — orphan parts are invisible, which is the whole
    exactly-once trick (same design as Spark's own FileOutputCommitter
    v2 + _SUCCESS, spelled out in ~40 lines)."""

    def __init__(self, options: dict, overwrite: bool = False):
        self.path = _manifest_dir(options)
        self.overwrite = overwrite

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartMessage(part, n)

    def commit(self, messages):
        import json as _json
        import os

        # sorted by part name: a deterministic manifest for diffing
        parts = sorted(
            (
                {"path": os.path.basename(m.path), "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ),
            key=lambda d: d["path"],
        )
        manifest = {
            "parts": parts,
            "n_rows": sum(p["n_rows"] for p in parts),
        }
        tmp = os.path.join(self.path, "_MANIFEST.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, "_MANIFEST.json"))

    def abort(self, messages):
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


class LedgerDataSource(DataSource):
    """Write-side registered format: `df.write.format("ledger")
    .option("path", dir).save()` → attempt-isolated parts + an
    atomically-published manifest."""

    @classmethod
    def name(cls) -> str:
        return "ledger"

    def schema(self) -> StructType:  # pragma: no cover - sink only
        return SCHEMA

    def writer(self, schema: StructType, overwrite: bool):
        return LedgerWriter(self.options, overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return LedgerStreamWriter(self.options)


def read_ledger(path: str) -> list[dict]:
    """Manifest-trusting reader: rows from LISTED parts only — orphan
    parts from failed/speculative attempts are invisible."""
    import json as _json
    import os

    with open(os.path.join(path, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    rows: list[dict] = []
    for part in manifest["parts"]:
        with open(os.path.join(path, part["path"])) as f:
            rows.extend(_json.loads(line) for line in f)
    return rows


class LedgerStreamWriter(DataSourceStreamWriter):
    """Streaming half of the ledger sink: per-micro-batch manifests
    `_MANIFEST-<batchId>.json`, published atomically at driver commit.
    A REPLAYED batch (recovery re-runs the last uncommitted batch)
    re-publishes the SAME batch id, replacing its manifest — so the
    manifest set is exactly-once even though part files from the
    failed attempt linger as invisible orphans. `read_ledger_stream`
    is the manifest-trusting reader: one manifest per batch id, listed
    parts only."""

    def __init__(self, options: dict):
        self.path = _manifest_dir(options)

    def write(self, iterator):
        import json as _json
        import os
        import uuid

        os.makedirs(self.path, exist_ok=True)
        part = os.path.join(self.path, f"part-{uuid.uuid4().hex}.jsonl")
        n = 0
        with open(part, "w") as f:
            for row in iterator:
                f.write(_json.dumps(row.asDict()) + "\n")
                n += 1
        return _PartMessage(part, n)

    def commit(self, messages, batchId: int) -> None:
        import json as _json
        import os

        parts = sorted(
            (
                {"path": os.path.basename(m.path), "n_rows": m.n_rows}
                for m in messages
                if m is not None
            ),
            key=lambda d: d["path"],
        )
        manifest = {
            "batch_id": batchId,
            "parts": parts,
            "n_rows": sum(p["n_rows"] for p in parts),
        }
        tmp = os.path.join(self.path, f"_MANIFEST-{batchId}.tmp")
        with open(tmp, "w") as f:
            _json.dump(manifest, f)
        os.replace(tmp, os.path.join(self.path, f"_MANIFEST-{batchId}.json"))

    def abort(self, messages, batchId: int) -> None:
        import os

        for m in messages or []:
            if m is not None and os.path.exists(m.path):
                os.remove(m.path)


def read_ledger_stream(path: str) -> list[dict]:
    """Rows from every committed batch manifest — exactly one manifest
    per batch id regardless of replays; orphan parts invisible."""
    import glob
    import json as _json
    import os

    rows: list[dict] = []
    for mf in sorted(glob.glob(os.path.join(path, "_MANIFEST-*.json"))):
        with open(mf) as f:
            manifest = _json.load(f)
        for part in manifest["parts"]:
            with open(os.path.join(path, part["path"])) as f:
                rows.extend(_json.loads(line) for line in f)
    return rows
