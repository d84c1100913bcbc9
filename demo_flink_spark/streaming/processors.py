"""Keyed stateful operators as `transformWithStateInPandas` processors.

The heart of the reference (SURVEY §2.6): four Flink Rich*Function /
ProcessFunction operators re-expressed as Spark `StatefulProcessor`s.
Lifecycle mapping: Flink `open()` → `init(handle)` (state declaration
by name + schema); `processElement()` → `handleInputRows()` (per-key
Arrow batches); keyed `ValueState`/`ListState` map one-to-one.

Determinism contract: Flink's demo jobs pin parallelism to 1 so
arrival order is list order (`FraudDetectorExample.java:44`). Spark
gives no cross-partition order, so every processor sorts its in-batch
rows by an explicit `seq` column before stepping the kernel —
deterministic under any partitioning, which is what a 1000-executor
run needs anyway. Across micro-batches, order = batch arrival order
(same contract as any streaming engine).

State lives in the executor-local RocksDB state store (see
session.py), checkpointed per micro-batch — at 100 TB keyed state
this is the scale path Flink's heap backend doesn't have.

Runtime dependency note: `transformWithStateInPandas`'s state client
imports `google.protobuf` at query start. Environments without
protobuf (like this container) run the same operators through the
`applyInPandasWithState` twins in `streaming.stateful_ops` — the
harness auto-selects; kernels and golden outputs are identical.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from demo_flink_spark.functions.state_kernels import (
    FraudState,
    cdc_step,
    fraud_step,
    iter_sorted,
)

# ---------------------------------------------------------------------------
# ST4 — running click counter (`UserClickCounter.java:39-61`)
# ---------------------------------------------------------------------------

RUNNING_COUNT_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("seq", LongType()),
        StructField("clicks", LongType()),
    ]
)


class RunningCounter(StatefulProcessor):
    """Per-key ValueState counter, one output row per input record.

    Parity: `ClickCountingFunction` (`UserClickCounter.java:39-61`) —
    read count, +1, update, emit. Emission is per record (not per
    batch), matching Flink's per-element emission exactly.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._count = handle.getValueState(
            "count", StructType([StructField("n", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        n = self._count.get()[0] if self._count.exists() else 0
        out_seq, out_n = [], []
        for row in iter_sorted(rows):
            n += 1
            out_seq.append(int(row.seq))
            out_n.append(n)
        self._count.update((n,))
        yield pd.DataFrame(
            {"user_id": key[0], "seq": out_seq, "clicks": out_n}
        )

    def close(self) -> None:
        pass


# ---------------------------------------------------------------------------
# ST3 — per-key event history (`UserEventListState.java:40-64`)
# ---------------------------------------------------------------------------

EVENT_HISTORY_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("seq", LongType()),
        StructField("history", StringType()),
    ]
)


class EventListAccumulator(StatefulProcessor):
    """Per-key ListState accumulator; emits the full history per record.

    Parity: `UserEventCollector` (`UserEventListState.java:40-64`).
    History rendered as a comma-joined string (the reference prints
    `user has events: [a, b]`); downstream can split if needed.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._events = handle.getListState(
            "events", StructType([StructField("e", StringType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        history = [r[0] for r in self._events.get()]
        out_seq, out_hist = [], []
        for row in iter_sorted(rows):
            history.append(str(row.event))
            out_seq.append(int(row.seq))
            out_hist.append(",".join(history))
            self._events.appendValue((str(row.event),))
        yield pd.DataFrame(
            {"user_id": key[0], "seq": out_seq, "history": out_hist}
        )

    def close(self) -> None:
        pass


# ---------------------------------------------------------------------------
# ST1 — fraud detector (`FraudDetectorExample.java:71-121`)
# ---------------------------------------------------------------------------

FRAUD_OUTPUT = StructType(
    [
        StructField("user_id", StringType()),
        StructField("seq", LongType()),
        StructField("ts_ms", LongType()),
        StructField("tracked", IntegerType()),
        StructField("alert", StringType()),
    ]
)


class FraudDetector(StatefulProcessor):
    """Time-pruned ListState + alert-throttle ValueState fraud rule.

    Parity: `FraudDetector` (`FraudDetectorExample.java:71-121`); the
    rule itself lives in `state_kernels.fraud_step` (shared with the
    batch twin). Emits one row per *alert* (the reference only
    collects alert strings, `:113-117`).
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._recent = handle.getListState(
            "recentTs", StructType([StructField("ts", LongType())])
        )
        self._last_alert = handle.getValueState(
            "lastAlert", StructType([StructField("ts", LongType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        state = FraudState(
            recent_ts=[r[0] for r in self._recent.get()],
            last_alert_ms=self._last_alert.get()[0]
            if self._last_alert.exists()
            else None,
        )
        out = {"seq": [], "ts_ms": [], "tracked": []}
        for row in iter_sorted(rows):
            count, fired = fraud_step(state, float(row.amount), int(row.ts_ms))
            if fired:
                out["seq"].append(int(row.seq))
                out["ts_ms"].append(int(row.ts_ms))
                out["tracked"].append(count)
        self._recent.put([(t,) for t in state.recent_ts])
        if state.last_alert_ms is not None:
            self._last_alert.update((state.last_alert_ms,))
        yield pd.DataFrame(
            {
                "user_id": key[0],
                "seq": out["seq"],
                "ts_ms": out["ts_ms"],
                "tracked": pd.array(out["tracked"], dtype="int32"),
                "alert": [
                    f"FRAUD ALERT: {key[0]} had {c} high-value transactions in 10 minutes"
                    for c in out["tracked"]
                ],
            }
        )

    def close(self) -> None:
        pass


# ---------------------------------------------------------------------------
# ST2 — JSON change detection / CDC (`TradeChangeDetectionJob.java:67-155`)
# ---------------------------------------------------------------------------

CDC_OUTPUT = StructType(
    [
        StructField("key", StringType()),
        StructField("seq", LongType()),
        StructField("field", StringType()),
        StructField("action", StringType()),
        StructField("old_value", StringType()),
        StructField("new_value", StringType()),
    ]
)


class TradeChangeDetector(StatefulProcessor):
    """Schema-free JSON CDC diff against per-key ValueState.

    Parity: `TradeChangeProcessor` (`TradeChangeDetectionJob.java:67-155`):
    first record stored silently; later records field-diffed
    (ADDED/MODIFIED/REMOVED, type-sensitive equality); no-change
    records do NOT update state. One output row per changed field
    (the reference emits one JSON doc per changed record; the
    row-per-field form is equivalent and join/filter-friendly —
    reassemble with to_json(collect_list(...)) if the doc shape is
    needed). Values are canonical JSON text ('"x"' vs '1' vs '1.0'),
    preserving Jackson's type sensitivity.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._prev = handle.getValueState(
            "prevJson", StructType([StructField("raw", StringType())])
        )

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev = self._prev.get()[0] if self._prev.exists() else None
        out = {"seq": [], "field": [], "action": [], "old": [], "new": []}
        for row in iter_sorted(rows):
            prev, diffs = cdc_step(prev, str(row.value))
            for fname, action, old_v, new_v in diffs:
                out["seq"].append(int(row.seq))
                out["field"].append(fname)
                out["action"].append(action)
                out["old"].append(old_v)
                out["new"].append(new_v)
        if prev is not None:
            self._prev.update((prev,))
        yield pd.DataFrame(
            {
                "key": key[0],
                "seq": out["seq"],
                "field": out["field"],
                "action": out["action"],
                "old_value": out["old"],
                "new_value": out["new"],
            }
        )

    def close(self) -> None:
        pass
