"""Golden tests for the keyed stateful operators (FIXTURES.md F3-F6).

Each fixture runs through the REAL production path: file stream →
transformWithStateInPandas (RocksDB state store) → memory sink, via
streaming.harness.run_stateful. Multi-batch variants prove state
survives micro-batch boundaries.
"""

from __future__ import annotations

import json

import pytest

from demo_flink_spark.functions.state_kernels import FraudState, fraud_step, json_diff
from demo_flink_spark.streaming.harness import run_stateful
from demo_flink_spark.streaming.stateful_ops import (
    CDC_DETECTOR,
    EVENT_LIST,
    FRAUD_DETECTOR,
    RUNNING_COUNTER,
)

# --- F5: click stream --------------------------------------------------------

F5_CLICKS = [
    (1, "user1", "click"),
    (2, "user2", "click"),
    (3, "user1", "click"),
    (4, "user3", "click"),
    (5, "user2", "click"),
    (6, "user1", "click"),
]
F5_GOLDEN = {1: 1, 2: 1, 3: 2, 4: 1, 5: 2, 6: 3}  # seq -> count


def test_running_counter_golden(spark):
    src = spark.createDataFrame(F5_CLICKS, "seq long, user_id string, action string")
    out = run_stateful(spark, src, ["user_id"], RUNNING_COUNTER)
    got = {r["seq"]: r["clicks"] for r in out.collect()}
    assert got == F5_GOLDEN


def test_running_counter_state_across_batches(spark):
    rows = [(s, u, a, 0 if s <= 3 else 1) for s, u, a in F5_CLICKS]
    src = spark.createDataFrame(rows, "seq long, user_id string, action string, b int")
    out = run_stateful(
        spark, src, ["user_id"], RUNNING_COUNTER, n_batches=2, batch_col="b"
    )
    got = {r["seq"]: r["clicks"] for r in out.collect()}
    assert got == F5_GOLDEN  # user1's count continues 2 -> 3 across batches


# --- F4: user event log ------------------------------------------------------

F4_EVENTS = [
    (1, "user1", "login"),
    (2, "user2", "view"),
    (3, "user1", "click"),
    (4, "user2", "logout"),
    (5, "user1", "purchase"),
]


def test_event_list_accumulator_golden(spark):
    src = spark.createDataFrame(F4_EVENTS, "seq long, user_id string, event string")
    out = run_stateful(spark, src, ["user_id"], EVENT_LIST)
    got = {r["seq"]: r["history"] for r in out.collect()}
    assert got == {
        1: "login",
        2: "view",
        3: "login,click",
        4: "view,logout",
        5: "login,click,purchase",
    }


# --- F3: fraud transactions --------------------------------------------------

F3_TXS = [
    (1, "user1", 120.0, 1000),
    (2, "user1", 250.0, 2000),
    (3, "user1", 300.0, 2500),
    (4, "user2", 50.0, 3000),
    (5, "user1", 200.0, 4000),
    (6, "user1", 500.0, 15000),
    (7, "user2", 700.0, 16000),
    (8, "user2", 800.0, 18000),
    (9, "user2", 900.0, 19000),
]


def test_fraud_detector_golden(spark):
    src = spark.createDataFrame(
        F3_TXS, "seq long, user_id string, amount double, ts_ms long"
    )
    out = run_stateful(spark, src, ["user_id"], FRAUD_DETECTOR)
    alerts = sorted(
        (r["user_id"], r["ts_ms"], r["tracked"]) for r in out.collect()
    )
    # FIXTURES.md F3 golden: exactly 2 alerts — user1@2500 (3rd high-value
    # tx), user2@19000; seq 5/6 throttled, seq 4 never tracked.
    assert alerts == [("user1", 2500, 3), ("user2", 19000, 3)]


def test_fraud_kernel_prune_and_rearm():
    state = FraudState()
    base = 0
    for i in range(3):
        count, fired = fraud_step(state, 200.0, base + i * 1000)
    assert fired and count == 3
    # 11 minutes later: prune clears old txs AND the throttle has
    # expired — three fresh high-value txs re-alert.
    later = base + 11 * 60 * 1000
    for i in range(3):
        count, fired = fraud_step(state, 200.0, later + i * 1000)
    assert fired and count == 3


# --- F6: versioned trades (CDC) ----------------------------------------------

T1 = {
    "id": "TRD1000", "symbol": "AAPL", "side": "BUY", "quantity": 199,
    "price": 10.32, "timestamp": "2025-10-04T19:20:00.123456",
    "trader": "1232", "version": 1,
}
T2 = {**T1, "price": 11.05, "version": 2}
T3 = {k: v for k, v in {**T2, "venue": "XNAS"}.items() if k != "trader"}
T5 = {
    "id": "TRD2000", "symbol": "MSFT", "side": "SELL", "quantity": 50,
    "price": 401.5, "timestamp": "2025-10-04T19:21:00.000000",
    "trader": "9001", "version": 1,
}
F6_TRADES = [
    (1, "TRD1000", json.dumps(T1)),
    (2, "TRD1000", json.dumps(T2)),
    (3, "TRD1000", json.dumps(T3)),
    (4, "TRD1000", json.dumps(T3)),  # identical: no output, state frozen
    (5, "TRD2000", json.dumps(T5)),
]


def test_cdc_golden(spark):
    src = spark.createDataFrame(F6_TRADES, "seq long, trade_id string, value string")
    out = run_stateful(spark, src, ["trade_id"], CDC_DETECTOR)
    got = sorted(
        (r["seq"], r["field"], r["action"], r["old_value"], r["new_value"])
        for r in out.collect()
    )
    assert got == [
        (2, "price", "MODIFIED", "10.32", "11.05"),
        (2, "version", "MODIFIED", "1", "2"),
        (3, "trader", "REMOVED", '"1232"', None),
        (3, "venue", "ADDED", None, '"XNAS"'),
    ]


def test_cdc_no_change_freezes_state(spark):
    # seq 4 (identical to seq 3) must produce nothing — and a later
    # record diffs against seq 3's state, not seq 4's.
    src = spark.createDataFrame(
        F6_TRADES + [(6, "TRD1000", json.dumps({**T3, "price": 12.0}))],
        "seq long, trade_id string, value string",
    )
    out = run_stateful(spark, src, ["trade_id"], CDC_DETECTOR)
    seq6 = [(r["field"], r["old_value"], r["new_value"])
            for r in out.collect() if r["seq"] == 6]
    assert seq6 == [("price", "11.05", "12.0")]


def test_json_diff_type_sensitive():
    # Jackson JsonNode.equals parity: 199 != 199.0 != "199"
    assert json_diff({"q": 199}, {"q": 199.0}) == [("q", "MODIFIED", "199", "199.0")]
    assert json_diff({"q": 199}, {"q": "199"}) == [("q", "MODIFIED", "199", '"199"')]
    assert json_diff({"q": 199}, {"q": 199}) == []


@pytest.mark.parametrize("a", [{}, {"x": 1}, {"x": 1, "y": [1, {"z": None}]}])
def test_json_diff_identity(a):
    assert json_diff(a, a) == []


# --- cross-chunk ordering (ADVICE r1, medium) -------------------------------


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = v


class _FakeListState:
    def __init__(self):
        self._items = []

    def get(self):
        return list(self._items)

    def put(self, items):
        self._items = list(items)

    def appendValue(self, v):
        self._items.append(v)


class _FakeHandle:
    def getValueState(self, name, schema):
        return _FakeValueState()

    def getListState(self, name, schema):
        return _FakeListState()


def test_processor_sorts_across_arrow_chunks():
    # One key's micro-batch rows arriving as MULTIPLE Arrow chunks must
    # be stepped in global seq order, not chunk-local order. Chunk A
    # holds the LATER seqs; per-chunk sorting would count them first.
    import pandas as pd

    from demo_flink_spark.streaming.processors import RunningCounter

    proc = RunningCounter()
    proc.init(_FakeHandle())
    chunk_late = pd.DataFrame({"seq": [5, 7, 6]})
    chunk_early = pd.DataFrame({"seq": [2, 1, 3]})
    [out] = list(
        proc.handleInputRows(("u1",), iter([chunk_late, chunk_early]), None)
    )
    assert out["seq"].tolist() == [1, 2, 3, 5, 6, 7]
    assert out["clicks"].tolist() == [1, 2, 3, 4, 5, 6]


def test_event_list_processor_cross_chunk_history():
    import pandas as pd

    from demo_flink_spark.streaming.processors import EventListAccumulator

    proc = EventListAccumulator()
    proc.init(_FakeHandle())
    chunk_late = pd.DataFrame({"seq": [2], "event": ["b"]})
    chunk_early = pd.DataFrame({"seq": [1], "event": ["a"]})
    [out] = list(
        proc.handleInputRows(("u1",), iter([chunk_late, chunk_early]), None)
    )
    assert out["history"].tolist() == ["a", "a,b"]
