"""Property-based tests (SURVEY §5.2.4): the CDC diff is an algebra.

Pure-kernel properties run without Spark — hypothesis generates random
JSON objects and checks the diff laws the reference implies.
"""

from __future__ import annotations

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from demo_flink_spark.functions.state_kernels import (
    ADDED,
    MODIFIED,
    REMOVED,
    cdc_step_parsed,
    json_diff,
)

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=8),
)
json_objs = st.dictionaries(st.text(min_size=1, max_size=6), scalars, max_size=8)


@given(json_objs)
def test_diff_reflexive(a):
    assert json_diff(a, a) == []


@given(json_objs, json_objs)
@settings(max_examples=200)
def test_diff_partitions_fields(a, b):
    diffs = json_diff(a, b)
    by_action = {}
    for field, action, old, new in diffs:
        by_action.setdefault(action, set()).add(field)
    assert by_action.get(ADDED, set()) == set(b) - set(a)
    assert by_action.get(REMOVED, set()) == set(a) - set(b)
    # MODIFIED ⊆ intersection, and every diffed field appears exactly once
    assert by_action.get(MODIFIED, set()) <= (set(a) & set(b))
    assert len(diffs) == len({f for f, *_ in diffs})


@given(json_objs, json_objs)
@settings(max_examples=200)
def test_diff_antisymmetric(a, b):
    """diff(b,a) is diff(a,b) with ADDED/REMOVED swapped and old/new
    values exchanged on MODIFIED."""
    fwd = {f: (act, old, new) for f, act, old, new in json_diff(a, b)}
    bwd = {f: (act, old, new) for f, act, old, new in json_diff(b, a)}
    assert set(fwd) == set(bwd)
    flip = {ADDED: REMOVED, REMOVED: ADDED, MODIFIED: MODIFIED}
    for f, (act, old, new) in fwd.items():
        b_act, b_old, b_new = bwd[f]
        assert b_act == flip[act]
        assert (b_old, b_new) == (new, old)


@given(json_objs, json_objs)
@settings(max_examples=200)
def test_diff_values_roundtrip(a, b):
    """Canonical old/new values parse back to the original values."""
    for field, action, old, new in json_diff(a, b):
        if old is not None:
            assert json.loads(old) == a[field]
        if new is not None:
            assert json.loads(new) == b[field]


txs = st.lists(
    st.tuples(
        st.floats(min_value=0, max_value=1000, allow_nan=False),
        st.integers(min_value=0, max_value=10**7),
    ),
    min_size=1,
    max_size=50,
)


@given(txs)
@settings(max_examples=200)
def test_fraud_alert_invariants(seq):
    """For any tx sequence (sorted by time): every alert sees ≥3
    tracked txs, and consecutive alerts are > window_ms apart (the
    throttle law, `FraudDetectorExample.java:108-112`)."""
    from demo_flink_spark.functions.state_kernels import (
        FRAUD_WINDOW_MS,
        FraudState,
        fraud_step,
    )

    state = FraudState()
    alert_times = []
    for amount, ts in sorted(seq, key=lambda t: t[1]):
        count, fired = fraud_step(state, amount, ts)
        if fired:
            assert count >= 3
            alert_times.append(ts)
    for a, b in zip(alert_times, alert_times[1:]):
        assert b - a > FRAUD_WINDOW_MS


@given(st.lists(json_objs, min_size=1, max_size=6))
@settings(max_examples=100)
def test_cdc_state_is_last_changed_record(objs):
    """After any record sequence, CDC state equals the last record that
    produced a diff (or the first record) — the no-change freeze law."""
    prev, expected = None, None
    for obj in objs:
        raw = json.dumps(obj)
        new_prev, diffs = cdc_step_parsed(prev, raw)
        if expected is None:
            expected = obj  # first occurrence always stored
        elif diffs:
            expected = obj
        prev = new_prev
        assert prev is not None and prev[1] == expected


# --- chunking arithmetic (operators/pipeline.py::chunk_documents) ---
# The DuckDB oracle uses the closed form ceil(max(L-w,0)/stride)+1 for
# the chunk count; the operator walks an emit-until-covered loop. Pin
# their equivalence over the whole parameter space.


@given(
    st.integers(min_value=0, max_value=2000),
    st.integers(min_value=2, max_value=128),
    st.integers(min_value=1, max_value=127),
)
@settings(max_examples=300)
def test_chunk_count_closed_form_matches_loop(n_tokens, window, overlap):
    import math

    from hypothesis import assume

    assume(overlap < window)
    stride = window - overlap
    loop_count = 0
    for start in range(0, n_tokens, stride):
        loop_count += 1
        if start + window >= n_tokens:
            break
    closed = (
        0
        if n_tokens == 0
        else math.ceil(max(n_tokens - window, 0) / stride) + 1
    )
    assert loop_count == closed
