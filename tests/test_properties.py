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


# --- monotone kept-prefix kernels (streaming/budget_stream.py) --------------
#
# Property: for ANY batch split and arrival order, replaying the
# kernel and taking each doc's last emission equals the batch
# operator's selection. Runs the kernel directly against a fake
# GroupState — no Spark session, so hypothesis can afford hundreds of
# adversarial orders.


class _FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _replay(op, batches, grp="g"):
    import pandas as pd

    state = _FakeState()
    last = {}
    for batch in batches:
        if not batch:
            continue
        pdf = pd.DataFrame(
            {"doc_id": [d for d, _ in batch], "text": [t for _, t in batch]}
        )
        for out in op.fn((grp,), iter([pdf]), state):
            for d, k in zip(out["doc_id"], out["kept"]):
                last[int(d)] = bool(k)
    return last


def _batch_budget(rows, budget, salt="tb1"):
    """Reference implementation of token_budget_cut's keep rule."""
    import hashlib

    ranked = sorted(
        rows, key=lambda r: hashlib.md5(f"{salt}{r[0]}".encode()).hexdigest()
    )
    kept, cum = {}, 0
    for d, t in ranked:
        n = len(t.split())
        cum += n
        kept[d] = cum <= budget
    return kept


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=14, unique=True),
    st.integers(1, 40),
    st.integers(1, 4),
    st.randoms(use_true_random=False),
)
def test_budget_kernel_converges_for_any_arrival_order(ids, budget, n_batches, rnd):
    from demo_flink_spark.streaming.budget_stream import token_budget_op

    rows = [(i, " ".join(["w"] * (1 + i % 5))) for i in ids]
    rnd.shuffle(rows)
    batches = [rows[i::n_batches] for i in range(n_batches)]
    got = _replay(token_budget_op({"g": budget}), batches)
    assert got == _batch_budget(rows, budget)


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(0, 12), min_size=1, max_size=14, unique=True),
    st.integers(1, 8),
    st.integers(1, 4),
    st.randoms(use_true_random=False),
)
def test_exact_k_kernel_converges_for_any_arrival_order(ids, k, n_batches, rnd):
    import hashlib

    from demo_flink_spark.streaming.budget_stream import exact_k_op

    rows = [(i, "x") for i in ids]
    rnd.shuffle(rows)
    batches = [rows[i::n_batches] for i in range(n_batches)]
    got = _replay(exact_k_op(k, salt="exk"), batches)
    ranked = sorted(
        ids, key=lambda i: hashlib.md5(f"exk{i}".encode()).hexdigest()
    )
    want = {i: rank < k for rank, i in enumerate(ranked)}
    assert got == want


# ---------------------------------------------------------------------------
# Mann-Whitney midrank AUC formula (operators/evaluation.py::binary_auc):
# the integer-arithmetic formula the Spark/DuckDB twins both evaluate must
# equal the definitional pairwise AUC for ANY multiset of (score, label).


def _auc_formula(pairs):
    """The exact formula both engines run: group by score, cumulate,
    2R_pos = Σ p_s (2 c_less + n_s + 1)."""
    from collections import Counter

    n_s = Counter(s for s, _ in pairs)
    p_s = Counter(s for s, y in pairs if y)
    c_less, two_r_pos = 0, 0
    for s in sorted(n_s):
        two_r_pos += p_s[s] * (2 * c_less + n_s[s] + 1)
        c_less += n_s[s]
    n_pos = sum(p_s.values())
    n_neg = len(pairs) - n_pos
    if n_pos == 0 or n_neg == 0:
        return None
    return (two_r_pos - n_pos * (n_pos + 1)) / (2 * n_pos * n_neg)


def _auc_pairwise(pairs):
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    if not pos or not neg:
        return None
    tot = sum(
        1.0 if p > n else (0.5 if p == n else 0.0) for p in pos for n in neg
    )
    return tot / (len(pos) * len(neg))


@given(
    st.lists(
        st.tuples(st.integers(min_value=0, max_value=5), st.booleans()),
        max_size=60,
    )
)
@settings(max_examples=300)
def test_auc_midrank_formula_equals_pairwise_definition(pairs):
    a, b = _auc_formula(pairs), _auc_pairwise(pairs)
    if a is None or b is None:
        assert a is None and b is None
    else:
        assert abs(a - b) < 1e-12
