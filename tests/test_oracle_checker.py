"""The local gate's canonicalization (tools/oracle_check.py) is
load-bearing: every "138 pass" claim routes through canonical_hash.
These pure-python tests pin its contract — full-precision float
hashing (the r3 blind spot), int-valued-float folding, NULL handling,
and order-insensitivity."""

from __future__ import annotations

import math
import sys

import pandas as pd

sys.path.insert(0, "/root/repo/tools")
from oracle_check import canonical_hash  # noqa: E402


def _h(rows, cols):
    return canonical_hash(pd.DataFrame(rows, columns=cols))


def test_last_ulp_difference_fails():
    a = 0.1 + 0.2          # 0.30000000000000004
    b = 0.3
    assert a != b
    assert _h([[a]], ["x"]) != _h([[b]], ["x"])


def test_int_valued_floats_fold_to_ints():
    # 2.0 (float column from a NULL-padded join) hashes like 2
    assert _h([[2.0]], ["x"]) == _h([[2]], ["x"])


def test_row_and_column_order_insensitive():
    h1 = _h([[1, "a"], [2, "b"]], ["n", "s"])
    h2 = _h([[2, "b"], [1, "a"]], ["n", "s"])
    assert h1 == h2
    h3 = canonical_hash(pd.DataFrame({"s": ["a", "b"], "n": [1, 2]}))
    assert h1 == h3


def test_null_and_nan_canonicalize_identically():
    assert _h([[None]], ["x"]) == _h([[float("nan")]], ["x"])
    # but NULL is distinct from zero and from the string "NULL"... the
    # pipe-joined row text cannot confuse them with real values
    assert _h([[None]], ["x"]) != _h([[0.0]], ["x"])


def test_nested_lists_hash_by_content():
    assert _h([[[1, 2, 3]]], ["x"]) == _h([[(1, 2, 3)]], ["x"])
    assert _h([[[1, 2, 3]]], ["x"]) != _h([[[1, 2, 4]]], ["x"])


def test_full_precision_repr_not_truncated():
    # the r3 gap: %.9g folded these two; repr must not
    a = 212.15323182313213
    b = 212.15323182332244
    assert f"{a:.9g}" == f"{b:.9g}"
    assert _h([[a]], ["x"]) != _h([[b]], ["x"])


def test_timestamps_use_isoformat():
    t1 = pd.Timestamp("2024-01-01T00:00:00")
    t2 = pd.Timestamp("2024-01-01T00:00:01")
    assert _h([[t1]], ["x"]) != _h([[t2]], ["x"])
    assert _h([[t1]], ["x"]) == _h([[pd.Timestamp("2024-01-01")]], ["x"])
