"""The engine-portable numerics toolbox (COVERAGE.md): these are the
primitives that make 130/137 value-hash oracle checks possible, so pin
them hard — accuracy AND cross-engine bit-equality."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from demo_flink_spark.operators.dedup import MINHASH_P, _modp_affine, minhash_params
from demo_flink_spark.operators.relational import softln_ratio_sql


@st.composite
def _ratio(draw):
    den = draw(st.integers(min_value=1, max_value=1_000_000))
    num = draw(st.integers(min_value=1, max_value=den))
    return num, den


@given(_ratio())
@settings(max_examples=300, deadline=None)
def test_softln_sql_accuracy(pair):
    num, den = pair
    con = duckdb.connect()
    got = con.execute(f"SELECT {softln_ratio_sql(str(num), str(den))}").fetchone()[0]
    assert abs(got - math.log(num / den)) < 1e-9


def test_softln_spark_duckdb_bit_equal(spark):
    import random

    from pyspark.sql import functions as F

    from demo_flink_spark.operators.relational import softln_ratio

    random.seed(11)
    pairs = [(n, d) for d in range(1, 30) for n in range(1, d + 1)]
    pairs += [
        (random.randint(1, d), d)
        for d in (random.randint(1, 1_000_000) for _ in range(500))
    ]
    df = spark.createDataFrame(pairs, "num long, den long")
    got = {
        (r.num, r.den): r.v
        for r in df.select(
            "num", "den", softln_ratio(F.col("num"), F.col("den")).alias("v")
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(num BIGINT, den BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", pairs)
    want = {
        (a, b): v
        for a, b, v in con.execute(
            f"SELECT num, den, {softln_ratio_sql('num', 'den')} FROM t"
        ).fetchall()
    }
    for k, v in got.items():
        assert struct.pack("d", v) == struct.pack("d", want[k]), (k, v, want[k])


@given(st.integers(min_value=0, max_value=MINHASH_P - 1))
@settings(max_examples=200, deadline=None)
def test_modp_affine_matches_integer_math(x):
    import numpy as np

    a_list, b_list = minhash_params(8)
    a = np.array(a_list, dtype=np.uint64)[None, :]
    b = np.array(b_list, dtype=np.uint64)[None, :]
    xs = np.array([x], dtype=np.uint64)[:, None]
    got = _modp_affine(xs, a, b)[0]
    for h in range(8):
        assert int(got[h]) == (a_list[h] * x + b_list[h]) % MINHASH_P


def test_modp_affine_matches_duckdb_hugeint():
    import numpy as np

    a_list, b_list = minhash_params(4)
    con = duckdb.connect()
    for x in (0, 1, MINHASH_P - 1, 123456789012345678 % MINHASH_P):
        xs = np.array([x], dtype=np.uint64)[:, None]
        got = _modp_affine(
            xs,
            np.array(a_list, dtype=np.uint64)[None, :],
            np.array(b_list, dtype=np.uint64)[None, :],
        )[0]
        for h in range(4):
            want = con.execute(
                f"SELECT (CAST({a_list[h]} AS HUGEINT) * {x} + {b_list[h]})"
                f" % {MINHASH_P}"
            ).fetchone()[0]
            assert int(got[h]) == int(want)


def test_softln_edges(spark):
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.relational import softln_ratio

    df = spark.createDataFrame(
        [(1, 1), (1, 2), (1, 1_000_000), (999_999, 1_000_000)],
        "num long, den long",
    )
    got = {
        (r.num, r.den): r.v
        for r in df.select(
            "num", "den", softln_ratio(F.col("num"), F.col("den")).alias("v")
        ).collect()
    }
    assert abs(got[(1, 1)]) < 1e-10                       # ln(1) ~ 0
    assert abs(got[(1, 2)] - math.log(0.5)) < 1e-9
    assert abs(got[(1, 1_000_000)] - math.log(1e-6)) < 1e-8
    assert abs(got[(999_999, 1_000_000)] - math.log(0.999999)) < 1e-10
