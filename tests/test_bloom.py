"""Bloom incremental dedup (`operators/bloom.py`) — the operator that
shipped untested in round 2 and broke. Covers build / flag / end-to-end
incremental_new on a known-overlap corpus, plus the schema-mutation
regression (flag_might_seen must NOT mutate the input's cached schema).
"""

from __future__ import annotations

import pytest

from demo_flink_spark.operators import bloom as B


@pytest.fixture(scope="module")
def corpus(spark):
    history = spark.createDataFrame(
        [(i, f"doc-{i}") for i in range(200)], "id long, text string"
    )
    # 50 dup texts (0..49) + 100 genuinely new
    incoming = spark.createDataFrame(
        [(1000 + i, f"doc-{i}") for i in range(50)]
        + [(2000 + i, f"new-{i}") for i in range(100)],
        "id long, text string",
    )
    return history, incoming


def test_build_bloom_no_false_negatives(spark, corpus):
    history, _ = corpus
    bits = B.build_bloom(history, "text", n_bits=1 << 16, k=5)
    flagged = B.flag_might_seen(history, bits, "text", n_bits=1 << 16, k=5)
    # every history row MUST flag as might-seen (bloom guarantees no FN)
    assert flagged.filter("NOT might_seen").count() == 0


def test_flag_does_not_mutate_input_schema(spark, corpus):
    history, incoming = corpus
    n_before = len(incoming.schema.fields)
    bits = B.build_bloom(history, "text", n_bits=1 << 16, k=5)
    B.flag_might_seen(incoming, bits, "text", n_bits=1 << 16, k=5)
    assert len(incoming.schema.fields) == n_before
    # and the input plan still resolves (the r02 bug raised here)
    assert incoming.count() == 150


def test_incremental_new_exact(spark, corpus):
    history, incoming = corpus
    new = B.incremental_new(incoming, history, "text", n_bits=1 << 16, k=5)
    got = sorted(r.text for r in new.collect())
    assert got == sorted(f"new-{i}" for i in range(100))


def test_incremental_new_prebuilt_bloom(spark, corpus):
    history, incoming = corpus
    bits = B.build_bloom(history, "text", n_bits=1 << 16, k=5)
    new = B.incremental_new(
        incoming, history, "text", n_bits=1 << 16, k=5, bloom=bits
    )
    assert new.count() == 100
