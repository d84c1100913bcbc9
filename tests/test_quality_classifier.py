"""Hashed-feature linear quality classifier
(operators/textstats.py::quality_classifier): deterministic seeded
weights, exact integer accumulation, python-reference parity."""

from __future__ import annotations

import hashlib
import re

from demo_flink_spark.operators.textstats import (
    classifier_weights,
    quality_classifier,
)


def _py_logit(text: str, w: list[int]) -> tuple[int, float]:
    canon = re.sub(r"\s+", " ", re.sub(r"[^a-z\s]", "", text.lower())).strip()
    toks = [t for t in canon.split(" ") if t]
    if not toks:
        return 0, 0.0
    s = sum(w[hashlib.md5(t.encode()).digest()[0]] for t in toks)
    return len(toks), s / 524288.0 / len(toks)


def test_weights_deterministic_and_bounded():
    w1, w2 = classifier_weights(), classifier_weights()
    assert w1 == w2 and len(w1) == 256
    assert all(-(1 << 19) <= v < (1 << 19) for v in w1)
    # a different seed gives a different table
    assert classifier_weights(seed="other") != w1


def test_matches_python_reference(spark):
    rows = [
        (1, "Some Fairly ordinary TEXT with mixed case and 42 numbers!"),
        (2, "the the the the repeated token stream"),
        (3, ""),
        (4, "single"),
    ]
    w = classifier_weights()
    out = {
        r.doc_id: r
        for r in quality_classifier(
            spark.createDataFrame(rows, "doc_id long, text string")
        ).collect()
    }
    for doc_id, text in rows:
        n, logit = _py_logit(text, w)
        assert out[doc_id].n_tokens == n, doc_id
        assert out[doc_id].logit == logit, (doc_id, out[doc_id].logit, logit)
        assert out[doc_id].keep == (logit > 0)


def test_partitioning_invariant(spark):
    # exact integer accumulation: identical logits under any layout
    rows = [(i, f"some text body number {i} with shared tokens") for i in range(50)]
    df1 = spark.createDataFrame(rows, "doc_id long, text string").repartition(1)
    df32 = spark.createDataFrame(rows, "doc_id long, text string").repartition(32)
    a = {r.doc_id: r.logit for r in quality_classifier(df1).collect()}
    b = {r.doc_id: r.logit for r in quality_classifier(df32).collect()}
    assert a == b
