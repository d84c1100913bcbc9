"""Batch-perceptron trainer (operators/training.py): hand-traced
updates on a tiny corpus, convergence on separable classes, and
empty-doc totality. The declared query's unrolled-CTE oracle is the
cross-engine check; these pin the learning semantics."""

from __future__ import annotations

import hashlib

from demo_flink_spark.operators.training import perceptron_train


def _bucket(tok: str) -> int:
    return int(hashlib.md5(tok.encode()).hexdigest()[:2], 16)


def test_hand_traced_two_doc_update(spark):
    # distinct buckets required for the hand trace below
    assert _bucket("aa") != _bucket("bb")
    df = spark.createDataFrame(
        [(1, "aa aa", "en"), (2, "bb", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in perceptron_train(df).collect()}
    # iter1 (w=0, all misclassified): w[aa]=+2, w[bb]=-1; iter2/3: both
    # docs already correct, no further update
    assert out[1]["margin"] == 4 and out[1]["pred"] and out[1]["correct"]
    assert out[2]["margin"] == -1 and not out[2]["pred"] and out[2]["correct"]


def test_separable_classes_converge(spark):
    pos_vocab = ["alpha", "beta", "gamma", "delta"]
    neg_vocab = ["omega", "sigma", "kappa", "lambda"]
    rows = []
    for i in range(20):
        w1, w2 = pos_vocab[i % 4], pos_vocab[(i + 1) % 4]
        rows.append((i, f"{w1} {w2} {w1}", "en"))
        w1, w2 = neg_vocab[i % 4], neg_vocab[(i + 3) % 4]
        rows.append((100 + i, f"{w1} {w2}", "de"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perceptron_train(df, n_iters=3).collect()
    assert all(r["correct"] for r in out)
    assert all(r["margin"] > 0 for r in out if r["label"] == 1)
    assert all(r["margin"] < 0 for r in out if r["label"] == -1)


def test_empty_doc_and_punct_only(spark):
    df = spark.createDataFrame(
        [(1, "real words here", "en"), (2, "", "fr"), (3, "!!! ???", "fr")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in perceptron_train(df).collect()}
    assert len(out) == 3
    for d in (2, 3):  # no tokens -> margin 0, predicted negative
        assert out[d]["margin"] == 0 and not out[d]["pred"]
        assert out[d]["correct"]  # label is -1, pred False


def test_more_iterations_never_break_separable_fit(spark):
    df = spark.createDataFrame(
        [(1, "aa aa", "en"), (2, "bb", "fr")],
        "doc_id long, text string, lang string",
    )
    out5 = {r["doc_id"]: r for r in perceptron_train(df, n_iters=5).collect()}
    assert out5[1]["correct"] and out5[2]["correct"]
