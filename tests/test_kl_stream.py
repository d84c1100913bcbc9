"""Streaming KL drift monitor: the final stream emission over exactly
a source's rows must equal the batch `kl_unigram_by_source` row for
that source bit-for-bit; arrival order must not matter (counts are
algebraic); OOV words are counted but never poison the divergence."""

from __future__ import annotations

import pyspark.sql.functions as F

from demo_flink_spark.operators.textstats import kl_unigram_by_source
from demo_flink_spark.streaming.harness import run_stateful
from demo_flink_spark.streaming.kl_stream import kl_drift_op

DOCS = [
    (1, "alpha beta gamma alpha delta epsilon", "s1"),
    (2, "alpha alpha beta zeta eta theta iota", "s1"),
    (3, "gamma gamma delta delta epsilon zeta kappa", "s2"),
    (4, "alpha beta beta beta gamma mu nu xi omicron", "s2"),
]


def _corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string, source string")


def _ref(spark):
    """Frozen reference = the full corpus unigram profile, computed by
    the same tokenizer the batch operator uses."""
    rows = (
        _corpus(spark)
        .select(
            F.explode(
                F.expr("regexp_extract_all(lower(text), '[a-z]+', 0)")
            ).alias("word")
        )
        .groupBy("word")
        .count()
        .collect()
    )
    ref = {r["word"]: r["count"] for r in rows}
    return ref, sum(ref.values())


def _s1_words(spark, batch_of):
    words = []
    for _, text, src in DOCS:
        if src == "s1":
            words.extend(text.split())
    return spark.createDataFrame(
        [("s1", w, batch_of(i)) for i, w in enumerate(words)],
        "grp string, word string, b int",
    )


def test_kl_stream_final_state_matches_batch_operator(spark):
    ref, m = _ref(spark)
    src = _s1_words(spark, lambda i: 0 if i < 7 else 1)
    out = run_stateful(
        spark, src, ["grp"], kl_drift_op(ref, m), n_batches=2, batch_col="b"
    ).collect()
    final = max(out, key=lambda r: r["seq"])
    batch = {
        r["source"]: r for r in kl_unigram_by_source(_corpus(spark)).collect()
    }
    assert final["kl_micros"] == batch["s1"]["kl_micros"]
    assert final["n_tokens"] == batch["s1"]["n_tokens"]
    assert final["n_oov"] == 0
    assert final["seq"] == 2  # state survived the micro-batch boundary


def test_kl_stream_order_invariance(spark):
    """Reversed/reshuffled arrival must converge to the same integers."""
    ref, m = _ref(spark)
    a = run_stateful(
        spark,
        _s1_words(spark, lambda i: 0 if i < 3 else 1),
        ["grp"],
        kl_drift_op(ref, m),
        n_batches=2,
        batch_col="b",
    ).collect()
    b = run_stateful(
        spark,
        _s1_words(spark, lambda i: 1 if i < 3 else 0),
        ["grp"],
        kl_drift_op(ref, m),
        n_batches=2,
        batch_col="b",
    ).collect()
    fa = max(a, key=lambda r: r["seq"])
    fb = max(b, key=lambda r: r["seq"])
    assert (fa["kl_micros"], fa["n_tokens"], fa["n_types"]) == (
        fb["kl_micros"],
        fb["n_tokens"],
        fb["n_types"],
    )


def test_kl_stream_oov_counted_not_poisoning(spark):
    ref, m = _ref(spark)
    base = _s1_words(spark, lambda i: 0)
    clean = run_stateful(
        spark, base, ["grp"], kl_drift_op(ref, m)
    ).collect()
    with_oov = run_stateful(
        spark,
        base.union(
            spark.createDataFrame(
                [("s1", "neverseenword", 0), ("s1", "anotheroov", 0)],
                "grp string, word string, b int",
            )
        ),
        ["grp"],
        kl_drift_op(ref, m),
    ).collect()
    c = max(clean, key=lambda r: r["seq"])
    o = max(with_oov, key=lambda r: r["seq"])
    assert o["n_oov"] == 2 and c["n_oov"] == 0
    assert o["kl_micros"] == c["kl_micros"]  # OOV excluded from the sum
    assert o["n_tokens"] == c["n_tokens"]
