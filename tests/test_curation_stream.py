"""Streaming curation gate (streaming/curation_stream.py): a real
foreachBatch streaming query over a file-drop source, with kept docs
and reasoned rejections verified per micro-batch — batch/streaming
parity by construction (the batch operator IS the rule engine)."""

from __future__ import annotations

import os
import time

from demo_flink_spark.streaming.curation_stream import curation_gate

GOOD = (
    "the quick brown fox jumps over a lazy dog and then runs far away "
    "to find some of the other animals that have been hiding with it"
)
TOO_SHORT = "the and also tiny docs"
NUMERIC = "the a " + " ".join(str(1000 + n) for n in range(30))
NO_STOPWORDS = " ".join(f"word{i}" for i in range(30))


def _drop_batches(spark, batches, stage_dir):
    """Stage source files under the caller's pytest tmp_path so the
    directory is cleaned up with the test (ADVICE r10 pattern: the
    mkdtemp form leaked a source dir per run)."""
    stage = str(stage_dir)
    os.makedirs(stage, exist_ok=True)
    base = time.time() - len(batches) - 1
    stamped: set[str] = set()
    for i, rows in enumerate(batches):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.mode("append").parquet(stage)
        for fname in os.listdir(stage):
            if fname.endswith(".parquet") and fname not in stamped:
                os.utime(os.path.join(stage, fname), (base + i, base + i))
                stamped.add(fname)
    return stage


def test_curation_gate_routes_and_reasons(spark, tmp_path):
    kept_dir = str(tmp_path / "kept")
    rejected_dir = str(tmp_path / "rejected")
    stage = _drop_batches(
        spark,
        [
            [(1, GOOD), (2, TOO_SHORT)],
            [(3, NUMERIC), (4, NO_STOPWORDS), (5, GOOD + " again ok")],
        ],
        tmp_path / "src",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = curation_gate(stream, kept_dir, rejected_dir, min_words=20)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    kept = {r.doc_id: r for r in spark.read.parquet(kept_dir).collect()}
    rej = {r.doc_id: r for r in spark.read.parquet(rejected_dir).collect()}
    assert set(kept) == {1, 5} and set(rej) == {2, 3, 4}
    # payload survives on the kept side, with batch provenance
    assert kept[1].text == GOOD
    assert {kept[1].epoch_id, kept[5].epoch_id} == {0, 1}
    # reasons name exactly the failed rules
    assert rej[2].reasons == "word_count"
    assert rej[3].reasons == "alpha_fraction"
    assert rej[4].reasons == "stopwords"
    assert rej[3].n_words == 32


def test_curation_gate_multi_reason(spark, tmp_path):
    kept_dir = str(tmp_path / "k2")
    rejected_dir = str(tmp_path / "r2")
    # short AND no stopwords AND numeric-heavy: all reasons listed
    stage = _drop_batches(spark, [[(9, "111 222 333")]], tmp_path / "src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(stage)
    q = curation_gate(stream, kept_dir, rejected_dir, min_words=20)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    r = spark.read.parquet(rejected_dir).collect()[0]
    assert r.reasons == "word_count,alpha_fraction,stopwords"


def test_curation_gate_epoch_replay_is_idempotent(spark, tmp_path):
    # simulate a foreachBatch replay: processing the same micro-batch
    # twice must leave ONE copy of its epoch partition, and must not
    # touch other epochs
    from demo_flink_spark.streaming import curation_stream as cs

    kept_dir = str(tmp_path / "k3")
    rejected_dir = str(tmp_path / "r3")
    stage = _drop_batches(spark, [[(1, GOOD), (2, TOO_SHORT)]], tmp_path / "src")
    stream = spark.readStream.schema("doc_id long, text string").parquet(stage)
    q = cs.curation_gate(stream, kept_dir, rejected_dir, min_words=20)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    batch_df = spark.createDataFrame(
        [(1, GOOD), (2, TOO_SHORT)], "doc_id long, text string"
    )
    # replay epoch 0 by invoking the same writer path directly
    import inspect

    # rebuild the process closure exactly as the gate does
    gate_src = inspect.getsource(cs.curation_gate)
    assert "partitionOverwriteMode" in gate_src
    from demo_flink_spark.operators.textstats import gopher_quality_filter
    from pyspark.sql import functions as F

    qf = gopher_quality_filter(batch_df, min_words=20)
    flagged = batch_df.join(F.broadcast(qf), "doc_id")
    kept = flagged.filter(F.col("keep")).select(
        *batch_df.columns, F.lit(0).alias("epoch_id")
    )
    (
        kept.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(kept_dir)
    )
    out = spark.read.parquet(kept_dir).collect()
    assert len(out) == 1 and out[0].doc_id == 1  # no duplicate rows
