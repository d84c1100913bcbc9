"""Streaming incremental MinHash-LSH dedup (streaming/dedup_stream.py):
a real foreachBatch streaming query over a file-drop source, verdicts
checked per micro-batch, and the index proven to GROW — batch 2 docs
dedup against batch 1 docs, not just the seeded history."""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from demo_flink_spark.streaming.dedup_stream import (
    incremental_lsh_dedup,
    seed_index,
)

HIST_1 = (
    "the quick brown fox jumps over the lazy dog while the moon rises "
    "slowly above the quiet river valley tonight"
)
HIST_2 = (
    "distributed query engines optimize joins by pushing filters into "
    "columnar scans and broadcasting small dimension tables everywhere"
)
NEW_UNIQUE = (
    "completely different subject matter about cooking pasta with "
    "garlic olive oil and fresh basil leaves in summer"
)
LATER_UNIQUE = (
    "yet another topic entirely concerning mountain hiking trails "
    "weather patterns and alpine flowers blooming in spring"
)


def _near_copy(text: str) -> str:
    # swap one trailing word: high-jaccard near-dup, not exact
    return text.rsplit(" ", 1)[0] + " yesterday"


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


def test_incremental_dedup_grows_index(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    verdict_dir = str(tmp_path / "verdicts")

    history = spark.createDataFrame(
        [(1, HIST_1), (2, HIST_2)], "doc_id long, text string"
    )
    seed_index(history, index_dir)

    stage = _drop_batches(
        spark,
        [
            [(10, _near_copy(HIST_1)), (11, NEW_UNIQUE)],
            [(12, _near_copy(NEW_UNIQUE)), (13, LATER_UNIQUE)],
        ],
        tmp_path / "src",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = incremental_lsh_dedup(stream, index_dir, verdict_dir, threshold=0.4)
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    v = {r.doc_id: r for r in spark.read.parquet(verdict_dir).collect()}
    assert set(v) == {10, 11, 12, 13}
    # batch 1: 10 duplicates seeded history doc 1; 11 is novel
    assert v[10].is_dup and v[10].matched_id == 1 and v[10].jaccard >= 0.4
    assert not v[11].is_dup and v[11].matched_id is None
    # batch 2: 12 duplicates doc 11 FROM BATCH 1 — the index grew
    assert v[12].is_dup and v[12].matched_id == 11
    assert not v[13].is_dup

    # index holds bands for history + novel streamed docs only
    indexed = {
        r.doc_id
        for r in spark.read.parquet(index_dir).select("doc_id").distinct().collect()
    }
    assert indexed == {1, 2, 11, 13}


def test_intra_batch_duplicates_resolve_to_lower_id(spark, tmp_path):
    index_dir = str(tmp_path / "index")
    verdict_dir = str(tmp_path / "verdicts")
    seed_index(
        spark.createDataFrame([(1, HIST_1)], "doc_id long, text string"),
        index_dir,
    )
    # both near-copies of each other arrive in ONE micro-batch
    stage = _drop_batches(
        spark,
        [[(20, NEW_UNIQUE), (21, _near_copy(NEW_UNIQUE))]],
        tmp_path / "src",
    )
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(stage)
    )
    q = incremental_lsh_dedup(stream, index_dir, verdict_dir, threshold=0.4)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    v = {r.doc_id: r for r in spark.read.parquet(verdict_dir).collect()}
    assert not v[20].is_dup  # lower id wins
    assert v[21].is_dup and v[21].matched_id == 20


def test_epoch_replay_idempotent(spark, tmp_path):
    # foreachBatch is at-least-once: replaying an epoch must rewrite
    # its partitions, not duplicate them — and the replay must not see
    # its own earlier index write as "history" (self-dup hazard)
    from demo_flink_spark.streaming.dedup_stream import process_dedup_batch

    index_dir = str(tmp_path / "idx")
    verdict_dir = str(tmp_path / "v")
    seed_index(
        spark.createDataFrame([(1, HIST_1)], "doc_id long, text string"),
        index_dir,
    )
    batch = spark.createDataFrame(
        [(10, _near_copy(HIST_1)), (11, NEW_UNIQUE)],
        "doc_id long, text string",
    )
    process_dedup_batch(batch, 0, index_dir, verdict_dir, threshold=0.4)
    first_v = sorted(
        (r.doc_id, r.is_dup, r.matched_id)
        for r in spark.read.parquet(verdict_dir).collect()
    )
    first_idx = spark.read.parquet(index_dir).count()
    # replay the SAME epoch
    process_dedup_batch(batch, 0, index_dir, verdict_dir, threshold=0.4)
    again_v = sorted(
        (r.doc_id, r.is_dup, r.matched_id)
        for r in spark.read.parquet(verdict_dir).collect()
    )
    assert again_v == first_v  # no duplicate rows, same verdicts
    # doc 11 must STILL be novel (not a dup of its own replayed bands)
    assert (11, False, None) in again_v
    assert spark.read.parquet(index_dir).count() == first_idx
    # a LATER epoch still sees epoch-0 novel docs as history
    batch2 = spark.createDataFrame(
        [(12, _near_copy(NEW_UNIQUE))], "doc_id long, text string"
    )
    process_dedup_batch(batch2, 1, index_dir, verdict_dir, threshold=0.4)
    v = {r.doc_id: r for r in spark.read.parquet(verdict_dir).collect()}
    assert v[12].is_dup and v[12].matched_id == 11
