"""cut_lineage (operators/checkpointing.py): the deployment knob that
switches iterative operators between executor-local lineage cuts (the
single-JVM default) and reliable checkpoints that survive executor
loss (set `sparkContext.setCheckpointDir(...)` on a real cluster).

The reliable-mode test drives a real iterative operator (PageRank)
with a checkpoint dir configured and asserts (a) identical results to
local mode — the knob must never change answers, only fault tolerance
— and (b) checkpoint data actually landed in the directory. The dir
is reset to unset afterwards so the rest of the suite keeps the
local-mode default.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from demo_flink_spark.operators.checkpointing import cut_lineage, cut_lineage_lazy
from demo_flink_spark.operators.graph import pagerank


def _edges(spark):
    rows = [(a, b) for a in range(8) for b in range(8) if a != b and (a + b) % 3]
    return spark.createDataFrame(rows, "src long, dst long")


def _reset_checkpoint_dir(spark):
    # Scala setCheckpointDir(null) -> Option(null) = None: the only way
    # to UNSET the dir (the Python wrapper rejects None).
    spark.sparkContext._jsc.sc().setCheckpointDir(None)
    assert spark.sparkContext.getCheckpointDir() is None


def test_local_mode_is_default(spark):
    assert spark.sparkContext.getCheckpointDir() is None
    df = spark.range(10).withColumn("x", F.col("id") * 2)
    out = cut_lineage(df)
    assert out.count() == 10
    lazy = cut_lineage_lazy(df)
    assert lazy.count() == 10


def test_reliable_mode_same_answers_and_writes_files(spark, tmp_path):
    e = _edges(spark)
    local = {r.node: r.rank for r in pagerank(e, n_iter=5).collect()}

    ckpt = str(tmp_path / "ckpt")
    spark.sparkContext.setCheckpointDir(ckpt)
    try:
        assert spark.sparkContext.getCheckpointDir() is not None
        reliable = {r.node: r.rank for r in pagerank(e, n_iter=5).collect()}
        # bit-identical: Q52 accumulation is order-independent and the
        # checkpoint mechanism must not perturb values
        assert reliable == local
        written = [
            os.path.join(root, f)
            for root, _dirs, files in os.walk(ckpt)
            for f in files
        ]
        assert written, "reliable mode must materialize into the checkpoint dir"
    finally:
        _reset_checkpoint_dir(spark)


def test_cluster_dedup_works_in_reliable_mode(spark, tmp_path):
    # the CC star-contraction loop is the other iterative consumer;
    # run its operator end-to-end under a checkpoint dir
    from demo_flink_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11), (20, 21), (21, 22), (22, 23)],
        "a long, b long",
    )
    local = {r.node: r.comp for r in connected_components(pairs, "a", "b").collect()}
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt2"))
    try:
        reliable = {
            r.node: r.comp for r in connected_components(pairs, "a", "b").collect()
        }
        assert reliable == local
    finally:
        _reset_checkpoint_dir(spark)
