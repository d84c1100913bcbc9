"""End-to-end corpus build CLI: materialized output + manifest, stage
attrition sanity, and the determinism contract (same input → same
checksum) that makes a large build auditable and resumable."""

from __future__ import annotations

import json
import os

from tests.conftest import SF_DIR


def test_build_corpus_end_to_end(spark, tmp_path):
    import tools.build_corpus as bc

    out1 = str(tmp_path / "b1")
    m1 = bc.build(spark, SF_DIR, out1)

    # every stage shrinks-or-holds and the chain is consistent
    stages = m1["stages"]
    assert [s["stage"] for s in stages] == [
        "exact_dedup",
        "neardup_dedup",
        "quality_floor",
        "decontamination",
        "mixture_rebalance",
    ]
    for s in stages:
        assert 0 < s["n_out"] <= s["n_in"]
    for a, b in zip(stages, stages[1:]):
        assert a["n_out"] == b["n_in"]
    assert m1["n_final"] == stages[-1]["n_out"]
    assert sum(m1["by_split"].values()) == m1["n_final"]

    # materialized corpus is split-partitioned and readable
    written = spark.read.parquet(os.path.join(out1, "corpus"))
    assert written.count() == m1["n_final"]
    assert set(written.select("split").distinct().toPandas()["split"]) <= {
        "train",
        "val",
        "test",
    }
    with open(os.path.join(out1, "manifest.json")) as f:
        assert json.load(f)["checksum"] == m1["checksum"]

    # determinism: a second build of the same input is bit-identical
    out2 = str(tmp_path / "b2")
    m2 = bc.build(spark, SF_DIR, out2)
    assert m2["checksum"] == m1["checksum"]
    assert m2["stages"] == m1["stages"]
    assert m2["by_split"] == m1["by_split"]
