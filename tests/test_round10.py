"""Round-10 additions.

The `components` trust-boundary guard on the keep-policy resolvers
(ADVICE r9): a caller-supplied label frame that does not correspond
to `pairs` used to silently produce a wrong keep/drop list; now the
shape is always checked and full node coverage is checked under
SPARK_GRAFT_VALIDATE_COMPONENTS.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


def test_components_guard_schema_and_coverage(spark, monkeypatch):
    from demo_flink_spark.operators import dedup as dd

    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 1), (2, 3)], "a long, b long")
    good = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 2), (3, 2)], "node long, comp long"
    )

    # a correct frame passes both layers
    monkeypatch.setenv("SPARK_GRAFT_VALIDATE_COMPONENTS", "1")
    out = {
        r["doc_id"]: r
        for r in dd.dedup_keep_list(docs, pairs, components=good).collect()
    }
    assert out[1]["canonical_id"] == 0 and not out[1]["is_kept"]
    assert out[4]["is_kept"]  # unpaired doc keeps itself

    # wrong columns: rejected by the always-on schema layer
    bad_cols = good.select(F.col("node").alias("doc"), "comp")
    with pytest.raises(ValueError, match=r"exactly \(node, comp\)"):
        dd.dedup_keep_list(docs, pairs, components=bad_cols)

    # a label frame missing a paired node: caught under the env gate
    missing = good.filter(F.col("node") != 3)
    with pytest.raises(ValueError, match="paired nodes"):
        dd.dedup_keep_list(docs, pairs, components=missing)

    # ... and demonstrably the silent hazard without the gate — doc 3
    # is paired yet kept as its own canonical (the failure mode the
    # debug path exists to surface)
    monkeypatch.delenv("SPARK_GRAFT_VALIDATE_COMPONENTS")
    wrong = {
        r["doc_id"]: r
        for r in dd.dedup_keep_list(docs, pairs, components=missing).collect()
    }
    assert wrong[3]["is_kept"]

    # dedup_keep_best shares the guard
    monkeypatch.setenv("SPARK_GRAFT_VALIDATE_COMPONENTS", "1")
    score = F.col("doc_id").cast("double")
    with pytest.raises(ValueError, match=r"exactly \(node, comp\)"):
        dd.dedup_keep_best(docs, pairs, score, components=bad_cols)
    with pytest.raises(ValueError, match="paired nodes"):
        dd.dedup_keep_best(docs, pairs, score, components=missing)
