"""The three operators demoted from the declared-query registry to
pytest-only coverage (r4, VERDICT item 5 option b): their outputs are
irreducibly engine-seeded — PCA eigenvectors from numpy eigh, k-means
codebooks/cells — so no DuckDB oracle can value-hash them. Numeric
behavior is pinned elsewhere (tests/test_features.py NumPy twin,
tests/test_dedup_similarity.py measured recall); THIS file keeps the
plan-level callables executing end-to-end on real testdata so demotion
never silently rots them.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_pca_scores_runs(spark):
    from demo_flink_spark.plans.features import q_pca_scores

    out = q_pca_scores(spark, SF_DIR)
    assert set(out.columns) >= {"vec_id", "pc1", "pc2"}
    assert out.count() == 500


def test_semantic_cells_runs(spark):
    from demo_flink_spark.plans.dedup import q_semantic_cells

    out = q_semantic_cells(spark, SF_DIR)
    rows = out.count()
    assert rows > 0
    # a dedup keep-list must cover every embedding exactly once
    assert rows == 500


def test_topk_pq_runs(spark):
    from demo_flink_spark.plans.similarity import q_topk_pq

    out = q_topk_pq(spark, SF_DIR).collect()
    assert out
    # every (query, rank) slot holds one neighbor with a finite score
    ranks = {(r.query_id, r.rk) for r in out}
    assert len(ranks) == len(out)
