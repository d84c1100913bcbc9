"""MMR diversified re-rank: NumPy-reference parity, the diversity
property vs plain top-k, and end-to-end execution of the pytest-only
plan callable (the test_pytest_only_queries contract)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _mmr_reference(corpus, qvec, ids, k, pool, lam):
    """Independent greedy MMR over the relevance-top-`pool`."""
    mat = corpus / np.linalg.norm(corpus, axis=1, keepdims=True)
    q = qvec / np.linalg.norm(qvec)
    rel = mat @ q
    # top-pool by (rel desc, id asc)
    order = sorted(range(len(ids)), key=lambda i: (-rel[i], ids[i]))[:pool]
    cand = list(order)
    sims = mat @ mat.T
    selected = []
    out = []
    for _ in range(min(k, len(cand))):
        best, best_s = None, -np.inf
        for i in sorted(cand, key=lambda i: ids[i]):
            if i in selected:
                continue
            pen = max((sims[i][j] for j in selected), default=0.0)
            s = lam * rel[i] - (1 - lam) * pen
            if s > best_s:
                best, best_s = i, s
        selected.append(best)
        out.append((ids[best], best_s))
    return out


def test_mmr_matches_numpy_reference(spark):
    from demo_flink_spark.operators.similarity import mmr_rerank

    rng = np.random.RandomState(11)
    n, d = 60, 8
    corpus_np = rng.standard_normal((n, d))
    # plant near-duplicates of row 0 so pure top-k would stack clones
    for j in (1, 2, 3):
        corpus_np[j] = corpus_np[0] + 0.01 * rng.standard_normal(d)
    corpus = spark.createDataFrame(
        [(int(i), corpus_np[i].tolist()) for i in range(n)],
        "vec_id long, embedding array<double>",
    )
    qvec = corpus_np[0] + 0.05 * rng.standard_normal(d)
    queries = spark.createDataFrame(
        [(100, qvec.tolist())], "query_id long, embedding array<double>"
    )
    # lam=0.3 weights diversity heavily: with ~0.999-similar clones a
    # relevance-dominant lam would still rank all clones (penalty 0.3
    # < relevance gap), which is correct MMR behavior but not the
    # regime this test wants to pin
    got = (
        mmr_rerank(corpus, queries, k=5, pool=15, lam=0.3)
        .orderBy("rk")
        .collect()
    )
    want = _mmr_reference(
        corpus_np, qvec, list(range(n)), k=5, pool=15, lam=0.3
    )
    assert [r["vec_id"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r["mmr_score"] == pytest.approx(w[1], abs=1e-9)
    # the clone family (0..3) must NOT occupy the whole result list
    assert len({r["vec_id"] for r in got} & {0, 1, 2, 3}) < 4


def test_mmr_rank1_is_pure_relevance_and_diversity_improves(spark):
    from demo_flink_spark.operators.similarity import (
        cosine_topk_bruteforce,
        mmr_rerank,
    )

    from demo_flink_spark.sources import load_table

    emb = load_table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mmr = mmr_rerank(emb, queries, k=5, pool=20, lam=0.7)
    topk = cosine_topk_bruteforce(emb, queries, k=5)
    mmr_rows = mmr.collect()
    top_rows = topk.collect()
    # rank 1 = argmax relevance = brute force rank 1, per query
    m1 = {r["query_id"]: r["vec_id"] for r in mmr_rows if r["rk"] == 1}
    t1 = {r["query_id"]: r["vec_id"] for r in top_rows if r["rk"] == 1}
    assert m1 == t1

    # diversity: mean intra-list similarity of the MMR set must not
    # exceed the plain top-k set (per query)
    vecs = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in emb.collect()
    }

    def mean_intra(ids):
        mat = np.array([vecs[i] / np.linalg.norm(vecs[i]) for i in ids])
        s = mat @ mat.T
        n = len(ids)
        return (s.sum() - n) / (n * (n - 1))

    for qid in m1:
        mmr_ids = [r["vec_id"] for r in mmr_rows if r["query_id"] == qid]
        top_ids = [r["vec_id"] for r in top_rows if r["query_id"] == qid]
        assert mean_intra(mmr_ids) <= mean_intra(top_ids) + 1e-12


def test_mmr_plan_callable_runs(spark):
    from demo_flink_spark.plans.similarity import q_mmr_rerank

    out = q_mmr_rerank(spark, SF_DIR).collect()
    assert out
    slots = {(r.query_id, r.rk) for r in out}
    assert len(slots) == len(out)
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rk)
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, len(ranks) + 1))
