"""bm25_batch and reciprocal-rank fusion (operators/search.py): the
batch scorer must reproduce the single-query scorer exactly, and the
fuse must honor the 1/(k+rank) arithmetic, absent-list zeros, and
deterministic tie-breaks."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from demo_flink_spark.operators.search import bm25_batch, bm25_scores, rrf_fuse

_CORPUS = [
    (0, "hash join hash join vector"),
    (1, "hash scan filter sort"),
    (2, "vector vector vector index probe"),
    (3, "sort merge join outer"),
    (4, "completely unrelated words here"),
]


def _docs(spark):
    return spark.createDataFrame(_CORPUS, "doc_id long, text string")


def test_bm25_batch_matches_single_query_scorer(spark):
    docs = _docs(spark)
    queries = spark.createDataFrame(
        [(100, "hash join"), (200, "vector")], "query_id long, text string"
    )
    batch = bm25_batch(docs, queries).collect()
    for qid, terms in ((100, ["hash", "join"]), (200, ["vector"])):
        single = {
            r["doc_id"]: r for r in bm25_scores(docs, terms).collect()
        }
        got = {r["doc_id"]: r for r in batch if r["query_id"] == qid}
        assert set(got) == set(single)
        for d in single:
            assert got[d]["score"] == single[d]["score"], (qid, d)
            assert got[d]["n_matched"] == single[d]["n_matched"]


def test_bm25_batch_dedups_repeated_query_terms(spark):
    docs = _docs(spark)
    q1 = spark.createDataFrame([(1, "hash hash hash")], "query_id long, text string")
    q2 = spark.createDataFrame([(1, "hash")], "query_id long, text string")
    assert sorted(map(tuple, bm25_batch(docs, q1).collect())) == sorted(
        map(tuple, bm25_batch(docs, q2).collect())
    )


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "query_id long, vec_id long, rk long")


def test_rrf_fuse_arithmetic_and_tiebreak(spark):
    # query 1: doc 10 in both lists, 11 only lexical, 12 only dense
    a = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    b = _ranked(spark, [(1, 10, 2), (1, 12, 2)])
    out = {r["vec_id"]: r for r in rrf_fuse(a, b, k_rrf=60).collect()}
    assert out[10]["rrf_score"] == 1.0 / 61 + 1.0 / 62
    assert out[11]["rrf_score"] == 1.0 / 62 and out[11]["rk_b"] is None
    assert out[12]["rrf_score"] == 1.0 / 62 and out[12]["rk_a"] is None
    assert out[10]["fused_rk"] == 1
    # 11 and 12 tie on score -> vec_id ascending breaks it
    assert out[11]["fused_rk"] == 2 and out[12]["fused_rk"] == 3


def test_rrf_topn_cut_per_query(spark):
    a = _ranked(spark, [(1, v, v) for v in range(1, 8)])
    b = _ranked(spark, [(2, v, v) for v in range(1, 8)])
    out = rrf_fuse(a, b, topn=3).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r["query_id"], []).append(r["fused_rk"])
    assert sorted(per_q[1]) == [1, 2, 3] and sorted(per_q[2]) == [1, 2, 3]


def test_retrieval_metrics_handcrafted(spark):
    from demo_flink_spark.operators.search import (
        _ndcg_gains,
        retrieval_metrics,
    )

    # truth top-3 for q1: [10, 11, 12]; approx returns [10, 99, 12]
    truth = _ranked(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    approx = _ranked(spark, [(1, 10, 1), (1, 99, 2), (1, 12, 3)])
    queries = spark.createDataFrame([(1,), (2,)], "query_id long")
    out = {
        r["query_id"]: r
        for r in retrieval_metrics(approx, truth, queries, k=3).collect()
    }
    r1 = out[1]
    assert r1["n_retrieved"] == 3
    assert r1["recall3"] == 2 / 3
    assert r1["mrr"] == 1.0  # first retrieved item is relevant
    g = [round(x * 1_000_000) for x in _ndcg_gains(3)]
    assert r1["ndcg3"] == (g[0] + g[2]) / sum(g)
    # query 2 retrieved nothing: zero row still present
    r2 = out[2]
    assert r2["n_retrieved"] == 0 and r2["recall3"] == 0.0
    assert r2["mrr"] == 0.0 and r2["ndcg3"] == 0.0


def test_retrieval_metrics_miss_everything(spark):
    truth = _ranked(spark, [(1, 10, 1), (1, 11, 2)])
    approx = _ranked(spark, [(1, 50, 1), (1, 51, 2)])
    queries = spark.createDataFrame([(1,)], "query_id long")
    r = retrieval_metrics_import()(approx, truth, queries, k=2).collect()[0]
    assert r["recall2"] == 0.0 and r["mrr"] == 0.0 and r["ndcg2"] == 0.0
    assert r["n_retrieved"] == 2


def retrieval_metrics_import():
    from demo_flink_spark.operators.search import retrieval_metrics

    return retrieval_metrics
