"""Declared queries: similarity search over `embeddings`.

Brute-force cosine top-k carries a full DuckDB oracle (exact math,
deterministic double accumulation both sides). The SRP-LSH variant is
hash/plane-dependent → rows-only check + a recall pytest against the
brute-force baseline (tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import similarity as sim
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

# The query set: the 10 lowest vec_ids play "incoming queries" against
# the whole corpus (including themselves as corpus members, excluded
# from their own results).
_N_QUERIES = 10
_K = 5


def _queries_df(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )


def q_topk_bruteforce(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_bruteforce(emb, _queries_df(spark, sf_dir), k=_K)


def q_topk_srp_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_srp_lsh(emb, _queries_df(spark, sf_dir), k=_K)


def q_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index at FULL probe (nprobe = n_cells): every cell is
    scanned, so the index machinery (quantizer training, cell
    assignment, cell equi-join, exact re-rank) must reproduce brute
    force EXACTLY — which makes this end-to-end oracle-checkable.
    Production uses nprobe << n_cells; that approximate regime's
    recall is measured in tests/test_dedup_similarity.py."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_ivf(
        emb, _queries_df(spark, sf_dir), k=_K, n_cells=16, nprobe=16
    )


def q_topk_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_pq(emb, _queries_df(spark, sf_dir), k=_K)


SPECS = [
    QuerySpec(
        "similarity_topk_bruteforce",
        q_topk_bruteforce,
        oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))) AS c
            FROM q JOIN e ON q.query_id <> e.vec_id
        ),
        ranked AS (
            SELECT query_id, vec_id, c,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, vec_id ASC) AS rk
            FROM scored
        )
        SELECT query_id, vec_id, round(c, 6) AS cos, rk
        FROM ranked WHERE rk <= {_K}
        """,
    ),
    QuerySpec("similarity_topk_srp_lsh", q_topk_srp_lsh, oracle=None),
    # full-probe IVF == exact -> shares the brute-force oracle; the
    # approximate (nprobe < n_cells) regime is recall-tested in
    # tests/test_dedup_similarity.py
    QuerySpec(
        "similarity_topk_ivf",
        q_topk_ivf,
        oracle=f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
        scored AS (
            SELECT q.query_id, e.vec_id,
                   list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))) AS c
            FROM q JOIN e ON q.query_id <> e.vec_id
        ),
        ranked AS (
            SELECT query_id, vec_id, c,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, vec_id ASC) AS rk
            FROM scored
        )
        SELECT query_id, vec_id, round(c, 6) AS cos, rk
        FROM ranked WHERE rk <= {_K}
        """,
    ),
    QuerySpec("similarity_topk_pq", q_topk_pq, oracle=None),
]
