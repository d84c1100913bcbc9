"""Declared queries: similarity search over `embeddings`.

Brute-force cosine top-k carries a full DuckDB oracle (exact math,
deterministic double accumulation both sides); SRP-LSH embeds its
seeded hyperplanes as SQL literals, and full-probe IVF equals brute
force exactly, so both are hash-checked too. PQ (seeded k-means
codebooks, no SQL twin) is pytest-only coverage with measured recall
(tests/test_similarity.py).
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



def _srp_lsh_oracle() -> str:
    """SQL twin of the SRP-LSH query, generated from the SAME seeded
    hyperplanes the operator uses (embedded as float literals — repr()
    round-trips doubles exactly). Bucket bits compare plane dot
    products to zero; a numpy-vs-DuckDB summation-order discrepancy
    could only flip a bit when |dot| is within float noise of 0
    (P ~ 1e-13 per projection — not observed at any tested SF).
    Candidates (>= 1 shared (table, bucket)) and the exact-cosine
    re-rank then mirror the operator one-to-one, so LSH's recall trade
    is identical on both engines.
    """
    from demo_flink_spark.operators.similarity import srp_planes

    planes = srp_planes(64, 16, 4, 42)

    def vec_lit(pl):
        return "[" + ", ".join(repr(float(x)) for x in pl) + "]"

    tables_sql = []
    for t in range(16):
        terms = " + ".join(
            "CAST((list_dot_product(v, "
            f"{vec_lit(planes[t][j])}) >= 0) AS INTEGER) * {1 << j}"
            for j in range(4)
        )
        tables_sql.append(f"SELECT vec_id, {t} AS tbl, {terms} AS bucket FROM e")
    cbuck = "\n            UNION ALL\n            ".join(tables_sql)
    return f"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        cbuck AS (
            {cbuck}
        ),
        cand AS (
            SELECT DISTINCT qb.vec_id AS query_id, cb.vec_id
            FROM cbuck qb JOIN cbuck cb
              ON qb.tbl = cb.tbl AND qb.bucket = cb.bucket
             AND qb.vec_id < {_N_QUERIES} AND qb.vec_id <> cb.vec_id
        ),
        scored AS (
            SELECT c.query_id, c.vec_id,
                   list_dot_product(q.v, x.v)
                   / (sqrt(list_dot_product(q.v, q.v))
                      * sqrt(list_dot_product(x.v, x.v))) AS c
            FROM cand c
            JOIN e q ON q.vec_id = c.query_id
            JOIN e x ON x.vec_id = c.vec_id
        ),
        ranked AS (
            SELECT query_id, vec_id, c,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, vec_id ASC) AS rk
            FROM scored
        )
        SELECT query_id, vec_id, round(c, 6) AS cos, rk
        FROM ranked WHERE rk <= {_K}
"""


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
    QuerySpec("similarity_topk_srp_lsh", q_topk_srp_lsh, oracle=_srp_lsh_oracle()),
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
    # similarity_topk_pq is pytest-only coverage: its seeded k-means
    # codebooks have no SQL twin, so it is exercised by the
    # measured-recall test in tests/test_similarity.py rather than
    # declared to the driver gate (r4, VERDICT item 5 option b).
]
