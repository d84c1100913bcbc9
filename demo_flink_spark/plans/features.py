"""Declared queries: embedding feature engineering (quantization, PCA).

The `embeddings` table is the stand-in for a 100 TB vector store; these
queries are the feature ops a training/serving pipeline runs over it.
Quantization and the covariance pass are oracle-checked against DuckDB
list arithmetic; the PCA projection is pytest-only coverage
(eigendecomposition has no SQL twin) with a NumPy-pinned test instead
(tests/test_features.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import features as ft
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

# shared quantization formula, DuckDB spelling (lambdas capture `scale`)
_Q_EXPR = "greatest(least(floor(x / scale + 0.5), 127), -127)"


def q_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization of every embedding (scale = max|x|/127)
    with per-vector max reconstruction error — the 4x storage cut before
    shipping vectors to an ANN index."""
    emb = load_table(spark, sf_dir, "embeddings")
    q = ft.quantize_int8(emb)
    return q.select(
        "vec_id",
        "scale",
        F.array_join("qvec", ",").alias("qvec_csv"),
        "max_abs_err",
    )


def q_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle covariance matrix of the embedding dimensions as
    (i, j, cov) triples — one distributed pass (sum/sum-of-products),
    d x d output only."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ft.covariance_triples(emb).select(
        F.col("i").cast("long").alias("i"),
        F.col("j").cast("long").alias("j"),
        "cov",
    )


def q_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean embedding (class prototypes) as (label, i,
    centroid, n_vecs) triples — exact Q24 fixed-point sums, 6-decimal
    round-half-away integer division (operators/features.py::
    label_centroids)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return ft.label_centroids(emb).select(
        F.col("label").cast("long").alias("label"),
        "i",
        "centroid",
        "n_vecs",
    )


def q_pca_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project every embedding onto the top-2 principal components
    (eigh of the d x d covariance on the driver, projection distributed)."""
    emb = load_table(spark, sf_dir, "embeddings")
    comps = ft.pca_components(emb, k=2)
    return ft.pca_project(emb, comps)


_RP_OUT = 16


def q_random_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Achlioptas sparse random projection 64→16 dims
    (operators/features.py::random_projection) — seeded sign matrix as
    plan literals, one left-to-right accumulation per coordinate, zero
    exchanges; every projected coordinate is hash-compared at full
    double precision."""
    emb = load_table(spark, sf_dir, "embeddings")
    out = ft.random_projection(emb, out_dim=_RP_OUT)
    return out.select(
        "vec_id",
        *[F.col("proj").getItem(k).alias(f"y{k}") for k in range(_RP_OUT)],
    )


def _rp_oracle() -> str:
    import numpy as np

    signs = ft.rp_signs(_RP_OUT, 64)
    scale = repr(float(np.sqrt(3.0 / _RP_OUT)))
    cols = []
    for k in range(_RP_OUT):
        lits = ", ".join(repr(float(s)) for s in signs[k])
        cols.append(
            f"list_dot_product(v, [{lits}]) * {scale} AS y{k}"
        )
    body = ",\n               ".join(cols)
    return f"""
        WITH e AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
        )
        SELECT vec_id,
               {body}
        FROM e
        """


def q_target_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leak-free leave-one-out target encoding of order priority by
    total price (operators/features.py::target_encode_loo): exact
    integer-cleared fraction, one final double division, m = 10."""
    orders = load_table(spark, sf_dir, "orders")
    return ft.target_encode_loo(
        orders,
        "o_orderpriority",
        F.round(F.col("o_totalprice") * 100),
        ("o_orderkey",),
        m=10,
    )


SPECS = [
    QuerySpec(
        "feature_target_encode_loo",
        q_target_encode,
        oracle="""
        WITH base AS (
            SELECT o_orderkey, o_orderpriority AS cat,
                   CAST(round(o_totalprice * 100) AS HUGEINT) AS y
            FROM orders
        ),
        pc AS (
            SELECT cat, sum(y) AS s_cat,
                   CAST(count(*) AS HUGEINT) AS n_cat
            FROM base GROUP BY cat
        ),
        tot AS (
            SELECT sum(y) AS s_all, CAST(count(*) AS HUGEINT) AS n_all
            FROM base
        )
        SELECT o_orderkey, cat AS o_orderpriority,
               CAST(((s_cat - y) * n_all + 10 * s_all) AS DOUBLE)
                 / CAST((n_cat - 1 + 10) * n_all AS DOUBLE) AS encoded
        FROM base JOIN pc USING (cat) CROSS JOIN tot
        """,
    ),
    QuerySpec(
        "embedding_random_projection", q_random_projection, oracle=_rp_oracle()
    ),
    QuerySpec(
        "embedding_quantize_int8",
        q_quantize_int8,
        oracle=f"""
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), s AS (
            SELECT vec_id, e,
                   greatest(list_max(list_transform(e, x -> abs(x))), 1e-30)
                       / 127.0 AS scale
            FROM v
        )
        SELECT vec_id, scale,
               array_to_string(
                   list_transform(e, x -> CAST({_Q_EXPR} AS BIGINT)), ',')
                   AS qvec_csv,
               list_max(list_transform(
                   e, x -> abs(x - {_Q_EXPR} * scale))) AS max_abs_err
        FROM s
        """,
    ),
    QuerySpec(
        "embedding_covariance",
        q_covariance,
        oracle="""
        -- mirrors covariance_triples EXACTLY (no covar_pop, no float
        -- sums): Q24-quantize inputs, exact HUGEINT sums, 6-decimal
        -- output via round-half-away integer division — bit-identical
        -- to the Spark operator by construction.
        WITH v AS (
            SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
        ), x AS (
            SELECT vec_id,
                   CAST(floor(unnest(e) * 16777216.0 + 0.5) AS HUGEINT)
                       AS val,
                   CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS i
            FROM v
        ), p AS (
            SELECT a.i AS i, b.i AS j,
                   SUM(a.val * b.val) AS sxy, COUNT(*) AS n
            FROM x a JOIN x b USING (vec_id)
            GROUP BY a.i, b.i
        ), s AS (
            SELECT i, SUM(val) AS sx FROM x GROUP BY i
        ), t AS (
            SELECT p.i, p.j,
                   CAST(p.n AS HUGEINT) * p.sxy - si.sx * sj.sx AS num,
                   CAST(p.n AS HUGEINT) * CAST(p.n AS HUGEINT)
                       * CAST(281474976710656 AS HUGEINT) AS den
            FROM p
            JOIN s si ON si.i = p.i
            JOIN s sj ON sj.i = p.j
        )
        SELECT i, j,
               CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)
                    * ((abs(num) * 2000000 + den) // (2 * den))
                    AS DOUBLE) / 1000000.0 AS cov
        FROM t
        """,
    ),
    QuerySpec(
        "embedding_label_centroids",
        q_label_centroids,
        oracle="""
        -- mirrors label_centroids exactly: Q24 quantize, exact HUGEINT
        -- sums, 6-decimal round-half-away integer division
        WITH v AS (
            SELECT CAST(label AS BIGINT) AS label,
                   CAST(embedding AS DOUBLE[]) AS e
            FROM embeddings
        ), x AS (
            SELECT label,
                   CAST(floor(unnest(e) * 16777216.0 + 0.5) AS HUGEINT)
                       AS q,
                   CAST(generate_subscripts(e, 1) - 1 AS BIGINT) AS i
            FROM v
        ), red AS (
            SELECT label, i, SUM(q) AS sx, COUNT(*) AS n
            FROM x GROUP BY label, i
        )
        SELECT label, i,
               CAST((CASE WHEN sx < 0 THEN -1 ELSE 1 END)
                    * ((abs(sx) * 2000000
                        + CAST(n AS HUGEINT) * 16777216)
                       // (2 * CAST(n AS HUGEINT) * 16777216))
                    AS DOUBLE) / 1000000.0 AS centroid,
               n AS n_vecs
        FROM red
        """,
    ),
    # embedding_pca_scores is pytest-only coverage: the eigh
    # eigenvector step has no SQL twin, so it is exercised by
    # tests/test_features.py (NumPy-pinned) rather than declared to
    # the driver gate (r4, VERDICT item 5 option b).
]
