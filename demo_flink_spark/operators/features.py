"""Embedding feature engineering: int8 quantization and distributed PCA.

The operations a 100 TB embedding store needs before serving/training:

- **int8 symmetric quantization** (`quantize_int8`): 4× smaller vectors
  with a per-vector scale — the storage/serving format ANN engines and
  vector DBs use. One Arrow-batched numpy pass; no shuffle at all.
- **distributed covariance / PCA** (`covariance_triples`,
  `pca_project`): the d×d second-moment matrix is computed as per-batch
  GEMM partials (numpy `X.T @ X`, the compute-optimal shape) exploded to
  (i, j, partial) triples and reduced by key — the corpus is scanned
  once, the shuffle carries O(batches · d²) floats, never the vectors.
  The tiny d×d solve (eigh) runs driver-side, exactly how FAISS trains
  its OPQ/PCA transforms: heavy pass distributed, KB-scale solve local.

Float discipline (same rules as operators/relational.py): every kernel
widens float32 storage to float64 before arithmetic; quantization uses
`floor(x + 0.5)` instead of `round` so Spark and DuckDB agree on ties.
The covariance pass is **engine-exact by construction** (the r3 driver
hash-fail taught us that "round(float_sum, 6)" is partition-order- and
engine-dependent): inputs are quantized to Q`qbits` fixed point — an
EXACT operation on doubles (power-of-two multiply + 0.5 + floor, every
step representable) — partials are integer GEMMs, the reduce is an
exact decimal(38,0) sum (order-independent), and the 6-decimal output
is produced by round-half-away INTEGER division, so any engine
mirroring the formula (see the DuckDB oracle in plans/features.py)
produces bit-identical doubles.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.operators.checkpointing import cut_lineage

__all__ = [
    "quantize_int8",
    "covariance_triples",
    "label_centroids",
    "pca_components",
    "pca_project",
]


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization.

    scale = max|x| / 127 (floored at 1e-30 so zero vectors stay finite);
    q_i = clip(floor(x_i / scale + 0.5), -127, 127). Emits the exact
    reconstruction bound `max_abs_err` = max|x - q·scale| alongside —
    order-independent (a max, not a sum), so it hash-matches any engine.
    Narrow plan: one mapInPandas, zero exchanges.
    """

    def quantize(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            scale = np.maximum(np.abs(mat).max(axis=1), 1e-30) / 127.0
            q = np.clip(np.floor(mat / scale[:, None] + 0.5), -127, 127)
            err = np.abs(mat - q * scale[:, None]).max(axis=1)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"],
                    "scale": scale,
                    "qvec": list(q.astype(np.int64)),
                    "max_abs_err": err,
                }
            )

    return df.select("vec_id", vec_col).mapInPandas(
        quantize, "vec_id long, scale double, qvec array<long>, max_abs_err double"
    )


def covariance_triples(
    df: DataFrame, vec_col: str = "embedding", qbits: int = 24
) -> DataFrame:
    """Population covariance matrix as (i, j, cov) triples — engine-exact.

    Pipeline (every step bit-deterministic under any partitioning AND
    reproducible in any engine that mirrors the arithmetic):

    1. quantize: `q = floor(x * 2^qbits + 0.5)` as int64. x is a
       float32 widened to double, so `x * 2^qbits` is an EXACT
       power-of-two scale; `+ 0.5` and `floor` are exact for the
       magnitudes involved — the same double comes out of Spark, numpy
       and DuckDB.
    2. per Arrow batch: integer GEMM partial `Q.T @ Q` (d×d), column
       sums, row count. Batches are sub-chunked so each int64 dot
       product provably cannot overflow (chunk ≤ 2^62 / max|q|²).
       Shuffle volume is O(n_batches · d²) longs — vectors never move.
    3. exact reduce: partials summed as decimal(38,0) (integer sums are
       order-independent; no float accumulation anywhere).
    4. output: cov = (n·Σxy − Σx_i·Σx_j) / (n² · 2^(2·qbits)), emitted
       at 6 decimals via round-half-away INTEGER division:
       `sign · ((|num|·2·10^6 + den) div (2·den)) / 10^6`.

    Scale ceiling: at qbits=24 the decimal(38,0) intermediates hold up
    to ~4e8 vectors; for a 100 TB corpus beyond that, pass qbits=20
    (headroom to ~1e12 rows, input quantization 1e-6 — at or below the
    6-decimal output grid either way).
    """
    qscale = float(1 << qbits)

    def partials(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            q = np.floor(mat * qscale + 0.5).astype(np.int64)
            d = q.shape[1]
            qmax = max(1, int(np.abs(q).max()))
            # largest chunk whose per-entry dot product fits int64
            step = max(1, (1 << 62) // (qmax * qmax))
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            for lo in range(0, len(q), step):
                qc = q[lo : lo + step]
                xtx = qc.T @ qc  # exact int64 GEMM partial
                sums = qc.sum(axis=0)
                yield pd.DataFrame(
                    {
                        "i": ii.reshape(-1).astype(np.int32),
                        "j": jj.reshape(-1).astype(np.int32),
                        "sum_xy": xtx.reshape(-1),
                        # ship the vector sums on the j==0 rows only
                        "sum_x": np.where(
                            jj.reshape(-1) == 0, sums[ii.reshape(-1)], 0
                        ).astype(np.int64),
                        "n": np.where(
                            (ii.reshape(-1) == 0) & (jj.reshape(-1) == 0),
                            len(qc),
                            0,
                        ).astype(np.int64),
                    }
                )

    tri = df.select(vec_col).mapInPandas(
        partials, "i int, j int, sum_xy long, sum_x long, n long"
    )
    red = tri.groupBy("i", "j").agg(
        F.sum(F.col("sum_xy").cast("decimal(38,0)")).alias("sum_xy"),
        F.sum(F.col("sum_x").cast("decimal(38,0)")).alias("sum_x"),
        F.sum("n").alias("n"),
    )
    # three consumers below — materialize the d²-row grid so the corpus
    # scan + GEMM pass runs exactly once (self-joins recompute otherwise)
    red = cut_lineage(red, eager=False)
    # broadcast the tiny d-row side stats back onto the d² grid
    mean_i = red.filter(F.col("j") == 0).select(
        "i", F.col("sum_x").alias("sum_x_i")
    )
    mean_j = red.filter(F.col("j") == 0).select(
        F.col("i").alias("j"), F.col("sum_x").alias("sum_x_j")
    )
    total = red.agg(F.sum("n").cast("decimal(38,0)").alias("n_rows"))
    den_unit = 1 << (2 * qbits)  # n² · 2^(2·qbits) completes it below
    return (
        red.join(F.broadcast(mean_i), "i")
        .join(F.broadcast(mean_j), "j")
        .join(F.broadcast(total))
        .withColumn(
            "num",
            F.col("n_rows") * F.col("sum_xy")
            - F.col("sum_x_i") * F.col("sum_x_j"),
        )
        .withColumn(
            "den",
            F.col("n_rows")
            * F.col("n_rows")
            * F.lit(den_unit).cast("decimal(38,0)"),
        )
        .select(
            "i",
            "j",
            # round-half-away-from-zero at 6 decimals, in exact integer
            # arithmetic: identical in every engine by construction
            F.expr(
                "CAST((CASE WHEN num < 0 THEN -1 ELSE 1 END)"
                " * ((abs(num) * 2000000 + den) div (2 * den)) AS DOUBLE)"
                " / 1000000.0"
            ).alias("cov"),
        )
    )


def label_centroids(
    df: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
    qbits: int = 24,
) -> DataFrame:
    """Per-label mean vector (class prototypes) as (label, i, centroid)
    triples — the nearest-class-mean classifier / k-means-init /
    per-domain-embedding-profile primitive.

    Engine-exact by the covariance_triples recipe: coordinates are
    quantized to Q`qbits` fixed point (exact double ops), summed as
    exact decimal(38,0) per (label, dim) — order-independent — and the
    6-decimal mean is round-half-away integer division by n · 2^qbits.
    A mean of float sums would be partition-order-dependent; this is
    bit-identical on any engine/partitioning by construction.

    Scale: one posexplode (narrow) + ONE hash aggregate keyed by
    (label, dim) with map-side partials — the exchange carries
    |labels| · d partial sums per task, never vectors. All-JVM, no
    Python in the path.
    """
    qscale = float(1 << qbits)
    den_unit = 1 << qbits
    tri = df.select(
        label_col,
        F.posexplode(F.col(vec_col)).alias("i", "x"),
    ).select(
        label_col,
        F.col("i").cast("long").alias("i"),
        F.floor(F.col("x").cast("double") * qscale + F.lit(0.5))
        .cast("decimal(38,0)")
        .alias("q"),
    )
    red = tri.groupBy(label_col, "i").agg(
        F.sum("q").alias("sx"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
    )
    return red.select(
        label_col,
        "i",
        F.expr(
            "CAST((CASE WHEN sx < 0 THEN -1 ELSE 1 END)"
            f" * ((abs(sx) * 2000000 + n * {den_unit})"
            f"    div (2 * n * {den_unit})) AS DOUBLE) / 1000000.0"
        ).alias("centroid"),
        F.col("n").cast("long").alias("n_vecs"),
    )


def pca_components(df: DataFrame, vec_col: str = "embedding", k: int = 2) -> np.ndarray:
    """Top-k principal axes from the DISTRIBUTED covariance pass.

    Collects only the d×d matrix (KBs), eigendecomposes driver-side
    (`np.linalg.eigh`), and fixes each axis's sign so its
    largest-magnitude coordinate is positive — eigenvectors are
    sign-ambiguous and the pin makes results run-reproducible.
    """
    rows = covariance_triples(df, vec_col).collect()
    d = max(r["i"] for r in rows) + 1
    cov = np.zeros((d, d))
    for r in rows:
        cov[r["i"], r["j"]] = r["cov"]
    vals, vecs = np.linalg.eigh(cov)  # ascending
    comps = vecs[:, ::-1][:, :k].T  # (k, d)
    for c in range(k):
        pivot = np.argmax(np.abs(comps[c]))
        if comps[c, pivot] < 0:
            comps[c] = -comps[c]
    return comps


def pca_project(
    df: DataFrame, components: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Project every vector onto the given principal axes — one
    Arrow-batched GEMM per batch, components ride the closure (KBs),
    zero shuffle. Emits (vec_id, pc1..pck) rounded to 6 decimals.
    """
    comp = np.asarray(components, dtype=np.float64)
    k = comp.shape[0]

    def project(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            scores = np.round(mat @ comp.T, 6)  # (n, k)
            out = {"vec_id": pdf["vec_id"]}
            for c in range(k):
                out[f"pc{c + 1}"] = scores[:, c]
            yield pd.DataFrame(out)

    schema = "vec_id long, " + ", ".join(f"pc{c + 1} double" for c in range(k))
    return df.select("vec_id", vec_col).mapInPandas(project, schema)


def rp_signs(out_dim: int, in_dim: int, seed: int = 11) -> np.ndarray:
    """Seeded Achlioptas sparse sign matrix, shape (out_dim, in_dim):
    entries +1 / -1 with probability 1/6 each, else 0 — deterministic
    across runs and executors (the `similarity.srp_planes` recipe)."""
    rng = np.random.RandomState(seed)
    draws = rng.randint(0, 6, size=(out_dim, in_dim))
    return np.where(draws == 0, 1, np.where(draws == 5, -1, 0))


def random_projection(
    df: DataFrame,
    out_dim: int = 16,
    in_dim: int = 64,
    seed: int = 11,
    vec_col: str = "embedding",
) -> DataFrame:
    """Achlioptas sparse random projection of an embedding column:
    ``y_k = sqrt(3/out_dim) · Σ_j sign_kj · x_j`` — the JL-lemma
    dimensionality reduction that preserves pairwise distances within
    (1 ± ε) while cutting vector storage 4× (64→16 dims here).

    The sign matrix is a plan literal (seeded, ~2/3 zeros); each
    output coordinate is a left-to-right double accumulation via
    `zip_with`/`aggregate` (the `dedup.cosine` portability pattern, so
    DuckDB's `list_dot_product` over the same literals reproduces
    every coordinate bit-for-bit). Zero exchanges — pure scan
    throughput, JVM-side, whole-stage codegen.
    """
    signs = rp_signs(out_dim, in_dim, seed)
    scale = float(np.sqrt(3.0 / out_dim))
    v = F.col(vec_col)
    coords = []
    for k in range(out_dim):
        sarr = F.array(*[F.lit(float(s)) for s in signs[k]])
        dot = F.aggregate(
            F.zip_with(v, sarr, lambda x, s: x.cast("double") * s),
            F.lit(0.0),
            lambda acc, t: acc + t,
        )
        coords.append((dot * F.lit(scale)).alias(f"y{k}"))
    return df.select("vec_id", F.array(*coords).alias("proj"))


def target_encode_loo(
    df: DataFrame,
    cat_col: str,
    target_cents: Column,
    id_cols: tuple[str, ...],
    m: int = 10,
) -> DataFrame:
    """Leave-one-out target encoding with m-estimate smoothing — the
    categorical-feature workhorse that window EXCLUDE CURRENT ROW
    would express if Spark supported it (it doesn't; this is the
    subtract-own-row formulation, exact and leak-free):

        encode_i = ( (S_cat − y_i)·N + m·S_all )
                 / ( (n_cat − 1 + m)·N )

    i.e. the category's mean target EXCLUDING row i, shrunk toward
    the global mean by pseudo-count m. Removing the own row is what
    prevents the target leaking into its own feature — the classic
    CatBoost/Kaggle trick, and the reason a plain groupBy-mean join
    is wrong for training features.

    Exactness: the target enters as integer cents; S_cat, S_all, N,
    n_cat are exact decimal(38,0) aggregates; numerator and
    denominator are exact integer products (the fraction is cleared
    of the global-mean ratio) and only the FINAL division is a
    double — bit-identical cross-engine, no rounding rule.

    Plan: one category aggregate (broadcast-sized), one global
    1-row aggregate, broadcast both back onto the scan — per-row
    arithmetic, no self-join, no window.
    """
    y = target_cents.cast("decimal(38,0)")
    base = df.select(*id_cols, F.col(cat_col).alias("cat"), y.alias("y"))
    per_cat = base.groupBy("cat").agg(
        F.sum("y").alias("s_cat"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_cat"),
    )
    tot = base.agg(
        F.sum("y").alias("s_all"),
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n_all"),
    )
    return (
        base.join(F.broadcast(per_cat), "cat")
        .crossJoin(F.broadcast(tot))
        .select(
            *id_cols,
            F.col("cat").alias(cat_col),
            (
                F.expr(
                    f"CAST(((s_cat - y) * n_all + {m} * s_all) AS DOUBLE)"
                )
                / F.expr(f"CAST((n_cat - 1 + {m}) * n_all AS DOUBLE)")
            ).alias("encoded"),
        )
    )
