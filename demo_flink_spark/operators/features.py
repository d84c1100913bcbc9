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
`floor(x + 0.5)` instead of `round` so Spark and DuckDB agree on ties;
covariance entries round to 6 decimals AFTER the reduce, which buries
the ≤1e-12 accumulation-order jitter of BLAS vs left-fold sums.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["quantize_int8", "covariance_triples", "pca_components", "pca_project"]


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


def covariance_triples(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Population covariance matrix as (i, j, cov) triples.

    Per Arrow batch: GEMM partial `X.T @ X` (d×d), the column sum, and
    the row count — flattened to (i, j, sum_xy) / (i, sum_x) triples and
    reduced by key. Shuffle volume is O(n_batches · d²) regardless of
    corpus size; the vectors themselves never shuffle. cov(i,j) =
    Σxy/n − μ_i·μ_j, rounded to 6 decimals for engine portability.
    """
    def partials(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            d = mat.shape[1]
            xtx = mat.T @ mat  # (d, d) BLAS partial
            sums = mat.sum(axis=0)
            ii, jj = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
            yield pd.DataFrame(
                {
                    "i": ii.reshape(-1).astype(np.int32),
                    "j": jj.reshape(-1).astype(np.int32),
                    "sum_xy": xtx.reshape(-1),
                    # ship the vector sums on the diagonal rows only
                    "sum_x": np.where(
                        jj.reshape(-1) == 0, sums[ii.reshape(-1)], 0.0
                    ),
                    "n": np.where(
                        (ii.reshape(-1) == 0) & (jj.reshape(-1) == 0), len(pdf), 0
                    ).astype(np.int64),
                }
            )

    tri = df.select(vec_col).mapInPandas(
        partials, "i int, j int, sum_xy double, sum_x double, n long"
    )
    red = tri.groupBy("i", "j").agg(
        F.sum("sum_xy").alias("sum_xy"),
        F.sum("sum_x").alias("sum_x"),
        F.sum("n").alias("n"),
    )
    # three consumers below — materialize the d²-row grid so the corpus
    # scan + GEMM pass runs exactly once (self-joins recompute otherwise)
    red = red.localCheckpoint(eager=False)
    # broadcast the tiny d-row side stats back onto the d² grid
    mean_i = red.filter(F.col("j") == 0).select(
        "i", F.col("sum_x").alias("sum_x_i")
    )
    mean_j = red.filter(F.col("j") == 0).select(
        F.col("i").alias("j"), F.col("sum_x").alias("sum_x_j")
    )
    total = red.agg(F.sum("n").alias("n_rows"))
    return (
        red.join(F.broadcast(mean_i), "i")
        .join(F.broadcast(mean_j), "j")
        .join(F.broadcast(total))
        .select(
            "i",
            "j",
            F.round(
                F.col("sum_xy") / F.col("n_rows")
                - (F.col("sum_x_i") / F.col("n_rows"))
                * (F.col("sum_x_j") / F.col("n_rows")),
                6,
            ).alias("cov"),
        )
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
