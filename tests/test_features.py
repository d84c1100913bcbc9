"""Embedding feature ops: quantization invariants and the PCA
projection pinned against a NumPy twin of the same contract."""

from __future__ import annotations

import duckdb
import numpy as np

from demo_flink_spark.operators import features as ft
from demo_flink_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def _local_embeddings() -> np.ndarray:
    rows = (
        duckdb.connect()
        .execute(
            f"SELECT embedding FROM read_parquet('{SF}/embeddings.parquet')"
            " ORDER BY vec_id"
        )
        .fetchall()
    )
    return np.array([r[0] for r in rows], dtype=np.float64)


def test_quantize_int8_invariants(spark):
    emb = load_table(spark, SF, "embeddings")
    out = ft.quantize_int8(emb).collect()
    assert len(out) == emb.count()
    for r in out:
        qv = np.array(r["qvec"])
        assert qv.min() >= -127 and qv.max() <= 127
        # symmetric quantization bounds the error by half a step
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-12
        # at least one coordinate must hit full scale (it defined scale)
        assert np.abs(qv).max() == 127


def _twin_cov(mat: np.ndarray, qbits: int = 24) -> np.ndarray:
    """Exact-integer twin of covariance_triples' contract: Q-quantize,
    integer sums, 6-decimal round-half-away integer division."""
    q = np.floor(mat * float(1 << qbits) + 0.5).astype(np.int64).astype(object)
    n, d = q.shape
    sxy = q.T @ q  # object dtype → arbitrary-precision python ints
    sx = q.sum(axis=0)
    den = n * n * (1 << (2 * qbits))
    cov = np.zeros((d, d))
    for i in range(d):
        for j in range(d):
            num = n * int(sxy[i, j]) - int(sx[i]) * int(sx[j])
            sign = -1 if num < 0 else 1
            cov[i, j] = sign * ((abs(num) * 2000000 + den) // (2 * den)) / 1e6
    return cov


def test_pca_scores_match_numpy_twin(spark):
    """The distributed pass must reproduce a local NumPy PCA that
    follows the same contract (Q24 exact-integer population covariance
    at 6 decimals, sign pinned on the largest-|coord|)."""
    emb = load_table(spark, SF, "embeddings")
    comps = ft.pca_components(emb, k=2)
    got = {
        r["vec_id"]: (r["pc1"], r["pc2"])
        for r in ft.pca_project(emb, comps).collect()
    }

    mat = _local_embeddings()
    cov = _twin_cov(mat)
    _, vecs = np.linalg.eigh(cov)
    want_comps = vecs[:, ::-1][:, :2].T.copy()
    for c in range(2):
        pivot = np.argmax(np.abs(want_comps[c]))
        if want_comps[c, pivot] < 0:
            want_comps[c] = -want_comps[c]

    # components agree exactly: the distributed covariance and the
    # integer twin produce the SAME matrix, so eigh sees identical input
    np.testing.assert_allclose(comps, want_comps, atol=1e-12)

    want = np.round(mat @ want_comps.T, 6)
    for vid in range(len(mat)):
        # 1.1e-6: scores round to 6 decimals; a last-bit GEMM-order
        # difference may flip one rounding step, never more
        np.testing.assert_allclose(got[vid], want[vid], atol=1.1e-6)


def test_pca_variance_ordering(spark):
    """pc1 must capture at least as much variance as pc2."""
    emb = load_table(spark, SF, "embeddings")
    comps = ft.pca_components(emb, k=2)
    rows = ft.pca_project(emb, comps).collect()
    pc1 = np.array([r["pc1"] for r in rows])
    pc2 = np.array([r["pc2"] for r in rows])
    assert pc1.var() >= pc2.var() > 0


def test_label_centroids_match_numpy(spark):
    import numpy as np

    from demo_flink_spark.operators.features import label_centroids
    from demo_flink_spark.sources import load_table

    emb = load_table(spark, SF, "embeddings")
    got = {
        (r["label"], r["i"]): (r["centroid"], r["n_vecs"])
        for r in label_centroids(emb).collect()
    }
    pdf = emb.toPandas()
    for label, grp in pdf.groupby("label"):
        mat = np.array(list(grp["embedding"]), dtype=np.float64)
        mean = mat.mean(axis=0)
        for i in range(mat.shape[1]):
            c, n = got[(label, i)]
            assert n == len(mat)
            assert abs(c - mean[i]) < 2e-6  # 6-dp grid + Q24 quantization


def test_random_projection_preserves_distances(spark):
    # JL property: with 16 output dims the pairwise distance distortion
    # of 64-d unit-ish vectors stays bounded in aggregate
    import numpy as np

    from demo_flink_spark.operators.features import random_projection, rp_signs

    rng = np.random.RandomState(3)
    X = rng.standard_normal((40, 64)).astype(np.float32)
    df = spark.createDataFrame(
        [(i, [float(x) for x in X[i]]) for i in range(40)],
        "vec_id long, embedding array<float>",
    )
    out = random_projection(df, out_dim=16).collect()
    Y = np.zeros((40, 16))
    for r in out:
        Y[r["vec_id"]] = r["proj"]
    # projection must equal the literal sign matrix applied in numpy
    S = rp_signs(16, 64)
    want = (X.astype(np.float64) @ S.T) * np.sqrt(3.0 / 16)
    assert np.allclose(Y, want, rtol=1e-9)
    # aggregate distance distortion: median ratio within 25%
    ratios = []
    for i in range(0, 40, 3):
        for j in range(i + 1, 40, 7):
            dx = np.linalg.norm(X[i] - X[j])
            dy = np.linalg.norm(Y[i] - Y[j])
            ratios.append(dy / dx)
    med = float(np.median(ratios))
    assert 0.75 < med < 1.25, med


def test_rp_signs_deterministic_and_sparse(spark):
    from demo_flink_spark.operators.features import rp_signs

    a, b = rp_signs(8, 64, seed=11), rp_signs(8, 64, seed=11)
    assert (a == b).all()
    frac_zero = (a == 0).mean()
    assert 0.5 < frac_zero < 0.8  # ~2/3 sparse
    assert set(a.flatten().tolist()) <= {-1, 0, 1}
