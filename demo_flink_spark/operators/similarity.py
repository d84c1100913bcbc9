"""Similarity search over embedding columns (north-star extension):
brute-force cosine top-k as the exact baseline; SRP-LSH bucketing,
IVF-Flat cells, and product quantization as the approximate scale
paths (recall measured against brute force in pytest for all three).

Scale design:
- **Brute force** is a broadcast nested-loop: the QUERY set is small
  (broadcast), the corpus streams through — cost |corpus|×|queries|,
  embarrassingly parallel, no shuffle except the final per-query top-k
  (which TakeOrdered keeps at k rows per partition). Right answer up
  to ~thousands of queries; at 100 TB corpus it's still one scan.
- **SRP-LSH**: L independent hash tables × P hyperplanes; bucket id =
  sign-bit string of the projections. Corpus is bucketed once (narrow
  pass), queries join buckets by equality — candidates per query ≈
  |corpus| / 2^P × L, then exact cosine re-rank. Recall is tunable
  with L (tables) and P (planes); the pytest asserts measured recall
  against brute force.
- Hyperplanes are generated driver-side from a fixed seed (numpy
  RandomState) and embedded as literals — deterministic across runs
  and executors, no model file.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_flink_spark.operators.dedup import cosine


def _topk_neighbors(scored: DataFrame, k: int) -> DataFrame:
    """Per-query top-k by cosine (desc), vec_id tiebreak for total order."""
    w = Window.partitionBy("query_id").orderBy(F.desc("_cos_raw"), F.asc("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            "query_id",
            "vec_id",
            F.round("_cos_raw", 6).alias("cos"),
            "rk",
        )
    )


def cosine_topk_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    `queries` must have (query_id, embedding). Self-matches (same id)
    are excluded when query_id collides with vec_id.
    """
    q = F.broadcast(
        queries.select(F.col("query_id"), F.col(vec_col).alias("qvec"))
    )
    scored = (
        corpus.select("vec_id", F.col(vec_col).alias("cvec"))
        .join(q, F.col("query_id") != F.col("vec_id"))
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def srp_planes(dim: int, n_tables: int, n_planes: int, seed: int = 42) -> np.ndarray:
    """Deterministic hyperplanes, shape (n_tables, n_planes, dim)."""
    rng = np.random.RandomState(seed)
    return rng.standard_normal((n_tables, n_planes, dim))


def srp_bucketize(
    df: DataFrame,
    vec_col: str,
    planes: np.ndarray,
    id_col: str,
) -> DataFrame:
    """(id, table_idx, bucket) — one row per hash table per vector.

    One Arrow-batched numpy pass: projections for ALL tables at once
    via (batch × dim) @ (dim × tables·planes) — a single BLAS call per
    batch instead of tables×planes interpreted column expressions.
    The plane matrix rides in the task closure (a few KB).
    """
    n_tables, n_planes, dim = planes.shape
    flat = planes.reshape(n_tables * n_planes, dim).T  # (dim, T*P)
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    def bucketize(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            bits = (mat @ flat) >= 0  # (n, T*P)
            bits = bits.reshape(len(pdf), n_tables, n_planes)
            buckets = bits @ weights  # (n, T)
            n = len(pdf)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), n_tables),
                    "table_idx": np.tile(np.arange(n_tables), n),
                    "bucket": buckets.reshape(-1),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        bucketize, f"{id_col} long, table_idx int, bucket long"
    )


def ivf_centroids(
    corpus: DataFrame,
    vec_col: str = "embedding",
    n_cells: int = 16,
    sample_size: int = 1024,
    n_iters: int = 5,
    seed: int = 42,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Deterministic IVF coarse quantizer: k-means over a hash-picked
    sample, trained driver-side.

    Sample = the `sample_size` vectors with the smallest xxhash64 of
    their id — deterministic across runs/partitionings, unlike
    `df.sample`. Lloyd iterations run in numpy on the driver (the
    sample is KB-MB scale regardless of corpus size — this is how
    FAISS trains IVF too: quantizer on a sample, never the corpus).
    Vectors are L2-normalized so nearest-centroid-by-dot ≈ cosine cell.
    Empty cells re-seed from the farthest sample points.
    """
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_size)
        .toPandas()
    )
    mat = np.array(list(sample[vec_col]), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    rng = np.random.RandomState(seed)
    cents = mat[rng.choice(len(mat), size=min(n_cells, len(mat)), replace=False)]
    for _ in range(n_iters):
        assign = np.argmax(mat @ cents.T, axis=1)
        for c in range(len(cents)):
            members = mat[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / np.linalg.norm(v)
            else:  # re-seed empty cell from the worst-served point
                worst = np.argmin(np.max(mat @ cents.T, axis=1))
                cents[c] = mat[worst]
    return cents


def ivf_assign(
    df: DataFrame,
    vec_col: str,
    centroids: np.ndarray,
    id_col: str,
    nprobe: int = 1,
) -> DataFrame:
    """(id, cell) rows: each vector's `nprobe` nearest centroid cells.

    One Arrow-batched numpy pass — (batch × dim) @ (dim × cells) per
    batch; the centroid matrix rides in the closure (KBs). Corpus
    vectors use nprobe=1 (each indexed once); queries probe several
    cells to trade compute for recall.
    """
    cents = centroids.T  # (dim, cells)
    # a tiny corpus can train fewer centroids than nprobe requests
    probe = min(nprobe, centroids.shape[0])

    def assign(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            sims = mat @ cents  # (n, cells)
            top = np.argsort(-sims, axis=1)[:, :probe]  # (n, probe)
            yield pd.DataFrame(
                {
                    id_col: np.repeat(pdf[id_col].to_numpy(), probe),
                    "cell": top.reshape(-1).astype(np.int32),
                }
            )

    return df.select(id_col, vec_col).mapInPandas(
        assign, f"{id_col} long, cell int"
    )


def cosine_topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via an IVF (inverted-file)
    index: corpus partitioned into coarse centroid cells, queries probe
    their `nprobe` nearest cells, exact cosine re-ranks within cells.

    The scale path ANN engines actually ship (FAISS IVF-Flat shape):
    candidates per query ≈ nprobe/n_cells of the corpus, recall is the
    probability the true neighbor's cell is probed — tunable with
    nprobe (the pytest measures recall vs brute force). All distributed
    work is an equi-join on `cell` + per-candidate cosine; only the
    KB-scale quantizer training touches the driver.
    """
    cents = ivf_centroids(corpus, vec_col, n_cells, seed=seed)
    ca = ivf_assign(corpus.select("vec_id", vec_col), vec_col, cents, "vec_id", 1)
    qa = ivf_assign(
        queries.select("query_id", vec_col), vec_col, cents, "query_id", nprobe
    )
    candidates = (
        qa.join(ca, "cell")
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        candidates.join(
            F.broadcast(queries.select("query_id", F.col(vec_col).alias("qvec"))),
            "query_id",
        )
        .join(corpus.select("vec_id", F.col(vec_col).alias("cvec")), "vec_id")
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def pq_codebooks(
    corpus: DataFrame,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 64,
    sample_size: int = 1024,
    n_iters: int = 8,
    seed: int = 7,
    id_col: str = "vec_id",
) -> np.ndarray:
    """Product-quantization codebooks: per-subspace k-means over the
    same deterministic hash-picked sample `ivf_centroids` uses.

    Returns (m, n_codes, dim/m). Vectors are L2-normalized before
    splitting so the additive ADC score approximates cosine. Training
    is driver-side on a KB-scale sample (the FAISS recipe); empty
    codes re-seed from the worst-quantized sample point.
    """
    sample = (
        corpus.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)))
        .limit(sample_size)
        .toPandas()
    )
    mat = np.array(list(sample[vec_col]), dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    dim = mat.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    rng = np.random.RandomState(seed)
    books = np.empty((m, n_codes, sub))
    for s in range(m):
        x = mat[:, s * sub : (s + 1) * sub]
        cents = x[rng.choice(len(x), size=min(n_codes, len(x)), replace=False)]
        for _ in range(n_iters):
            d2 = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cents)):
                members = x[assign == c]
                if len(members):
                    cents[c] = members.mean(axis=0)
                else:
                    cents[c] = x[np.argmax(d2.min(axis=1))]
        books[s] = cents
    return books


def pq_encode(
    df: DataFrame, vec_col: str, books: np.ndarray, id_col: str
) -> DataFrame:
    """(id, codes array<int>): each vector compressed to m sub-space
    code indices — dim×4 bytes → m bytes (32× at dim 64, m 8).

    One Arrow-batched numpy pass; the codebooks (m·n_codes·sub floats,
    KBs) ride the closure. At 100 TB the encoded table is what you
    persist and scan — the raw vectors are only touched again for
    exact re-ranking of final candidates.
    """
    m, n_codes, sub = books.shape

    def encode(batches):
        for pdf in batches:
            mat = np.array(list(pdf[vec_col]), dtype=np.float64)
            mat /= np.linalg.norm(mat, axis=1, keepdims=True)
            codes = np.empty((len(pdf), m), dtype=np.int32)
            for s in range(m):
                x = mat[:, s * sub : (s + 1) * sub]
                d2 = ((x[:, None, :] - books[s][None, :, :]) ** 2).sum(axis=2)
                codes[:, s] = np.argmin(d2, axis=1)
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "codes": list(codes)}
            )

    return df.select(id_col, vec_col).mapInPandas(
        encode, f"{id_col} long, codes array<int>"
    )


def cosine_topk_pq(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    m: int = 8,
    n_codes: int = 64,
    oversample: int = 8,
    seed: int = 7,
) -> DataFrame:
    """Approximate top-k cosine via product quantization with ADC
    scan + exact re-rank (the FAISS PQ shape).

    ADC: cosine(q, x) ≈ Σ_s dot(q_s, codebook[s][code_s(x)]) — each
    query precomputes an (m × n_codes) lookup table, and scoring a
    corpus vector is m table lookups over its codes, never touching
    the raw floats. The scan emits only a per-batch partial top-K'
    (K' = k·oversample) per query, so the shuffle carries
    O(batches · |Q| · K') rows; the final exact cosine re-rank joins
    just the K' survivors per query back to the raw vectors.

    At scale: the PQ-coded corpus is 32× smaller than the raw floats
    — the scan is I/O-bound on codes, the re-rank touches ~K' vectors
    per query, and nothing ever pairs all queries with all vectors.
    Compose with IVF cells for sub-linear scan if |corpus| demands it.
    """
    books = pq_codebooks(corpus, vec_col, m, n_codes, seed=seed)
    coded = pq_encode(corpus.select("vec_id", vec_col), vec_col, books, "vec_id")
    qpdf = queries.select("query_id", vec_col).toPandas()  # |Q| rows, small
    qmat = np.array(list(qpdf[vec_col]), dtype=np.float64)
    qmat /= np.linalg.norm(qmat, axis=1, keepdims=True)
    qids = qpdf["query_id"].to_numpy()
    sub = books.shape[2]
    # (|Q|, m, n_codes) ADC lookup tables
    luts = np.stack(
        [
            np.einsum("qd,cd->qc", qmat[:, s * sub : (s + 1) * sub], books[s])
            for s in range(books.shape[0])
        ],
        axis=1,
    )
    kprime = k * oversample

    def scan(batches):
        for pdf in batches:
            codes = np.array(list(pdf["codes"]), dtype=np.int64)  # (n, m)
            ids = pdf["vec_id"].to_numpy()
            # scores (|Q|, n): sum of per-subspace LUT lookups
            scores = luts[:, np.arange(codes.shape[1])[None, :], codes].sum(
                axis=2
            )
            take = min(kprime, codes.shape[0])
            top = np.argpartition(-scores, take - 1, axis=1)[:, :take]
            yield pd.DataFrame(
                {
                    "query_id": np.repeat(qids, take),
                    "vec_id": ids[top].reshape(-1),
                    "score_pq": np.take_along_axis(scores, top, axis=1).reshape(
                        -1
                    ),
                }
            )

    partial = coded.mapInPandas(
        scan, "query_id long, vec_id long, score_pq double"
    ).filter(F.col("query_id") != F.col("vec_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_pq"), F.asc("vec_id")
    )
    survivors = (
        partial.withColumn("prk", F.row_number().over(w))
        .filter(F.col("prk") <= kprime)
        .select("query_id", "vec_id")
    )
    scored = (
        survivors.join(
            F.broadcast(queries.select("query_id", F.col(vec_col).alias("qvec"))),
            "query_id",
        )
        .join(corpus.select("vec_id", F.col(vec_col).alias("cvec")), "vec_id")
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def cosine_topk_srp_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    n_tables: int = 16,
    n_planes: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k cosine neighbors via SRP-LSH bucket join.

    Candidates = corpus vectors sharing ≥1 (table, bucket) with the
    query; exact cosine re-ranks candidates. Collision odds per plane
    are 1−θ/π, so defaults (16 tables × 4 planes) give a ~0.4-cosine
    neighbor p ≈ 1−(1−0.6^4)^16 ≈ 0.9 recall; raise n_planes as the
    corpus grows and neighbors get closer (tighter buckets, same
    recall). The pytest measures recall against brute force.
    """
    dim = len(
        queries.select(vec_col).first()[0]
    )  # driver-side: one row, cheap
    planes = srp_planes(dim, n_tables, n_planes, seed)
    cb = srp_bucketize(corpus.select("vec_id", vec_col), vec_col, planes, "vec_id")
    qb = srp_bucketize(
        queries.select("query_id", vec_col), vec_col, planes, "query_id"
    )
    candidates = (
        qb.join(cb, ["table_idx", "bucket"])
        .filter(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .distinct()
    )
    scored = (
        candidates.join(
            F.broadcast(
                queries.select("query_id", F.col(vec_col).alias("qvec"))
            ),
            "query_id",
        )
        .join(corpus.select("vec_id", F.col(vec_col).alias("cvec")), "vec_id")
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining for contrastive training: for each query,
    the top-k most cosine-similar corpus vectors with a DIFFERENT
    label — the negatives that actually teach a bi-encoder something.

    Same broadcast scan shape as `cosine_topk_bruteforce` (query set
    broadcast, corpus streams, per-query top-k); the label-mismatch
    predicate rides the join condition, so same-class pairs are
    dropped before scoring. `queries` needs (query_id, embedding,
    label). The label comparison is null-safe (NULL is a distinct
    label value, SQL `IS DISTINCT FROM`): a plain `!=` would silently
    exclude every NULL-labeled row from negative mining."""
    q = F.broadcast(
        queries.select(
            F.col("query_id"),
            F.col(vec_col).alias("qvec"),
            F.col(label_col).alias("qlabel"),
        )
    )
    scored = (
        corpus.select("vec_id", F.col(vec_col).alias("cvec"), label_col)
        .join(
            q,
            (F.col("query_id") != F.col("vec_id"))
            & ~F.col(label_col).eqNullSafe(F.col("qlabel")),
        )
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def binary_quantize_words(
    df: DataFrame, vec_col: str, id_col: str, dim: int = 64
) -> DataFrame:
    """Sign-bit binary quantization: each vector becomes dim/32
    bigint words (bit i of word w = 1 iff v[32w+i] >= 0) — 32× less
    memory than float32 and Hamming-comparable with two CPU
    instructions (xor + popcount).

    This is the compressed representation every billion-scale vector
    store keeps hot (binary quantization in Qdrant/Faiss terms; PQ is
    the finer-grained cousin — `cosine_topk_pq`). Exact integer bit
    arithmetic, so the DuckDB twin packs identical words. Works per
    32-dim block to stay in a signed bigint's positive range on both
    engines.
    """
    if dim % 32 != 0:
        raise ValueError(f"dim ({dim}) must be a multiple of 32")
    words = [
        F.expr(
            f"aggregate(sequence(0, 31), 0L, (acc, i) -> acc + "
            f"IF(element_at({vec_col}, {32 * w} + i + 1) >= 0, "
            f"shiftleft(1L, i), 0L))"
        ).alias(f"w{w}")
        for w in range(dim // 32)
    ]
    return df.select(F.col(id_col), *words)


def cosine_topk_hamming(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    dim: int = 64,
    candidate_mult: int = 10,
) -> DataFrame:
    """Two-stage ANN: Hamming distance over sign-bit words prunes the
    corpus to `candidate_mult * k` candidates per query, then the
    exact portable cosine re-ranks those to the final top-k — the
    binary-quantization search loop (scan compressed words, re-rank
    survivors against full-precision vectors).

    Candidate selection is deterministic (hamming asc, vec_id asc) and
    exact-integer, so the recall trade is identical on any engine and
    the DuckDB twin is a full value-hash oracle. Output schema matches
    the other top-k operators: (query_id, vec_id, cos, rk).

    Scale: the corpus side carries only id + dim/32 bigints into the
    prune (the float vectors stay in the parquet scan until the
    candidate join pulls ~mult·k·|Q| of them); queries broadcast.
    """
    n_words = dim // 32
    cw = binary_quantize_words(corpus, vec_col, "vec_id", dim)
    qw = binary_quantize_words(
        queries.select(F.col("query_id").alias("vec_id"), F.col(vec_col)),
        vec_col,
        "vec_id",
        dim,
    ).select(
        F.col("vec_id").alias("query_id"),
        *[F.col(f"w{i}").alias(f"qw{i}") for i in range(n_words)],
    )
    hamming = sum(
        F.bit_count(F.col(f"w{i}").bitwiseXOR(F.col(f"qw{i}")))
        for i in range(n_words)
    )
    pruned = (
        cw.join(F.broadcast(qw), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", hamming.alias("_ham"))
        .withColumn(
            "_crk",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.asc("_ham"), F.asc("vec_id")
                )
            ),
        )
        .filter(F.col("_crk") <= candidate_mult * k)
        .select("query_id", "vec_id")
    )
    qv = F.broadcast(
        queries.select("query_id", F.col(vec_col).alias("qvec"))
    )
    scored = (
        pruned.join(corpus.select("vec_id", F.col(vec_col).alias("cvec")), "vec_id")
        .join(qv, "query_id")
        .withColumn("_cos_raw", cosine(F.col("qvec"), F.col("cvec")))
    )
    return _topk_neighbors(scored, k)


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    pool: int = 20,
    lam: float = 0.7,
    vec_col: str = "embedding",
) -> DataFrame:
    """Maximal Marginal Relevance diversified top-k (Carbonell &
    Goldstein 1998): per query, greedily pick the candidate maximizing

        lam * rel(q, d)  -  (1 - lam) * max_{s in selected} sim(d, s)

    so the result list trades pure relevance for coverage — the
    re-rank every RAG/retrieval stack runs when near-duplicate
    passages would otherwise fill all k slots.

    Two stages: (1) exact top-`pool` relevance candidates per query —
    the brute-force broadcast scan (`cosine_topk_bruteforce` shape,
    one corpus pass); (2) per-query greedy selection over the pool via
    applyInPandas — the group state is a pool x dim matrix (KBs), and
    the O(k * pool) greedy loop runs on ~pool rows per group, never on
    the corpus. Ties break (score desc, vec_id asc): deterministic
    output for a fixed corpus.

    Returns (query_id, rk, vec_id, relevance, mmr_score). Pytest-only
    coverage: the greedy recursion has no reasonable SQL twin
    (tests/test_mmr.py pins NumPy-reference parity + the diversity
    property vs plain top-k).
    """
    cand = cosine_topk_bruteforce(corpus, queries, k=pool, vec_col=vec_col)
    qv = F.broadcast(
        queries.select("query_id", F.col(vec_col).alias("qvec"))
    )
    pooled = (
        cand.select("query_id", "vec_id")
        .join(corpus.select("vec_id", F.col(vec_col).alias("cvec")), "vec_id")
        .join(qv, "query_id")
    )

    def per_query(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        mat = np.array(list(pdf["cvec"]), dtype=np.float64)
        mat /= np.linalg.norm(mat, axis=1, keepdims=True)
        # np.array (copy), not asarray: Arrow hands the vector over as
        # a zero-copy READ-ONLY buffer and the in-place normalize below
        # would raise "output array is read-only"
        qvec = np.array(pdf["qvec"].iloc[0], dtype=np.float64)
        qvec /= np.linalg.norm(qvec)
        rel = mat @ qvec
        sims = mat @ mat.T
        ids = pdf["vec_id"].to_numpy()
        n = len(ids)
        selected: list[int] = []
        out_rows = []
        for rank in range(1, min(k, n) + 1):
            best_i, best_score = -1, -np.inf
            for i in range(n):
                if i in selected:
                    continue
                penalty = max(sims[i, j] for j in selected) if selected else 0.0
                score = lam * rel[i] - (1.0 - lam) * penalty
                # total order: score desc, vec_id asc (ids pre-sorted,
                # so strict > keeps the lowest id among exact ties)
                if score > best_score:
                    best_i, best_score = i, score
            selected.append(best_i)
            out_rows.append(
                (
                    int(pdf["query_id"].iloc[0]),
                    rank,
                    int(ids[best_i]),
                    float(rel[best_i]),
                    float(best_score),
                )
            )
        return pd.DataFrame(
            out_rows,
            columns=["query_id", "rk", "vec_id", "relevance", "mmr_score"],
        )

    return pooled.groupBy("query_id").applyInPandas(
        per_query,
        "query_id long, rk int, vec_id long, relevance double, mmr_score double",
    )


def label_centroid_cosine(
    emb: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Pairwise cosine similarity between per-label centroid vectors —
    the cluster-geometry audit behind label-taxonomy health checks
    (two labels with cos ≈ 1 are candidates to merge; a label whose
    centroid sits far from all others is a candidate outlier class).

    Engine-exact: components are rounded to integer micros (off any
    tie by representation error), per-(label, dim) sums and all dot
    products are exact decimal arithmetic, and since
    centroid = s/n, cos(c₁, c₂) = s₁·s₂ / (|s₁||s₂|) — the 1/n
    factors cancel, so NO division happens until the final
    dot / sqrt(n₁·n₂), both IEEE-correctly-rounded over exact
    integers. Overflow: Σ|s_d| per label must stay < 10¹⁹-ish per
    dim — fine to billions of unit-scale vectors per label.

    Scale shape: posexplode → (label, dim) partial sums is ONE
    map-side-combinable aggregate over |rows|·dim narrow rows; the
    pair join runs on |labels|·dim centroid rows, never raw vectors.
    Output is |labels|²/2 rows.
    """
    comps = emb.select(
        F.col(label_col).alias("label"),
        F.posexplode(F.col(vec_col)).alias("dim", "comp"),
    ).select(
        "label",
        "dim",
        F.round(F.col("comp").cast("double") * 1_000_000)
        .cast("decimal(38,0)")
        .alias("c"),
    )
    sums = comps.groupBy("label", "dim").agg(F.sum("c").alias("s"))
    norms = sums.groupBy("label").agg(
        F.sum(F.expr("s * s")).alias("n2")
    )
    counts = emb.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("n_vecs")
    )
    a, b = sums.alias("a"), sums.alias("b")
    dots = (
        a.join(b, on="dim")
        .filter(F.col("a.label") < F.col("b.label"))
        .groupBy(
            F.col("a.label").alias("label_a"),
            F.col("b.label").alias("label_b"),
        )
        .agg(F.sum(F.expr("a.s * b.s")).alias("dot"))
    )
    na, nb = norms.alias("na"), norms.alias("nb")
    ca, cb = counts.alias("ca"), counts.alias("cb")
    return (
        dots.join(na, F.col("label_a") == F.col("na.label"))
        .join(nb, F.col("label_b") == F.col("nb.label"))
        .join(ca, F.col("label_a") == F.col("ca.label"))
        .join(cb, F.col("label_b") == F.col("cb.label"))
        .select(
            "label_a",
            "label_b",
            F.col("ca.n_vecs").alias("n_a"),
            F.col("cb.n_vecs").alias("n_b"),
            F.when(
                (F.col("na.n2") == 0) | (F.col("nb.n2") == 0), F.lit(0.0)
            )
            .otherwise(
                F.col("dot").cast("double")
                / F.sqrt(F.expr("na.n2 * nb.n2").cast("double"))
            )
            .alias("cos"),
        )
    )
