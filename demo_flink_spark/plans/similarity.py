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


def q_knn_label_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-NN label-coherence eval of the embedding space: predict each
    query's label by majority vote of its 5 exact nearest neighbors
    (tie → smallest label) and score against the true label — the
    cheap geometric sanity check (are same-label points actually
    near?) run before any ANN index or centroid model is trusted.
    One row: (n_queries, n_correct, accuracy). The neighbor scan is
    the broadcast brute-force shape; votes and the argmax are one
    aggregate + one query-keyed window."""
    from pyspark.sql.window import Window

    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    nbrs = sim.cosine_topk_bruteforce(emb, queries, k=_K)
    votes = (
        nbrs.join(
            emb.select("vec_id", F.col("label").alias("nbr_label")), "vec_id"
        )
        .groupBy("query_id", "nbr_label")
        .agg(F.count(F.lit(1)).alias("n_votes"))
    )
    pick = Window.partitionBy("query_id").orderBy(
        F.desc("n_votes"), F.asc("nbr_label")
    )
    pred = (
        votes.withColumn("rn", F.row_number().over(pick))
        .filter(F.col("rn") == 1)
        .select("query_id", F.col("nbr_label").alias("pred_label"))
    )
    truth = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("label").alias("true_label")
    )
    return (
        pred.join(truth, "query_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_queries"),
            F.sum(
                (F.col("pred_label") == F.col("true_label")).cast("long")
            )
            .cast("long")
            .alias("n_correct"),
        )
        .select(
            "n_queries",
            "n_correct",
            (F.col("n_correct").cast("double") / F.col("n_queries")).alias(
                "accuracy"
            ),
        )
    )


def q_mmr_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MMR diversified top-k (operators/similarity.py::mmr_rerank):
    relevance pool from the brute-force scan, per-query greedy
    diversity re-rank in one Arrow group pass. Pytest-only coverage —
    the greedy recursion has no reasonable SQL twin
    (tests/test_mmr.py: NumPy parity + diversity property)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.mmr_rerank(emb, _queries_df(spark, sf_dir), k=_K, pool=20)



def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining (operators/similarity.py::hard_negatives):
    per query, the top-5 most similar OTHER-label vectors — the
    contrastive-training negative set. Label-mismatch rides the join
    predicate; scores compared at 6dp with rank tiebreaks."""
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), "embedding", "label"
    )
    return sim.hard_negatives(emb, queries, k=_K)


_HARD_NEG_ORACLE = f"""
WITH e AS (SELECT vec_id, label,
                  CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS query_id, label AS qlabel, v AS qv FROM e
      WHERE vec_id < {_N_QUERIES}),
scored AS (
    SELECT q.query_id, e.vec_id,
           list_dot_product(q.qv, e.v)
           / (sqrt(list_dot_product(q.qv, q.qv))
              * sqrt(list_dot_product(e.v, e.v))) AS c
    FROM q JOIN e
      ON q.query_id <> e.vec_id AND e.label IS DISTINCT FROM q.qlabel
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


_EVAL_K = 10


def q_retrieval_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN evaluation as a distributed query (operators/search.py::
    retrieval_metrics): recall@10 / MRR / nDCG@10 of the SRP-LSH index
    against brute-force exact ground truth, per query — the quality
    measurement an ANN deployment reruns on every index rebuild. All
    metric arithmetic is exact-integer sums (nDCG gains pre-quantized
    to micro-units driver-side) and single divisions, so the metrics
    themselves hash-match cross-engine."""
    from demo_flink_spark.operators.search import retrieval_metrics

    emb = load_table(spark, sf_dir, "embeddings")
    q = _queries_df(spark, sf_dir)
    approx = sim.cosine_topk_srp_lsh(emb, q, k=_EVAL_K)
    truth = sim.cosine_topk_bruteforce(emb, q, k=_EVAL_K)
    return retrieval_metrics(
        approx, truth, q.select("query_id"), k=_EVAL_K
    )


def _retrieval_eval_oracle() -> str:
    from demo_flink_spark.operators.search import _ndcg_gains

    gains = [round(g * 1_000_000) for g in _ndcg_gains(_EVAL_K)]
    glist = "[" + ", ".join(str(g) for g in gains) + "]"
    idcg = str(sum(gains))
    cbuck = _srp_bucket_union()
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
    ascored AS (
        SELECT c.query_id, c.vec_id,
               list_dot_product(q.v, x.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(x.v, x.v))) AS c
        FROM cand c
        JOIN e q ON q.vec_id = c.query_id
        JOIN e x ON x.vec_id = c.vec_id
    ),
    appr AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id ASC) AS rk
        FROM ascored
        QUALIFY rk <= {_EVAL_K}
    ),
    tscored AS (
        SELECT q.vec_id AS query_id, e.vec_id,
               list_dot_product(q.v, e.v)
               / (sqrt(list_dot_product(q.v, q.v))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
        FROM e q JOIN e ON q.vec_id <> e.vec_id
        WHERE q.vec_id < {_N_QUERIES}
    ),
    tr AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id ASC) AS rk
        FROM tscored
        QUALIFY rk <= {_EVAL_K}
    ),
    j AS (
        SELECT a.query_id, a.rk, t.vec_id IS NOT NULL AS hit
        FROM appr a LEFT JOIN tr t
          ON a.query_id = t.query_id AND a.vec_id = t.vec_id
    ),
    m AS (
        SELECT query_id,
               count(*) AS n_retrieved,
               sum(CASE WHEN hit THEN 1 ELSE 0 END) AS hits,
               min(CASE WHEN hit THEN rk END) AS first_hit,
               CAST(sum(CASE WHEN hit
                        THEN {glist}[CAST(rk AS BIGINT)] END)
                    AS BIGINT) AS dcg
        FROM j GROUP BY query_id
    )
    SELECT q.query_id,
           CAST(coalesce(m.n_retrieved, 0) AS BIGINT) AS n_retrieved,
           coalesce(m.hits, 0) / {float(_EVAL_K)!r} AS recall{_EVAL_K},
           coalesce(1.0 / m.first_hit, 0.0) AS mrr,
           CAST(coalesce(m.dcg, 0) AS DOUBLE) / {idcg} AS ndcg{_EVAL_K}
    FROM (SELECT vec_id AS query_id FROM embeddings
          WHERE vec_id < {_N_QUERIES}) q
    LEFT JOIN m ON q.query_id = m.query_id
    """


_RRF_DEPTH = 20
_RRF_TOPN = 10
_RRF_K = 60


def q_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical, over `documents`) and exact
    cosine (dense, over `embeddings`) rank lists fused per query by
    reciprocal-rank fusion (operators/search.py::bm25_batch +
    rrf_fuse). Queries are the 10 lowest ids playing both roles —
    their text against the corpus text, their embedding against the
    corpus vectors (doc_id and vec_id are the same entity id). Each
    retriever contributes its top-20 (self-matches excluded); RRF
    keeps the fused top-10."""
    from pyspark.sql.window import Window

    from demo_flink_spark.operators.search import bm25_batch, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    qdocs = docs.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    bm = bm25_batch(docs, qdocs).filter(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score"), F.asc("doc_id")
    )
    bm_ranked = (
        bm.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _RRF_DEPTH)
        .select("query_id", F.col("doc_id").alias("vec_id"), "rk")
    )
    emb = load_table(spark, sf_dir, "embeddings")
    cos_ranked = sim.cosine_topk_bruteforce(
        emb, _queries_df(spark, sf_dir), k=_RRF_DEPTH
    ).select("query_id", "vec_id", "rk")
    return rrf_fuse(
        bm_ranked,
        cos_ranked,
        k_rrf=_RRF_K,
        topn=_RRF_TOPN,
        rk_a_name="rk_bm25",
        rk_b_name="rk_cos",
    )


def _hybrid_rrf_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql

    softln = softln_ratio_sql("(2 * df + 1)", "(2 * n_docs + 2)")
    return rf"""
    WITH toks AS (
        SELECT doc_id, unnest(list_filter(string_split_regex(
            regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
            w -> length(w) > 0)) AS term
        FROM documents
    ),
    dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
    stats AS (SELECT count(*) AS n_docs,
                     CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
              FROM dl),
    qt AS (SELECT DISTINCT doc_id AS query_id, term FROM toks
           WHERE doc_id < {_N_QUERIES}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
           WHERE term IN (SELECT term FROM qt)
           GROUP BY doc_id, term),
    idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
    scored AS (
        SELECT qt.query_id, tf.doc_id,
               round(- {softln}, 9)
                 * ((tf * 2.2)
                    / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)))
                 AS term_score
        FROM tf JOIN qt USING (term) JOIN idf USING (term)
        JOIN dl USING (doc_id)
        CROSS JOIN stats
        WHERE tf.doc_id <> qt.query_id
    ),
    bm AS (SELECT query_id, doc_id,
                  -- double cast to rank on the SAME key Spark's dsum
                  -- emits (decimal ties could order differently)
                  CAST(sum(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE) AS s
           FROM scored GROUP BY query_id, doc_id),
    bmr AS (SELECT query_id, doc_id AS vec_id,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY s DESC, doc_id ASC) AS rk
            FROM bm),
    bmk AS (SELECT * FROM bmr WHERE rk <= {_RRF_DEPTH}),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    q AS (SELECT vec_id AS query_id, v AS qv FROM e
          WHERE vec_id < {_N_QUERIES}),
    cscored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
        FROM q JOIN e ON q.query_id <> e.vec_id
    ),
    cr AS (SELECT query_id, vec_id,
                  row_number() OVER (PARTITION BY query_id
                                     ORDER BY c DESC, vec_id ASC) AS rk
           FROM cscored),
    ck AS (SELECT * FROM cr WHERE rk <= {_RRF_DEPTH}),
    fused AS (
        SELECT coalesce(b.query_id, c.query_id) AS query_id,
               coalesce(b.vec_id, c.vec_id) AS vec_id,
               b.rk AS rk_bm25, c.rk AS rk_cos
        FROM bmk b FULL OUTER JOIN ck c
          ON b.query_id = c.query_id AND b.vec_id = c.vec_id
    ),
    sc AS (
        SELECT query_id, vec_id, rk_bm25, rk_cos,
               coalesce(1.0 / ({_RRF_K} + rk_bm25), 0.0)
               + coalesce(1.0 / ({_RRF_K} + rk_cos), 0.0) AS rrf_score
        FROM fused
    )
    SELECT query_id, vec_id, rk_bm25, rk_cos, rrf_score,
           fused_rk
    FROM (SELECT *, row_number() OVER (PARTITION BY query_id
                    ORDER BY rrf_score DESC, vec_id ASC) AS fused_rk
          FROM sc)
    WHERE fused_rk <= {_RRF_TOPN}
    """


def _srp_bucket_union() -> str:
    """UNION-ALL SQL computing every (vec_id, table, bucket) from the
    operator's own seeded hyperplanes (shared by the SRP oracle and
    the retrieval-metrics oracle)."""
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
    return "\n            UNION ALL\n            ".join(tables_sql)


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
    cbuck = _srp_bucket_union()
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


def q_topk_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-quantization ANN (operators/similarity.py::
    cosine_topk_hamming): sign-bit words -> Hamming prune to 10k
    candidates -> exact cosine re-rank (a 64-bit sketch of 64 dims is
    coarse, so the prune keeps a wider margin than higher-dim
    deployments would). All-integer candidate selection, so the whole
    two-stage recall trade is value-hash oracle-checkable (unlike
    seeded PQ)."""
    emb = load_table(spark, sf_dir, "embeddings")
    return sim.cosine_topk_hamming(
        emb, _queries_df(spark, sf_dir), k=_K, dim=64, candidate_mult=10
    )


def _hamming_oracle() -> str:
    def word(off: int) -> str:
        return (
            "CAST(list_sum(list_transform(range(0, 32), i -> "
            f"CASE WHEN v[i + {off + 1}] >= 0 THEN 1::BIGINT << i "
            "ELSE 0::BIGINT END)) AS BIGINT)"
        )

    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    w AS (
        SELECT vec_id, v, {word(0)} AS w0, {word(32)} AS w1 FROM e
    ),
    q AS (
        SELECT vec_id AS query_id, v AS qv, w0 AS qw0, w1 AS qw1
        FROM w WHERE vec_id < {_N_QUERIES}
    ),
    ham AS (
        SELECT q.query_id, w.vec_id,
               bit_count(xor(w.w0, q.qw0)) + bit_count(xor(w.w1, q.qw1)) AS h
        FROM q JOIN w ON q.query_id <> w.vec_id
    ),
    cand AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY h ASC, vec_id ASC) AS crk
        FROM ham
        QUALIFY crk <= {10 * _K}
    ),
    scored AS (
        SELECT c.query_id, c.vec_id,
               list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
        FROM cand c
        JOIN q ON q.query_id = c.query_id
        JOIN e ON e.vec_id = c.vec_id
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


_MATRYOSHKA_DIM = 16


def q_matryoshka_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka truncation evaluation (Kusupati et al. 2022): how
    much top-k recall survives truncating embeddings to their first
    16 of 64 dims — the dimension/quality knob an MRL-trained encoder
    exposes. Runs brute-force top-k at BOTH dims in-engine (same
    composed-evaluation shape as `dedup_eval_minhash` /
    `retrieval_eval_metrics`) and reports per-query overlap; exact
    integer counts + one division, so the metric hash-matches."""
    emb = load_table(spark, sf_dir, "embeddings")
    trunc = F.slice(F.col("embedding"), 1, _MATRYOSHKA_DIM)
    t_corpus = emb.select("vec_id", trunc.alias("embedding"))
    t_queries = emb.filter(F.col("vec_id") < _N_QUERIES).select(
        F.col("vec_id").alias("query_id"), trunc.alias("embedding")
    )
    approx = sim.cosine_topk_bruteforce(t_corpus, t_queries, k=_K)
    truth = sim.cosine_topk_bruteforce(emb, _queries_df(spark, sf_dir), k=_K)
    hits = (
        approx.select("query_id", "vec_id")
        .join(truth.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .groupBy("query_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n_common"))
    )
    qids = truth.select("query_id").distinct()
    return qids.join(hits, "query_id", "left").select(
        "query_id",
        F.coalesce("n_common", F.lit(0)).cast("long").alias("n_common"),
        (F.coalesce("n_common", F.lit(0)) / F.lit(_K)).alias("recall_at_k"),
    )


def _matryoshka_oracle() -> str:
    return f"""
    WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
    et AS (SELECT vec_id, v[1:{_MATRYOSHKA_DIM}] AS v FROM e),
    tq AS (SELECT vec_id AS query_id, v AS qv FROM e WHERE vec_id < {_N_QUERIES}),
    tscored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
        FROM tq q JOIN e ON q.query_id <> e.vec_id
    ),
    truth AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id ASC) AS rk
        FROM tscored
        QUALIFY rk <= {_K}
    ),
    aq AS (SELECT vec_id AS query_id, v AS qv FROM et WHERE vec_id < {_N_QUERIES}),
    ascored AS (
        SELECT q.query_id, e.vec_id,
               list_dot_product(q.qv, e.v)
               / (sqrt(list_dot_product(q.qv, q.qv))
                  * sqrt(list_dot_product(e.v, e.v))) AS c
        FROM aq q JOIN et e ON q.query_id <> e.vec_id
    ),
    appr AS (
        SELECT query_id, vec_id,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY c DESC, vec_id ASC) AS rk
        FROM ascored
        QUALIFY rk <= {_K}
    ),
    hits AS (
        SELECT a.query_id, count(*) AS n_common
        FROM appr a JOIN truth t
          ON a.query_id = t.query_id AND a.vec_id = t.vec_id
        GROUP BY a.query_id
    )
    SELECT q.query_id,
           CAST(coalesce(h.n_common, 0) AS BIGINT) AS n_common,
           coalesce(h.n_common, 0) / CAST({_K} AS DOUBLE) AS recall_at_k
    FROM (SELECT DISTINCT query_id FROM truth) q
    LEFT JOIN hits h ON q.query_id = h.query_id
    """


def q_label_centroid_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine between per-label centroids
    (operators/similarity.py::label_centroid_cosine): micros-integer
    component sums, 1/n factors cancel, only the final
    dot / sqrt(n₁·n₂) is floating point — both operations
    IEEE-correctly-rounded over exact integers."""
    from demo_flink_spark.operators.similarity import label_centroid_cosine

    return label_centroid_cosine(load_table(spark, sf_dir, "embeddings"))


_CENTROID_COS_ORACLE = """
WITH comps AS (
    SELECT label, u.ord AS dim,
           CAST(round(CAST(embedding[CAST(u.ord AS INT)] AS DOUBLE)
                      * 1000000) AS HUGEINT) AS c
    FROM embeddings,
         LATERAL unnest(range(1, len(embedding) + 1)) AS u(ord)
),
sums AS (SELECT label, dim, sum(c) AS s FROM comps GROUP BY label, dim),
norms AS (SELECT label, sum(s * s) AS n2 FROM sums GROUP BY label),
counts AS (
    SELECT label, CAST(count(*) AS BIGINT) AS n FROM embeddings GROUP BY label
),
dots AS (
    SELECT a.label AS la, b.label AS lb, sum(a.s * b.s) AS dot
    FROM sums a JOIN sums b ON a.dim = b.dim AND a.label < b.label
    GROUP BY a.label, b.label
)
SELECT la AS label_a, lb AS label_b, ca.n AS n_a, cb.n AS n_b,
       CASE WHEN na.n2 = 0 OR nb.n2 = 0 THEN 0.0
            ELSE CAST(dot AS DOUBLE) / sqrt(CAST(na.n2 * nb.n2 AS DOUBLE))
       END AS cos
FROM dots
JOIN norms na ON la = na.label
JOIN norms nb ON lb = nb.label
JOIN counts ca ON la = ca.label
JOIN counts cb ON lb = cb.label
"""


SPECS = [
    QuerySpec(
        "label_centroid_cosine",
        q_label_centroid_cosine,
        oracle=_CENTROID_COS_ORACLE,
    ),
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
    QuerySpec(
        "knn_label_accuracy",
        q_knn_label_eval,
        oracle=f"""
        WITH e AS (SELECT vec_id, label,
                          CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS query_id, v AS qv, label AS true_label
              FROM e WHERE vec_id < {_N_QUERIES}),
        scored AS (
            SELECT q.query_id, e.vec_id, e.label AS nbr_label,
                   list_dot_product(q.qv, e.v)
                   / (sqrt(list_dot_product(q.qv, q.qv))
                      * sqrt(list_dot_product(e.v, e.v))) AS c
            FROM q JOIN e ON q.query_id <> e.vec_id
        ),
        ranked AS (
            SELECT query_id, nbr_label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY c DESC, vec_id ASC) AS rk
            FROM scored
        ),
        votes AS (
            SELECT query_id, nbr_label, count(*) AS n_votes
            FROM ranked WHERE rk <= {_K}
            GROUP BY query_id, nbr_label
        ),
        pick AS (
            SELECT query_id, nbr_label,
                   row_number() OVER (PARTITION BY query_id
                                      ORDER BY n_votes DESC, nbr_label ASC)
                       AS rn
            FROM votes
        ),
        joined AS (
            SELECT p.query_id,
                   CASE WHEN p.nbr_label = q.true_label THEN 1 ELSE 0 END
                       AS ok
            FROM pick p JOIN q ON p.query_id = q.query_id
            WHERE p.rn = 1
        )
        SELECT CAST(count(*) AS BIGINT) AS n_queries,
               CAST(sum(ok) AS BIGINT) AS n_correct,
               CAST(sum(ok) AS DOUBLE) / count(*) AS accuracy
        FROM joined
        """,
    ),
    QuerySpec("similarity_topk_srp_lsh", q_topk_srp_lsh, oracle=_srp_lsh_oracle()),
    QuerySpec("hybrid_search_rrf", q_hybrid_rrf, oracle=_hybrid_rrf_oracle()),
    QuerySpec("hard_negative_mining", q_hard_negatives, oracle=_HARD_NEG_ORACLE),
    QuerySpec(
        "retrieval_eval_metrics", q_retrieval_eval,
        oracle=_retrieval_eval_oracle(),
    ),
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
    QuerySpec("similarity_topk_hamming", q_topk_hamming, oracle=_hamming_oracle()),
    QuerySpec(
        "matryoshka_topk_recall", q_matryoshka_recall,
        oracle=_matryoshka_oracle(),
    ),
    # similarity_topk_pq is pytest-only coverage: its seeded k-means
    # codebooks have no SQL twin, so it is exercised by the
    # measured-recall test in tests/test_similarity.py rather than
    # declared to the driver gate (r4, VERDICT item 5 option b).
]
