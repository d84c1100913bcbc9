"""Full-text relevance scoring (engine extension, WordCount lineage
from SURVEY §2.2/§2.4 made retrieval-useful): BM25 over a document
corpus.

The reference tops out at word counting (`AdvancedWordCount.java`);
a corpus engine also needs the standard retrieval score. Okapi BM25
with Lucene's non-negative IDF:

    score(d, q) = Σ_{t ∈ q, t ∈ d} ln(1 + (N - df + 0.5)/(df + 0.5))
                  · tf·(k1+1) / (tf + k1·(1 - b + b·dl/avgdl))

Scale shape: one tokenize pass builds (doc, term) counts; the query
term set is a literal `isin` filter, so the exploded token stream is
pruned before any shuffle; df and the corpus stats (N, avgdl) are
scalar-row aggregates that ride broadcast joins. No all-pairs, no
per-query corpus scan beyond the shared tokenize.

Determinism: idf's ln is rounded per element before use (libm last-ulp
portability — same discipline as `lm_bigram_score`), and the per-doc
term-score sum is decimal-exact (`dsum`), so scores hash-match the
DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.operators.relational import dsum
from demo_flink_spark.operators.textstats import _tokens


def bm25_scores(
    docs: DataFrame,
    query_terms: Sequence[str],
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_matched, score) for every document matching at least
    one query term, higher = more relevant."""
    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z\s]", "")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(norm)).alias("term"),
    )
    # doc length over ALL terms (before the query-term prune):
    # size(tokens) per INPUT ROW, then summed per doc_id — the same
    # grouped exchange as before but over one narrow row per doc
    # instead of the full exploded token stream (r14 pass, guide
    # §2.3: aggregate before you shuffle / shuffle fewer bytes).
    # Summing per doc_id (not a bare per-row size) keeps the old
    # explode+groupBy semantics exact even for a caller passing
    # duplicate doc_ids (review r14), and the dl > 0 filter mirrors
    # the explode's exclusion of docs whose rows all tokenize empty.
    dl = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(_tokens(norm)).cast("long").alias("_n_toks"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_n_toks").alias("dl"))
        .filter(F.col("dl") > 0)
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n, avgdl = F.col("n_docs"), F.col("avgdl")
    # (N - df + .5)/(df + .5) + 1 == (2N + 2)/(2df + 1): an integer
    # ratio, so the engine-portable softln applies (bit-identical on
    # every engine; builtin ln's libm ulp drift can flip the rounding)
    from demo_flink_spark.operators.relational import softln_ratio

    idf = F.round(
        -softln_ratio(
            F.lit(2) * F.col("df") + F.lit(1), F.lit(2) * n + F.lit(2)
        ),
        9,
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / avgdl)
    )
    scored = (
        tf.join(df_, "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tf_norm).alias("term_score"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        dsum(F.col("term_score")).alias("score"),
    )


def bm25_batch(
    docs: DataFrame,
    queries: DataFrame,
    k1: float = 1.2,
    b: float = 0.75,
    id_col: str = "doc_id",
    text_col: str = "text",
    query_id_col: str = "query_id",
    query_text_col: str = "text",
) -> DataFrame:
    """BM25 of EVERY query document against the corpus in one plan:
    (query_id, doc_id, n_matched, score) for each (query, doc) pair
    sharing at least one term.

    Scale shape: the corpus is tokenized ONCE (shared with dl/df
    stats); the query term table is small (|Q| · |terms per query|)
    and rides **broadcast** joins twice — a semi-join that prunes the
    exploded corpus token stream to query terms BEFORE the (doc, term)
    count shuffle, then the scoring join that fans each matched term
    out to its queries. Nothing is ever keyed by (query, doc) until
    the final partial-aggregated sum, so the plan is one corpus scan
    + one tf shuffle regardless of |Q| — the batch twin of
    `bm25_scores`, which it reproduces exactly for a single query.

    Determinism contract matches `bm25_scores`: softln idf rounded to
    9 dp per element, decimal-exact per-pair sum.
    """
    from demo_flink_spark.operators.relational import softln_ratio

    norm = F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z\s]", "")
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(norm)).alias("term"),
    )
    qnorm = F.regexp_replace(F.lower(F.col(query_text_col)), r"[^a-z\s]", "")
    qterms = (
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.explode(_tokens(qnorm)).alias("term"),
        )
        .distinct()
    )
    # per-row size(tokens) summed per doc_id: the dl exchange carries
    # one narrow row per doc instead of the exploded token stream,
    # with semantics exact even under duplicate doc_ids — see
    # bm25_scores (review r14)
    dl = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.size(_tokens(norm)).cast("long").alias("_n_toks"),
        )
        .groupBy("doc_id")
        .agg(F.sum("_n_toks").alias("dl"))
        .filter(F.col("dl") > 0)
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    term_set = qterms.select("term").distinct()
    tf = (
        toks.join(F.broadcast(term_set), "term", "left_semi")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_ = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    idf = F.round(
        -softln_ratio(
            F.lit(2) * F.col("df") + F.lit(1),
            F.lit(2) * F.col("n_docs") + F.lit(2),
        ),
        9,
    )
    tf_norm = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    scored = (
        tf.join(df_, "term")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("query_id", "doc_id", (idf * tf_norm).alias("term_score"))
    )
    return scored.groupBy("query_id", "doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        dsum(F.col("term_score")).alias("score"),
    )


def rrf_fuse(
    ranked_a: DataFrame,
    ranked_b: DataFrame,
    k_rrf: int = 60,
    topn: int = 10,
    rk_a_name: str = "rk_a",
    rk_b_name: str = "rk_b",
) -> DataFrame:
    """Reciprocal-rank fusion of two per-query ranked lists.

    Inputs carry (query_id, vec_id, rk); a doc absent from one list
    contributes 0 from that source. ``rrf = Σ 1/(k + rank)`` — each
    source term is one IEEE division of small integers (bit-identical
    on any engine) and the fuse is ONE addition, so the fused ordering
    is engine-portable with a vec_id tiebreak.

    The join is per-query rank lists (|Q|·depth rows each side) — a
    full-outer hash join on (query_id, vec_id); at any corpus size
    this is query-set-sized, never corpus-sized.
    """
    from pyspark.sql.window import Window

    a = ranked_a.select("query_id", "vec_id", F.col("rk").alias("_rka"))
    bdf = ranked_b.select("query_id", "vec_id", F.col("rk").alias("_rkb"))
    fused = a.join(bdf, ["query_id", "vec_id"], "full_outer")
    score = F.coalesce(
        F.lit(1.0) / (F.lit(k_rrf) + F.col("_rka")), F.lit(0.0)
    ) + F.coalesce(F.lit(1.0) / (F.lit(k_rrf) + F.col("_rkb")), F.lit(0.0))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("rrf_score"), F.asc("vec_id")
    )
    return (
        fused.select(
            "query_id",
            "vec_id",
            F.col("_rka").alias(rk_a_name),
            F.col("_rkb").alias(rk_b_name),
            score.alias("rrf_score"),
        )
        .withColumn("fused_rk", F.row_number().over(w).cast("long"))
        .filter(F.col("fused_rk") <= topn)
    )


def _ndcg_gains(k: int) -> list[float]:
    """1/log2(r+1) for r = 1..k — computed once driver-side and
    embedded as literals, so both engines consume IDENTICAL doubles
    (no runtime log2 whose libm could drift)."""
    import math

    return [1.0 / math.log2(r + 1) for r in range(1, k + 1)]


def retrieval_metrics(
    approx: DataFrame,
    truth: DataFrame,
    queries: DataFrame,
    k: int = 10,
) -> DataFrame:
    """Recall@k, MRR and nDCG@k of an approximate ranked list against
    exact ground truth, per query — the evaluation harness for ANN /
    hybrid retrieval, AS a distributed query.

    `approx` and `truth` carry (query_id, vec_id, rk); `queries` is
    the query-id universe (queries with zero retrieved rows still get
    a metrics row). Numerics are engine-portable by construction:
    recall and MRR are single divisions of exact integers; DCG sums
    literal 1/log2(r+1) gains through decimal (order-independent) and
    divides by the literal ideal DCG.

    Scale shape: rank lists are |Q|·k rows — every join and aggregate
    here is query-set-sized, independent of corpus size.
    """
    # gains quantized to integer micro-units IN PYTHON: a runtime
    # double->decimal cast of an irrational gain is the r3/r4
    # cross-engine rounding hazard (Spark converts the exact binary
    # expansion, DuckDB float-multiplies) — caught live by this
    # query's first oracle run. Integer gains make DCG an exact long
    # sum and nDCG one division of exact longs.
    gains = [round(g * 1_000_000) for g in _ndcg_gains(k)]
    idcg = sum(gains)
    garr = F.array(*[F.lit(int(g)) for g in gains])
    a = approx.filter(F.col("rk") <= k).select("query_id", "vec_id", "rk")
    t = (
        truth.filter(F.col("rk") <= k)
        .select("query_id", "vec_id")
        .withColumn("_hit", F.lit(True))
    )
    j = a.join(t, ["query_id", "vec_id"], "left").select(
        "query_id",
        "rk",
        F.coalesce("_hit", F.lit(False)).alias("hit"),
    )
    m = j.groupBy("query_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_retrieved"),
        F.sum(F.col("hit").cast("long")).alias("_hits"),
        F.min(F.when(F.col("hit"), F.col("rk"))).alias("_first_hit"),
        F.sum(
            F.when(F.col("hit"), F.element_at(garr, F.col("rk").cast("int")))
        ).cast("long").alias("_dcg"),
    )
    return (
        queries.select("query_id")
        .join(m, "query_id", "left")
        .select(
            "query_id",
            F.coalesce("n_retrieved", F.lit(0)).cast("long").alias(
                "n_retrieved"
            ),
            (F.coalesce("_hits", F.lit(0)) / F.lit(float(k))).alias(
                f"recall{k}"
            ),
            F.coalesce(F.lit(1.0) / F.col("_first_hit"), F.lit(0.0)).alias(
                "mrr"
            ),
            (F.coalesce("_dcg", F.lit(0)) / F.lit(int(idcg))).alias(
                f"ndcg{k}"
            ),
        )
    )
