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
    # doc length over ALL terms (before the query-term prune)
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
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
        tf.join(F.broadcast(df_), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", (idf * tf_norm).alias("term_score"))
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_matched"),
        dsum(F.col("term_score")).alias("score"),
    )
