"""Declared queries: corpus-pipeline stages (contamination check and
sequence packing) over `documents`.

Both stages run AFTER dedup/quality filtering in a real corpus build;
here they are standalone oracle-checked queries. The benchmark for the
contamination check is a deterministic md5-bucket subset of the corpus
itself (every engine can reproduce it), which guarantees non-trivial
overlap: benchmark members score ~1.0, near-duplicates of them score
partial rates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import pipeline as pl
from demo_flink_spark.operators.textstats import _tokens
from demo_flink_spark.plans.dedup import _CANON
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

# DuckDB twin of operators.dedup.shingles at n=3 (identical to the
# ngram-jaccard oracle's sh CTE — hash-verified in round 1).
_SHINGLES_SQL = f"""
        sh AS (
            SELECT doc_id,
                   list_distinct(list_transform(
                       range(0, greatest(len(string_split({_CANON}, ' ')) - 3, 0) + 1),
                       i -> array_to_string(
                           list_slice(string_split({_CANON}, ' '), i + 1, i + 3), ' ')
                   )) AS shingles
            FROM documents
        )
"""


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bench = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    return pl.contamination_flags(docs, bench, n=3, threshold=0.2)


def q_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pl.chunk_documents(docs, window=64, overlap=8)


def q_dataset_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-data ordering:
    shuffle_key = md5(salt || id) gives a reproducible pseudo-random
    permutation on any engine; the global position comes from the
    distributed prefix sum over ones — NOT row_number() over a global
    ORDER BY, which Spark executes on a single task.

    Changing the salt string re-deals the permutation (new epoch)
    without touching the data.
    """
    from demo_flink_spark.operators.pipeline import global_cumsum

    docs = load_table(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.concat(F.lit("shuf1:"), F.col("doc_id").cast("string"))).alias(
            "shuffle_key"
        ),
        F.lit(1).alias("one"),
    )
    return global_cumsum(
        keyed, "shuffle_key", "one", out_col="shuffle_pos"
    ).select("doc_id", "shuffle_key", "shuffle_pos")


def q_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return pl.pack_sequences(
        docs, budget=2048, token_count=F.size(_tokens(F.col("text")))
    )


def q_file_provenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-level lineage via the hidden `_metadata` file-source
    column (SURVEY §2.1 ext): every row reports which physical file it
    came from — the provenance a 100 TB corpus build needs for
    per-source auditing, retractions, and incremental reprocessing.
    Zero extra I/O: `_metadata` is scan-local, no join against a
    listing. The fixture table is one file, so the oracle pins the
    basename constant; the multi-file behavior (per-file counts over a
    repartitioned write, verified against DuckDB `filename=true`) is
    proven in tests/test_provenance.py.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(F.col("_metadata.file_name").alias("source_file"), "doc_id")
        .groupBy("source_file")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("doc_id").alias("min_doc"),
            F.max("doc_id").alias("max_doc"),
        )
    )


def q_span_corruption(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5-style span corruption (operators/pipeline.py::
    span_corruption): seeded 3-token spans, one per 20 tokens, masked
    to <Xs> sentinels; input and target sequences md5-compared — the
    oracle rebuilds both strings from the same strata/hash arithmetic,
    so span placement, sentinel numbering and token order must all
    invert exactly."""
    out = pl.span_corruption(load_table(spark, sf_dir, "documents"))
    return out.select(
        "doc_id",
        "n_tokens",
        "n_spans",
        "frac_masked",
        F.md5("input_txt").alias("input_md5"),
        F.md5("targets_txt").alias("target_md5"),
    )


def _span_corruption_oracle() -> str:
    def h(s_expr: str) -> str:
        return (
            f"(md5_number_upper('t5' || CAST(doc_id AS VARCHAR) || '_' "
            f"|| CAST({s_expr} AS VARCHAR)) % 256 % (w - 2))"
        )

    hi = h("i // w")
    hs = h("s")
    return f"""
    WITH tok AS (
        SELECT doc_id, list_filter(string_split(text, ' '),
                                   x -> x <> '') AS t
        FROM documents
    ),
    p AS (
        SELECT doc_id, t, len(t) AS n, len(t) // 20 AS ns FROM tok
    ),
    p2 AS (
        SELECT doc_id, t, n, ns,
               CASE WHEN ns > 0 THEN n // ns ELSE 0 END AS w
        FROM p
    ),
    built AS (
        SELECT doc_id, n, ns,
               CASE WHEN ns = 0 THEN array_to_string(t, ' ')
               ELSE array_to_string(list_filter(list_transform(
                   range(0, n), i ->
                   CASE WHEN i // w < ns AND i - (i // w) * w = {hi}
                        THEN '<X' || CAST(i // w AS VARCHAR) || '>'
                        WHEN i // w < ns
                             AND i - (i // w) * w > {hi}
                             AND i - (i // w) * w < {hi} + 3
                        THEN ''
                        ELSE t[i + 1] END),
                   x -> x <> ''), ' ')
               END AS input_txt,
               CASE WHEN ns = 0 THEN ''
               ELSE array_to_string(list_transform(range(0, ns), s ->
                   '<X' || CAST(s AS VARCHAR) || '> '
                   || array_to_string(list_transform(range(1, 4),
                        d -> t[CAST(s * w + {hs} + d AS BIGINT)]), ' ')), ' ')
               END AS target_txt
        FROM p2
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(ns AS BIGINT) AS n_spans,
           CASE WHEN n > 0 THEN CAST(3 * ns AS DOUBLE) / n
                ELSE 0.0 END AS frac_masked,
           md5(input_txt) AS input_md5,
           md5(target_txt) AS target_md5
    FROM built
    """


def q_fim_transform(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIM PSM permutation (operators/pipeline.py::fim_transform):
    seeded 16-bit cut points, PSM string md5-compared — the oracle
    rebuilds the permutation from the same two md5 bytes, so cut
    placement, slice boundaries, and piece order must invert
    exactly."""
    return pl.fim_transform(load_table(spark, sf_dir, "documents"))


def _fim_oracle() -> str:
    def h16(tag: str) -> str:
        x = f"md5_number_upper('fim' || CAST(doc_id AS VARCHAR) || '_{tag}')"
        # big-endian first two md5 bytes == Spark conv(substr(md5,1,4),16,10)
        return f"CAST(({x} % 256) * 256 + ({x} // 256) % 256 AS BIGINT)"

    return f"""
    WITH tok AS (
        SELECT doc_id,
               list_filter(string_split(text, ' '), x -> x <> '') AS t
        FROM documents
    ),
    cuts AS (
        SELECT doc_id, t, len(t) AS n,
               {h16('a')} % (len(t) + 1) AS c1,
               {h16('b')} % (len(t) + 1) AS c2
        FROM tok
    ),
    ps AS (
        SELECT doc_id, t, n,
               least(c1, c2) AS p, greatest(c1, c2) AS s
        FROM cuts
    )
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_tokens,
           CAST(p AS BIGINT) AS pre_len,
           CAST(s - p AS BIGINT) AS mid_len,
           CAST(n - s AS BIGINT) AS suf_len,
           -- array_to_string of an EMPTY list is NULL in DuckDB
           -- (Spark's array_join gives ''): coalesce each piece
           md5('<PRE> ' || coalesce(array_to_string(t[1:p], ' '), '')
               || ' <SUF> ' || coalesce(array_to_string(t[s+1:n], ' '), '')
               || ' <MID> ' || coalesce(array_to_string(t[p+1:s], ' '), ''))
               AS psm_md5
    FROM ps
    """


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl bookkeeping (operators/pipeline.py::
    snapshot_diff): old = docs with id % 11 != 3, new = docs with
    id % 13 != 5 and a ' rev' mutation on id % 7 == 0 — every status
    class (added/removed/changed/unchanged) is populated
    deterministically. Content compared by md5 digest, bodies never
    join."""
    docs = load_table(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 11 != 3)
    new = docs.filter(F.col("doc_id") % 13 != 5).withColumn(
        "text",
        F.when(
            F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev"))
        ).otherwise(F.col("text")),
    )
    return pl.snapshot_diff(old, new)


def q_zorder_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key for `part` over
    (p_size, retail-price-cents) — the multi-dimensional layout key
    that makes file-level min/max stats prune on BOTH columns
    (operators/layout.py::zorder_key). Exact BIGINT quantization +
    unrolled bit interleave, whole-stage codegen, value-hash oracle;
    the layout writer is repartitionByRange(zkey) + sortWithin."""
    from demo_flink_spark.operators.layout import zorder_key

    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_size",
        F.expr("CAST(round(p_retailprice * 100) AS BIGINT)").alias("cents"),
    )
    return zorder_key(part, "p_size", "cents", bits=16).select(
        "p_partkey",
        F.col("qx").alias("q_size"),
        F.col("qy").alias("q_cents"),
        "zkey",
    )


def _zorder_oracle(bits: int = 16) -> str:
    """DuckDB twin: same integer quantization + the same unrolled
    interleave expression."""
    top = (1 << bits) - 1
    terms = []
    for i in range(bits):
        terms.append(f"(((qx >> {i}) & 1) << {2 * i})")
        terms.append(f"(((qy >> {i}) & 1) << {2 * i + 1})")
    z = " | ".join(terms)
    return f"""
        WITH base AS (
            SELECT p_partkey, CAST(p_size AS BIGINT) AS x,
                   CAST(round(p_retailprice * 100) AS BIGINT) AS y
            FROM part
        ),
        s AS (
            SELECT min(x) AS minx, max(x) AS maxx,
                   min(y) AS miny, max(y) AS maxy
            FROM base
        ),
        q AS (
            SELECT p_partkey,
                   CASE WHEN maxx = minx THEN 0
                        ELSE ((x - minx) * {top}) // (maxx - minx)
                   END AS qx,
                   CASE WHEN maxy = miny THEN 0
                        ELSE ((y - miny) * {top}) // (maxy - miny)
                   END AS qy
            FROM base CROSS JOIN s
        )
        SELECT p_partkey, qx AS q_size, qy AS q_cents,
               CAST({z} AS BIGINT) AS zkey
        FROM q
    """


SPECS = [
    QuerySpec(
        "layout_zorder_part",
        q_zorder_part,
        oracle=_zorder_oracle(16),
    ),
    QuerySpec(
        "corpus_snapshot_diff",
        q_snapshot_diff,
        oracle="""
        WITH o AS (
            SELECT doc_id, text FROM documents WHERE doc_id % 11 <> 3
        ),
        n AS (
            SELECT doc_id,
                   CASE WHEN doc_id % 7 = 0 THEN text || ' rev'
                        ELSE text END AS text
            FROM documents WHERE doc_id % 13 <> 5
        )
        SELECT coalesce(o.doc_id, n.doc_id) AS doc_id,
               CASE WHEN o.doc_id IS NULL THEN 'added'
                    WHEN n.doc_id IS NULL THEN 'removed'
                    WHEN md5(o.text) = md5(n.text) THEN 'unchanged'
                    ELSE 'changed' END AS status
        FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id
        """,
    ),
    QuerySpec(
        "source_file_provenance",
        q_file_provenance,
        oracle="""
        SELECT 'documents.parquet' AS source_file, count(*) AS n_rows,
               min(doc_id) AS min_doc, max(doc_id) AS max_doc
        FROM documents
        """,
    ),
    QuerySpec(
        "contamination_bench_overlap",
        q_contamination,
        oracle=f"""
        WITH {_SHINGLES_SQL},
        bench AS (
            SELECT DISTINCT unnest(shingles) AS shingle FROM sh
            WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
        ),
        posting AS (SELECT doc_id, unnest(shingles) AS shingle FROM sh),
        hits AS (
            SELECT doc_id, count(*) AS n_contaminated
            FROM posting
            WHERE shingle IN (SELECT shingle FROM bench)
            GROUP BY doc_id
        )
        SELECT s.doc_id,
               CAST(len(s.shingles) AS BIGINT) AS n_shingles,
               CAST(coalesce(h.n_contaminated, 0) AS BIGINT) AS n_contaminated,
               round(coalesce(h.n_contaminated, 0)
                     / CAST(greatest(len(s.shingles), 1) AS DOUBLE), 6)
                   AS contamination_rate,
               coalesce(h.n_contaminated, 0)
                   / CAST(greatest(len(s.shingles), 1) AS DOUBLE) >= 0.2
                   AS is_contaminated
        FROM sh s LEFT JOIN hits h USING (doc_id)
        """,
    ),
    QuerySpec(
        "doc_chunking_overlap",
        q_chunking,
        # window=64, overlap=8 -> stride=56; chunk count for a doc of
        # L tokens is ceil(max(L-64,0)/56)+1 (0 chunks when L=0) —
        # the closed form of the operator's emit-until-covered loop.
        oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(text, '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        ),
        chunks AS (
            SELECT doc_id, toks,
                   unnest(range(0,
                       CAST(ceil(greatest(len(toks) - 64, 0) / 56.0) AS BIGINT)
                       + 1)) AS ci
            FROM tok
            WHERE len(toks) > 0
        )
        SELECT doc_id,
               CAST(ci AS BIGINT) AS chunk_idx,
               array_to_string(list_slice(toks, ci * 56 + 1, ci * 56 + 64), ' ')
                   AS chunk_text,
               CAST(len(list_slice(toks, ci * 56 + 1, ci * 56 + 64)) AS BIGINT)
                   AS n_chunk_tokens
        FROM chunks
        """,
    ),
    QuerySpec(
        "dataset_shuffle_positions",
        q_dataset_shuffle,
        oracle="""
        SELECT doc_id,
               md5('shuf1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
               CAST(row_number() OVER (
                   ORDER BY md5('shuf1:' || CAST(doc_id AS VARCHAR))
               ) AS BIGINT) AS shuffle_pos
        FROM documents
        """,
    ),
    QuerySpec(
        "sequence_packing",
        q_sequence_packing,
        oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   CAST(len(list_filter(string_split_regex(text, '\s+'),
                                        w -> length(w) > 0)) AS BIGINT) AS n_tokens
            FROM documents
        ),
        cum AS (
            SELECT doc_id, n_tokens,
                   CAST(sum(n_tokens) OVER (
                       ORDER BY doc_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
                       AS cum_tokens
            FROM tok
        )
        SELECT doc_id, n_tokens, cum_tokens,
               CAST(floor((cum_tokens - n_tokens) / 2048.0) AS BIGINT) AS bin_id
        FROM cum
        """,
    ),
    QuerySpec(
        "span_corruption_t5", q_span_corruption,
        oracle=_span_corruption_oracle(),
    ),
    QuerySpec("fim_transform_psm", q_fim_transform, oracle=_fim_oracle()),
]
