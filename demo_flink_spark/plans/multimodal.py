"""Declared queries: multimodal column plumbing (north-star extension).

The decode internals are stubbed (no media libs in the container) but
deterministic, so EVERY query here carries a full DuckDB value-hash
oracle: the byte-level stats (mean_luma, frame split, resize stride
sampling) are reproducible as ascii()/substring arithmetic over the
synthesized ASCII payloads; pytest goldens additionally exercise the
real-PIL branch via monkeypatching.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import multimodal as mm
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def _media(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.attach_fake_media(load_table(spark, sf_dir, "documents"))


def q_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata projection of the decoded media: (doc_id, mime,
    n_bytes, width, height) — the prunable-columns half of the
    multimodal contract (scans that only need metadata never touch
    payload bytes)."""
    return mm.decoded_media_stats(_media(spark, sf_dir)).select(
        "doc_id", "mime", "n_bytes", "width", "height"
    )


def q_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full decode pass: payload bytes through the Arrow-batched
    decode UDF into per-media content statistics (byte-sum luma over
    the deterministic stub decoder) alongside the metadata."""
    return mm.decoded_media_stats(_media(spark, sf_dir))


def q_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    return mm.frame_sample(_media(spark, sf_dir), n_frames=4)


def q_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize stage (operators/multimodal.py::resize_media): exact
    integer fit-within-128 target dims + the stride-sampled stub
    payload, compared by md5 — the oracle must reproduce the actual
    byte sampling, not just the dimension arithmetic."""
    out = mm.resize_media(_media(spark, sf_dir), max_side=128)
    return out.select(
        "doc_id",
        "width",
        "height",
        "target_w",
        "target_h",
        "out_bytes",
        F.md5("resized").alias("resized_md5"),
    )


_RESIZE_ORACLE = """
WITH dims AS (
    SELECT doc_id, text,
           CAST(doc_id % 640 + 32 AS BIGINT) AS w,
           CAST(doc_id % 480 + 32 AS BIGINT) AS h
    FROM documents
),
t AS (
    SELECT doc_id, text, w, h,
           CASE WHEN greatest(w, h) <= 128 THEN w
                ELSE greatest(w * 128 // greatest(w, h), 1) END AS tw,
           CASE WHEN greatest(w, h) <= 128 THEN h
                ELSE greatest(h * 128 // greatest(w, h), 1) END AS th
    FROM dims
),
s AS (
    SELECT doc_id, text, w, h, tw, th,
           (w * h + tw * th - 1) // (tw * th) AS stride
    FROM t
),
r AS (
    SELECT doc_id, w, h, tw, th,
           CASE WHEN stride > 1
                THEN array_to_string(list_transform(
                     range(1, length(text) + 1, CAST(stride AS BIGINT)),
                     i -> substring(text, CAST(i AS INT), 1)), '')
                ELSE text END AS body
    FROM s
)
SELECT doc_id,
       CAST(w AS INTEGER) AS width,
       CAST(h AS INTEGER) AS height,
       CAST(tw AS INTEGER) AS target_w,
       CAST(th AS INTEGER) AS target_h,
       CAST(length(body) AS BIGINT) AS out_bytes,
       md5(body) AS resized_md5
FROM r
"""


def q_byte_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-distribution entropy of each payload
    (operators/multimodal.py::byte_entropy): the no-decoder
    content-randomness filter (compressed/encrypted detection),
    engine-exact via the token_entropy softln recipe."""
    return mm.byte_entropy(_media(spark, sf_dir))


def _byte_entropy_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql

    softln = softln_ratio_sql("c", "n")
    # Byte symbols via hex pairs of the UTF-8 encoding — the EXACT
    # symbol alphabet the operator uses (hex(payload) pairs), so the
    # oracle is byte-correct for ANY content, not just pure-ASCII
    # corpora (where char == byte happened to hold). hex() emits pure
    # ASCII, so character substring over it is byte-safe.
    return f"""
WITH hx AS (
    SELECT doc_id, hex(encode(text)) AS h
    FROM documents WHERE text IS NOT NULL
),
ch AS (
    SELECT doc_id,
           substring(h, CAST((i - 1) * 2 + 1 AS INT), 2) AS ch
    FROM hx, LATERAL unnest(range(1,
         CAST(length(h) // 2 AS BIGINT) + 1)) AS u(i)
),
cnt AS (
    SELECT doc_id, ch, CAST(count(*) AS BIGINT) AS c
    FROM ch GROUP BY doc_id, ch
),
tot AS (
    SELECT doc_id, CAST(coalesce(strlen(text), 0) AS BIGINT) AS n
    FROM documents
),
terms AS (
    SELECT cnt.doc_id, tot.n, cnt.c,
           CAST(CAST(cnt.c AS DOUBLE) * round({softln}, 6)
                AS DECIMAL(38,6)) AS term
    FROM cnt JOIN tot USING (doc_id)
),
agg AS (
    SELECT doc_id, any_value(n) AS n,
           CAST(count(*) AS BIGINT) AS d,
           max(c) AS maxc,
           sum(term) AS s
    FROM terms GROUP BY doc_id
),
mic AS (
    SELECT doc_id, n, d, maxc,
           (abs(CAST(s * 1000000 AS HUGEINT)) * 2 + n) // (2 * n)
               AS ent_micros
    FROM agg WHERE n > 0
)
SELECT t.doc_id,
       t.n AS n_bytes,
       CAST(coalesce(m.d, 0) AS BIGINT) AS n_distinct_bytes,
       CAST(coalesce((m.maxc * 1000000) // m.n, 0) AS BIGINT)
           AS max_byte_share_micros,
       coalesce(CAST(m.ent_micros AS DOUBLE) / 1000000.0, 0.0)
           AS entropy_nats,
       coalesce(m.ent_micros > 5000000, FALSE) AS looks_compressed
FROM tot t LEFT JOIN mic m USING (doc_id)
"""


SPECS = [
    QuerySpec("multimodal_resize", q_resize, oracle=_RESIZE_ORACLE),
    QuerySpec(
        "media_byte_entropy", q_byte_entropy, oracle=_byte_entropy_oracle()
    ),
    QuerySpec(
        "multimodal_decode_meta",
        q_decode_meta,
        oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               octet_length(encode(text)) AS n_bytes,
               CAST(doc_id % 640 + 32 AS INTEGER) AS width,
               CAST(doc_id % 480 + 32 AS INTEGER) AS height
        FROM documents
        """,
    ),
    # oracle mirrors the deterministic STUB decode (payload = UTF-8
    # text bytes; luma = byte-sum of the first 1KiB / 255): the corpus
    # is ASCII so ascii(char) == byte value. A deployment with real
    # media libs swaps the decode AND drops this oracle (the plumbing
    # tests keep covering the Spark side).
    QuerySpec(
        "multimodal_decode_stats",
        q_decode_stats,
        oracle="""
        SELECT doc_id,
               CASE WHEN doc_id % 3 = 0 THEN 'image/png'
                    WHEN doc_id % 3 = 1 THEN 'audio/wav'
                    ELSE 'video/mp4' END AS mime,
               CAST(length(text) AS BIGINT) AS n_bytes,
               CAST(doc_id % 640 + 32 AS INTEGER) AS width,
               CAST(doc_id % 480 + 32 AS INTEGER) AS height,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE list_aggregate(list_transform(
                             range(1, least(length(text), 1024) + 1),
                             i -> ascii(text[i])), 'sum')
                         / least(length(text), 1024) / 255.0
               END AS mean_luma
        FROM documents
        """,
    ),
    # the stub frame split is pure arithmetic over the payload length
    # (payload = UTF-8 text bytes), so the whole 1->N generator path is
    # oracle-checkable even with the decode stubbed
    QuerySpec(
        "multimodal_frame_sample",
        q_frame_sample,
        oracle="""
        WITH m AS (
            SELECT doc_id, octet_length(encode(text)) AS len FROM documents
        ),
        f AS (
            SELECT doc_id, len, greatest(len // 4, 1) AS sz,
                   unnest(generate_series(0, least(4, len) - 1)) AS frame_idx
            FROM m WHERE len > 0
        )
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(least((frame_idx + 1) * sz, len) - frame_idx * sz
                    AS BIGINT) AS frame_bytes
        FROM f
        WHERE least((frame_idx + 1) * sz, len) - frame_idx * sz > 0
        """,
    ),
]
