"""Declared queries: multimodal column plumbing (north-star extension).

The decode internals are stubbed (no media libs in the container) but
deterministic, so the metadata-derived half of the decode output gets
a full DuckDB oracle; the byte-level stats (mean_luma, frame split)
are Python-side → rows-only checks + pytest goldens.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

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


SPECS = [
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
