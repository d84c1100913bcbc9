"""Multimodal columns: images/audio/video as opaque binary + typed
metadata (north-star extension).

The container has no image/audio libraries, so the DECODE step is
stubbed (clearly marked) behind an import-try with a deterministic
fake decoder — but every piece of Spark plumbing is real and tested:

- **Schema**: media is `binary` payload + a typed metadata struct
  (mime, width, height, duration_ms). Binary stays opaque to Catalyst;
  metadata columns are prunable/filterable like any other — filter on
  `media.meta.mime` never touches payload bytes.
- **Partitioning**: decode is CPU-bound and payload sizes are skewed,
  so `decoded_*` repartitions by a payload-hash before the UDF —
  even work distribution at 1000 executors, no hot partition from
  ingest order.
- **Batch shape**: `mapInPandas` streams Arrow batches (bounded by
  spark.sql.execution.arrow.maxRecordsPerBatch) — memory stays flat no
  matter the partition size, unlike applyInPandas-per-group which
  materializes whole groups.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

try:  # decode libs are optional; the container ships neither
    from PIL import Image  # noqa: F401

    HAS_PIL = True
except ImportError:
    HAS_PIL = False

MEDIA_META = StructType(
    [
        StructField("mime", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

DECODED_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("mime", StringType()),
        StructField("n_bytes", LongType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("mean_luma", DoubleType()),
    ]
)


def attach_fake_media(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Synthesize a deterministic binary payload + metadata per doc.

    Stands in for a real ingest (s3 object bytes / parquet binary
    column); payload = UTF-8 of the text, metadata derived from
    doc_id — deterministic so tests and oracle runs are stable.
    """
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").cast(BinaryType()).alias("payload"),
        F.struct(
            F.when(F.col("doc_id") % 3 == 0, F.lit("image/png"))
            .when(F.col("doc_id") % 3 == 1, F.lit("audio/wav"))
            .otherwise(F.lit("video/mp4"))
            .alias("mime"),
            (F.col("doc_id") % 640 + 32).cast("int").alias("width"),
            (F.col("doc_id") % 480 + 32).cast("int").alias("height"),
            (F.col("doc_id") * 40 + 1000).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> float:
    """STUB decode: deterministic 'mean luma' from payload bytes.

    A real deployment replaces this with PIL/libav decoding; the
    surrounding plumbing (schema, batching, partitioning) is identical.
    """
    if not payload:
        return 0.0
    return sum(payload[:1024]) / min(len(payload), 1024) / 255.0


def _pil_decode(payload: bytes) -> tuple[int, int, float]:
    """Real image decode: (width, height, mean_luma) via PIL.

    Only called when PIL imported successfully AND the mime is
    image/*. Raises on undecodable bytes — callers fall back to the
    deterministic stub so a corrupt object never kills the batch.
    """
    from io import BytesIO

    from PIL import Image

    with Image.open(BytesIO(payload)) as im:
        gray = im.convert("L")
        w, h = gray.size
        hist = gray.histogram()
        total = sum(hist)
        luma = (
            sum(i * c for i, c in enumerate(hist)) / (total * 255.0)
            if total
            else 0.0
        )
        return w, h, luma


def _decode_one(payload: bytes, meta: dict) -> tuple[int, int, float]:
    """Per-object decode: real PIL path for images when available,
    deterministic stub (metadata dims + byte-sum luma) otherwise.

    Module-level so tests can monkeypatch `_pil_decode` and exercise
    the real branch without image libraries in the container.
    """
    if HAS_PIL and (meta["mime"] or "").startswith("image/"):
        try:
            return _pil_decode(payload)
        except Exception:
            pass  # corrupt/unsupported bytes → stub fallback
    return meta["width"], meta["height"], _fake_decode(payload)


def decoded_media_stats(media: DataFrame) -> DataFrame:
    """Decode payloads → per-media stats via Arrow-batched mapInPandas.

    Repartitions on payload hash first: decode cost follows payload
    bytes, and ingest order usually clusters large payloads — the
    hash spread keeps 1000 executors evenly busy.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [
                _decode_one(p, m) for p, m in zip(pdf["payload"], pdf["meta"])
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": [m["mime"] for m in pdf["meta"]],
                    "n_bytes": pdf["payload"].map(len),
                    "width": pd.array([d[0] for d in decoded], dtype="int32"),
                    "height": pd.array([d[1] for d in decoded], dtype="int32"),
                    "mean_luma": [d[2] for d in decoded],
                }
            )

    return media.repartition(F.xxhash64("payload")).mapInPandas(
        decode, DECODED_SCHEMA
    )


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", IntegerType()),
        StructField("frame_bytes", LongType()),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4) -> DataFrame:
    """STUB frame sampler: split payload into n 'frames' (1 → N rows).

    Real video sampling would seek keyframes; the Spark shape — a
    generator per input row, bounded output — is what matters: at
    scale this is `mapInPandas` yielding multiple rows per input, so
    frame explosion never materializes per-group."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                size = max(len(payload) // n_frames, 1)
                for i in range(min(n_frames, len(payload))):
                    chunk = payload[i * size : (i + 1) * size]
                    if chunk:
                        rows.append((int(doc_id), i, len(chunk)))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_bytes"]
            ).astype({"frame_idx": "int32"})

    return media.select("doc_id", "payload").mapInPandas(sample, FRAME_SCHEMA)


def resize_media(
    media: DataFrame, max_side: int = 128
) -> DataFrame:
    """Resize stage of an image/video preprocessing pipeline: compute
    fit-within-`max_side` target dimensions (aspect preserved) and a
    proportionally-downsampled payload.

    Target dims are EXACT integer arithmetic (scale = max_side /
    longest side, floor, min 1) — no float in the contract. The pixel
    resample itself is the stub (real deployments put PIL's
    `Image.resize` inside the same Arrow batch; the container ships no
    media libs): the stub keeps every `stride`-th byte with ``stride =
    ceil(in_pixels / out_pixels)`` — deterministic, size-proportional,
    and byte-content-dependent so the oracle must reproduce the actual
    sampling, not just the lengths.

    Same scale shape as `decoded_media_stats`: payload-hash
    repartition (decode/resize cost follows payload size, not row
    count), one Arrow-batched mapInPandas, metadata carried through.
    """
    n_part = media.sparkSession.conf.get("spark.sql.shuffle.partitions")

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, payload, meta in zip(
                pdf["doc_id"], pdf["payload"], pdf["meta"]
            ):
                w, h = int(meta["width"]), int(meta["height"])
                longest = max(w, h)
                if longest <= max_side:
                    tw, th = w, h
                else:
                    tw = max(w * max_side // longest, 1)
                    th = max(h * max_side // longest, 1)
                in_px, out_px = w * h, tw * th
                stride = -(-in_px // out_px)  # ceil
                body = bytes(payload)[::stride] if stride > 1 else bytes(payload)
                rows.append((int(doc_id), w, h, tw, th, len(body), body))
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height",
                    "target_w", "target_h", "out_bytes", "resized",
                ],
            )

    return (
        media.repartition(int(n_part), F.xxhash64("payload"))
        .mapInPandas(
            resize,
            "doc_id long, width int, height int, target_w int, "
            "target_h int, out_bytes long, resized binary",
        )
    )


def byte_entropy(media: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Shannon entropy of the BYTE distribution of each binary payload
    — the content-randomness probe that needs no decoder: already-
    compressed/encrypted media sits near 8 bits/byte (5.545 nats),
    text/bitmap payloads sit far lower. The standard cheap filter for
    "don't re-compress / don't try to parse this" routing in an ingest
    pipeline, and the binary twin of `textstats.token_entropy`.

    Engine-exact by the token_entropy recipe: byte symbols are hex
    pairs of `hex(payload)` (pure JVM, no UDF); each ln(c/n) is the
    portable softln series rounded to 6dp; c·round6 products are exact
    doubles summed in decimal(38,6); the final 6dp division is
    round-half-away integer arithmetic. `max_byte_share_micros` and
    `looks_compressed` (H > 5.0 nats) derive from the same integers.

    Scale: ZERO exchanges — the histogram is higher-order array
    expressions per row, O(d·n) with d ≤ 256 distinct bytes. For
    multi-MB payloads switch to the explode+groupBy form (the oracle's
    plan); same values.
    """
    from demo_flink_spark.operators.relational import softln_ratio

    base = media.select(
        "doc_id", F.hex(F.col(payload_col)).alias("h")
    )
    pairs = F.expr(
        "CASE WHEN h IS NULL OR length(h) < 2 THEN array('') "
        "ELSE transform(sequence(1, length(h) div 2), "
        "i -> substring(h, (i-1)*2+1, 2)) END"
    )
    # sentinel array('') for empty payloads keeps types uniform; n=0
    # routes them to the zero row before any term math matters
    step = base.select(
        "doc_id",
        F.when(
            F.col("h").isNull() | (F.length("h") < 2), F.lit(0)
        )
        .otherwise(F.length("h") / 2)
        .cast("long")
        .alias("n"),
        pairs.alias("t"),
    )
    t = F.col("t")
    step2 = step.select(
        "doc_id", "n", "t", F.array_distinct(t).alias("d")
    )
    counts = F.transform(
        F.col("d"),
        lambda x: F.size(F.filter(F.col("t"), lambda y: y == x)),
    )
    nn = F.col("n")
    terms = F.transform(
        counts,
        lambda c: c.cast("double") * F.round(softln_ratio(c, nn), 6),
    )
    ent_sum = F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, x: acc + x.cast("decimal(38,6)"),
    )
    step3 = step2.select(
        "doc_id",
        nn.alias("n_bytes"),
        F.when(nn == 0, F.lit(0))
        .otherwise(F.size("d"))
        .cast("long")
        .alias("n_distinct_bytes"),
        F.when(nn == 0, F.lit(0))
        .otherwise(F.array_max(counts))
        .cast("long")
        .alias("_maxc"),
        F.when(nn == 0, F.lit(0).cast("decimal(38,6)"))
        .otherwise(ent_sum)
        .alias("_s"),
    )
    ent_micros = F.expr(
        "(abs(CAST(_s * 1000000 AS DECIMAL(38,0))) * 2"
        " + CAST(n_bytes AS DECIMAL(38,0)))"
        " div (2 * CAST(n_bytes AS DECIMAL(38,0)))"
    )
    return step3.select(
        "doc_id",
        "n_bytes",
        "n_distinct_bytes",
        F.when(F.col("n_bytes") == 0, F.lit(0))
        .otherwise(
            F.expr("(_maxc * 1000000) div n_bytes")
        )
        .cast("long")
        .alias("max_byte_share_micros"),
        F.when(F.col("n_bytes") == 0, F.lit(0.0))
        .otherwise(ent_micros.cast("double") / 1_000_000.0)
        .alias("entropy_nats"),
        F.when(F.col("n_bytes") == 0, F.lit(False))
        .otherwise(ent_micros > 5_000_000)
        .alias("looks_compressed"),
    )
