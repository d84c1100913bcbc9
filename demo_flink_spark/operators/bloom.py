"""Bloom-filter incremental dedup: prune a new batch against a seen
corpus WITHOUT joining the full history.

The 100 TB motivation: snapshot-over-snapshot dedup (CommonCrawl-style
re-crawls) cannot afford `incoming ANTI JOIN history` — that shuffles
the whole history every increment. The bloom path is:

1. build per-partition partial blooms over the history key (one
   narrow mapInPandas pass, each partition emits its n_bits/8-byte
   bit array once),
2. OR the partials on the driver (KB-MB × partitions — the only
   driver touch, independent of row count) and ship the merged bloom
   back in task closures,
3. membership-test the incoming batch map-side: definite-new rows
   (bloom says absent — NO false negatives) pass through with zero
   shuffle; only the might-seen sliver (true dups + fpp of the new
   rows) pays an exact anti-join for verification.

So the expensive join runs over ~|dups| + fpp·|new| rows instead of
|history|. The final result is EXACT (bloom only routes; the
verification join removes false positives) — which is why the declared
query is fully oracle-checkable.

The bloom itself is engine-portable on purpose: Kirsch-Mitzenmacher
double hashing over the two 64-bit halves of md5 — deterministic
across workers, Python versions, and partitionings (Spark's JVM
`DataFrame.stat.bloomFilter` object cannot be evaluated inside Python
workers; Catalyst's runtime bloom join is a planner optimization, not
an API).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _hash2(values: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit hashes per value (md5 halves)."""
    h1 = np.empty(len(values), dtype=np.uint64)
    h2 = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.md5(str(v).encode("utf-8", "surrogatepass")).digest()
        h1[i] = int.from_bytes(d[:8], "little")
        h2[i] = int.from_bytes(d[8:], "little") | 1  # odd: full-period step
    return h1, h2


def _indices(h1: np.ndarray, h2: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing."""
    ks = np.arange(k, dtype=np.uint64)
    return (h1[:, None] + ks[None, :] * h2[:, None]) % np.uint64(n_bits)


def build_bloom(
    df: DataFrame, col: str, n_bits: int = 1 << 23, k: int = 5
) -> bytes:
    """Merged bloom bit array over `df[col]` (distributed build,
    driver OR-merge of one partial per partition)."""

    def partial(batches):
        bits = np.zeros(n_bits // 8, dtype=np.uint8)
        for pdf in batches:
            idx = _indices(*_hash2(pdf[col]), k, n_bits).reshape(-1)
            np.bitwise_or.at(
                bits, (idx >> 3).astype(np.int64),
                (np.uint8(1) << (idx & 7).astype(np.uint8)),
            )
        yield pd.DataFrame({"bits": [bits.tobytes()]})

    parts = df.select(col).mapInPandas(partial, "bits binary").collect()
    merged = np.zeros(n_bits // 8, dtype=np.uint8)
    for row in parts:
        merged |= np.frombuffer(row.bits, dtype=np.uint8)
    return merged.tobytes()


def flag_might_seen(
    df: DataFrame, bloom: bytes, col: str, n_bits: int = 1 << 23, k: int = 5
) -> DataFrame:
    """`df` + boolean `might_seen` (true ⇒ maybe in the bloomed set;
    false ⇒ DEFINITELY not). Map-side only — no shuffle."""
    bits = np.frombuffer(bloom, dtype=np.uint8)
    # Build a FRESH StructType: `df.schema` is cached on the DataFrame and
    # `StructType.add` mutates in place, so extending it directly would give
    # the *input* plan a phantom `might_seen` column (UNRESOLVED_COLUMN).
    from pyspark.sql.types import BooleanType, StructField, StructType

    schema = StructType(
        list(df.schema.fields) + [StructField("might_seen", BooleanType())]
    )

    def test(batches):
        for pdf in batches:
            if len(pdf) == 0:
                continue
            idx = _indices(*_hash2(pdf[col]), k, n_bits)
            hit = (bits[(idx >> 3).astype(np.int64)]
                   >> (idx & 7).astype(np.uint8)) & 1
            pdf = pdf.copy()
            pdf["might_seen"] = hit.all(axis=1).astype(bool)
            yield pdf

    return df.mapInPandas(test, schema)


def incremental_new(
    incoming: DataFrame,
    history: DataFrame,
    col: str,
    n_bits: int = 1 << 23,
    k: int = 5,
    bloom: bytes | None = None,
) -> DataFrame:
    """Exactly the rows of `incoming` whose `col` value never appears
    in `history`, at bloom-prune cost (see module docstring).

    NOTE: unless a prebuilt `bloom` is passed, this EAGERLY runs the
    distributed bloom build over `history` (a `.collect()` of one
    KB-sized partial per partition) at plan-construction time — callers
    timing the returned DataFrame should build the bloom once and pass
    it in, or account for the build job.
    """
    if bloom is None:
        bloom = build_bloom(history, col, n_bits, k)
    flagged = flag_might_seen(incoming, bloom, col, n_bits, k)
    definite_new = flagged.filter(~F.col("might_seen")).drop("might_seen")
    candidates = flagged.filter(F.col("might_seen")).drop("might_seen")
    verified_new = candidates.join(
        history.select(F.col(col)).distinct(), col, "left_anti"
    )
    return definite_new.unionByName(verified_new)
