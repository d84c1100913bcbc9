"""Streaming twin of `operators.heavyhitters.topk_frequent_exact`'s
candidate pass: a continuously-maintained Misra-Gries heavy-hitter
summary per hash bucket.

Why this shape: the batch operator runs one MG summary per PARTITION
and unions survivors; a stream has no bounded partitions, so the
streaming form keys the state by `bucket = md5(value) mod B` — every
occurrence of a value lands in the same bucket, so each bucket's
summary sees its values' FULL stream and the classic MG guarantee
holds per bucket with that bucket's own row count n_b:

    true_count − n_b/(m+1)  ≤  estimate  ≤  true_count,
    and every value with true_count > n_b/(m+1) is PRESENT.

State per bucket is O(m) forever (m counters + the bucket row count) —
bounded by the accuracy target, not the stream — and the summary
update is the same vectorized mergeable-summaries step as the batch
kernel (exact value_counts merged, then the (m+1)-th weight subtracted
from all, positives kept), so batch and stream implement ONE
algorithm. Every micro-batch emits the bucket's current candidate set
with a fresh `seq`; the converged answer is each bucket's highest-seq
emission, and a downstream exact recount (the batch verify pass) turns
candidates into exact top-k whenever needed.

Delivery assumption: exactly-once input (file/Kafka source under a
checkpoint) — MG merges counts, so a replayed batch would double-count
(the kept-prefix kernels in `budget_stream` can dedup by id; counts
cannot, which is inherent to sketches over multisets).

Reference lineage: the reference keeps per-key running aggregates in
keyed state (`UserClickCounter.java:39-61`); this extends the same
state discipline to a bounded-memory SUMMARY of an unbounded key
space — the Flink-at-scale pattern for "top items right now".
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = "bucket int, value string, est long, n_seen long, seq long"
STATE_SCHEMA = "words array<string>, wts array<long>, n_seen long, seq long"


def bucket_of(value: str, n_buckets: int) -> int:
    """Stable value→bucket hash (md5 first 8 bytes, little-endian mod
    B — the engine's portable-hash convention)."""
    return int.from_bytes(
        hashlib.md5(value.encode()).digest()[:8], "little"
    ) % n_buckets


def misra_gries_op(m: int = 8) -> StatefulOp:
    """Keyed stateful op: key = (bucket,), rows carry `value`."""

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (bucket,) = key
        arrivals = pd.Series(dtype="int64")
        n_new = 0
        for pdf in pdfs:
            vc = pdf["value"].dropna().value_counts()
            n_new += int(vc.sum())
            arrivals = arrivals.add(vc, fill_value=0).astype("int64")
        if n_new == 0:
            return
        if state.exists:
            words, wts, n_seen, seq = state.get
            acc = pd.Series(list(wts), index=list(words), dtype="int64")
        else:
            acc, n_seen, seq = pd.Series(dtype="int64"), 0, 0
        seq += 1
        n_seen += n_new
        # the batch kernel's vectorized MG step: merge exact counts,
        # then decrement-all by the (m+1)-th largest and keep positives
        acc = acc.add(arrivals, fill_value=0).astype("int64")
        if len(acc) > m:
            thresh = int(acc.nlargest(m + 1).iloc[-1])
            acc = acc[acc > thresh] - thresh
        # deterministic emission/state order: weight desc, value asc
        acc = acc.sort_index().sort_values(ascending=False, kind="stable")
        if len(acc) == 0:
            # the decrement step CAN legitimately empty the summary
            # (every weight tied at/below the (m+1)-th — nothing in
            # the bucket is frequent). Emit a value=NULL sentinel so
            # downstream sees the new seq and knows every previous
            # candidate was retracted; silence would leave stale
            # candidates as the bucket's latest emission.
            yield pd.DataFrame(
                {
                    "bucket": [bucket],
                    "value": [None],
                    "est": [None],
                    "n_seen": [n_seen],
                    "seq": [seq],
                }
            )
        else:
            yield pd.DataFrame(
                {
                    "bucket": bucket,
                    "value": acc.index.astype(object),
                    "est": acc.to_numpy(dtype="int64"),
                    "n_seen": n_seen,
                    "seq": seq,
                }
            )
        state.update(
            (
                [str(v) for v in acc.index],
                [int(x) for x in acc.to_numpy()],
                int(n_seen),
                int(seq),
            )
        )

    return StatefulOp(
        name="misra_gries",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
