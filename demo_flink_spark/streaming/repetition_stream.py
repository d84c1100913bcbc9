"""Streaming twin of `repetition_removal` — continuous intra-document
repetition cutting on an ingest stream.

The batch operator (`operators/textstats.py::remove_repeated_ngrams`,
registry query `repetition_removal`) is a ZERO-EXCHANGE narrow map:
every row is cleaned against its own token array, no corpus-wide
state. That makes its streaming form the simplest kind Structured
Streaming supports — the SAME operator applied to a streaming
DataFrame (stateless projections are streaming-valid as-is), appended
to a parquet sink. One rule implementation, two execution modes: the
twin discipline of `operators/stateful_batch.py` and
`streaming/curation_stream.py`, with parity guaranteed by
construction because there is exactly one expression tree.

Completes the batch/streaming symmetry of the curation family
(quality gate, dedup, heavy hitters, budget, drift … and now the
Gopher repetition cut): a corpus-ingest pipeline can run the
repetition cut in-flight instead of as a post-hoc sweep.

Scale: per-row array expressions only — no state store, no shuffle,
no watermark needed (nothing is keyed or windowed); throughput is
bounded by codegen'd CPU per document, identical to the batch plan.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from demo_flink_spark.operators.textstats import remove_repeated_ngrams


def repetition_removal_stream(
    incoming: DataFrame,
    out_dir: str,
    *,
    n: int = 5,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming repetition cut over `incoming` (a streaming
    DataFrame with doc_id + text). Cleaned rows — (doc_id, n_tokens,
    n_removed, cleaned_text), the batch operator's exact schema —
    append to `out_dir` as parquet.

    The default checkpoint lives at `<out_dir>/_checkpoint`: STABLE
    across restarts, so a stopped/crashed stream resumes from its
    offset log instead of reprocessing the source and appending
    duplicates (a fresh random dir per call would silently forfeit
    the sink's exactly-once contract). Underscore-prefixed paths are
    invisible to Spark's file readers, so the sink directory stays
    directly readable. Pass `checkpoint_dir` to place it elsewhere
    (e.g. a different filesystem than the sink at scale)."""
    cleaned = remove_repeated_ngrams(incoming, n=n)
    return (
        cleaned.writeStream.format("parquet")
        .outputMode("append")
        .option("path", out_dir)
        .option(
            "checkpointLocation",
            checkpoint_dir or os.path.join(out_dir, "_checkpoint"),
        )
        .start()
    )
