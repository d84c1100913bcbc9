"""Streaming curation gate with a rejected-document side output.

The reference's one side-output pattern is late data
(`EventTimeWordCountDebug.java:96-108` → `streaming/late_data.py`);
a corpus-ingest pipeline needs the same split for QUALITY: documents
flow in continuously, the passing stream feeds training-data storage,
and the failing stream lands in a quarantine sink WITH the reasons —
auditable, reprocessable, never silently dropped.

Implementation: `foreachBatch` over any streaming (doc_id, text [,...])
source. Each micro-batch runs the BATCH quality operator
(`textstats.gopher_quality_filter` — identical rules, zero-exchange
narrow map), so the batch and streaming paths can never diverge: one
rule implementation, two execution modes (the same twin discipline as
`operators/stateful_batch.py`). Rejected rows carry a comma-joined
list of the rules they failed.

Scale: the per-batch work is the narrow quality projection plus one
batch-local broadcast join back to the payload — no state store, no
shuffle keyed by anything; both sinks append partitioned-by-epoch
parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from demo_flink_spark.operators.textstats import gopher_quality_filter

# (flag column, reason tag) — order fixes the reason string
_RULES = (
    ("ok_word_count", "word_count"),
    ("ok_mean_len", "mean_word_len"),
    ("ok_symbol", "symbol_ratio"),
    ("ok_alpha", "alpha_fraction"),
    ("ok_stop", "stopwords"),
)


def curation_gate(
    incoming: DataFrame,
    kept_dir: str,
    rejected_dir: str,
    *,
    min_words: int = 20,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming quality gate over `incoming` (a streaming
    DataFrame with at least doc_id + text). Kept rows append to
    `kept_dir` (payload + epoch); rejected rows append to
    `rejected_dir` as (doc_id, reasons, n_words, epoch_id)."""

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        q = gopher_quality_filter(batch_df, min_words=min_words)
        flagged = batch_df.join(F.broadcast(q), "doc_id")
        kept = flagged.filter(F.col("keep")).select(
            *batch_df.columns, F.lit(epoch_id).alias("epoch_id")
        )
        reasons = F.concat_ws(
            ",",
            *[
                F.when(~F.col(flag), F.lit(tag))
                for flag, tag in _RULES
            ],
        )
        rejected = flagged.filter(~F.col("keep")).select(
            "doc_id",
            reasons.alias("reasons"),
            "n_words",
            F.lit(epoch_id).alias("epoch_id"),
        )
        # exactly-once per epoch: dynamic partition overwrite replaces
        # ONLY the epoch partitions present in this batch, so a
        # foreachBatch replay after failure rewrites its epoch instead
        # of appending duplicates (plain append is NOT idempotent)
        for df_out, path in ((kept, kept_dir), (rejected, rejected_dir)):
            (
                df_out.write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("epoch_id")
                .parquet(path)
            )

    writer = incoming.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
