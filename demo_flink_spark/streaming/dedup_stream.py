"""Continuous-ingestion near-dup dedup: a stream of documents checked
against — and folded into — a persistent MinHash-LSH band index.

This is the streaming composition of the batch dedup family
(operators/dedup.py): `minhash_signatures` banding turns near-dup
search into an equi-join on (band_idx, band_hash), and the parquet
band index plays the role the bloom snapshot plays for exact dedup
(operators/bloom.py) — new data is compared against everything seen
so far without ever re-scanning the corpus.

Per micro-batch (foreachBatch — the batch DataFrame API applied
incrementally):

1. signature + band hashes for the batch's documents (one narrow
   Arrow pass, no shuffle);
2. candidate pairs via the (band_idx, band_hash) equi-join against
   the index — sub-quadratic, identical recall trade to the batch
   `minhash_lsh_pairs`;
3. exact-Jaccard verification on the shingle sets (JVM array
   intersect/union), so emitted verdicts carry no false positives;
4. verdicts appended to `verdict_dir`; band rows of the batch's
   NON-duplicate docs appended to `index_dir` — the index grows, so
   later batches dedup against earlier batches too, and the kept set
   is exactly "first occurrence wins" in stream order.

Scale notes: the index is parquet partitioned by (epoch_id,
band_idx) — the join key prunes on band_idx; at 100 TB the index join
is a shuffled equi-join on 8-byte keys (band hash), and
re-banding/compaction of the index dir is `compact_parquet`
maintenance. foreachBatch is at-least-once, so both sinks are made
exactly-once PER EPOCH: candidate history is read as `epoch_id <
current` (a replayed batch never sees its own earlier half-write),
and verdicts/index rows land via dynamic partition overwrite of the
epoch's partitions — a replay rewrites its epoch instead of
duplicating it (tests/test_dedup_stream.py pins this with a direct
double-replay).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

from demo_flink_spark.operators.checkpointing import cut_lineage


def seed_index(docs: DataFrame, index_dir: str, *, n: int = 3,
               n_hashes: int = 64, bands: int = 16) -> None:
    """Build the initial band index from a batch history corpus."""
    from demo_flink_spark.operators.dedup import minhash_signatures

    sigs = minhash_signatures(docs, n=n, n_hashes=n_hashes, bands=bands)
    (
        sigs.select(
            "doc_id",
            "shingles",
            F.posexplode("bands").alias("band_idx", "band_hash"),
            F.lit(-1).alias("epoch_id"),  # pre-stream history
        )
        .write.mode("overwrite")
        .partitionBy("epoch_id", "band_idx")
        .parquet(index_dir)
    )


def incremental_lsh_dedup(
    incoming: DataFrame,
    index_dir: str,
    verdict_dir: str,
    *,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.4,
    checkpoint_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming dedup query over a streaming `incoming`
    DataFrame with (doc_id long, text string). Verdict rows:
    (doc_id, is_dup, matched_id, jaccard, epoch_id) — matched_id is
    the best (highest-jaccard, then lowest-id) prior doc, NULL when
    the doc is novel.
    """
    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_dedup_batch(
            batch_df, epoch_id, index_dir, verdict_dir,
            n=n, n_hashes=n_hashes, bands=bands, threshold=threshold,
        )

    writer = incoming.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def process_dedup_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    verdict_dir: str,
    *,
    n: int = 3,
    n_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.4,
) -> None:
    """One micro-batch of the incremental dedup — module-level so a
    replay (same batch, same epoch) can be exercised directly; both
    sinks are idempotent per epoch."""
    from demo_flink_spark.operators.dedup import minhash_signatures

    spark = batch_df.sparkSession
    sigs = cut_lineage(
        minhash_signatures(batch_df, n=n, n_hashes=n_hashes, bands=bands)
    )  # two consumers: candidate join + index append
    mine = sigs.select(
        F.col("doc_id").alias("in_id"),
        F.col("shingles").alias("in_sh"),
        F.posexplode("bands").alias("band_idx", "band_hash"),
    )
    # replay safety: a re-run epoch must not see its own earlier
    # half-written index rows as "history"
    idx = spark.read.parquet(index_dir).filter(
        F.col("epoch_id") < F.lit(int(epoch_id))
    )
    hist_cand = mine.join(idx, ["band_idx", "band_hash"]).select(
        "in_id",
        "in_sh",
        F.col("doc_id").alias("hist_id"),
        F.col("shingles").alias("hist_sh"),
    )
    # intra-batch candidates: two near-dups arriving in the SAME
    # micro-batch must still resolve (lower doc_id wins, matching
    # the batch family's keep-min convention)
    a, b = mine.alias("a"), mine.alias("b")
    intra_cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.in_id") > F.col("b.in_id")),
        )
        .select(
            F.col("a.in_id").alias("in_id"),
            F.col("a.in_sh").alias("in_sh"),
            F.col("b.in_id").alias("hist_id"),
            F.col("b.in_sh").alias("hist_sh"),
        )
    )
    cand = hist_cand.unionByName(intra_cand).dropDuplicates(
        ["in_id", "hist_id"]
    )
    inter = F.size(F.array_intersect("in_sh", "hist_sh"))
    union = F.size(F.array_union("in_sh", "hist_sh"))
    verified = cand.select(
        "in_id",
        "hist_id",
        F.when(union > 0, inter / union.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)
    best = verified.groupBy("in_id").agg(
        F.max_by(
            F.struct(F.col("jaccard"), (-F.col("hist_id")).alias("neg")),
            F.struct(F.col("jaccard"), (-F.col("hist_id")).alias("neg")),
        ).alias("m")
    ).select(
        "in_id",
        F.col("m.jaccard").alias("jaccard"),
        (-F.col("m.neg")).cast("long").alias("matched_id"),
    )
    verdicts = (
        sigs.select(F.col("doc_id"))
        .join(best, sigs.doc_id == best.in_id, "left")
        .select(
            "doc_id",
            F.col("matched_id").isNotNull().alias("is_dup"),
            "matched_id",
            "jaccard",
            F.lit(epoch_id).alias("epoch_id"),
        )
        .transform(cut_lineage)  # pin BEFORE the index grows below
    )
    (
        verdicts.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id")
        .parquet(verdict_dir)
    )
    # fold the batch's novel docs into the index: later batches
    # dedup against them (first occurrence wins in stream order)
    novel = verdicts.filter(~F.col("is_dup")).select("doc_id")
    (
        sigs.join(novel, "doc_id", "semi")
        .select(
            "doc_id",
            "shingles",
            F.posexplode("bands").alias("band_idx", "band_hash"),
            F.lit(int(epoch_id)).alias("epoch_id"),
        )
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch_id", "band_idx")
        .parquet(index_dir)
    )
