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

Band-bucket WIDTH GUARD (`bucket_cap`, VERDICT r13 #1): the batch
path caps template-cluster buckets (operators/dedup.py:
minhash_lsh_pairs — one k=100k boilerplate cluster alone emits
~5x10^9 candidate rows unguarded, measured slope 1.95 in SCALING.md
r12), and the streaming form pays the SAME quadratic incrementally:
every new template-doc arrival joins against all k prior members in
its hot bucket, so total candidate volume over the cluster's
lifetime is still Theta(k^2) — per-batch cost grows linearly with
the accumulated cluster, unmonitored. With `bucket_cap=C` set, the
guard tags every bucket TOUCHED by the batch (batch members plus the
bucket's index members — a semi-join keeps untouched index buckets
out of the pass entirely) with its width and representative (min
doc_id across history + batch, matching the batch guard exactly);
buckets of width <= C run the normal all-pairs candidate join, and
wider buckets route per `overflow`:
  - "star": each member pairs with the bucket's rep only — Theta(k)
    rows per bucket lifetime instead of Theta(k^2), cluster-level
    recall preserved for genuine template clusters (every member
    verifies against the rep; same caveat as batch: a
    hash-collision crowd can lose non-rep pairs);
  - "drop": touched over-cap buckets contribute no candidates (the
    flag-and-skip policy; monitor via `stats_dir`).
Verification is unchanged, so precision stays 1 under both policies.
`stats_dir` (opt-in) writes one row per epoch — candidate count and
over-cap bucket/doc tallies — the streaming twin of the batch
`lsh_bucket_stats` monitoring view, and what the planted-template
receipt (tests/test_dedup_stream_guard.py) measures.

Scale notes: the index is parquet partitioned by (epoch_id,
band_idx) — the join key prunes on band_idx; at 100 TB the index join
is a shuffled equi-join on 8-byte keys (band hash), and
re-banding/compaction of the index dir is `compact_parquet`
maintenance. Candidate generation is SKINNY (doc_id + band keys
only); shingle payloads are attached to surviving candidates via a
semi-joined lookup, so the wide arrays never ride the band join.
foreachBatch is at-least-once, so all sinks are made exactly-once
PER EPOCH: candidate history is read as `epoch_id < current` (a
replayed batch never sees its own earlier half-write), and
verdicts/index/stats rows land via dynamic partition overwrite of
the epoch's partitions — a replay rewrites its epoch instead of
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


def compact_index(
    spark, index_dir: str, up_to_epoch: int, *, out_partitions: int = 16
) -> int:
    """Fold index epochs ``<= up_to_epoch`` into one consolidated
    history epoch — the maintenance half of the index's 100 TB story.
    The index is partitioned (epoch_id, band_idx), so an always-on
    stream accretes 1 + bands directories per epoch and the per-batch
    `spark.read.parquet(index_dir)` listing cost grows with stream
    lifetime; folding closed epochs bounds the partition count at
    (1 + bands × retained epochs) without touching semantics:

    - the `epoch_id < current` replay filter still holds — each
      consolidated partition carries a NEGATIVE epoch (one below the
      smallest epoch currently present, so every compaction
      generation gets a fresh value: -2, -3, …; seed_index's -1 is
      the zeroth generation), which is less than every live epoch;
    - crash-safety by DUPLICATE TOLERANCE, not atomicity (a
      multi-directory swap has no atomic rename): the consolidated
      partition is built in a temp tree and moved INTO the index in
      one rename BEFORE any folded directory is deleted. A crash
      before the move leaves the index untouched (plus an orphan
      ``*_compact_*`` temp dir to sweep); a crash during the delete
      loop leaves folded rows present TWICE (consolidated + not-yet-
      deleted originals) — exactly the state the pipeline already
      tolerates (see next bullet) and the next compaction dedupes.
      No window loses data;
    - a REPLAY of an already-compacted epoch re-appends that epoch's
      band rows next to their folded copies — harmless by
      construction: self-pairs are excluded from the candidate keys
      (the folded copies of the replayed docs would otherwise be
      "history" to themselves), cross pairs are `dropDuplicates`'d
      before verification, and the width guard only sees a
      conservatively WIDER bucket; the next compaction dedupes the
      doubled rows (receipt: test_replay_after_compaction_is_safe).
      Production discipline remains: prefer compacting only epochs at
      least two behind the stream's committed offset, where the
      checkpoint guarantees no replay can reach them.

    Local-filesystem moves (shutil); an object-store deployment uses
    the same build→install→delete order with its rename primitive.
    Returns the number of rows folded. `out_partitions` is the hash
    partition count on band_idx for the rewrite (≈ out_partitions /
    bands files per band directory — the small-files compaction; the
    hash on band_idx also co-locates each band's rows).
    """
    import glob
    import os
    import shutil
    import uuid

    def _epoch_dirs() -> list[tuple[int, str]]:
        out = []
        for d in glob.glob(os.path.join(index_dir, "epoch_id=*")):
            try:
                out.append((int(os.path.basename(d).split("=", 1)[1]), d))
            except ValueError:
                continue
        return out

    existing = _epoch_dirs()
    new_epoch = min((e for e, _ in existing), default=-1) - 1
    tmp = index_dir.rstrip("/") + f"_compact_{uuid.uuid4().hex[:8]}"
    folded = (
        spark.read.parquet(index_dir)
        .filter(F.col("epoch_id") <= F.lit(int(up_to_epoch)))
        .select("doc_id", "shingles", "band_idx", "band_hash")
        # a replayed-after-compaction epoch leaves each of its band
        # rows both in the consolidated partition and in its
        # re-created epoch partition; folding dedupes them so the
        # doubles never outlive the next compaction (shingles are
        # identical per doc, so any row wins)
        .dropDuplicates(["doc_id", "band_idx", "band_hash"])
        .withColumn("epoch_id", F.lit(new_epoch))
        .repartition(out_partitions, "band_idx")
    )
    # the write MATERIALIZES the read before index_dir is mutated
    folded.write.mode("overwrite").partitionBy("epoch_id", "band_idx").parquet(
        tmp
    )
    n = spark.read.parquet(tmp).count()
    # install FIRST (one rename; folded rows now exist twice — the
    # tolerated state), delete the folded originals AFTER
    consolidated = os.path.join(tmp, f"epoch_id={new_epoch}")
    if os.path.isdir(consolidated):  # empty fold writes no partition
        shutil.move(
            consolidated, os.path.join(index_dir, f"epoch_id={new_epoch}")
        )
        for epoch, d in existing:
            if epoch <= up_to_epoch:
                shutil.rmtree(d)
    shutil.rmtree(tmp, ignore_errors=True)
    return int(n)


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
    bucket_cap: int | None = None,
    overflow: str = "star",
    stats_dir: str | None = None,
) -> StreamingQuery:
    """Start the streaming dedup query over a streaming `incoming`
    DataFrame with (doc_id long, text string). Verdict rows:
    (doc_id, is_dup, matched_id, jaccard, epoch_id) — matched_id is
    the best (highest-jaccard, then lowest-id) prior doc, NULL when
    the doc is novel. `bucket_cap`/`overflow`/`stats_dir`: see the
    module docstring's width-guard section.
    """
    if overflow not in ("star", "drop"):
        # fail fast at call time — inside foreachBatch this would only
        # surface as a StreamingQueryException at the first micro-batch
        raise ValueError(f"overflow must be 'star' or 'drop', got {overflow!r}")

    def process(batch_df: DataFrame, epoch_id: int) -> None:
        process_dedup_batch(
            batch_df, epoch_id, index_dir, verdict_dir,
            n=n, n_hashes=n_hashes, bands=bands, threshold=threshold,
            bucket_cap=bucket_cap, overflow=overflow, stats_dir=stats_dir,
        )

    writer = incoming.writeStream.foreachBatch(process).outputMode("update")
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def _candidate_keys(
    mine_keys: DataFrame,
    idx_keys: DataFrame,
    bucket_cap: int | None,
    overflow: str,
) -> tuple[DataFrame, DataFrame | None]:
    """Skinny candidate-pair generation: (in_id, hist_id) pairs where
    in_id is always an incoming doc and hist_id is an earlier doc —
    from the index, or a lower-id doc in the same batch (the batch
    family's keep-min intra-batch convention).

    `mine_keys`: (doc_id, band_idx, band_hash) of the batch.
    `idx_keys`: same columns for the accumulated index (history).
    Returns (cand_keys, tagged) — `tagged` is the width-tagged
    touched-bucket frame (None when unguarded), exposed so the
    caller's stats sidecar reuses the materialized pass instead of
    recomputing it.

    Guard shape (bucket_cap set): history rows are first SEMI-joined
    to the batch's bucket keys — a bucket no incoming doc touches can
    emit no candidates this batch, so the width pass costs
    Theta(batch + index-rows-in-touched-buckets) per batch, NOT
    Theta(index). One window over the join key tags width + rep, the
    same single-shuffle shape as the batch guard
    (operators/dedup.py:minhash_lsh_pairs).
    """
    def _band_cands(new_side: DataFrame, hist_side: DataFrame) -> DataFrame:
        """The two candidate joins, shared verbatim by the guarded and
        unguarded branches so they cannot silently diverge (the batch
        twin's `_band_pairs` discipline, operators/dedup.py): the
        history equi-join plus the keep-min intra-batch self-join."""
        hist_ck = new_side.join(
            hist_side.withColumnRenamed("doc_id", "hist_id"),
            ["band_idx", "band_hash"],
        ).select(F.col("doc_id").alias("in_id"), "hist_id")
        a, b = new_side.alias("a"), new_side.alias("b")
        intra_ck = a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") > F.col("b.doc_id")),
        ).select(
            F.col("a.doc_id").alias("in_id"),
            F.col("b.doc_id").alias("hist_id"),
        )
        return hist_ck.unionByName(intra_ck)

    if bucket_cap is None:
        return _band_cands(mine_keys, idx_keys), None

    from pyspark.sql.window import Window

    touched_idx = idx_keys.join(
        mine_keys.select("band_idx", "band_hash").distinct(),
        ["band_idx", "band_hash"],
        "semi",
    )
    all_keys = (
        mine_keys.select(
            "doc_id", "band_idx", "band_hash", F.lit(True).alias("is_new")
        )
        .unionByName(
            touched_idx.select(
                "doc_id", "band_idx", "band_hash",
                F.lit(False).alias("is_new"),
            )
        )
    )
    # width + representative in ONE window pass on the join key —
    # struct min is ordered by its first field, so _rep carries the
    # bucket-min doc_id AND whether that rep is itself incoming
    wspec = Window.partitionBy("band_idx", "band_hash")
    tagged = all_keys.select(
        "doc_id",
        "band_idx",
        "band_hash",
        "is_new",
        F.count(F.lit(1)).over(wspec).alias("_w"),
        F.min(F.struct(F.col("doc_id"), F.col("is_new"))).over(wspec)
        .alias("_rep"),
    ).transform(cut_lineage)  # feeds narrow join, star routing, stats

    narrow = tagged.filter(F.col("_w") <= bucket_cap)
    mine_n = narrow.filter(F.col("is_new")).select(
        "doc_id", "band_idx", "band_hash"
    )
    hist_n = narrow.filter(~F.col("is_new")).select(
        "doc_id", "band_idx", "band_hash"
    )
    cand = _band_cands(mine_n, hist_n)
    if overflow == "star":
        # over-cap members pair with the bucket rep only; the verdict
        # side (in_id) must be the INCOMING doc, so orient each
        # rep-member pair by which side is new (both-history pairs
        # were resolved in an earlier batch and emit nothing)
        members = tagged.filter(
            (F.col("_w") > bucket_cap)
            & (F.col("doc_id") != F.col("_rep.doc_id"))
        ).filter(F.col("is_new") | F.col("_rep.is_new"))
        star_ck = members.select(
            F.when(F.col("is_new"), F.col("doc_id"))
            .otherwise(F.col("_rep.doc_id"))
            .alias("in_id"),
            F.when(F.col("is_new"), F.col("_rep.doc_id"))
            .otherwise(F.col("doc_id"))
            .alias("hist_id"),
        )
        cand = cand.unionByName(star_ck)
    return cand, tagged


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
    bucket_cap: int | None = None,
    overflow: str = "star",
    stats_dir: str | None = None,
) -> None:
    """One micro-batch of the incremental dedup — module-level so a
    replay (same batch, same epoch) can be exercised directly; all
    sinks are idempotent per epoch. `bucket_cap`/`overflow` apply the
    batch family's band-bucket width guard to the history AND
    intra-batch candidate joins (module docstring); `stats_dir`
    additionally writes one (epoch_id, n_candidates, n_over_cap,
    docs_in_over_cap) monitoring row per epoch."""
    from demo_flink_spark.operators.dedup import minhash_signatures

    if overflow not in ("star", "drop"):
        raise ValueError(f"overflow must be 'star' or 'drop', got {overflow!r}")
    spark = batch_df.sparkSession
    sigs = cut_lineage(
        minhash_signatures(batch_df, n=n, n_hashes=n_hashes, bands=bands)
        .select("doc_id", "shingles", "bands")
    )  # three consumers: candidate join + shingle lookup + index append
    mine_keys = sigs.select(
        "doc_id", F.posexplode("bands").alias("band_idx", "band_hash")
    )
    # replay safety: a re-run epoch must not see its own earlier
    # half-written index rows as "history"
    idx = spark.read.parquet(index_dir).filter(
        F.col("epoch_id") < F.lit(int(epoch_id))
    )
    cand_keys, tagged = _candidate_keys(
        mine_keys,
        idx.select("doc_id", "band_idx", "band_hash"),
        bucket_cap,
        overflow,
    )
    # self-pair exclusion: in_id == hist_id arises when a doc's own
    # band rows are visible as history — an epoch REPLAYED after
    # compact_index folded it into a consolidated negative epoch (the
    # folded rows lose the epoch identity the `epoch_id < current`
    # filter keys on), or a caller
    # re-sending an id. A doc is never a duplicate of itself; without
    # this, a post-compaction replay would flip its novel docs to
    # dup-of-self (receipt: test_replay_after_compaction_is_safe).
    cand_keys = (
        cand_keys.filter(F.col("in_id") != F.col("hist_id"))
        .dropDuplicates(["in_id", "hist_id"])
        .transform(cut_lineage)  # feeds shingle lookup semi + wide join
    )
    # attach shingle payloads to SURVIVING candidates only: hist_id
    # may be a history doc (index) or a lower-id batch doc (intra),
    # and only candidates' shingles leave the column store. The index
    # side WINS when an id exists in both (a caller re-sending an id
    # with changed text): "duplicate of a prior doc" means the
    # historical text, and an arbitrary-winner union would make the
    # verdict depend on partition ordering (review r14).
    needed = cand_keys.select(F.col("hist_id").alias("doc_id")).distinct()
    idx_look = (
        idx.select("doc_id", "shingles")
        .join(needed, "doc_id", "semi")
        .dropDuplicates(["doc_id"])  # index holds one row per band
        .transform(cut_lineage)  # two consumers: union side + anti side
    )
    hist_lookup = idx_look.unionByName(
        sigs.select("doc_id", "shingles")
        .join(needed, "doc_id", "semi")
        .join(idx_look.select("doc_id"), "doc_id", "anti")
    )
    cand = (
        cand_keys.join(
            sigs.select(
                F.col("doc_id").alias("in_id"), F.col("shingles").alias("in_sh")
            ),
            "in_id",
        )
        .join(
            hist_lookup.withColumnsRenamed(
                {"doc_id": "hist_id", "shingles": "hist_sh"}
            ),
            "hist_id",
        )
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
    if stats_dir is not None:
        # monitoring sidecar (streaming lsh_bucket_stats): candidate
        # volume per batch is the number the guard bounds, over-cap
        # tallies are what it routed. Counts on already-materialized
        # frames (cand_keys/tagged are lineage-cut above).
        if tagged is not None:
            # both over-cap tallies in ONE job over the materialized
            # frame — the hot-bucket case this monitors is exactly
            # where a second scan would hurt most (review r14)
            row = (
                tagged.filter(F.col("_w") > bucket_cap)
                .agg(
                    F.count_distinct(
                        F.col("band_idx"), F.col("band_hash")
                    ).alias("b"),
                    F.count_distinct(F.col("doc_id")).alias("d"),
                )
                .first()
            )
            n_over, docs_over = row.b, row.d
        else:
            n_over, docs_over = 0, 0
        spark.createDataFrame(
            [(int(cand_keys.count()), int(n_over), int(docs_over),
              int(epoch_id))],
            "n_candidates long, n_over_cap long, docs_in_over_cap long, "
            "epoch_id long",
        ).write.mode("overwrite").option(
            "partitionOverwriteMode", "dynamic"
        ).partitionBy("epoch_id").parquet(stats_dir)
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
