"""Scale utilities: hot-key salting and streaming observability.

SURVEY §7.5 hard items for the 100 TB design goal. AQE's skew-join
splitting handles *join* skew automatically; aggregation skew on a hot
key (one user/trade id with 10⁹ events) still serializes into one
reducer — salting splits it into S partial aggregates + one tiny
final combine.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery


def salted_agg(
    df: DataFrame,
    key_cols: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase aggregation with key salting.

    Phase 1 groups by (key, salt) — a hot key fans out over n_salts
    reducers. Phase 2 re-groups by key alone to combine partials. Only
    works for decomposable aggregates; `aggs` maps output name →
    phase-1 aggregate, and the phase-2 combine is chosen by
    convention: sum→sum, count→sum, min→min, max→max.

    (Map-side partial aggregation already does this for most cases;
    salting matters when the DISTINCT key count per partition is so
    low that hash-agg degenerates — the classic hot-key shape.)

    Salt = row position (monotonically_increasing_id % S), NOT row
    content: a hot key made of identical rows would hash to a single
    salt and re-serialize into one reducer. Position spreads evenly
    regardless of content, and the salt never affects results — only
    partitioning.
    """
    salt = (F.monotonically_increasing_id() % n_salts).cast("int").alias("_salt")
    phase1 = df.withColumn("_salt", salt).groupBy(*key_cols, "_salt")
    partial = phase1.agg(
        *[expr.alias(f"_p_{name}") for name, expr in aggs.items()]
    )
    combines = []
    for name in aggs:
        p = F.col(f"_p_{name}")
        lowered = name.lower()
        if lowered.startswith("min"):
            combines.append(F.min(p).alias(name))
        elif lowered.startswith("max"):
            combines.append(F.max(p).alias(name))
        else:  # sums and counts both combine by summing partials
            combines.append(F.sum(p).alias(name))
    return partial.groupBy(*key_cols).agg(*combines)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Skew-resistant equi-join: salt the big side, explode the small.

    big gets salt = row position % S (content-independent — identical
    hot rows still spread); small is replicated S times with every
    salt value — so a hot key's rows spread over S tasks instead of
    one. Use when AQE's skew split isn't available (e.g. stream-static
    joins). Small side grows S×: only for dimension-sized right sides.

    Streaming callers MUST pass `salt_expr`: Spark rejects
    `monotonically_increasing_id()` on streaming DataFrames at query
    start (StreamingQueryException, non-time-based expression). A good
    streaming salt is a per-record source ordinal that identical rows
    don't share — e.g. `pmod(col("offset"), n_salts)` for Kafka, or a
    sequence column carried by the source. Content hashes are NOT a
    good salt: a hot key made of identical rows would collapse back
    into one reducer.
    """
    if salt_expr is None:
        if big.isStreaming:
            raise ValueError(
                "salted_join on a streaming DataFrame needs an explicit "
                "salt_expr (e.g. pmod(col('offset'), n_salts) for Kafka): "
                "monotonically_increasing_id() is rejected on streams"
            )
        salt_expr = (F.monotonically_increasing_id() % n_salts).cast("int")
    small_rep = small.select(
        "*",
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("_salt"),
    )
    big_salted = big.withColumn("_salt", salt_expr.cast("int"))
    return big_salted.join(small_rep, [key, "_salt"]).drop("_salt")


def write_bucketed(
    df: DataFrame,
    table_name: str,
    key: str,
    n_buckets: int = 32,
    sorted_by_key: bool = True,
    mode: str = "overwrite",
) -> None:
    """Persist `df` as a bucketed (and bucket-sorted) table so joins
    and aggregations on `key` run WITHOUT an exchange.

    Bucketing is the 100 TB answer to repeated joins on the same key:
    pay the shuffle once at write time, then every
    fact⋈fact / fact⋈dim join on the bucket key is a zero-shuffle
    sort-merge over co-located buckets (both sides hashed with the
    same bucketing function into the same bucket count). Verified by
    the plan test: bucketed orders⋈lineitem shows 0 Exchange nodes.

    Uses the session catalog's managed tables (`saveAsTable` — plain
    `parquet(path)` cannot record bucket metadata). Pick `n_buckets`
    so one bucket ≈ 100-500 MB at the target scale; both join sides
    must use the SAME bucket count to avoid a re-shuffle.
    """
    writer = df.write.bucketBy(n_buckets, key)
    if sorted_by_key:
        writer = writer.sortBy(key)
    writer.mode(mode).saveAsTable(table_name)


def observed_watermark(query: StreamingQuery) -> str | None:
    """Current event-time watermark of a running query (SURVEY §2.5 W8).

    The reference prints `ctx.timerService().currentWatermark()` per
    element (`EventTimeWordCountDebug.java:77-84`); Spark exposes the
    same quantity per micro-batch in query progress.
    """
    progress = query.lastProgress
    if not progress:
        return None
    return (progress.get("eventTime") or {}).get("watermark")


def with_observed_metrics(df: DataFrame, name: str, **metrics: Column):
    """Attach zero-cost pipeline metrics to a DataFrame: row counts,
    null counts, sums — computed DURING the job's own pass, not by a
    second scan.

    At 100 TB a separate `df.count()` for monitoring doubles the I/O;
    `observe` folds the aggregates into the existing physical plan
    (CollectMetrics node) and the numbers come back on the driver
    after the action. Batch: returns (df, Observation) — read
    `observation.get` after an action runs. Streaming: pass the plain
    named form and read metrics from `QueryProgress.observedMetrics`.

    Default metrics when none given: n_rows.
    """
    from pyspark.sql import Observation

    if not metrics:
        metrics = {"n_rows": F.count(F.lit(1))}
    obs = Observation(name)
    observed = df.observe(obs, *(c.alias(k) for k, c in metrics.items()))
    return observed, obs


def zorder_value(cols: Sequence[Column], bits: int = 8) -> Column:
    """Interleave the low `bits` of each (already-bucketed) integer
    column into one Z-order (Morton) key — pure JVM bit expressions,
    built by a Python loop at plan time.

    Input columns must be bucket ordinals in [0, 2^bits); see
    `zorder_write` for the end-to-end layout pass."""
    z = F.lit(0).cast("long")
    n = len(cols)
    for b in range(bits):
        for i, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), b).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, b * n + (n - 1 - i)))
    return z


def zorder_write(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    n_files: int = 8,
    bits: int = 8,
    mode: str = "overwrite",
) -> None:
    """Z-order-clustered parquet write: co-locate rows that are close
    in EVERY `cols` dimension, so min/max file statistics prune scans
    filtered on ANY of them (the OPTIMIZE ZORDER technique, without a
    table format).

    A plain sort optimizes skipping for its leading column only; the
    Morton key interleaves bucket ordinals of all columns, so each
    output file covers a small hyper-rectangle of the value space.
    Buckets here are equal-width from a min/max agg (one tiny driver
    scalar per column — NOT a data pass per column); for heavily
    skewed columns substitute approxQuantile boundaries to make
    buckets equal-frequency. The final step is a range repartition on
    the z-key + within-partition sort — one shuffle total.
    """
    bounds = df.agg(
        *[F.min(c).alias(f"_lo_{c}") for c in cols],
        *[F.max(c).alias(f"_hi_{c}") for c in cols],
    ).first()
    n_buckets = (1 << bits) - 1
    bucketed = []
    for c in cols:
        lo, hi = float(bounds[f"_lo_{c}"]), float(bounds[f"_hi_{c}"])
        span = (hi - lo) or 1.0
        bucketed.append(
            F.least(
                F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * n_buckets),
                F.lit(n_buckets),
            ).cast("long")
        )
    z = df.withColumn("_z", zorder_value(bucketed, bits=bits))
    (
        z.repartitionByRange(n_files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode(mode)
        .parquet(path)
    )


def compact_parquet(
    spark,
    path: str,
    out_path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    sort_within_by: Sequence[str] | None = None,
) -> int:
    """Small-files compaction: rewrite a parquet directory into files
    near `target_file_bytes`. Returns the output file count.

    The maintenance half of the layout story (zorder_write optimizes
    WHAT is in each file; this fixes HOW MANY there are): streaming
    sinks, per-trigger micro-batches, and over-parallel writers leave
    thousands of KB-scale files whose per-file open/footer cost comes
    to dominate scans at 100 TB. Output file count is sized from the
    directory's actual bytes (driver-side listing — file metadata, not
    data). `coalesce` (not repartition) merges without a shuffle when
    shrinking; when the target exceeds the scan's partition count
    (re-splitting oversized files) a shuffle `repartition` is required
    because coalesce can only merge. Returns the file count actually
    written (counted from `out_path`), not the computed target — the
    two can differ when partitions are empty.
    """
    import math
    import os

    total = 0
    for root, _dirs, files in os.walk(path):
        for f in files:
            if f.endswith(".parquet"):
                total += os.path.getsize(os.path.join(root, f))
    n_out = max(1, math.ceil(total / target_file_bytes))
    df = spark.read.parquet(path)
    if df.rdd.getNumPartitions() < n_out:
        compacted = df.repartition(n_out)
    else:
        compacted = df.coalesce(n_out)
    if sort_within_by:
        compacted = compacted.sortWithinPartitions(*sort_within_by)
    compacted.write.mode("overwrite").parquet(out_path)
    return sum(
        1
        for root, _dirs, files in os.walk(out_path)
        for f in files
        if f.endswith(".parquet")
    )


def sketch_residual_quantile(
    df,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    pcts: tuple[int, ...] = (50, 90, 99),
    accuracy: int = 100,
):
    """EXACT type-1 quantile elements per key WITHOUT a full per-key
    sort — the sketch-first-then-residual recipe that the exact-rank
    operators (`quantile_disc_by_segment`, `percentile_exact`,
    `anomaly_mad_hampel`) document as the 100 TB path, implemented:

    1. SKETCH: one `percentile_approx` aggregate per key (GK-style
       mergeable sketch, map-side combinable) brackets each target
       percentile p with [approx(p−2ε), approx(p+2ε)], ε = 1/accuracy.
       The sketch's rank-error guarantee (≤ εn for any merge order /
       partitioning) puts the TRUE rank-r* element inside that value
       band regardless of how the sketch merged.
    2. RESIDUAL: count rows strictly below the band (one aggregate),
       then rank-select ONLY the band rows — a keyed window over
       O(εn) rows per key instead of n. The selected element is the
       same bit-copied input value the full-sort path returns; the
       sketch only PRUNES, it never touches the answer.
    3. FALLBACK: any (key, pct) whose target rank falls outside its
       band (possible only for degenerate/tiny groups) is recomputed
       by the audit-grade full-sort path — correctness never rests on
       the sketch's guarantee being tight.

    Returns (key, n, p{pct}...) with EXACTLY the values of the
    full-sort `quantile_disc` contract: rank ⌊p·(n−1)⌋+1 under the
    (value, tiebreak) total order, doubles bit-copied.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    eps = 1.0 / accuracy
    # NULL values must be excluded EXPLICITLY: percentile_approx
    # ignores them but count(*) would not, silently shifting every
    # target rank on nullable columns
    base = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    ).filter(F.col("v").isNotNull())
    lo_qs = [max(p / 100.0 - 2 * eps, 0.0) for p in pcts]
    hi_qs = [min(p / 100.0 + 2 * eps, 1.0) for p in pcts]
    stats = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile_approx("v", lo_qs, accuracy).alias("lo"),
        F.percentile_approx("v", hi_qs, accuracy).alias("hi"),
    )
    bands = stats.select(
        "k",
        "n",
        F.posexplode(F.arrays_zip("lo", "hi")).alias("i", "band"),
    ).select(
        "k",
        "n",
        F.element_at(
            F.array(*[F.lit(p) for p in pcts]), F.col("i") + 1
        ).alias("pct"),
        F.col("band.lo").alias("lo"),
        F.col("band.hi").alias("hi"),
    ).withColumn("target", F.expr("(n - 1) * pct div 100 + 1"))
    tagged = base.join(F.broadcast(bands), "k")
    below = (
        tagged.filter(F.col("v") < F.col("lo"))
        .groupBy("k", "pct")
        .agg(F.count(F.lit(1)).alias("n_below"))
    )
    band_rows = tagged.filter(
        (F.col("v") >= F.col("lo")) & (F.col("v") <= F.col("hi"))
    ).join(F.broadcast(below), ["k", "pct"], "left").na.fill({"n_below": 0})
    w = Window.partitionBy("k", "pct").orderBy("v", "tb")
    picked = (
        band_rows.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == F.col("target") - F.col("n_below"))
        .select("k", "pct", F.col("v").alias("element"))
    )
    # picked is keys×pcts rows; it feeds the output AND the fallback
    # anti-join — materialize once instead of re-running the pipeline
    from demo_flink_spark.operators.checkpointing import cut_lineage

    picked = picked.transform(cut_lineage)
    # fallback: (key, pct) pairs the band missed -> full-sort path,
    # but ONLY over the missing keys' rows (left_semi first). In the
    # normal case `missing` is empty and AQE's empty-relation
    # propagation collapses the whole branch to nothing at runtime —
    # no eager isEmpty() probe, no full-sort job.
    missing = bands.join(picked, ["k", "pct"], "left_anti").select("k", "pct")
    fb_base = base.join(
        F.broadcast(missing.select("k").distinct()), "k", "left_semi"
    )
    wf = Window.partitionBy("k").orderBy("v", "tb")
    fb = (
        fb_base.select(
            "k",
            "v",
            "tb",
            F.row_number().over(wf).alias("rn"),
            F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n"),
        )
        .join(F.broadcast(missing), "k")
        .filter(F.expr("rn = (n - 1) * pct div 100 + 1"))
        .select("k", "pct", F.col("v").alias("element"))
    )
    wide = picked.unionByName(fb).groupBy("k").pivot("pct", list(pcts)).agg(
        F.first("element")
    )
    out = stats.select("k", F.col("n").cast("long").alias("n")).join(
        wide, "k"
    )
    for p in pcts:
        out = out.withColumnRenamed(str(p), f"p{p}")
    return out.withColumnRenamed("k", key_col)
