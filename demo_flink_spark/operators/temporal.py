"""Temporal join & rollup operators (engine extensions, SURVEY §2.3/§2.5
lineage): as-of join, bucketed range join, multi-granularity rollup.

The reference has no temporal joins (its only keyed-time logic is the
stateful operators); these are the standard time-series operators a
100 TB analytics engine needs, built scale-first:

- **as-of join** is ONE shuffle + sort (union both sides, per-key
  last-non-null window), never a range-condition join — Spark executes
  inequality joins as broadcast-nested-loop, which is quadratic and
  non-startable on two big sides.
- **range join** buckets time so the pairing is an equi-join on
  (key, bucket): only one side explodes (×3), each qualifying pair is
  found exactly once, and the precise predicate filters after the
  hash join. This is the standard OSS rewrite of the range-join-hint
  optimization.
- **multi-granularity rollup** aggregates the raw table ONCE at the
  finest grain, then re-aggregates coarser grains from the fine
  aggregate — the continuous-aggregate/hypertable pattern: at 100 TB
  the raw scan dominates, so every grain after the first is nearly
  free (the hourly table is ~|buckets×keys| rows, not |events|).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_flink_spark.functions.time import epoch_ms
from demo_flink_spark.operators.relational import dsum  # noqa: F401 (re-export habit)


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: Sequence[str] = (),
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: for each left row, the values of the LATEST
    right row with right.ts <= left.ts (direction='backward', the
    default) or the EARLIEST right row with right.ts >= left.ts
    (direction='forward'); NULLs when no right row qualifies. DuckDB
    twin: `ASOF LEFT JOIN ... ON l.key = r.key AND l.ts >= r.ts`
    (backward), or an arg_min reconstruction (forward).

    Shape: union both sides with a side marker, one window pass per
    key ordered by (ts, side) — ts DESCENDING for forward — with right
    rows sorting before left rows at equal ts, so an exactly-
    simultaneous right row IS visible (the at-or-{{before,after}}
    contract) — carrying each value column with
    `last(..., ignorenulls=True)`, then keep only left rows. One
    shuffle on the key; no inequality join, no per-key explosion:
    cost is sort(|L|+|R|) however large both sides are.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_other = [c for c in left.columns if c not in (key, left_ts)]
    lhs = left.select(
        F.col(key),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.col(c) for c in left_other],
        *[
            F.lit(None).cast(right.schema[c].dataType).alias(f"_v_{c}")
            for c in value_cols
        ],
    )
    rhs = right.select(
        F.col(key),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[
            F.lit(None).cast(left.schema[c].dataType).alias(c)
            for c in left_other
        ],
        *[F.col(c).alias(f"_v_{c}") for c in value_cols],
    )
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(key)
        .orderBy(ts_order, F.col("_side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*",
        *[
            F.last(f"_v_{c}", ignorenulls=True).over(w).alias(f"asof_{c}")
            for c in value_cols
        ],
    )
    return carried.filter(F.col("_side") == 1).select(
        key,
        F.col("_ts").alias(left_ts),
        *left_other,
        *[f"asof_{c}" for c in value_cols],
    )


def range_join_window(
    left: DataFrame,
    right: DataFrame,
    key: str,
    window_ms: int,
    left_ts: str = "ts",
    right_ts: str = "ts",
) -> DataFrame:
    """All (left, right) pairs with the same key whose timestamps are
    within `window_ms` of each other, as an equi-join.

    The left side is tagged with three covering bucket ids
    (floor(ts/w) − 1, floor, +1); the right side with its single
    bucket. A qualifying pair's buckets differ by at most 1, and each
    (left, right) pair meets on exactly ONE bucket value (the right
    row's own bucket), so the equi-join finds every pair exactly once
    — no distinct needed. The precise |Δt| ≤ w predicate then filters
    hash-join output. Cost: 3× explosion of one side + one shuffle,
    vs. a broadcast-nested-loop (quadratic, one side must fit in
    memory) for the naive inequality join.

    Output: left columns (original names) + right columns prefixed
    `r_` + `delta_ms` (left ts − right ts, may be negative).
    """
    lb = left.withColumn("_l_ms", epoch_ms(left_ts)).select(
        "*",
        F.explode(
            F.array(
                (F.floor(F.col("_l_ms") / window_ms) - 1).cast("long"),
                F.floor(F.col("_l_ms") / window_ms).cast("long"),
                (F.floor(F.col("_l_ms") / window_ms) + 1).cast("long"),
            )
        ).alias("_bucket"),
    )
    rb = (
        right.select(
            F.col(key).alias("_r_key"),
            *[F.col(c).alias(f"r_{c}") for c in right.columns if c != key],
        )
        .withColumn("_r_ms", epoch_ms(f"r_{right_ts}"))
        .withColumn("_bucket", F.floor(F.col("_r_ms") / window_ms).cast("long"))
    )
    return (
        lb.join(rb, (F.col(key) == F.col("_r_key")) & (lb["_bucket"] == rb["_bucket"]))
        .filter(F.abs(F.col("_l_ms") - F.col("_r_ms")) <= window_ms)
        .withColumn("delta_ms", F.col("_l_ms") - F.col("_r_ms"))
        .drop("_bucket", "_r_key", "_l_ms", "_r_ms")
    )


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    grid_ms: int,
) -> DataFrame:
    """All overlapping (left, right) interval pairs — as an equi-join.

    Inputs both carry half-open intervals as ``(id, start_ms,
    end_ms)``; output is every pair with ``a_start < b_end AND
    b_start < a_end`` plus the overlap length. The naive inequality
    join is a broadcast-nested-loop (quadratic, one side in memory);
    this is the scale rewrite:

    - each interval explodes to its covering grid buckets
      (``floor(start/g) .. floor((end−1)/g)`` — ``len/g + 1`` rows for
      bounded intervals with a well-chosen grid);
    - pairs meet on bucket equality (one shuffle);
    - the precise overlap predicate filters hash-join output, and the
      pair is kept only in its CANONICAL bucket — the bucket of
      ``greatest(a_start, b_start)``, which both intervals provably
      cover when they overlap — so every pair is emitted exactly once
      with no distinct pass.

    Pick ``grid_ms`` near the typical interval length (explosion ≈ 2);
    a pathological bucket (everything overlapping one moment) is the
    AQE skew-join case, same as any hot join key.
    """

    def buckets(df: DataFrame, p: str) -> DataFrame:
        return df.select(
            F.col("id").alias(f"{p}_id"),
            F.col("start_ms").alias(f"{p}_start"),
            F.col("end_ms").alias(f"{p}_end"),
            F.explode(
                F.expr(
                    f"sequence(CAST(floor(start_ms / {grid_ms}) AS BIGINT),"
                    f" CAST(floor((end_ms - 1) / {grid_ms}) AS BIGINT))"
                )
            ).alias("_bucket"),
        )

    pairs = buckets(left, "a").join(buckets(right, "b"), "_bucket").filter(
        (F.col("a_start") < F.col("b_end"))
        & (F.col("b_start") < F.col("a_end"))
        & (
            F.col("_bucket")
            == F.floor(
                F.greatest("a_start", "b_start") / F.lit(grid_ms)
            ).cast("long")
        )
    )
    return pairs.select(
        "a_id",
        "b_id",
        "a_start",
        "a_end",
        "b_start",
        "b_end",
        (
            F.least("a_end", "b_end") - F.greatest("a_start", "b_start")
        ).alias("overlap_ms"),
    )


def rollup_time_multi(
    events: DataFrame,
    ts_col: str,
    key_col: str,
    value_col: str,
    grains: Sequence[str] = ("1 hour", "1 day"),
) -> DataFrame:
    """Continuous-aggregate-style multi-granularity rollup.

    Aggregates the raw table once at the finest grain, then derives
    each coarser grain FROM the previous aggregate (sums of sums,
    counts of counts — decimal-exact so re-aggregation is lossless).
    Output: (granularity, window_start, key, cnt, sum_micros) unioned
    across grains. `grains` must be coarsening multiples (hour→day→…)
    so every coarse bucket is a whole number of fine buckets.

    The sum is emitted as SCALE-6 INTEGER MICROS (bigint), not a
    double: the decimal(38,6) accumulation is exact on every engine,
    so ``_sum * 1e6`` is an integer-valued decimal and the bigint is
    bit-identical by construction. The previous ``cast("double")``
    contract hash-failed the cross-harness gate twice (r03, r05) on
    last-ulp decimal→double conversion differences that the local
    full-precision-repr gate provably could not reproduce — integers
    remove the float from the contract entirely (same technique as
    ts_linear_trend's integer sufficient statistics).
    """
    fine, *coarser = grains
    agg = (
        events.select(
            F.window(ts_col, fine).start.alias("window_start"),
            F.col(key_col).alias("key"),
            F.col(value_col).cast("decimal(38,6)").alias("_v"),
        )
        .groupBy("window_start", "key")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("_v").alias("_sum"))
    )
    out = agg.select(
        F.lit(fine).alias("granularity"), "window_start", "key", "cnt", "_sum"
    )
    prev = agg
    for grain in coarser:
        prev = (
            prev.select(
                F.window("window_start", grain).start.alias("window_start"),
                "key",
                "cnt",
                "_sum",
            )
            .groupBy("window_start", "key")
            .agg(F.sum("cnt").alias("cnt"), F.sum("_sum").alias("_sum"))
        )
        out = out.unionByName(
            prev.select(
                F.lit(grain).alias("granularity"),
                "window_start",
                "key",
                "cnt",
                "_sum",
            )
        )
    return out.select(
        "granularity",
        "window_start",
        "key",
        "cnt",
        # scale-6 decimal × 10^6 is exactly integral; the long cast is
        # lossless. No double anywhere in the output contract.
        (F.col("_sum") * F.lit(1000000)).cast("long").alias("sum_micros"),
    )


def sequence_pattern_matches(
    events: DataFrame,
    pattern: Sequence[str],
    within: str = "10 minutes",
    key_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
) -> DataFrame:
    """CEP-lite sequential pattern detection: per key, every run of
    STRICTLY CONSECUTIVE events matching `pattern` whose first→last
    span fits in `within` — the core of Flink-CEP's
    ``begin.next.next.within`` chain (strict contiguity, no
    quantifiers/negation), expressed as ONE keyed window pass.

    Each match row reports the key, the starting event id/ts and the
    span end ts. Overlapping matches all emit (CEP's default). The
    k−1 `lead` columns share one (key, order) window spec, so the
    whole detection is a single exchange + sort — no self-joins, no
    per-stage scans, the same scale shape as the funnel.

    `within` must be a Spark interval string; the span check compares
    exact timestamps (microsecond integers under the hood — no float
    boundary).
    """
    k = len(pattern)
    if k < 2:
        raise ValueError("pattern needs at least 2 steps")
    w = Window.partitionBy(key_col).orderBy(
        F.col(ts_col).asc(), F.col(id_col).asc()
    )
    cols = [
        F.col(key_col),
        F.col(id_col).alias("start_event_id"),
        F.col(ts_col).alias("start_ts"),
        F.col(type_col).alias("_t0"),
    ]
    for j in range(1, k):
        cols.append(F.lead(type_col, j).over(w).alias(f"_t{j}"))
    cols.append(F.lead(ts_col, k - 1).over(w).alias("end_ts"))
    staged = events.select(*cols)
    cond = F.lit(True)
    for j, step in enumerate(pattern):
        cond = cond & (F.col(f"_t{j}") == step)
    cond = cond & (
        F.col("end_ts") <= F.col("start_ts") + F.expr(f"INTERVAL {within}")
    )
    return staged.filter(cond).select(
        key_col, "start_event_id", "start_ts", "end_ts"
    )
