"""Regular-grid time-series operators (engine extensions, SURVEY §2.5
lineage): gap-fill onto a fixed bucket grid, last-observation-carried-
forward (LOCF) interpolation, and trailing-window z-score anomaly
detection.

The reference's only time handling is watermarked windows
(`EventTimeWordCountDebug.java:100-105`); a 100 TB telemetry store also
needs the hypertable staples — `time_bucket_gapfill` + `locf` (the
TimescaleDB names) and online anomaly flagging. Scale shape:

- **gap-fill** never materializes one giant per-key array: the grid is
  generated two-level (day chunks, then buckets within each chunk), so
  the largest exploded array is |buckets per day| (24 for hourly, 1440
  for minutely) regardless of how many years a key spans. The grid rows
  come from a tiny per-key (min, max) aggregate, not from the raw scan.
- **LOCF** is one window pass per key ordered by bucket —
  `last(value, ignorenulls=True)` over unbounded-preceding; no
  self-join, no per-row subquery.
- **z-score** is one window pass with decimal-exact trailing sums
  (`dsum` discipline, operators/relational.py) so mean/std — and hence
  the emitted z values — are partition-order independent and bit-match
  the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_STEPS_PER_DAY = {"1 hour": 24, "1 minute": 1440, "15 minutes": 96}


def bucket(ts: Column, step: str) -> Column:
    """Floor `ts` onto the step grid (grid phase = midnight)."""
    if step == "1 hour":
        return F.date_trunc("hour", ts)
    if step == "1 minute":
        return F.date_trunc("minute", ts)
    # generic: floor the epoch to whole steps — integer floor-division
    # (double division + cast truncates toward zero, which mis-floors
    # pre-1970 timestamps and drifts from the date_trunc paths)
    n = {"15 minutes": 900}[step]
    return F.timestamp_seconds(
        F.floor(F.unix_timestamp(ts) / F.lit(n)).cast("long") * n
    )


def gapfill_locf(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "1 hour",
) -> DataFrame:
    """Per-key regular grid from the key's first to last bucket, with
    `max(value)` per occupied bucket and LOCF for the empty ones.

    Returns (key, bucket_ts, value_filled, is_gap): `is_gap` marks grid
    rows with no raw event; `value_filled` is NULL only before a key's
    first observation (nothing to carry forward). Bucket aggregate is
    MAX — deterministic under ties, no float-sum ordering hazard.
    """
    per_day = _STEPS_PER_DAY[step]
    b = bucket(F.col(ts_col), step)
    vals = (
        df.select(F.col(key_col).alias("key"), b.alias("bucket_ts"),
                  F.col(value_col).alias("v"))
        .groupBy("key", "bucket_ts")
        .agg(F.max("v").alias("v"))
    )
    spans = vals.groupBy("key").agg(
        F.min("bucket_ts").alias("lo"), F.max("bucket_ts").alias("hi")
    )
    # two-level grid: |span| days per key, then <= per_day buckets per
    # day — bounds every exploded array even for multi-year spans
    days = spans.select(
        "key", "lo", "hi",
        F.explode(
            F.expr("sequence(date_trunc('day', lo), date_trunc('day', hi), "
                   "interval 1 day)")
        ).alias("day"),
    )
    step_s = 24 * 3600 // per_day
    grid = days.select(
        "key",
        F.explode(
            F.expr(
                "sequence(greatest(day, lo),"
                f" least(day + interval {(per_day - 1) * step_s} seconds, hi),"
                f" interval {step_s} seconds)"
            )
        ).alias("bucket_ts"),
    )
    w = (
        Window.partitionBy("key")
        .orderBy("bucket_ts")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(vals, ["key", "bucket_ts"], "left")
        .select(
            F.col("key").alias(key_col),
            "bucket_ts",
            F.last("v", ignorenulls=True).over(w).alias("value_filled"),
            F.col("v").isNull().alias("is_gap"),
        )
    )


def zscore_anomalies(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    order_tiebreak: str = "event_id",
    value_col: str = "value",
    n_trailing: int = 100,
    threshold: float = 2.5,
) -> DataFrame:
    """Rows whose value deviates > `threshold` sample standard
    deviations from the trailing `n_trailing`-row mean of their key's
    series (window includes the current row; rows before a full-ish
    window, count < 8, are never flagged — the std estimate is noise.
    Note the self-inclusion cap: a single outlier's |z| can never
    exceed (n-1)/sqrt(n), so a 2.5 threshold needs n >= 9 to fire).

    Decimal-exact trailing sums make z bit-deterministic (see module
    docstring); one window pass, one shuffle on the key.

    The trailing sums are computed as RUNNING prefix sums minus their
    `lag(n_trailing)` value instead of a sliding ROWS frame: Spark
    re-aggregates a bounded sliding frame from scratch on every row
    (O(rows x frame) — with decimal adds that dominated this query's
    bench time), while running frames update incrementally and lag is
    an O(1) offset lookup. Decimal arithmetic keeps the difference
    EXACT, so the rewrite is value-identical to the windowed sum.
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak)
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    v = F.col(value_col)
    zero = F.lit(0).cast("decimal(38,6)")
    c1 = F.sum(v.cast("decimal(38,6)")).over(wrun)
    c2 = F.sum((v * v).cast("decimal(38,6)")).over(wrun)
    ccnt = F.count(v).over(wrun)
    cnt = ccnt - F.coalesce(F.lag(ccnt, n_trailing).over(wo), F.lit(0))
    s1 = (c1 - F.coalesce(F.lag(c1, n_trailing).over(wo), zero)).cast("double")
    s2 = (c2 - F.coalesce(F.lag(c2, n_trailing).over(wo), zero)).cast("double")
    mean = s1 / cnt
    # sample variance from exact sums; guard the 1-row window
    var = (s2 - s1 * s1 / cnt) / (cnt - F.lit(1))
    z = (v - mean) / F.sqrt(var)
    return (
        df.select(
            key_col,
            ts_col,
            order_tiebreak,
            v.alias(value_col),
            cnt.alias("n_win"),
            z.alias("z"),
        )
        .filter((F.col("n_win") >= 8) & (F.abs(F.col("z")) > threshold))
        .drop("n_win")
    )


def mad_outliers(
    df: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-key outlier summary via median/MAD — the
    Hampel-filter statistic: med = median(value), MAD =
    median(|value − med|), outlier ⇔ |value − med| > k·MAD. Unlike
    the trailing z-score (`zscore_anomalies`), a few extreme points
    cannot inflate the spread estimate and mask each other (the
    breakdown point is 50%, vs 0 for mean/σ).

    Engine-exactness by construction: both medians are LOWER-median
    ELEMENTS selected by rank — rank (n+1) div 2 under the total
    order (value, tiebreak) — never an interpolated average, so every
    output is either a bit-copied input double or a deterministic
    IEEE subtract/abs/compare; no rounding rule anywhere. Output:
    (key, n, med, mad, n_outliers).

    Plan: two keyed window passes (value rank, then absdev rank) and
    a 1-row-per-key broadcast join back — shuffles only on the key.
    Each window pass executes exactly ONCE (r14 optimization pass):
    the per-key median frames (`med`, `mad` — one row per key) are
    lazily lineage-cut, so the sorts behind them run a single time no
    matter how many broadcasts consume them, and the deviation frame
    is derived from the RAW (key, v, tb) projection + a broadcast of
    `med` rather than from the ranked frame — the value-rank window
    previously re-executed inside every broadcast build of
    `med`/`stats` (3 sort passes for one answer, visible as repeated
    Window+Sort subtrees under each BroadcastExchange in the plan).
    The full-sort-per-key window is the audit-grade exact path (same
    caveat as `percentile_exact`): at 100 TB locate each median with
    the sketch-first-then-residual recipe — IMPLEMENTED as
    `operators/scale.py::sketch_residual_quantile` (exactness proven
    by sharing the full-sort oracle) — and run this operator's
    selection on the residual band only.
    """
    from demo_flink_spark.operators.checkpointing import cut_lineage_lazy

    v, key = F.col(value_col), F.col(key_col)
    w = Window.partitionBy("key").orderBy("v", "tb")
    wn = Window.partitionBy("key")
    base = df.select(
        key.alias("key"), v.alias("v"), F.col(tiebreak_col).alias("tb")
    )
    ranked = base.select(
        "key",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # (n+1) div 2 as exact integer arithmetic; one row per key, so the
    # lazy lineage cut materializes the rank sort exactly once
    med = (
        ranked.filter(F.expr("rn = (n + 1) div 2"))
        .select("key", F.col("v").alias("med"), "n")
        .transform(cut_lineage_lazy)
    )
    # dev feeds TWO consumers (the absdev rank window and the final
    # outlier count): cut lineage or the scan+join re-executes per
    # consumer
    dev = (
        base.join(F.broadcast(med.select("key", "med")), "key")
        .select(
            "key", "v", "tb", F.abs(F.col("v") - F.col("med")).alias("absdev")
        )
        .transform(cut_lineage_lazy)
    )
    w2 = Window.partitionBy("key").orderBy("absdev", "tb")
    dev_ranked = dev.select(
        "key",
        "absdev",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = (
        dev_ranked.filter(F.expr("rn = (n + 1) div 2"))
        .select("key", F.col("absdev").alias("mad"))
        .transform(cut_lineage_lazy)
    )
    stats = med.join(F.broadcast(mad), "key")
    return (
        dev.join(F.broadcast(stats.select("key", "mad")), "key")
        .groupBy("key")
        .agg(
            F.sum(
                F.when(F.col("absdev") > F.lit(k) * F.col("mad"), 1).otherwise(0)
            ).cast("long").alias("n_outliers")
        )
        .join(F.broadcast(stats), "key")
        .select(
            F.col("key").alias(key_col),
            F.col("n").cast("long").alias("n"),
            "med",
            "mad",
            "n_outliers",
        )
    )


def cusum_drift(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    target: float = 100.0,
    slack: float = 5.0,
    h: float = 500.0,
) -> DataFrame:
    """One-sided (upward) CUSUM drift detector per key — Page's
    sequential change-point statistic, the standard "has this metric's
    mean shifted?" monitor:

        S_i = max(0, S_{i-1} + (x_i − target − slack)),  alarm ⇔ S_i > h

    computed WITHOUT the recursion via its closed form over the
    (ts, tiebreak)-ordered series:

        S_i = P_i − min(0, min_{j≤i} P_j),   P = running Σ(x − target − slack)

    i.e. one decimal-exact cumulative sum + one running min — two
    expressions over a single keyed window exchange, no recursion, no
    UDF. The slack (allowance) absorbs noise below `slack` per
    reading; `h` trades detection delay for false alarms (both in
    value units).

    Engine-exact contract: deviations, prefix sums and running mins
    are all decimal(38,6) (the input cast is the same HALF_UP
    conversion every decimal aggregate in the engine uses), and the
    outputs are scale-6 integer micros — no double anywhere (the
    rollup lesson). Output per key: (key, n, n_alarms,
    max_cusum_micros, first_alarm_ts).
    """
    wo = Window.partitionBy(key_col).orderBy(ts_col, tiebreak_col)
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dev = (
        F.col(value_col).cast("decimal(38,6)")
        - F.lit(target).cast("decimal(38,6)")
        - F.lit(slack).cast("decimal(38,6)")
    )
    p = F.sum(dev).over(wrun)
    m = F.least(F.lit(0).cast("decimal(38,6)"), F.min(p).over(wrun))
    s = (p - m).alias("s")
    h_dec = F.lit(h).cast("decimal(38,6)")
    scored = df.select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        s,
        (p - m > h_dec).alias("alarm"),
    )
    return scored.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.when(F.col("alarm"), 1).otherwise(0)).cast("long").alias(
            "n_alarms"
        ),
        (F.max("s") * F.lit(1000000)).cast("long").alias("max_cusum_micros"),
        F.min(F.when(F.col("alarm"), F.col("ts"))).alias("first_alarm_ts"),
    ).withColumnRenamed("key", key_col)


def linear_trend(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-key least-squares trend fit — the forecasting primitive
    (is this series rising, and how fast?) behind capacity planning
    and drift alerts:

        slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²),
        intercept = ȳ − slope·x̄

    computed from INTEGER sufficient statistics: x = microseconds
    since the key's first reading (bounded offsets, not raw epochs),
    y = value in cents (the synthetic feed carries 2 decimals; the
    double→cents rounding is off any tie by representation error, so
    both engines agree). Every Σ is an exact decimal/HUGEINT sum —
    magnitudes stay under 10^34 ≪ 10^38 — and only the final
    slope/intercept divisions are doubles, so the fit is bit-identical
    cross-engine with NO rounding step.

    Scale: ONE key-partitioned window (min-ts per key rides the same
    exchange as the aggregate) + one grouped sum — the classic
    map-side-combinable regression; nothing is ever collected.

    Returns (key, n, slope_per_hour, intercept) in original value
    units: slope_cents_per_us · 3.6e7 = value/hour (exact double
    scaling), intercept = cents/100.
    """
    w = Window.partitionBy(key_col)
    x = (
        F.unix_micros(F.col(ts_col))
        - F.min(F.unix_micros(F.col(ts_col))).over(w)
    ).cast("decimal(38,0)")
    y = F.round(F.col(value_col) * 100).cast("decimal(38,0)")
    base = df.select(
        F.col(key_col).alias("key"), x.alias("x"), y.alias("y")
    )
    agg = base.groupBy("key").agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    num = F.expr("n * sxy - sx * sy")
    den = F.expr("n * sxx - sx * sx")
    slope = F.when(den != 0, num.cast("double") / den.cast("double")).otherwise(
        F.lit(0.0)
    )
    return agg.select(
        F.col("key").alias(key_col),
        F.col("n").cast("long").alias("n"),
        (slope * F.lit(3.6e7)).alias("slope_per_hour"),
        (
            (
                F.col("sy").cast("double") / F.col("n").cast("double")
                - slope
                * (F.col("sx").cast("double") / F.col("n").cast("double"))
            )
            / F.lit(100.0)
        ).alias("intercept"),
    )


def ewma_trailing(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    n_trailing: int = 8,
) -> DataFrame:
    """Exponentially weighted moving average over the trailing
    `n_trailing` readings per key (alpha = 1/2):

        ewma_t = Σ_j v_{t-j} · 2^(-j)  /  Σ_j 2^(-j),   j = 0..L-1

    the denoised "current level" feature every monitoring/trading
    pipeline derives, truncated to a bounded window so it is a pure
    ROWS-frame window op (the untruncated recursion needs stateful
    streaming; this is its batch twin).

    Bit-exact across engines WITHOUT rounding: the weights are
    reciprocals of powers of two pulled from a LITERAL array (exact
    doubles), v · 2^(-j) is an exact scaling, and both engines fold
    the term list strictly left-to-right (Spark `aggregate` from +0.0,
    DuckDB `list_reduce` — adding 0.0 first is itself exact), so every
    intermediate double is identical. No libm pow anywhere.

    One window pass, one shuffle on the key; the collected frame is
    `n_trailing` doubles per row.
    """
    if n_trailing < 1:
        raise ValueError("n_trailing must be >= 1")
    w = Window.partitionBy(key_col).orderBy(ts_col, order_tiebreak).rowsBetween(
        -(n_trailing - 1), 0
    )
    # materialize the frame as a named column BEFORE any lambda uses
    # it (expressions inside higher-order functions are re-evaluated
    # per element)
    base = df.select(
        key_col,
        ts_col,
        order_tiebreak,
        F.col(value_col).alias(value_col),
        F.collect_list(F.col(value_col).cast("double")).over(w).alias("_vals"),
    )
    vals = F.col("_vals")
    length = F.size(vals)
    pow2 = F.array(*[F.lit(float(1 << k)) for k in range(n_trailing)])
    # element i (1-based, oldest-first) sits L-i steps before the
    # current row -> weight 2^-(L-i)
    terms = F.zip_with(
        vals,
        F.sequence(F.lit(1), length),
        lambda v, i: v / F.element_at(pow2, length - i + 1),
    )
    weights = F.transform(
        F.sequence(F.lit(1), length),
        lambda i: F.lit(1.0) / F.element_at(pow2, length - i + 1),
    )
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x
    )
    return base.select(
        key_col,
        ts_col,
        order_tiebreak,
        value_col,
        length.alias("n_win"),
        (fold(terms) / fold(weights)).alias("ewma"),
    )


def ohlc_bars(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    step: str = "15 minutes",
) -> DataFrame:
    """Downsample a (key, ts, value) stream to OHLC bars per bucket:
    open/high/low/close, tick count, and a decimal-exact value sum —
    the classic telemetry/market resample.

    Open and close are decided by an explicit total order
    (ts, then a tiebreak column if present — the corpus has unique
    timestamps per key, but determinism must not depend on data
    luck): ONE window pass assigns first/last row numbers, then a
    single aggregate per (key, bucket) folds everything. The groupBy
    reuses the window's hash partitioning, so the whole resample is
    one exchange. At 100 TB this is the standard keyed-shuffle shape;
    bars per key-bucket are tiny and skew-free.
    """
    from demo_flink_spark.operators.relational import dsum

    b = bucket(F.col(ts_col), step).alias("bucket_ts")
    tie = (
        [F.col("event_id")] if "event_id" in df.columns else []
    )
    base = df.select(
        F.col(key_col).alias("key"), b, F.col(ts_col).alias("_ts"),
        F.col(value_col).alias("v"), *tie
    )
    order = [F.col("_ts").asc(), *[t.asc() for t in tie]]
    w = Window.partitionBy("key", "bucket_ts")
    rn_a = F.row_number().over(w.orderBy(*order))
    rn_d = F.row_number().over(
        w.orderBy(F.col("_ts").desc(), *[t.desc() for t in tie])
    )
    marked = base.select(
        "key", "bucket_ts", "v", rn_a.alias("_ra"), rn_d.alias("_rd")
    )
    return marked.groupBy("key", "bucket_ts").agg(
        F.count(F.lit(1)).cast("long").alias("n_ticks"),
        F.max(F.when(F.col("_ra") == 1, F.col("v"))).alias("open"),
        F.max("v").alias("high"),
        F.min("v").alias("low"),
        F.max(F.when(F.col("_rd") == 1, F.col("v"))).alias("close"),
        dsum(F.col("v")).alias("vsum"),
    )


def acf_exact(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    max_lag: int = 4,
) -> DataFrame:
    """Per-key sample autocorrelation at lags 1..max_lag — the
    seasonality/persistence probe behind cadence detection and
    forecast-model selection (batch oracle for the reference's keyed
    aggregation lineage, WindowWordCount.java:20-23 → SURVEY A1/A2 ext,
    applied to the time-series family like ts_linear_trend):

        r_k = Σ_{t>k} (y_t − ȳ)(y_{t−k} − ȳ) / Σ_t (y_t − ȳ)²

    computed BIT-IDENTICALLY cross-engine via the `ts_linear_trend`
    integer-sufficient-statistics recipe: with y in cents and
    S = Σy, n·(y_t − ȳ) = n·y_t − S termwise, so numerator·n² and
    denominator·n² are EXACT decimal(38,0) sums of integer products;
    the n² factors cancel in the ratio and only the final division is
    a double. No rounding step anywhere. Overflow bound: n³·y² per
    key must stay < 10³⁸ — with cents ≤ 10⁵ that is ~10⁹ rows per
    key, far past any per-key series this engine targets (partition a
    longer series by epoch first).

    Scale shape: the per-key total (count·y − S) and the lag columns
    ride ONE key-partitioned exchange (both window specs share the
    partition key, Spark reuses the partitioning); the final per-key
    aggregate is map-side combinable. Nothing is collected; output is
    |keys|·max_lag rows.
    """
    if max_lag < 1:
        raise ValueError("max_lag must be >= 1")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.round(F.col(value_col) * 100).cast("decimal(38,0)").alias("y"),
    )
    wp = Window.partitionBy("key")
    wo = Window.partitionBy("key").orderBy("ts", "tb")
    centered = base.select(
        "key",
        "ts",
        "tb",
        (
            F.count(F.lit(1)).over(wp).cast("decimal(38,0)") * F.col("y")
            - F.sum("y").over(wp)
        ).alias("c"),
    )
    lagged = centered.select(
        "key",
        "c",
        *[
            F.lag("c", k).over(wo).alias(f"c{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    agg = lagged.groupBy("key").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.expr("c * c")).alias("den"),
        *[
            F.sum(F.expr(f"c * c{k}")).alias(f"num{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    acfs = agg.select(
        "key",
        "n",
        *[
            F.when(
                F.col("den") != 0,
                F.col(f"num{k}").cast("double")
                / F.col("den").cast("double"),
            )
            .otherwise(F.lit(0.0))
            .alias(f"acf{k}")
            for k in range(1, max_lag + 1)
        ],
    )
    stack_args = ", ".join(f"{k}, acf{k}" for k in range(1, max_lag + 1))
    return acfs.select(
        F.col("key").alias(key_col),
        "n",
        F.expr(f"stack({max_lag}, {stack_args}) as (lag, acf)"),
    )


def seasonal_naive_eval(
    df: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    tiebreak_col: str = "event_id",
    value_col: str = "value",
    season: int = 24,
) -> DataFrame:
    """Backtest of the seasonal-naive forecast ŷ_t = y_{t−season} per
    key — the mandatory baseline every forecasting pipeline must beat,
    and the cheapest cadence sanity check (a LOW seasonal-naive error
    at lag m is evidence of period-m seasonality, the actionable twin
    of `acf_exact`).

    Metrics, ALL integers (the rollup lesson — no float in the
    contract):
      mae_micros   — mean |y_t − ŷ_t| in value-micros,
      smape_micros — mean of 2|y−ŷ|/(|y|+|ŷ|) (0 when both are 0),
                     each term a 6dp round-half-away INTEGER ratio,
                     so the mean is exact integer arithmetic,
      mase_micros  — MAE relative to the in-sample lag-1 naive
                     (Hyndman's scaled error), integer cross-division.

    Values are cents (exact off-tie rounding as in linear_trend);
    every numerator/denominator stays in decimal(38,0)/HUGEINT, and
    each division is the (2a+b) div 2b half-away form.

    Scale: ONE key-partitioned window provides both lags; the metric
    aggregate is map-side combinable. O(1) state per row, |keys| rows
    out.
    """
    if season < 2:
        raise ValueError("season must be >= 2 (use 1 and MASE=1 otherwise)")
    base = df.filter(F.col(value_col).isNotNull()).select(
        F.col(key_col).alias("key"),
        F.col(ts_col).alias("ts"),
        F.col(tiebreak_col).alias("tb"),
        F.round(F.col(value_col) * 100).cast("decimal(38,0)").alias("y"),
    )
    wo = Window.partitionBy("key").orderBy("ts", "tb")
    lagged = base.select(
        "key",
        "y",
        F.lag("y", season).over(wo).alias("ym"),
        F.lag("y", 1).over(wo).alias("y1"),
    )
    em = F.abs(F.col("y") - F.col("ym"))
    e1 = F.abs(F.col("y") - F.col("y1"))
    # (2a + b) div 2b half-away integer division, a = 2*em*1e6, b = sden
    smape_term = F.expr(
        "CASE WHEN ym IS NULL THEN NULL"
        " WHEN abs(y) + abs(ym) = 0 THEN CAST(0 AS DECIMAL(38,0))"
        " ELSE CAST((4 * abs(y - ym) * 1000000 + (abs(y) + abs(ym)))"
        "      div (2 * (abs(y) + abs(ym))) AS DECIMAL(38,0)) END"
    )
    agg = lagged.groupBy("key").agg(
        F.count("ym").cast("decimal(38,0)").alias("nm"),
        F.count("y1").cast("decimal(38,0)").alias("n1"),
        F.sum(em).alias("sem"),
        F.sum(e1).alias("se1"),
        F.sum(smape_term).alias("ssm"),
    )
    # cents -> value micros: * 1e4
    mae = F.expr("(2 * sem * 10000 + nm) div (2 * nm)")
    smape = F.expr("(2 * ssm + nm) div (2 * nm)")
    # MASE = (sem/nm) / (se1/n1) = sem*n1 / (se1*nm), in micros
    mase = F.when(
        (F.col("se1") != 0) & (F.col("nm") != 0),
        F.expr("(2 * sem * n1 * 1000000 + se1 * nm) div (2 * se1 * nm)"),
    )
    return agg.filter(F.col("nm") > 0).select(
        F.col("key").alias(key_col),
        F.col("nm").cast("long").alias("n_eval"),
        mae.cast("long").alias("mae_micros"),
        smape.cast("long").alias("smape_micros"),
        mase.cast("long").alias("mase_micros"),
    )


def stl_decompose(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    period_hours: int = 24,
    half_window_hours: int = 12,
) -> DataFrame:
    """STL-lite additive decomposition of per-key hourly count series:

        cnt = trend + seasonal + residual

    - trend: centered moving average over a RANGE frame of
      ±`half_window_hours` on the epoch axis (a time-range frame, not
      a rows frame, so irregular/gappy series window correctly —
      hours with no bucket simply contribute nothing);
    - seasonal: per-(key, phase) mean of the detrended series, phase =
      `(epoch_s div 3600) % period_hours` — the hour index on the
      epoch axis modulo the period, so non-divisor-of-24 periods
      (weekly = 168) keep their full cycle instead of collapsing to
      hour-of-day. Contract: ts >= 1970 (Spark's `div` truncates
      toward zero, DuckDB's `//` floors; they agree only for
      non-negative epochs);
    - residual: what's left.

    Classic STL iterates loess fits; this single-pass MA/phase-mean
    form is the standard cheap decomposition for monitoring
    dashboards and anomaly baselines, and unlike loess it is exactly
    reproducible: every mean is round-half-away INTEGER division in
    micros (the covariance_triples recipe), so trend/seasonal/residual
    are exact integers, bit-identical on any engine and partitioning.

    Scale: one groupBy (hourly buckets ≈ |keys|·|hours| rows, tiny vs
    input), then two window passes over the bucketed series — per-key
    partitions, no cross-key traffic.
    """
    hourly = (
        events.groupBy(
            F.col(key_col).alias("key"),
            F.date_trunc("hour", F.col(ts_col)).alias("window_start"),
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
        .withColumn("epoch_s", F.unix_timestamp("window_start"))
    )
    half = half_window_hours * 3600
    win = (
        Window.partitionBy("key").orderBy("epoch_s").rangeBetween(-half, half)
    )
    t = hourly.select(
        "key",
        "window_start",
        "cnt",
        F.sum("cnt").over(win).alias("w_sum"),
        F.count(F.lit(1)).over(win).alias("w_n"),
        # phase off the epoch axis, NOT hour-of-day: hour() % p only
        # matches when p divides 24 — a weekly period (168) would
        # silently collapse to daily seasonality. Contract: ts >=
        # 1970 (Spark's `div` truncates toward zero, DuckDB's `//`
        # floors — they agree only for non-negative epochs)
        (F.expr("epoch_s div 3600") % period_hours).alias("phase"),
    ).withColumn(
        # round-half-away mean in micros: w_sum, w_n > 0 always
        "trend_micros",
        F.expr("(w_sum * 2000000 + w_n) div (2 * w_n)"),
    ).withColumn(
        "detr_micros", F.col("cnt") * 1000000 - F.col("trend_micros")
    )
    pw = Window.partitionBy("key", "phase")
    s = t.select(
        "key",
        "window_start",
        "cnt",
        "trend_micros",
        "detr_micros",
        F.sum("detr_micros").over(pw).alias("p_sum"),
        F.count(F.lit(1)).over(pw).alias("p_n"),
    ).withColumn(
        "seasonal_micros",
        F.expr(
            "(CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)"
            " * ((abs(p_sum) * 2 + p_n) div (2 * p_n))"
        ),
    )
    return s.select(
        "key",
        "window_start",
        "cnt",
        "trend_micros",
        "seasonal_micros",
        (F.col("detr_micros") - F.col("seasonal_micros")).alias(
            "residual_micros"
        ),
    )


def cross_correlation(
    events: DataFrame,
    type_a: str,
    type_b: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    step: str = "hour",
) -> DataFrame:
    """Pearson cross-correlation (lag 0) between two event types'
    bucketed count series — "do errors spike when clicks spike?", the
    bivariate companion to `acf_exact`'s univariate autocorrelation.

    The two series are aligned on the UNION of their buckets with
    missing buckets as 0 (a bucket where only one side fired is
    exactly the disagreement evidence the correlation must see;
    inner-joining would bias r upward). Counts are exact ints; all
    five sufficient statistics are decimal(38,0) sums; only the final
    r is double arithmetic (sqrt is correctly rounded everywhere) —
    bit-identical cross-engine.

    One bucket aggregate + one full-outer self-alignment on the
    bucket key + a scalar reduction.
    """
    b = (
        events.filter(F.col(key_col).isin([type_a, type_b]))
        .groupBy(
            F.date_trunc(step, F.col(ts_col)).alias("bucket"),
            F.col(key_col).alias("k"),
        )
        .agg(F.count(F.lit(1)).alias("c"))
    )
    a_side = b.filter(F.col("k") == type_a).select(
        "bucket", F.col("c").alias("ca")
    )
    b_side = b.filter(F.col("k") == type_b).select(
        "bucket", F.col("c").alias("cb")
    )
    aligned = (
        a_side.join(b_side, "bucket", "full_outer")
        .select(
            F.coalesce(F.col("ca"), F.lit(0)).cast("decimal(38,0)").alias("x"),
            F.coalesce(F.col("cb"), F.lit(0)).cast("decimal(38,0)").alias("y"),
        )
    )
    agg = aligned.agg(
        F.count(F.lit(1)).cast("decimal(38,0)").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
        F.sum(F.expr("y * y")).alias("syy"),
    )
    return agg.select(
        F.lit(type_a).alias("type_a"),
        F.lit(type_b).alias("type_b"),
        F.expr("CAST(n AS BIGINT)").alias("n_buckets"),
        (
            F.expr("CAST(n * sxy - sx * sy AS DOUBLE)")
            / (
                F.expr("sqrt(CAST(n * sxx - sx * sx AS DOUBLE))")
                * F.expr("sqrt(CAST(n * syy - sy * sy AS DOUBLE))")
            )
        ).alias("r"),
    )


def winsorize(
    df: DataFrame,
    key_col: str,
    value_col: str,
    tiebreak_col: str,
    lo_pct: int = 1,
    hi_pct: int = 99,
) -> DataFrame:
    """Per-key winsorization: clip values to the key's exact
    [p_lo, p_hi] rank-selected ELEMENTS — the standard tail-taming
    step before training on heavy-tailed features (cap, don't drop).

    Fences follow the `quantile_disc` float-free contract: elements
    at rank ⌊p·(n−1)⌋+1 under the (value, tiebreak) total order —
    bit-copied inputs, integer ranks, no interpolation — so the
    clipped output is always either the original value or an exact
    input element, and the whole operator carries a value-hash
    oracle. Emits `was_clipped` for audit.

    Plan: one keyed rank window to locate fences, a 1-row-per-key
    broadcast join back, then a narrow clip map. (At 100 TB locate
    the fences with `scale.sketch_residual_quantile` — same values —
    and keep only the clip map here.)
    """
    w = Window.partitionBy("k").orderBy("v", "tb")
    wn = Window.partitionBy("k")
    all_rows = df.select(
        F.col(key_col).alias("k"),
        F.col(value_col).alias("v"),
        F.col(tiebreak_col).alias("tb"),
    )
    # fences are computed over NON-NULL values only (Spark sorts NULLS
    # FIRST, DuckDB NULLS LAST — a nullable rank column would shift
    # fence ranks differently per engine), but NULL rows still PASS
    # THROUGH the clip: a winsorizer caps values, it never drops rows
    base = all_rows.filter(F.col("v").isNotNull())
    ranked = base.select(
        "k",
        "v",
        "tb",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    fences = ranked.groupBy("k").agg(
        F.max(
            F.when(
                F.expr(f"rn = (n - 1) * {lo_pct} div 100 + 1"), F.col("v")
            )
        ).alias("fence_lo"),
        F.max(
            F.when(
                F.expr(f"rn = (n - 1) * {hi_pct} div 100 + 1"), F.col("v")
            )
        ).alias("fence_hi"),
    )
    # explicit CASE on v IS NULL (not greatest/least NULL semantics,
    # which differ across engines): NULL value -> NULL winsorized,
    # was_clipped = false. Left join so keys whose values are ALL
    # NULL (no fence row) still emit their rows.
    return (
        all_rows.join(F.broadcast(fences), "k", "left")
        .select(
            F.col("k").alias(key_col),
            F.col("tb").alias(tiebreak_col),
            F.col("v").alias(value_col),
            F.when(
                F.col("v").isNull(), F.lit(None).cast(df.schema[value_col].dataType)
            )
            .otherwise(
                F.greatest(
                    F.least(F.col("v"), F.col("fence_hi")), F.col("fence_lo")
                )
            )
            .alias("value_winsorized"),
            F.when(F.col("v").isNull(), F.lit(False))
            .otherwise(
                (F.col("v") < F.col("fence_lo"))
                | (F.col("v") > F.col("fence_hi"))
            )
            .alias("was_clipped"),
        )
    )
