"""Reusable relational building blocks.

The reference has no joins/sorts/analytic functions (SURVEY §2.3, §2.7,
§2.8 — verified absent), but the engine's north star is full analytics
capability, so these are first-class extensions. Everything here is
declarative DataFrame API: Catalyst picks broadcast-hash vs sort-merge,
pushes filters into scans, and AQE re-plans skew at runtime.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dsum(expr: Column) -> Column:
    """Deterministic double sum: accumulate exactly in decimal(38,6),
    surface as double.

    Plain double sums are partition-order dependent (float addition is
    non-associative), so the same query can hash differently run to
    run — and will never bit-match another engine. Casting each term
    to decimal makes the sum exact and order-independent; the final
    double cast is deterministic. SQL twin:
    ``CAST(SUM(CAST(e AS DECIMAL(38,6))) AS DOUBLE)``.
    """
    return F.sum(expr.cast("decimal(38,6)")).cast("double")


def davg(expr: Column) -> Column:
    """Deterministic average via exact decimal sum / non-null count."""
    return dsum(expr) / F.count(expr)


def _iunits(expr: Column, scale: int) -> Column:
    """Exact integer units: round(x·scale) as long.

    Contract: x carries at most log10(scale) decimal digits (money
    columns store 2), so x·scale sits within 1e-9 of an integer and
    both engines' integer rounding (Spark HALF_UP on the exact binary
    expansion, DuckDB half-away on the float product) land on the SAME
    integer — never at a .5 boundary.
    """
    return F.round(expr * F.lit(scale), 0).cast("long")


# Second-moment aggregates (stddev/covar/corr) quantize inputs to
# integer units and do ALL accumulation and cancellation in exact
# decimal(38,0) integer arithmetic, casting to double only at the end.
#
# Why not decimal(38,10) sums cast to double (the r1-r3 form)? The
# scale-10 integer behind Σx² exceeds 2^53, and DuckDB casts such a
# decimal to double as double(int128)/1e10 — TWO roundings — while
# Spark's BigDecimal.doubleValue rounds once. The 1-ulp input gap is
# then amplified ~1e4× by the Σxy − ΣxΣy/n cancellation (seen as the
# agg_corr_covar 1e-10 mismatch in round 4). A SCALE-0 decimal cast
# is one IEEE add in DuckDB (upper·2^64 + lower, both exact) and
# correctly rounded in Spark — bit-identical in both engines at any
# magnitude — so quantize → integer math → one final cast is exact
# through the cancellation and deterministic after it.


def dstddev_samp(expr: Column, scale: int = 100) -> Column:
    """Deterministic sample stddev via exact integer second moments.

    sqrt(d(n·Σx² − (Σx)²) / d(n·(n−1))) / scale, where x is quantized
    to integer units (see `_iunits`), the variance numerator is EXACT
    decimal integer math, and d(·) is the scale-0 decimal→double cast
    both engines perform identically.
    """
    xi = _iunits(expr, scale)
    n = F.count(expr)
    sx = F.sum(xi.cast("decimal(38,0)"))
    sxx = F.sum((xi * xi).cast("decimal(38,0)"))
    num = (n.cast("decimal(38,0)") * sxx - sx * sx).cast("double")
    den = (n * (n - F.lit(1))).cast("double")
    return F.when(n > 1, F.sqrt(num / den) / F.lit(float(scale)))


def dcovar_samp(x: Column, y: Column, scale_x: int = 100, scale_y: int = 100) -> Column:
    """Deterministic sample covariance via exact integer moments.

    d(n·Σxy − Σx·Σy) / d(n·(n−1)) / (scale_x·scale_y): the
    cancellation happens in exact decimal integers; only the final
    quotient is floating point (identical IEEE tree in the SQL twin).
    """
    xi, yi = _iunits(x, scale_x), _iunits(y, scale_y)
    n = F.count(x)
    sx = F.sum(xi.cast("decimal(38,0)"))
    sy = F.sum(yi.cast("decimal(38,0)"))
    sxy = F.sum((xi * yi).cast("decimal(38,0)"))
    num = (n.cast("decimal(38,0)") * sxy - sx * sy).cast("double")
    den = (n * (n - F.lit(1))).cast("double")
    return F.when(n > 1, num / den / F.lit(float(scale_x * scale_y)))


def dcorr(x: Column, y: Column, scale_x: int = 100, scale_y: int = 100) -> Column:
    """Deterministic Pearson correlation via exact integer moments.

    d(n·Σxy − Σx·Σy) / sqrt(d(n·Σx² − Σx²) · d(n·Σy² − Σy²)) — scale
    factors cancel, every cancellation is exact integer math, and the
    remaining float ops (cast, multiply, sqrt, divide) are identical
    IEEE trees cross-engine.
    """
    xi, yi = _iunits(x, scale_x), _iunits(y, scale_y)
    n = F.count(x).cast("decimal(38,0)")
    sx = F.sum(xi.cast("decimal(38,0)"))
    sy = F.sum(yi.cast("decimal(38,0)"))
    sxy = F.sum((xi * yi).cast("decimal(38,0)"))
    sxx = F.sum((xi * xi).cast("decimal(38,0)"))
    syy = F.sum((yi * yi).cast("decimal(38,0)"))
    num = (n * sxy - sx * sy).cast("double")
    vx = (n * sxx - sx * sx).cast("double")
    vy = (n * syy - sy * sy).cast("double")
    denom = F.sqrt(vx * vy)
    return F.when(denom > 0, num / denom)


def top_k_per_group(
    df: DataFrame,
    part_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int,
    rank_col: str = "rk",
) -> DataFrame:
    """Top-k rows per group via row_number.

    SURVEY §2.7 extension. One shuffle on the partition key; at 100 TB
    prefer this over a global sort — the window sorts within
    partitions only, never globally. `order_cols` must be a total
    order (include a unique tiebreaker) for deterministic output.
    """
    w = Window.partitionBy(*part_cols).orderBy(*order_cols)
    return df.withColumn(rank_col, F.row_number().over(w).cast("long")).filter(
        F.col(rank_col) <= k
    )


def softln_ratio(num: Column, den: Column) -> Column:
    """Engine-portable ln(num/den) for integer columns with
    0 < num <= den: an explicit +,*,/ expression tree that any engine
    evaluates to the SAME IEEE doubles — unlike builtin ln(), whose
    last-ulp behavior is libm-specific and breaks cross-engine hash
    equality wherever a rounded value straddles a boundary (seen at
    sf0.1 on lm_bigram_score).

    Range-reduce exactly: q = floor(den/num) (exact: quotients of
    <= 2^53 integers floor correctly in double); k = bitlength(q)
    puts r = num*2^k/den in (1, 2] with 2^k an exact power of two and
    ONE double division; then ln(r) = 2*atanh((r-1)/(r+1)) via a fixed
    10-term Horner series (|y| <= 1/3 -> error < ~1e-10), and
    ln(x) = ln(r) - k*ln2 with ln2 a shared literal. The SQL twin is
    `softln_ratio_sql`; the arithmetic SHAPE is the contract — keep
    them in lockstep.
    """
    q = F.floor(den.cast("double") / num.cast("double")).cast("long")
    k = F.length(F.bin(q))
    pow2k = F.pow(F.lit(2.0), k.cast("double"))  # exact power of two
    r = (num.cast("double") * pow2k) / den.cast("double")
    y = (r - F.lit(1.0)) / (r + F.lit(1.0))
    t = y * y
    h = F.lit(1.0) / F.lit(19.0)
    for c in (17.0, 15.0, 13.0, 11.0, 9.0, 7.0, 5.0, 3.0):
        h = h * t + F.lit(1.0) / F.lit(c)
    series = F.lit(2.0) * y * (h * t + F.lit(1.0))
    return series - k.cast("double") * F.lit(0.6931471805599453)


def softln_ratio_sql(num: str, den: str) -> str:
    """DuckDB twin of `softln_ratio` — same expression tree, same
    literals, same association order."""
    q = f"CAST(floor(CAST({den} AS DOUBLE) / CAST({num} AS DOUBLE)) AS BIGINT)"
    k = f"length(bin({q}))"
    pow2k = f"pow(2.0, CAST({k} AS DOUBLE))"
    r = f"((CAST({num} AS DOUBLE) * {pow2k}) / CAST({den} AS DOUBLE))"
    y = f"(({r} - 1.0) / ({r} + 1.0))"
    t = f"({y} * {y})"
    h = "(1.0 / 19.0)"
    for c in ("17.0", "15.0", "13.0", "11.0", "9.0", "7.0", "5.0", "3.0"):
        h = f"({h} * {t} + 1.0 / {c})"
    series = f"(2.0 * {y} * ({h} * {t} + 1.0))"
    return f"({series} - CAST({k} AS DOUBLE) * 0.6931471805599453)"


def profile_table(
    df: DataFrame,
    columns: Sequence[str] | None = None,
    exact_ndv: bool = True,
) -> DataFrame:
    """Single-pass column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per column — the ANALYZE/data-quality
    primitive every warehouse runs before trusting a new feed.

    With exact_ndv=True (the declared oracle query's mode): two jobs
    total, independent of table width — one fused aggregation for
    rows/nulls/min/max (map-side partials, native-typed buffers), and
    one stack()-melt + two-stage hash aggregate for EXACT ndv of
    every column at once (multiple countDistincts in a single agg
    would Expand the input |cols|+1 times — 10x slower, measured).
    A naive per-column loop would instead scan the table |columns|
    times. min/max surface as strings so heterogeneous column types
    share one schema.

    With exact_ndv=False (the 100x-scale path, VERDICT r12 #4):
    approx_count_distinct(c, rsd=0.02) per column rides INSIDE the
    single wide aggregation — ONE table pass total, fixed-size HLL++
    sketches merged map-side, no Expand, and crucially no melt
    shuffle whose width is every column's VALUES (the exact melt
    moves |rows|x|cols| cast strings; the sketch path moves a few KB
    per column per partition). Profiling tolerates the ~2% relative
    error; the DuckDB oracle requires exactness, so the declared
    query keeps exact_ndv=True and the approx path's error bound is
    pinned by tests/test_round13.py::test_profile_approx_ndv_bound.
    """
    cols = list(columns) if columns is not None else list(df.columns)
    aggs = [F.count(F.lit(1)).alias("__n_rows")]
    for c in cols:
        col = F.col(c)
        aggs += [
            F.count(col).alias(f"__nn_{c}"),
            F.min(col).cast("string").alias(f"__min_{c}"),
            F.max(col).cast("string").alias(f"__max_{c}"),
        ]
        if not exact_ndv:
            # rsd 0.02: ~2% standard relative error, 4 KB sketch/col
            aggs.append(
                F.approx_count_distinct(col, rsd=0.02).alias(f"__nd_{c}")
            )
    wide_df = df.agg(*aggs)
    if not exact_ndv:
        wide = wide_df.first()
        ndv = {c: wide[f"__nd_{c}"] for c in cols}
        rows = [
            (
                c,
                wide["__n_rows"],
                wide["__n_rows"] - wide[f"__nn_{c}"],
                ndv.get(c, 0),
                wide[f"__min_{c}"],
                wide[f"__max_{c}"],
            )
            for c in cols
        ]
        return df.sparkSession.createDataFrame(
            rows,
            "column string, n_rows long, n_null long, n_distinct long, "
            "min_value string, max_value string",
        )
    # Exact ndv for ALL columns via ONE melt + two-stage distinct:
    # multiple countDistinct aggregates in one agg make Catalyst plan
    # an Expand (|cols|+1 copies of every row through the aggregate —
    # 10x this query's cost measured at sf0.1). stack() melts to
    # (column, value) narrow rows instead; the distinct then runs as
    # an ordinary two-level hash aggregate. String-casting for the
    # melt is fine: the cast is injective per column, and ndv only
    # counts distinction. Exact ndv is what the DuckDB oracle
    # requires.
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column, val)")
    )
    ndv_df = (
        melted.filter(F.col("val").isNotNull())
        .groupBy("column", "val")
        .agg(F.lit(1))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    # The wide aggregate and the melt-distinct are INDEPENDENT jobs
    # over the same scan; submit them concurrently (guide §2.6 —
    # actions are only sequential because driver code calls them
    # sequentially) so the slower job's tail back-fills the other's
    # executors and the operator's wall clock is max(t1, t2), not
    # t1 + t2. Results are unchanged — both jobs are deterministic.
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as pool:
        wide_fut = pool.submit(wide_df.first)
        ndv_rows = pool.submit(ndv_df.collect).result()
        wide = wide_fut.result()
    ndv = {r["column"]: r["nd"] for r in ndv_rows}
    rows = [
        (
            c,
            wide["__n_rows"],
            wide["__n_rows"] - wide[f"__nn_{c}"],
            ndv.get(c, 0),
            wide[f"__min_{c}"],
            wide[f"__max_{c}"],
        )
        for c in cols
    ]
    spark = df.sparkSession
    return spark.createDataFrame(
        rows,
        "column string, n_rows long, n_null long, n_distinct long, "
        "min_value string, max_value string",
    )
