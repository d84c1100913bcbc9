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


def dstddev_samp(expr: Column) -> Column:
    """Deterministic sample stddev from exact decimal sums.

    sqrt((Σx² − (Σx)²/n) / (n−1)) with both sums accumulated in
    decimal. The per-row x² is IEEE-double deterministic; the sums are
    exact; the final formula is straight-line double math — identical
    in any engine that evaluates the same expression.
    """
    n = F.count(expr)
    sx = dsum(expr)
    sxx = F.sum((expr * expr).cast("decimal(38,10)")).cast("double")
    return F.when(n > 1, F.sqrt((sxx - sx * sx / n) / (n - F.lit(1))))


def dcovar_samp(x: Column, y: Column) -> Column:
    """Deterministic sample covariance from exact decimal sums.

    (Σxy − ΣxΣy/n) / (n−1), with Σxy/Σx/Σy accumulated in decimal so
    the result is partition-order independent (plain `covar_samp`
    streams doubles and drifts run to run). The same formula written in
    ANSI SQL with the same decimal casts is the DuckDB twin.
    """
    n = F.count(x)
    sx, sy = dsum(x), dsum(y)
    sxy = F.sum((x * y).cast("decimal(38,10)")).cast("double")
    return F.when(n > 1, (sxy - sx * sy / n) / (n - F.lit(1)))


def dcorr(x: Column, y: Column) -> Column:
    """Deterministic Pearson correlation from exact decimal sums.

    (n·Σxy − Σx·Σy) / sqrt((n·Σx² − Σx²)·(n·Σy² − Σy²)). Every sum is
    decimal-exact; the final expression is straight-line double math —
    bit-identical across engines and partitionings.
    """
    n = F.count(x)
    sx, sy = dsum(x), dsum(y)
    sxy = F.sum((x * y).cast("decimal(38,10)")).cast("double")
    sxx = F.sum((x * x).cast("decimal(38,10)")).cast("double")
    syy = F.sum((y * y).cast("decimal(38,10)")).cast("double")
    denom = F.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
    return F.when(denom > 0, (n * sxy - sx * sy) / denom)


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


def profile_table(df: DataFrame, columns: Sequence[str] | None = None) -> DataFrame:
    """Single-pass column profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) per column — the ANALYZE/data-quality
    primitive every warehouse runs before trusting a new feed.

    Two jobs total, independent of table width: one fused aggregation
    for rows/nulls/min/max (map-side partials, native-typed buffers),
    and one stack()-melt + two-stage hash aggregate for EXACT ndv of
    every column at once (multiple countDistincts in a single agg
    would Expand the input |cols|+1 times — 10x slower, measured).
    A naive per-column loop would instead scan the table |columns|
    times. min/max surface as strings so heterogeneous column types
    share one schema.
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
    wide = df.agg(*aggs).first()
    # Exact ndv for ALL columns via ONE melt + two-stage distinct:
    # multiple countDistinct aggregates in one agg make Catalyst plan
    # an Expand (|cols|+1 copies of every row through the aggregate —
    # 10x this query's cost measured at sf0.1). stack() melts to
    # (column, value) narrow rows instead; the distinct then runs as
    # an ordinary two-level hash aggregate. String-casting for the
    # melt is fine: the cast is injective per column, and ndv only
    # counts distinction.
    stack_args = ", ".join(
        f"'{c}', CAST(`{c}` AS STRING)" for c in cols
    )
    melted = df.select(
        F.expr(f"stack({len(cols)}, {stack_args}) AS (column, val)")
    )
    ndv = {
        r["column"]: r["nd"]
        for r in melted.filter(F.col("val").isNotNull())
        .groupBy("column", "val")
        .agg(F.lit(1))
        .groupBy("column")
        .agg(F.count(F.lit(1)).alias("nd"))
        .collect()
    }
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
