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
