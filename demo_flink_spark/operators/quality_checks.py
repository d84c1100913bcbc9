"""Data-quality constraint checking and shuffle-skew diagnostics —
the operational side of running a 100 TB corpus/warehouse build.

- `dq_report`: Deequ-style declarative constraints (completeness,
  key uniqueness, value ranges, accepted sets) evaluated in ONE
  multi-aggregate scan and emitted as a (check_name, numerator,
  denominator, ratio, passed) report. Pass/fail is decided by integer
  cross-multiplication against the threshold percentage — no float
  boundary — and the ratio is a single division of exact longs
  (engine-portable, same discipline as `gopher_quality_filter`).
- `skew_report`: per-key group-size distribution of a prospective
  shuffle key — row/key counts, the largest key's share, the
  sum-of-squares concentration (an HHI: 1/n_keys = uniform, 1.0 = one
  key), and exact interpolated percentiles of group sizes. This is
  the measurement that tells you whether a join/agg needs
  `scale.salted_join` / AQE skew handling BEFORE you burn a cluster
  run discovering it.

Scale shape: `dq_report` is one pass over the fact table (count /
conditional-count / count_distinct aggregates, map-side partials);
`skew_report` is the key-count aggregate (one shuffle on the key) plus
a bounded second aggregate over one row per DISTINCT key — never the
raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dq_report", "skew_report"]


def dq_report(
    df: DataFrame,
    completeness: dict[str, int] | None = None,
    unique: list[tuple[str, ...]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """One row per declared constraint: (check, n_good, n_total,
    ratio, passed).

    - completeness: col -> min percent non-null (integer pct).
    - unique: column tuples whose combination must be globally unique.
    - ranges: col -> inclusive [lo, hi] numeric bounds (100% required).
    - accepted: col -> allowed value set (100% required).

    All non-uniqueness constraints fold into ONE aggregate row;
    uniqueness adds one count_distinct per declared key (same scan,
    Spark expands it map-side). The per-check rows are then unpivoted
    from that single row with literal check names — a constant-width
    stack, not a second scan.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    rows: list[tuple[str, str, int]] = []  # (check name, agg alias, pct)
    for col, pct in (completeness or {}).items():
        a = f"c_{col}"
        aggs.append(F.count(col).alias(a))
        rows.append((f"completeness({col})>={pct}%", a, pct))
    for cols in unique or []:
        a = "u_" + "_".join(cols)
        aggs.append(F.count_distinct(*[F.col(c) for c in cols]).alias(a))
        rows.append((f"unique({','.join(cols)})", a, 100))
    for col, (lo, hi) in (ranges or {}).items():
        a = f"r_{col}"
        cond = F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi)
        aggs.append(F.sum(cond.cast("long")).alias(a))
        rows.append((f"range({col} in [{lo},{hi}])", a, 100))
    for col, vals in (accepted or {}).items():
        a = f"s_{col}"
        cond = F.col(col).isin(*vals)
        aggs.append(F.sum(cond.cast("long")).alias(a))
        rows.append((f"accepted({col})", a, 100))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', {alias}, {pct}L" for name, alias, pct in rows
    )
    report = one.selectExpr(
        "_n",
        f"stack({len(rows)}, {stack}) AS (check_name, n_good, min_pct)",
    )
    return report.select(
        "check_name",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("_n").cast("long").alias("n_total"),
        F.when(F.col("_n") > 0, F.col("n_good") / F.col("_n"))
        .otherwise(F.lit(1.0))
        .alias("ratio"),
        (F.col("n_good") * 100 >= F.col("min_pct") * F.col("_n")).alias(
            "passed"
        ),
    )


def skew_report(
    df: DataFrame, key: str, percentiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Group-size distribution of `key`: one summary row with
    (n_rows, n_keys, max_key_cnt, top1_share, hhi, p50_cnt, ...).

    top1_share and hhi (Σ cnt² / total²) are single divisions of
    exact integer aggregates; percentiles use Spark's exact
    interpolated `percentile`, which matches DuckDB `quantile_cont`
    (two-sided weighted form — same pairing as `percentile_exact`).
    """
    sizes = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    pcols = [
        F.expr(f"percentile(cnt, {p!r})").alias(f"p{int(p * 100)}_cnt")
        for p in percentiles
    ]
    # hhi staged as (ss/t)/t — two identical IEEE divisions on both
    # engines; a single t*t product would overflow long at ~3e9 rows
    return sizes.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_cnt"),
        (F.max("cnt") / F.sum("cnt")).alias("top1_share"),
        (
            (F.sum(F.col("cnt") * F.col("cnt")) / F.sum("cnt"))
            / F.sum("cnt")
        ).alias("hhi"),
        *pcols,
    )
