"""Physical-layout operators: multi-dimensional clustering keys.

At 100 TB the single biggest scan-cost lever after partition pruning
is FILE-level pruning: when a table is sorted/clustered so each file
covers a narrow range of the filter columns, min/max footer stats let
the reader skip most files. A plain lexicographic sort only prunes on
the leading column; a Z-ORDER (Morton) key interleaves the bits of
several columns so files cluster in ALL of them at once — the layout
step behind `OPTIMIZE ... ZORDER BY` in lakehouse engines and
`CLUSTER BY` in cloud warehouses.

Division of labor with `operators/scale.py`: `scale.zorder_write` is
the end-to-end PHYSICAL writer (N columns, float equal-width buckets
— fine for a layout pass, where a last-ulp bucket-edge difference
moves a row one file over) and owns the file-stat pruning test; THIS
module is the exact-arithmetic key computation — pure BIGINT
quantization, lazy in-plan min/max, bit-identical on any engine — so
the key itself is a declared, value-hash-oracle-checked query
(`layout_zorder_part`). Both share one interleaver
(`scale.zorder_value`).

Everything is exact integer arithmetic so the key is bit-identical on
any engine/partitioning and the whole operator carries a value-hash
oracle:

- quantize: q(x) = (x - min) * (2^bits - 1) div (max - min) over
  BIGINTs (min/max ride a broadcast 1-row aggregate, in-plan — no
  eager driver collect); a constant column quantizes to 0.
- interleave: zkey = Σ_i ((qx >> i) & 1) << (2i)  |  ((qy >> i) & 1)
  << (2i+1) — an unrolled 2·bits-term bitwise expression that stays
  inside whole-stage codegen (no UDF, no shuffle; the only exchange
  in the operator is the 1-row min/max aggregate's).

A Hilbert curve has strictly better locality (no Z-shaped jumps) but
needs stateful bit transposition that only pays off at very high
dimension counts; Z-order is what production lakehouse optimizers
ship, so that is what this implements.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _interleave2(qx: Column, qy: Column, bits: int) -> Column:
    """Morton-interleave two `bits`-bit non-negative ints: x takes the
    even bit positions, y the odd ones. Delegates to the write-path's
    `scale.zorder_value` (same unrolled shift/AND/OR expression; its
    column order puts cols[0] on the HIGH bit of each pair, so
    [qy, qx] yields qx-even / qy-odd) — one interleaver, two callers:
    the float-bucketed physical writer (`scale.zorder_write`) and
    this exact-integer, oracle-checked key."""
    from demo_flink_spark.operators.scale import zorder_value

    return zorder_value([qy, qx], bits=bits)


def zorder_key(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
) -> DataFrame:
    """Append an exact Z-order (Morton) clustering key over two
    integer-valued columns: each column is min-max quantized to
    `bits` bits with pure BIGINT arithmetic, then bit-interleaved.

    Returns the input columns plus (qx, qy, zkey). Sorting/range-
    partitioning the table by `zkey` before writing gives min/max
    file stats that prune on BOTH columns. 2·bits must stay < 63
    so the key fits a signed BIGINT.

    Range caveat: the quantizer computes (x - min) * (2^bits - 1) in
    BIGINT, so a column whose span exceeds 2^63 / 2^bits (~1.4e14 at
    bits=16 — e.g. an epoch-MICROSECONDS axis spanning years) raises
    a loud ANSI overflow rather than silently wrapping; pre-scale
    such columns (epoch seconds/hours) or lower `bits`.
    """
    if 2 * bits >= 63:
        raise ValueError(f"2*bits must be < 63, got bits={bits}")
    top = (1 << bits) - 1
    stats = df.agg(
        F.min(col_x).cast("long").alias("_minx"),
        F.max(col_x).cast("long").alias("_maxx"),
        F.min(col_y).cast("long").alias("_miny"),
        F.max(col_y).cast("long").alias("_maxy"),
    )
    # exact integer quantization (div, not double /: a cast of true
    # division would round); a constant column (max == min) maps to
    # bucket 0 rather than dividing by zero
    qx = F.when(
        (F.col("_maxx") - F.col("_minx")) == 0, F.lit(0).cast("long")
    ).otherwise(
        F.expr(f"((CAST({col_x} AS BIGINT) - _minx) * {top}) div (_maxx - _minx)")
    )
    qy = F.when(
        (F.col("_maxy") - F.col("_miny")) == 0, F.lit(0).cast("long")
    ).otherwise(
        F.expr(f"((CAST({col_y} AS BIGINT) - _miny) * {top}) div (_maxy - _miny)")
    )
    out = (
        df.crossJoin(F.broadcast(stats))
        .withColumn("qx", qx)
        .withColumn("qy", qy)
        .withColumn("zkey", _interleave2(F.col("qx"), F.col("qy"), bits))
        .drop("_minx", "_maxx", "_miny", "_maxy")
    )
    return out


def zorder_locality_report(
    df: DataFrame,
    col_x: str,
    col_y: str,
    bits: int = 16,
    n_files: int = 64,
) -> DataFrame:
    """Would Z-ordering actually prune? Simulate a `n_files`-file
    layout under (a) lexicographic (col_x, col_y) order and (b) zkey
    order, and report the average per-file min/max WIDTH of each
    column as a fraction of its full range (micros). Narrow widths ⇒
    footer stats prune; a lexicographic layout shows ~full-range
    widths on the second column, the Z-layout splits the budget.

    PYTEST-ONLY diagnostic (not a declared query): NTILE over a
    global order is the single-partition-sort anti-pattern this repo
    bans from declared plans (the linkage_sorted_neighborhood
    lesson). The report exists to PROVE the layout effect in tests;
    a production-scale version would assign files with
    `repartitionByRange` boundaries instead of a global window.
    """
    from pyspark.sql.window import Window

    z = zorder_key(df, col_x, col_y, bits)
    lex = Window.orderBy(F.col(col_x), F.col(col_y))
    zor = Window.orderBy(F.col("zkey"))
    tiles = z.select(
        F.col(col_x).cast("long").alias("x"),
        F.col(col_y).cast("long").alias("y"),
        F.ntile(n_files).over(lex).alias("f_lex"),
        F.ntile(n_files).over(zor).alias("f_z"),
    )

    def report(file_col: str, label: str) -> DataFrame:
        per = tiles.groupBy(file_col).agg(
            (F.max("x") - F.min("x")).alias("wx"),
            (F.max("y") - F.min("y")).alias("wy"),
        )
        g = tiles.agg(
            (F.max("x") - F.min("x")).alias("gx"),
            (F.max("y") - F.min("y")).alias("gy"),
        )
        # gx/gy are constant (broadcast 1-row): max() makes them
        # legal inside the ungrouped aggregate. greatest(..., 1)
        # guards a constant input column (gx or gy == 0): every
        # per-file width is 0 too, so the report correctly shows 0
        # instead of an ANSI divide-by-zero crash.
        return per.crossJoin(F.broadcast(g)).agg(
            F.lit(label).alias("layout"),
            F.expr(
                "CAST((sum(wx) * 1000000 * 2 + count(*) * greatest(max(gx), 1))"
                " div (2 * count(*) * greatest(max(gx), 1)) AS BIGINT)"
            ).alias("avg_width_x_micros"),
            F.expr(
                "CAST((sum(wy) * 1000000 * 2 + count(*) * greatest(max(gy), 1))"
                " div (2 * count(*) * greatest(max(gy), 1)) AS BIGINT)"
            ).alias("avg_width_y_micros"),
        )

    return report("f_lex", "lexicographic").unionByName(report("f_z", "zorder"))
