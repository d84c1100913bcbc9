"""Z-order layout: Morton-key correctness and the actual data-skipping
benefit, measured from parquet file statistics."""

from __future__ import annotations

import glob
import os
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from demo_flink_spark.operators.scale import zorder_value, zorder_write
from demo_flink_spark.sources.tables import load_table

SF_DIR = "/root/testdata/sf0.001"


def _interleave2(x: int, y: int, bits: int) -> int:
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b + 1)
        z |= ((y >> b) & 1) << (2 * b)
    return z


def test_zorder_value_matches_reference_interleave(spark):
    rows = [(x, y) for x in (0, 1, 5, 255) for y in (0, 3, 128, 255)]
    df = spark.createDataFrame(rows, "x long, y long").withColumn(
        "z", zorder_value([F.col("x"), F.col("y")], bits=8)
    )
    for r in df.collect():
        assert r["z"] == _interleave2(r["x"], r["y"], 8), (r["x"], r["y"])


def _avg_file_range(path: str, col: str) -> float:
    """Mean (max-min) of a column across the parquet files — the
    quantity min/max skipping actually depends on."""
    spans = []
    for f in glob.glob(os.path.join(path, "*.parquet")):
        md = pq.read_metadata(f)
        lo = min(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.min
            for i in range(md.num_row_groups)
        )
        hi = max(
            md.row_group(i).column(
                next(
                    j
                    for j in range(md.row_group(i).num_columns)
                    if md.row_group(i).column(j).path_in_schema == col
                )
            ).statistics.max
            for i in range(md.num_row_groups)
        )
        spans.append(hi - lo)
    assert spans
    return sum(spans) / len(spans)


def test_zorder_write_narrows_file_stats_on_both_columns(spark):
    orders = load_table(spark, SF_DIR, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    n_files = 8
    with tempfile.TemporaryDirectory() as d:
        plain, single, zz = f"{d}/plain", f"{d}/single", f"{d}/z"
        # hash-spread layout: every file sees the whole value range
        orders.repartition(n_files).write.parquet(plain)
        # single-column sort: perfect on custkey, useless on price
        orders.repartitionByRange(n_files, "o_custkey").sortWithinPartitions(
            "o_custkey"
        ).write.parquet(single)
        zorder_write(orders, zz, ["o_custkey", "o_totalprice"], n_files=n_files)

        assert (
            spark.read.parquet(zz).count() == orders.count()
        )  # layout only, no data change

        cust_plain = _avg_file_range(plain, "o_custkey")
        cust_z = _avg_file_range(zz, "o_custkey")
        price_plain = _avg_file_range(plain, "o_totalprice")
        price_single = _avg_file_range(single, "o_totalprice")
        price_z = _avg_file_range(zz, "o_totalprice")

        # z-order narrows BOTH dimensions vs the hash layout...
        assert cust_z < 0.6 * cust_plain
        assert price_z < 0.6 * price_plain
        # ...while the single-column sort leaves the second dimension
        # as wide as the hash layout (the gap z-order closes)
        assert price_single > 0.9 * price_plain
