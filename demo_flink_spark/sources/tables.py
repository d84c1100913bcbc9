"""Batch table sources: the driver's parquet star schema.

Reference parity: the reference's bounded sources are in-memory
collections (`UserClickCounter.java:19-26`, `FraudDetectorExample.java:47-59`);
our batch source is the parquet scan, which at 100 TB is where
predicate pushdown + column pruning + partition pruning happen. Every
query in the engine goes through `load_table` so scans stay
declarative (`spark.read.parquet`) and Catalyst prunes them.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

# The driver-generated tables (TESTDATA.md). Names double as the
# DuckDB oracle view names.
TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Scan one parquet table. Columns/filters prune at the scan.

    `events.ts` is stored as TIMESTAMP(NANOS), which Spark only reads
    via `spark.sql.legacy.parquet.nanosAsLong` (long nanos). Convert to
    a microsecond timestamp — the same floor-truncation DuckDB applies
    when it reads the file — so both engines see identical instants.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; known: {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        from pyspark.sql import functions as F

        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() queries."""
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
