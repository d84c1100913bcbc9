"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``demo_flink_spark``; this module only
publishes the registry (demo_flink_spark/plans).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from demo_flink_spark.plans import all_specs


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    The reference's signature computation (`AdvancedWordCount.java:30-42`)
    over the `documents` corpus: normalize → tokenize → stopword filter
    → per-word counts, top words first.
    """
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.wordcount import advanced_word_count
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents")
    return advanced_word_count(docs, "text").orderBy(F.desc("cnt"), F.asc("word"))


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return {
        name: spec.oracle
        for name, spec in all_specs().items()
        if spec.oracle is not None
    }
