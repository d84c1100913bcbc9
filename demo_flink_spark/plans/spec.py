"""QuerySpec: one declared query = Spark callable + DuckDB oracle."""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    """A named query in the engine's declared inventory.

    ``fn(spark, sf_dir)`` returns the Spark result; ``oracle`` is the
    ANSI-SQL twin DuckDB runs over the same parquet tables (None for
    ops that aren't cleanly SQL-expressible → driver does a rows-only
    check). Column names MUST match between the two: alias every
    computed column identically on both sides.
    """

    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
