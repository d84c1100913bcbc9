"""Shared time expressions.

Oracle parity depends on one canonical epoch-millis derivation — keep
it in exactly one place (DuckDB twin: `epoch_ms(ts)`).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def epoch_ms(ts_col: str | Column) -> Column:
    """Milliseconds since epoch of a timestamp column (floor)."""
    col = F.col(ts_col) if isinstance(ts_col, str) else ts_col
    return F.unix_timestamp(col) * 1000 + F.date_format(col, "SSS").cast("long")
