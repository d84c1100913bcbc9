"""WordCount lineage — the reference's signature computation.

Reference parity:
- tokenize + per-word rolling sum: `WindowWordCount.java:18-27`
  (socket → Splitter flatMap → keyBy(word) → sum).
- normalization (lowercase + strip non-[a-z\\s]), `\\s+` tokenization
  with empty-token drop, and an 11-word stopword filter:
  `AdvancedWordCount.java:26-36,52-61`.
- event-time tumbling-window count per key:
  `EventTimeWordCountDebug.java:87-105`.

Spark-first design: everything here is built-in column expressions
(`lower`/`regexp_replace`/`split`/`explode`/`groupBy.count`) so the
whole pipeline stays inside whole-stage codegen — no Python UDFs. At
100 TB the tokenize+explode is a narrow map (no shuffle); the single
shuffle is the final per-word aggregation, which map-side partial
aggregation compresses to ~vocabulary size per partition before the
exchange.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Verbatim the reference's stopword set (`AdvancedWordCount.java:26-28`).
STOPWORDS = ("a", "the", "is", "in", "at", "of", "on", "and", "or", "to", "with")


def normalize_text(col: Column) -> Column:
    """Lowercase and strip everything but [a-z] and whitespace.

    Parity: `AdvancedWordCount.java:32`.
    """
    return F.regexp_replace(F.lower(col), r"[^a-z\s]", "")


def tokenize(df: DataFrame, text_col: str = "text", out_col: str = "word") -> DataFrame:
    """Split on runs of whitespace, drop empty tokens (1 → N rows).

    Parity: `AdvancedWordCount.java:52-61` (Tokenizer flatMap);
    `WindowWordCount.java:30-37` (Splitter). Expressed as
    `explode(split(...))` — a codegen'd generator, not a UDTF.
    """
    return (
        df.select(F.explode(F.split(F.col(text_col), r"\s+")).alias(out_col))
        .filter(F.length(out_col) > 0)
    )


def word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Plain per-word counts (`WindowWordCount.java:20-23`)."""
    return (
        tokenize(docs, text_col)
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def advanced_word_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Normalize → tokenize → stopword-filter → per-word counts.

    Parity: the full `AdvancedWordCount.java:30-42` pipeline. The
    stopword filter sits before the aggregation exactly as in the
    reference, but Catalyst is free to push it below the explode's
    projection — declarative beats hand-placed.
    """
    normalized = docs.select(normalize_text(F.col(text_col)).alias("_norm"))
    return (
        tokenize(normalized, "_norm")
        .filter(~F.col("word").isin(*STOPWORDS))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def windowed_event_count(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window_duration: str = "10 seconds",
) -> DataFrame:
    """Tumbling event-time window count per key.

    Parity: `EventTimeWordCountDebug.java:100-105` (keyBy → 10 s
    tumbling event-time window → sum). Batch form of the same
    `window()` grouping used by the streaming twin
    (`demo_flink_spark.streaming.windows`). Emits the window start as
    a plain timestamp column (oracle-friendly, no struct).
    """
    w = F.window(F.col(ts_col), window_duration)
    return (
        events.groupBy(w.alias("w"), F.col(key_col))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col(key_col),
            F.col("cnt"),
        )
    )
