"""Golden tests for the WordCount lineage (FIXTURES.md F1)."""

from __future__ import annotations

from demo_flink_spark.operators.wordcount import (
    advanced_word_count,
    windowed_event_count,
    word_count,
)

# FIXTURES.md F1: mixed case, punctuation, runs of whitespace, stopwords.
F1_LINES = [
    (1, "The quick brown fox, the FAST fox!"),
    (2, "a fox   and   a dog"),
    (3, ""),
]


def _lines_df(spark):
    return spark.createDataFrame(F1_LINES, "seq long, text string")


def test_advanced_word_count_golden(spark):
    got = {
        r["word"]: r["cnt"]
        for r in advanced_word_count(_lines_df(spark), "text").collect()
    }
    assert got == {"quick": 1, "brown": 1, "fox": 3, "fast": 1, "dog": 1}


def test_word_count_keeps_raw_tokens(spark):
    got = {r["word"]: r["cnt"] for r in word_count(_lines_df(spark), "text").collect()}
    # No normalization: "fox," and "fox!" are distinct raw tokens.
    assert got["The"] == 1 and got["the"] == 1
    assert got["fox,"] == 1 and got["fox!"] == 1 and got["fox"] == 1


def test_windowed_event_count(spark):
    rows = [
        (1, "2024-01-01 00:00:01", "a"),
        (2, "2024-01-01 00:00:09", "a"),
        (3, "2024-01-01 00:00:12", "b"),
    ]
    df = spark.createDataFrame(rows, "seq long, ts_s string, event_type string").selectExpr(
        "cast(ts_s as timestamp) as ts", "event_type"
    )
    got = {
        (str(r["window_start"]), r["event_type"]): r["cnt"]
        for r in windowed_event_count(df).collect()
    }
    assert got == {
        ("2024-01-01 00:00:00", "a"): 2,
        ("2024-01-01 00:00:10", "b"): 1,
    }


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert set(df.columns) == {"word", "cnt"}
