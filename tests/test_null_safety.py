"""NULL-text totality: real corpora carry nulls, and Spark's non-ANSI
size(NULL) = -1 silently poisons counts. Every text-consuming operator
must treat a NULL document as empty, never emit -1/NULL stats, and
never let a null doc grab a budget/keep slot it shouldn't."""

from __future__ import annotations

from pyspark.sql import functions as F


def _docs(spark):
    return spark.createDataFrame(
        [(1, None), (2, "Real text here. More of it now.")],
        "doc_id long, text string",
    )


def test_c4_null_page(spark):
    from demo_flink_spark.operators.webtext import c4_line_filter

    r = {
        x["doc_id"]: x
        for x in c4_line_filter(
            _docs(spark).withColumnRenamed("text", "page")
        ).collect()
    }
    assert r[1]["n_lines_total"] == 0 and r[1]["n_lines_kept"] == 0
    assert r[1]["n_sentences"] == 0 and r[1]["page_kept"] is False
    assert r[1]["cleaned"] == ""
    assert r[2]["n_lines_total"] == 1


def test_gopher_null_text(spark):
    from demo_flink_spark.operators.textstats import gopher_quality_filter

    r = {
        x["doc_id"]: x
        for x in gopher_quality_filter(_docs(spark), min_words=3).collect()
    }
    assert r[1]["n_words"] == 0 and r[1]["n_stop_present"] == 0
    assert r[1]["keep"] is False and r[1]["ok_stop"] is False


def test_span_corruption_null_text(spark):
    from demo_flink_spark.operators.pipeline import span_corruption

    r = {x["doc_id"]: x for x in span_corruption(_docs(spark)).collect()}
    assert r[1]["n_tokens"] == 0 and r[1]["n_spans"] == 0
    assert r[1]["input_txt"] == "" and r[1]["targets_txt"] == ""


def test_token_budget_null_text(spark):
    from demo_flink_spark.operators.sampling import token_budget_cut

    df = _docs(spark).withColumn("lang", F.lit("en"))
    r = {
        x["doc_id"]: x
        for x in token_budget_cut(df, {"en": 100}).collect()
    }
    assert r[1]["n_tokens"] == 0 and r[1]["cum_tokens"] >= 0
    # the null doc contributes nothing to the running budget
    assert r[2]["cum_tokens"] == 7
