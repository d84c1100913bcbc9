"""dq_report / skew_report (operators/quality_checks.py): constraint
semantics on handcrafted rows; the declared queries carry the
cross-engine value-hash checks."""

from __future__ import annotations

from demo_flink_spark.operators.quality_checks import dq_report, skew_report


def test_dq_report_thresholds_and_uniqueness(spark):
    rows = [
        (1, 1, "a", 5.0),
        (2, 1, "a", 5.0),
        (2, 1, "b", 150.0),  # dup key (2,1); value out of range
        (3, 2, None, 7.0),  # null name
    ]
    df = spark.createDataFrame(rows, "k long, sub long, name string, v double")
    out = {
        r["check_name"]: r
        for r in dq_report(
            df,
            completeness={"name": 75, "k": 100},
            unique=[("k", "sub")],
            ranges={"v": (0.0, 100.0)},
            accepted={"name": ("a", "b")},
        ).collect()
    }
    assert len(out) == 5
    # 3/4 non-null names passes >=75% exactly (integer cross-multiply)
    c = out["completeness(name)>=75%"]
    assert c["n_good"] == 3 and c["passed"] and c["ratio"] == 0.75
    assert out["completeness(k)>=100%"]["passed"]
    u = out["unique(k,sub)"]
    assert u["n_good"] == 3 and not u["passed"]
    r = out["range(v in [0.0,100.0])"]
    assert r["n_good"] == 3 and not r["passed"]
    # isin(None) is null-false: accepted counts only real 'a'/'b'
    s = out["accepted(name)"]
    assert s["n_good"] == 3 and not s["passed"]


def test_dq_report_empty_table(spark):
    df = spark.createDataFrame([], "k long, sub long")
    out = dq_report(df, completeness={"k": 100}).collect()
    assert len(out) == 1
    # vacuous pass on empty input, ratio pinned to 1.0
    assert out[0]["passed"] and out[0]["ratio"] == 1.0


def test_skew_report_hot_key(spark):
    rows = [(i, "hot") for i in range(90)] + [
        (100 + i, f"cold{i}") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "i long, user_id string")
    r = skew_report(df, "user_id").collect()[0]
    assert r["n_rows"] == 100 and r["n_keys"] == 11
    assert r["max_key_cnt"] == 90 and r["top1_share"] == 0.9
    # hhi = (90^2 + 10*1)/100^2
    assert r["hhi"] == (90 * 90 + 10) / 100 / 100
    assert r["p50_cnt"] == 1.0  # median group is a cold singleton


def test_skew_report_uniform(spark):
    rows = [(i, f"u{i % 20}") for i in range(100)]
    df = spark.createDataFrame(rows, "i long, user_id string")
    r = skew_report(df, "user_id").collect()[0]
    assert r["n_keys"] == 20 and r["max_key_cnt"] == 5
    assert r["top1_share"] == 0.05 and r["hhi"] == 1 / 20
    assert r["p50_cnt"] == 5.0 and r["p99_cnt"] == 5.0


def test_corpus_health_report_values(spark):
    import math

    from demo_flink_spark.operators.quality_checks import corpus_health_report

    rows = [
        (1, "one two three", "en"),
        (2, "one two three", "en"),  # exact dup of 1
        (3, "vier funf", "de"),
        (4, None, "de"),  # null text: counted, zero tokens
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    r = corpus_health_report(df).collect()[0]
    assert r["n_docs"] == 4 and r["n_tokens"] == 8
    # 3 distinct canonical texts (null == '' is its own value)
    assert r["exact_dup_rate"] == 0.25
    assert r["top_lang_share"] == 0.5 and r["mean_doc_tokens"] == 2.0
    # 2/2 split -> ln(2) entropy (9dp-rounded terms through decimal)
    assert abs(r["lang_entropy_nats"] - math.log(2)) < 1e-6
    # monolingual corpus -> zero entropy
    mono = spark.createDataFrame(
        [(1, "a b", "en"), (2, "c d", "en")],
        "doc_id long, text string, lang string",
    )
    assert corpus_health_report(mono).collect()[0]["lang_entropy_nats"] == 0.0


def test_dq_report_requires_a_constraint(spark):
    """Zero constraints would build stack(0, ) — a SQL parse error at
    action time; the operator must fail at call time instead."""
    import pytest

    df = spark.createDataFrame([(1,)], "k long")
    with pytest.raises(ValueError, match="at least one constraint"):
        dq_report(df)


def test_heavy_change_detection_values(spark):
    """Missing keys count 0 via the full outer join; the score is the
    exact integer cross-multiplied share delta |c_ref*n_cur - c_cur*n_ref|;
    ties break by key ascending."""
    from demo_flink_spark.operators.quality_checks import (
        heavy_change_detection,
    )

    ref = spark.createDataFrame(
        [("a",)] * 6 + [("b",)] * 3 + [("gone",)], "k string"
    )  # n_ref = 10
    cur = spark.createDataFrame(
        [("a",)] * 1 + [("b",)] * 2 + [("new",)] * 2, "k string"
    )  # n_cur = 5
    got = [
        (r["key"], r["c_ref"], r["c_cur"], r["change_score"])
        for r in heavy_change_detection(ref, cur, "k", k=10).collect()
    ]
    # scores: a |6*5-1*10|=20, new |0*5-2*10|=20, b |3*5-2*10|=5,
    # gone |1*5-0*10|=5 -> ties broken by key asc
    assert got == [
        ("a", 6, 1, 20),
        ("new", 0, 2, 20),
        ("b", 3, 2, 5),
        ("gone", 1, 0, 5),
    ]
