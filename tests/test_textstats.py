"""Sanity tests for the text-analysis operators."""

from __future__ import annotations

from demo_flink_spark.operators import textstats


def test_lang_id_separates_obvious_languages(spark):
    docs = spark.createDataFrame(
        [
            (1, "the weather in the north then there is rather thin", "en"),
            (2, "ich eichen reichen zeichen einen schein durchein", "de"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in textstats.lang_id_ngram(docs).collect()}
    assert got[1] == "en"
    assert got[2] == "de"


def test_lang_id_empty_text(spark):
    docs = spark.createDataFrame([(1, "", "en")], "doc_id long, text string, lang string")
    got = textstats.lang_id_ngram(docs).first()
    assert got["predicted_lang"] == "und"


def test_quality_score_extremes(spark):
    docs = spark.createDataFrame(
        [
            (1, "the the the the"),       # all stopwords, all same token
            (2, "alpha beta gamma delta"),  # no stopwords, all distinct
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.quality_score(docs).collect()}
    assert got[1]["stopword_ratio"] == 1.0 and got[1]["distinct_ratio"] == 0.25
    assert got[2]["stopword_ratio"] == 0.0 and got[2]["distinct_ratio"] == 1.0


def test_fingerprint_invariant_to_case_and_punct(spark):
    docs = spark.createDataFrame(
        [(1, "Hello, World!"), (2, "hello world"), (3, "different text")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["fingerprint"] for r in textstats.doc_fingerprint(docs).collect()}
    assert got[1] == got[2]
    assert got[1] != got[3]


def test_lang_id_cjk_scripts(spark):
    # non-Latin scripts must route by codepoint range, not bigram vote
    # (hanzi has zero latin bigrams; r1 mislabeled it 'de')
    docs = spark.createDataFrame(
        [
            (1, "今天天气很好我们去公园", "zh"),  # hanzi
            (2, "今日はいい天気ですね", "ja"),  # kanji+kana
            (3, "오늘 날씨가 좋습니다", "ko"),  # hangul
            (4, "the weather in the north then there is rather thin", "en"),
        ],
        "doc_id long, text string, lang string",
    )
    got = {r["doc_id"]: r["predicted_lang"] for r in textstats.lang_id_ngram(docs).collect()}
    assert got[1] == "zh"
    assert got[2] == "ja"
    assert got[3] == "ko"
    assert got[4] == "en"
