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


def test_repetition_signals_known_values(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b a b a b"),   # bigrams: ab,ba,ab,ba,ab → top 3/5
            (2, "x x x x x x"),   # one distinct bigram; 5-grams all equal
            (3, "one two three"),  # too short for 5-grams
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in textstats.repetition_signals(docs).collect()}
    assert got[1]["top_bigram_frac"] == 0.6
    assert got[1]["dup_ngram_frac"] == 0.0  # both 5-grams distinct
    assert got[2]["top_bigram_frac"] == 1.0
    assert got[2]["dup_ngram_frac"] == 0.5  # 2 occurrences, 1 distinct
    assert got[3]["dup_ngram_frac"] == 0.0


def test_pii_scrub_redacts_and_counts(spark):
    df = spark.createDataFrame(
        [(1, "mail a.user+tag@sub.example.org or +1-555-0100 today")],
        "doc_id long, text string",
    )
    row = textstats.pii_scrub(df).first()
    assert row["n_emails"] == 1 and row["n_phones"] == 1
    assert "<EMAIL>" in row["text"] and "<PHONE>" in row["text"]
    assert "example.org" not in row["text"] and "555" not in row["text"]


def test_url_parts(spark):
    df = spark.createDataFrame(
        [(1, "https://docs.example.com/a/b?lang=de&v=2")],
        "doc_id long, url string",
    )
    row = textstats.url_parts(df).first()
    assert row["host"] == "docs.example.com"
    assert row["path"] == "/a/b"
    assert row["q_lang"] == "de"


def test_dsir_tilts_toward_target_domain(spark):
    # target docs share a distinctive vocabulary; off-target docs use a
    # disjoint one; a mixed doc sits between
    rows = (
        [(i, "alpha beta gamma delta alpha beta gamma delta", "en") for i in range(6)]
        + [(10 + i, "zeta eta theta iota zeta eta theta iota", "de") for i in range(6)]
        + [(99, "alpha beta zeta eta alpha beta zeta eta", "de")]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = {r["doc_id"]: r for r in textstats.dsir_log_ratio(df).collect()}
    tgt = [out[i]["avg_log_ir"] for i in range(6)]
    off = [out[10 + i]["avg_log_ir"] for i in range(6)]
    mixed = out[99]["avg_log_ir"]
    assert min(tgt) > mixed > max(off)
    assert all(out[i]["keep"] for i in range(6))
    assert not any(out[10 + i]["keep"] for i in range(6))
    assert out[99]["n_feats"] == 7  # 8 tokens -> 7 bigrams


def test_dsir_short_and_empty_docs(spark):
    df = spark.createDataFrame(
        [(1, "word", "en"), (2, "", "en"), (3, "a b", "de")],
        "doc_id long, text string, lang string",
    )
    out = {r["doc_id"]: r for r in textstats.dsir_log_ratio(df).collect()}
    assert out[1]["n_feats"] == 0 and out[1]["avg_log_ir"] == 0.0
    assert out[2]["n_feats"] == 0 and not out[2]["keep"]
    assert out[3]["n_feats"] == 1


def test_gopher_quality_filter_boundaries(spark):
    from demo_flink_spark.operators.textstats import gopher_quality_filter

    rows = [
        # 0: clean passing doc (needs >= 2 stopwords, >= 3 mean len)
        (0, "the quick brown fox jumps over a lazy dog today"),
        # 1: word count below the floor
        (1, "the and cat"),
        # 2: mean word length below 3 (all 1-2 char words)
        (2, "a an is it to we he of in at on by the ok hm ah eh um ma pa"),
        # 3: symbol ratio above 10% (2 symbols / 10 words)
        (3, "the alpha beta gamma delta epsilon zeta eta # ..."),
        # 4: alpha fraction below 80% (3 numeric / 10 words)
        (4, "the cat 111 222 333 and dog runs far away"),
        # 5: only one stopword present
        (5, "the lion tiger bear wolf eagle shark whale otter mouse"),
        # 6: empty text
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r["doc_id"]: r
        for r in gopher_quality_filter(df, min_words=10).collect()
    }
    assert out[0]["keep"]
    assert not out[1]["ok_word_count"] and not out[1]["keep"]
    assert not out[2]["ok_mean_len"]
    assert out[2]["mean_word_len"] < 3
    assert not out[3]["ok_symbol"] and out[3]["symbol_word_ratio"] == 0.2
    assert not out[4]["ok_alpha"] and out[4]["frac_alpha_words"] == 0.7
    assert out[5]["n_stop_present"] == 1 and not out[5]["ok_stop"]
    assert out[6]["n_words"] == 0 and not out[6]["keep"]
    assert out[6]["mean_word_len"] == 0.0
    # boundary: exactly 10% symbols passes (integer cross-multiply)
    b = spark.createDataFrame(
        [(0, "the and alpha beta gamma delta epsilon zeta eta #")],
        "doc_id long, text string",
    )
    r = gopher_quality_filter(b, min_words=5).collect()[0]
    assert r["ok_symbol"] and r["symbol_word_ratio"] == 0.1


def test_pmi_cooccurrence_handcrafted(spark):
    import math

    from demo_flink_spark.operators.textstats import pmi_cooccurrence

    # "alpha beta" always adjacent; "gamma" floats alone
    rows = [(i, "alpha beta gamma") for i in range(6)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        (r["w1"], r["w2"]): r
        for r in pmi_cooccurrence(df, min_pair_count=1).collect()
    }
    # pairs per doc (window 2): (a,b), (a,g), (b,g) -> 6 each
    assert set(out) == {
        ("alpha", "beta"),
        ("alpha", "gamma"),
        ("beta", "gamma"),
    }
    r = out[("alpha", "beta")]
    assert r["c12"] == 6 and r["c1"] == 6 and r["c2"] == 6
    # N=18, Npairs=18: PMI = ln(6*18*18 / (18*6*6)) = ln(3)
    assert abs(r["pmi"] - math.log(3)) < 1e-9
    # window=1 drops the skip pair (alpha, gamma)
    out1 = {
        (r["w1"], r["w2"])
        for r in pmi_cooccurrence(df, window=1, min_pair_count=1).collect()
    }
    assert ("alpha", "gamma") not in out1 and ("alpha", "beta") in out1


def test_pmi_min_count_filter(spark):
    from demo_flink_spark.operators.textstats import pmi_cooccurrence

    df = spark.createDataFrame(
        [(1, "x y"), (2, "x y"), (3, "p q")], "doc_id long, text string"
    )
    out = pmi_cooccurrence(df, min_pair_count=2).collect()
    assert {(r["w1"], r["w2"]) for r in out} == {("x", "y")}
