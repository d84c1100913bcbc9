"""Round-5 additions: exact AUC, split-leakage audit, CDC chunking,
perplexity buckets, n-gram diversity, tokenizer fertility.

Each test pins a property the oracle hash can't see directly: the
CDC shift-robustness guarantee, Mann-Whitney equivalence to the
brute-force pairwise AUC definition, tercile size arithmetic, and
hand-counted diversity ratios.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


# ---------------------------------------------------------------- AUC


def _auc_bruteforce(pairs):
    """Definitional AUC: P(score_pos > score_neg) + 0.5·P(tie)."""
    pos = [s for s, y in pairs if y]
    neg = [s for s, y in pairs if not y]
    total = 0.0
    for p in pos:
        for n in neg:
            total += 1.0 if p > n else (0.5 if p == n else 0.0)
    return total / (len(pos) * len(neg))


def test_binary_auc_matches_bruteforce_with_ties(spark):
    from demo_flink_spark.operators.evaluation import binary_auc

    rng = random.Random(7)
    # small score alphabet forces heavy ties — the case a trapezoid
    # scan gets wrong without midranks
    pairs = [(rng.choice([0.1, 0.2, 0.3, 0.4]), rng.random() < 0.4)
             for _ in range(200)]
    df = spark.createDataFrame(
        [(float(s), bool(y)) for s, y in pairs], "s double, y boolean"
    )
    row = binary_auc(df, F.col("s"), F.col("y")).collect()[0]
    expect = _auc_bruteforce(pairs)
    assert row["auc"] == pytest.approx(expect, abs=1e-12)
    assert row["gini"] == pytest.approx(2 * expect - 1, abs=1e-12)
    assert row["n_pos"] + row["n_neg"] == 200


def test_binary_auc_degenerate_single_class_is_null(spark):
    from demo_flink_spark.operators.evaluation import binary_auc

    df = spark.createDataFrame([(0.1, True), (0.9, True)], "s double, y boolean")
    row = binary_auc(df, F.col("s"), F.col("y")).collect()[0]
    assert row["auc"] is None and row["gini"] is None
    assert (row["n_pos"], row["n_neg"]) == (2, 0)


def test_binary_auc_perfect_separation(spark):
    from demo_flink_spark.operators.evaluation import binary_auc

    rows = [(float(i), i >= 50) for i in range(100)]
    df = spark.createDataFrame(rows, "s double, y boolean")
    row = binary_auc(df, F.col("s"), F.col("y")).collect()[0]
    assert row["auc"] == 1.0 and row["gini"] == 1.0


# ------------------------------------------------------ split leakage


def test_split_leakage_directions_and_counts(spark):
    from demo_flink_spark.operators.evaluation import split_leakage

    pairs = spark.createDataFrame(
        [
            (1, 2, 0.9),   # train-train: not a leak
            (1, 3, 0.8),   # train vs test doc 3
            (4, 1, 0.7),   # val doc 4 vs train (reverse direction)
            (4, 2, 0.75),  # val doc 4 vs train again -> n_train_dups=2
            (3, 4, 0.6),   # test-val: neither side in train, not a leak
        ],
        "doc_a long, doc_b long, jaccard double",
    )
    splits = spark.createDataFrame(
        [(1, "train"), (2, "train"), (3, "test"), (4, "val")],
        "doc_id long, split string",
    )
    out = {
        r["doc_id"]: r
        for r in split_leakage(pairs, splits).collect()
    }
    assert set(out) == {3, 4}
    assert out[3]["split"] == "test"
    assert out[3]["n_train_dups"] == 1 and out[3]["max_sim"] == 0.8
    assert out[4]["split"] == "val"
    assert out[4]["n_train_dups"] == 2 and out[4]["max_sim"] == 0.75


# ------------------------------------------------------- CDC chunking


def test_cdc_chunks_cover_and_dedup_identical_docs(spark):
    from demo_flink_spark.operators.dedup import cdc_chunk_stats

    words = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 5
    docs = _docs(spark, [(1, words.strip()), (2, words.strip()), (3, "")])
    out = {r["doc_id"]: r for r in cdc_chunk_stats(docs).collect()}
    # identical docs: every chunk duplicated
    assert out[1]["n_chunks"] == out[2]["n_chunks"] > 0
    assert out[1]["n_dup_chunks"] == out[1]["n_chunks"]
    assert out[1]["dup_chunk_frac"] == 1.0
    # empty doc: zero chunks, frac 0
    assert out[3]["n_chunks"] == 0 and out[3]["dup_chunk_frac"] == 0.0


def test_cdc_shift_robustness_vs_fixed_stride(spark):
    """THE content-defined property: one token inserted at the front
    re-chunks only the neighborhood of the edit; almost every
    downstream chunk keeps its identity and still dedups. Fixed-stride
    chunking loses all alignment after the same edit."""
    from demo_flink_spark.operators.dedup import cdc_chunk_stats
    from demo_flink_spark.operators.pipeline import chunk_documents

    rng = random.Random(13)
    vocab = "ab cd ef gh ij kl mn op qr st uv wx yz on tw th fo fi si".split()
    base = " ".join(rng.choice(vocab) for _ in range(400))
    edited = "zzz " + base
    docs = _docs(spark, [(1, base), (2, edited)])

    out = {r["doc_id"]: r for r in cdc_chunk_stats(docs).collect()}
    # the edit can only disturb chunks whose boundary window overlaps
    # the inserted token: the shared tail must still dedup almost
    # fully (>= 90% of the edited doc's chunks)
    frac = out[2]["dup_chunk_frac"]
    assert frac >= 0.9, f"CDC lost alignment after one edit: {frac}"

    # fixed-stride chunks on the same pair, same corpus-level dedup:
    # the 1-token shift must destroy most alignment (no chunk of the
    # edited doc reproduces a base chunk except by rare coincidence)
    fixed = chunk_documents(docs, window=8, overlap=0)
    counts = (
        fixed.groupBy("chunk_text")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert counts <= 5, "fixed-stride unexpectedly survived the shift"


# ------------------------------------------------- perplexity buckets


def test_perplexity_bucket_tercile_sizes(spark):
    from demo_flink_spark.operators.textstats import perplexity_buckets

    rows = [
        (i, " ".join("word%d and the of %d" % (i % 7, j) for j in range(6)),
         "en" if i % 2 == 0 else "de")
        for i in range(40)
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = perplexity_buckets(docs)
    sizes = {
        (r["lang"], r["ppl_bucket"]): r["n"]
        for r in out.groupBy("lang", "ppl_bucket").agg(
            F.count(F.lit(1)).alias("n")
        ).collect()
    }
    for lang, n in (("en", 20), ("de", 20)):
        head = sizes.get((lang, "head"), 0)
        middle = sizes.get((lang, "middle"), 0)
        tail = sizes.get((lang, "tail"), 0)
        assert head == n // 3
        assert head + middle == 2 * n // 3
        assert head + middle + tail == n
    kept = out.filter(F.col("is_kept") != (F.col("ppl_bucket") != "tail"))
    assert kept.count() == 0


# --------------------------------------------------- n-gram diversity


def test_ngram_diversity_hand_counted(spark):
    from demo_flink_spark.operators.textstats import ngram_diversity

    docs = spark.createDataFrame(
        [(1, "a b a b", "s1"), (2, "a b c", "s1")],
        "doc_id long, text string, source string",
    )
    out = {
        (r["source"], r["n"]): r for r in ngram_diversity(docs).collect()
    }
    # unigrams: 7 occurrences, {a,b,c}
    assert out[("s1", 1)]["n_total"] == 7
    assert out[("s1", 1)]["n_distinct"] == 3
    # bigrams: "a b","b a","a b" + "a b","b c" -> 5 occ, {a b,b a,b c}
    assert out[("s1", 2)]["n_total"] == 5
    assert out[("s1", 2)]["n_distinct"] == 3
    # trigrams: "a b a","b a b" + "a b c" -> 3 occ, all distinct
    assert out[("s1", 3)]["n_total"] == 3
    assert out[("s1", 3)]["n_distinct"] == 3
    assert out[("s1", 3)]["diversity"] == 1.0


# ------------------------------------------------- tokenizer fertility


def test_tokenizer_fertility_punctuation_counts(spark):
    from demo_flink_spark.operators.textstats import tokenizer_fertility

    docs = spark.createDataFrame(
        [(1, "Hello, world! 123", "en"), (2, "plain words here", "en")],
        "doc_id long, text string, lang string",
    )
    row = tokenizer_fertility(docs).collect()[0]
    # doc1: [Hello][,][world][!][123] = 5 bpe, 3 ws; doc2: 3 bpe, 3 ws
    assert row["n_bpe_tokens"] == 8
    assert row["n_ws_tokens"] == 6
    assert row["fertility"] == pytest.approx(8 / 6)
    assert row["n_docs"] == 2


# ----------------------------------------------------------- EWMA


def test_ewma_trailing_matches_definition(spark):
    import math

    from demo_flink_spark.operators.timeseries import ewma_trailing

    rows = [
        (i, "k", float(v))
        for i, v in enumerate([10, 20, 40, 10, 30, 50, 70, 20, 60, 80])
    ]
    df = spark.createDataFrame(rows, "event_id long, event_type string, value double")
    from pyspark.sql import functions as F

    out = (
        ewma_trailing(
            df.withColumn("ts", F.timestamp_seconds(F.col("event_id"))),
            n_trailing=4,
        )
        .orderBy("event_id")
        .collect()
    )
    vals = [v for _, _, v in rows]
    for r in out:
        i = r["event_id"]
        window = vals[max(0, i - 3) : i + 1]
        num = sum(v * 2.0 ** -(len(window) - 1 - j) for j, v in enumerate(window))
        den = sum(2.0 ** -(len(window) - 1 - j) for j in range(len(window)))
        assert r["n_win"] == len(window)
        assert math.isclose(r["ewma"], num / den, rel_tol=1e-12)
    # most recent reading dominates: last ewma sits between mean and v_t
    last = out[-1]
    tail = vals[-4:]
    assert min(tail) <= last["ewma"] <= max(tail)
    assert ewma_trailing.__doc__  # docstring documents the exactness contract


# ------------------------------------------------ entropy + snapshot diff


def test_token_entropy_known_values(spark):
    import math

    from demo_flink_spark.operators.textstats import token_entropy

    docs = _docs(
        spark,
        [
            (1, "spam spam spam spam"),     # single token: H = 0
            (2, "a b"),                     # uniform 2: H = ln 2
            (3, "a a b b c c d d"),         # uniform 4: H = ln 4
            (4, ""),                        # empty: H = 0, n = 0
        ],
    )
    out = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_distinct"] == 1
    assert abs(out[2]["entropy"] - math.log(2)) < 1e-5
    assert abs(out[3]["entropy"] - math.log(4)) < 1e-5
    assert out[4]["n_tokens"] == 0 and out[4]["entropy"] == 0.0
    # skew lowers entropy below uniform over the same support
    skew = _docs(spark, [(9, "a a a a a a b")])
    h = token_entropy(skew).collect()[0]["entropy"]
    assert 0 < h < math.log(2)


def test_snapshot_diff_all_statuses(spark):
    from demo_flink_spark.operators.pipeline import snapshot_diff

    old = _docs(spark, [(1, "same"), (2, "before"), (3, "gone")])
    new = _docs(spark, [(1, "same"), (2, "after"), (4, "fresh")])
    out = {r["doc_id"]: r["status"] for r in snapshot_diff(old, new).collect()}
    assert out == {1: "unchanged", 2: "changed", 3: "removed", 4: "added"}


def test_mixture_interleave_prefix_proportionality(spark):
    """WFQ property: in virtual-time order, any reasonable prefix
    holds sources roughly in weight proportion, and per-source ranks
    are dense 1..n."""
    from demo_flink_spark.operators.sampling import mixture_interleave

    rows = [(i, "heavy" if i % 3 != 2 else "light") for i in range(300)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = mixture_interleave(
        docs,
        group_col="source",
        weight_of=lambda s: F.when(s == "heavy", F.lit(2.0)).otherwise(
            F.lit(1.0)
        ),
    ).collect()
    ordered = sorted(out, key=lambda r: (r["virtual_time"], r["source"], r["doc_id"]))
    prefix = ordered[:90]
    n_heavy = sum(1 for r in prefix if r["source"] == "heavy")
    # weight 2 vs 1 -> ~2/3 of any prefix is heavy (exact while both
    # sources are unexhausted: per unit virtual time, 2 heavy + 1 light)
    assert abs(n_heavy / 90 - 2 / 3) < 0.05
    # dense ranks per source
    for src in ("heavy", "light"):
        ranks = sorted(r["src_rank"] for r in out if r["source"] == src)
        assert ranks == list(range(1, len(ranks) + 1))


def test_linear_trend_recovers_planted_slope(spark):
    from datetime import datetime, timedelta

    from demo_flink_spark.operators.timeseries import linear_trend

    # y = 3.5 * hours + 20, exact: slope_per_hour must come back 3.5
    rows = []
    t0 = datetime(2024, 1, 1)
    for i in range(50):
        rows.append(
            (i, "lin", t0 + timedelta(minutes=30 * i), 20.0 + 3.5 * (0.5 * i))
        )
    # a flat series: slope 0, intercept = the constant
    for i in range(10):
        rows.append((100 + i, "flat", t0 + timedelta(hours=i), 7.25))
    df = spark.createDataFrame(
        rows, "event_id long, event_type string, ts timestamp, value double"
    )
    out = {r["event_type"]: r for r in linear_trend(df).collect()}
    assert abs(out["lin"]["slope_per_hour"] - 3.5) < 1e-9
    assert abs(out["lin"]["intercept"] - 20.0) < 1e-6
    assert out["flat"]["slope_per_hour"] == 0.0
    assert abs(out["flat"]["intercept"] - 7.25) < 1e-9
    assert out["lin"]["n"] == 50
