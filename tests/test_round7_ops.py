"""Round-7 operators: Adamic-Adar link prediction, multi-source BFS,
PPJoin prefix-filtered Jaccard, Flesch readability, STL-lite
decomposition — plus the oracle result-type lint."""

from __future__ import annotations

import math

import pyspark.sql.functions as F
import pytest


# ---------------------------------------------------------------- graph


def test_adamic_adar_matches_hand_computation(spark):
    """Path graph 1-2-3 plus hub 4 connected to 1,2,3:
    verify the classic score on a graph small enough to enumerate."""
    from demo_flink_spark.operators.graph import adamic_adar_topk

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 1), (4, 2), (4, 3)], "src long, dst long"
    )
    got = {
        (r["x"], r["y"]): r["score_micros"]
        for r in adamic_adar_topk(edges, k=10).collect()
    }
    # adjacency: 1:{2,4} 2:{1,3,4} 3:{2,4} 4:{1,2,3}
    # non-adjacent pairs: (1,3) via common {2,4}: 1/ln3 + 1/ln3
    w = {n: round(1.0 / math.log(n), 6) for n in (2, 3, 4)}
    assert got[(1, 3)] == int(round(w[3] * 1e6)) * 2
    # no existing edge may appear
    assert (1, 2) not in got and (2, 3) not in got
    assert (1, 4) not in got and (2, 4) not in got and (3, 4) not in got


def test_adamic_adar_rare_neighbor_outweighs_hub(spark):
    """Two candidate pairs: one shares a degree-2 (rare) neighbor, the
    other a degree-4 hub — the rare-neighbor pair must score higher."""
    from demo_flink_spark.operators.graph import adamic_adar_topk

    edges = spark.createDataFrame(
        # rare z=10 connects 1,2 ; hub z=20 connects 3,4,5,6
        [(10, 1), (10, 2), (20, 3), (20, 4), (20, 5), (20, 6)],
        "src long, dst long",
    )
    rows = adamic_adar_topk(edges, k=100).collect()
    scores = {(r["x"], r["y"]): r["score_micros"] for r in rows}
    assert scores[(1, 2)] > scores[(3, 4)]  # 1/ln2 > 1/ln4


def test_bfs_hops_distances_and_cycle_termination(spark):
    """Cycle 1→2→3→1 plus a tail 3→4→5; BFS from {1} must terminate
    and report shortest hop counts."""
    from demo_flink_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 10).collect()}
    assert got == {1: 0, 2: 1, 3: 2, 4: 3, 5: 4}


def test_bfs_hops_multi_source_min(spark):
    """Two seeds: each node gets the MIN distance over sources, and
    nodes beyond max_hops are absent."""
    from demo_flink_spark.operators.graph import bfs_hops

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (9, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, 2).collect()}
    # 3 is 2 hops from 1 but 1 hop from 9; 4 is 2 hops via 9
    assert got == {1: 0, 9: 0, 2: 1, 3: 1, 4: 2}


# --------------------------------------------------------------- ppjoin


def test_ppjoin_equals_full_jaccard_join(spark):
    """Losslessness on a corpus with repeated shingles everywhere:
    prefix-filtered pairs == uncut posting-list pairs (same integer
    threshold), pair for pair."""
    from demo_flink_spark.operators.dedup import (
        ngram_jaccard_pairs,
        ppjoin_prefix_pairs,
    )

    base = "the quick brown fox jumps over the lazy dog near the river"
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, base + " bank"),
            (3, base.replace("quick", "slow")),
            (4, "a completely different text about spark and flink engines"),
            (5, "a completely different text about spark and flink engines!"),
        ],
        "doc_id long, text string",
    )
    pp = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in ppjoin_prefix_pairs(
            docs, n=3, threshold_num=2, threshold_den=5
        ).collect()
    }
    full = {
        (r["doc_a"], r["doc_b"]): (r["n_common"], r["jaccard"])
        for r in ngram_jaccard_pairs(docs, n=3, threshold=0.4).collect()
    }
    assert set(pp) >= {(1, 2), (4, 5)}
    # completeness: every full-join pair at rounded jaccard >= 0.4
    # must be found by the prefix plan, with identical counts
    for k, (nc, j) in full.items():
        if j >= 0.4:
            assert k in pp, f"prefix filter lost pair {k}"
            assert pp[k] == (nc, j)
    # soundness: every emitted pair satisfies the exact integer rule
    # (ngram_jaccard_pairs' rounded filter can only differ at the
    # 6th-decimal boundary, which this corpus does not sit on)
    assert set(pp) == {k for k, (nc, j) in full.items() if j >= 0.4}


def test_ppjoin_prefix_finds_threshold_boundary_pair(spark):
    """A pair at exactly Jaccard 0.4 (2 common of 5+2-2=5 union):
    integer cross-multiplication keeps it (float rounding might not)."""
    from demo_flink_spark.operators.dedup import ppjoin_prefix_pairs

    # doc1 tokens a b c d e f g -> 5 trigrams; doc2 shares exactly 2
    d1 = "aa bb cc dd ee ff gg"
    d2 = "aa bb cc dd ee zz yy"  # trigrams: shares 'aa bb cc','bb cc dd','cc dd ee'
    docs = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    rows = ppjoin_prefix_pairs(
        docs, n=3, threshold_num=2, threshold_den=5
    ).collect()
    assert len(rows) == 1
    r = rows[0]
    # 3 common, 5+5-3=7 union -> 3/7 ~ 0.4286 >= 0.4
    assert (r["doc_a"], r["doc_b"], r["n_common"]) == (1, 2, 3)
    assert 5 * r["n_common"] >= 2 * 7


# ---------------------------------------------------------- readability


def test_readability_hand_counts(spark):
    from demo_flink_spark.operators.textstats import readability_scores

    text = "The cat sat. It ran!"
    # words: the cat sat it ran -> 5; sentences: '.' '!' -> 2
    # vowel groups: e|a|a|i|a -> 5
    docs = spark.createDataFrame([(1, text)], "doc_id long, text string")
    r = readability_scores(docs).collect()[0]
    assert (r["n_words"], r["n_sentences"], r["n_syllable_groups"]) == (5, 2, 5)
    want = 206_835_000 - (1_015_000 * 5) // 2 - (84_600_000 * 5) // 5
    assert r["flesch_micros"] == want
    assert r["band"] == "easy"  # ~119.7 on the Flesch scale


def test_readability_zero_guards(spark):
    """Empty text and punctuation-free text must not divide by zero."""
    from demo_flink_spark.operators.textstats import readability_scores

    docs = spark.createDataFrame(
        [(1, ""), (2, "no sentence punctuation here")],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in readability_scores(docs).collect()}
    assert rows[1]["flesch_micros"] == 206_835_000  # 0 words, 0 sentences
    assert rows[2]["n_sentences"] == 0
    assert rows[2]["flesch_micros"] is not None


# ------------------------------------------------------------------ stl


def test_stl_identity_and_constant_series(spark):
    """A constant hourly series decomposes to trend == cnt, seasonal
    == 0, residual == 0; and cnt*1e6 == trend + seasonal + residual
    holds row-for-row on any series."""
    from demo_flink_spark.operators.timeseries import stl_decompose

    rows = []
    for d in range(3):
        for h in range(24):
            for _ in range(5):  # constant 5 events per hour
                rows.append(("a", f"2024-01-0{d+1} {h:02d}:15:00"))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = stl_decompose(ev).collect()
    assert len(out) == 72
    for r in out:
        assert r["cnt"] == 5
        assert r["trend_micros"] == 5_000_000
        assert r["seasonal_micros"] == 0
        assert r["residual_micros"] == 0
        assert (
            r["cnt"] * 1_000_000
            == r["trend_micros"] + r["seasonal_micros"] + r["residual_micros"]
        )


def test_stl_recovers_planted_daily_seasonality(spark):
    """Series = 10 + big spike at hour 12: the hour-12 seasonal
    component must dominate every other hour's."""
    from demo_flink_spark.operators.timeseries import stl_decompose

    rows = []
    for d in range(4):
        for h in range(24):
            n = 30 if h == 12 else 10
            for _ in range(n):
                rows.append(("k", f"2024-02-0{d+1} {h:02d}:00:00"))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    out = stl_decompose(ev).collect()
    seas = {}
    for r in out:
        h = r["window_start"].hour
        seas.setdefault(h, set()).add(r["seasonal_micros"])
    # phase means are constant per hour-of-day by construction
    assert all(len(v) == 1 for v in seas.values())
    s12 = seas[12].pop()
    others = [v.pop() for h, v in seas.items() if h != 12]
    assert s12 > 0 and all(s12 > o for o in others)
    # identity on every row
    for r in out:
        assert (
            r["cnt"] * 1_000_000
            == r["trend_micros"] + r["seasonal_micros"] + r["residual_micros"]
        )


# ------------------------------------------------------------- typelint


def test_oracle_typelint_rejects_hugeint():
    """The lint that turns the rollup_time_hour_day class of
    cross-fetch-path type laundering into a visible error."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from oracle_check import _type_ok

    assert _type_ok("BIGINT")
    assert _type_ok("DECIMAL(38,6)")
    assert _type_ok("VARCHAR")
    assert _type_ok("TIMESTAMP")
    assert _type_ok("BIGINT[]")
    assert not _type_ok("HUGEINT")
    assert not _type_ok("UHUGEINT")
    assert not _type_ok("HUGEINT[]")
    assert not _type_ok("JSON")


# ------------------------------------------------------- zipf / kl


def test_zipf_slope_near_minus_one_on_zipfian_corpus(spark):
    """A corpus with planted freq(r) ∝ 1/r must fit slope ≈ -1."""
    from demo_flink_spark.operators.textstats import zipf_fit_by_lang

    # word_r appears round(1000/r) times, r = 1..50
    words = []
    for r in range(1, 51):
        words.extend([f"w{chr(97 + r // 26)}{chr(97 + r % 26)}"] * (1000 // r))
    docs = spark.createDataFrame(
        [(1, " ".join(words), "xx")], "doc_id long, text string, lang string"
    )
    r = zipf_fit_by_lang(docs, top_k=50).collect()[0]
    assert r["n_types"] == 50 and r["n_top"] == 50
    assert -1.05 < r["zipf_slope"] < -0.92, r["zipf_slope"]


def test_kl_zero_for_identical_sources_and_positive_for_skewed(spark):
    from demo_flink_spark.operators.textstats import kl_unigram_by_source

    same = "alpha beta gamma delta"
    docs = spark.createDataFrame(
        [
            (1, same, "s1"),
            (2, same, "s2"),
            (3, "alpha alpha alpha alpha", "s3"),
        ],
        "doc_id long, text string, source string",
    )
    got = {r["source"]: r for r in kl_unigram_by_source(docs).collect()}
    # s1 and s2 are identical 1/4-uniform slices of a corpus where
    # alpha dominates -> equal, positive KL; s3 is maximally skewed
    assert got["s1"]["kl_micros"] == got["s2"]["kl_micros"] > 0
    assert got["s3"]["kl_micros"] > got["s1"]["kl_micros"]
    assert all(r["kl_micros"] >= 0 for r in got.values())


def test_kl_single_source_is_zero(spark):
    """One source == the whole corpus: p == q everywhere, KL == 0."""
    from demo_flink_spark.operators.textstats import kl_unigram_by_source

    docs = spark.createDataFrame(
        [(1, "a b c a", "only"), (2, "b c d", "only")],
        "doc_id long, text string, source string",
    )
    rows = kl_unigram_by_source(docs).collect()
    assert len(rows) == 1 and rows[0]["kl_micros"] == 0


# ------------------------------------------------------------ linkage


def test_sorted_neighborhood_finds_adjacent_near_dups(spark):
    from demo_flink_spark.operators.dedup import sorted_neighborhood_pairs

    df = spark.createDataFrame(
        [
            (1, "john smith"),
            (2, "john smyth"),   # 1 substitution from 1
            (3, "jon smith"),    # 1 deletion from 1, 2 edits from 2
            (4, "zzz unrelated"),
        ],
        "id long, name string",
    )
    pairs = {
        (r["key_a"], r["key_b"]): r["edit_dist"]
        for r in sorted_neighborhood_pairs(df, "id", "name", window=4).collect()
    }
    # sort order: john smith, john smyth, jon smith, zzz unrelated
    assert pairs[(1, 2)] == 1
    assert pairs[(1, 3)] == 1  # delete the 'h'
    assert pairs[(2, 3)] == 2  # y->i substitution + 'h' deletion
    assert all(k[0] != 4 and k[1] != 4 for k in pairs)  # zzz beyond 2 edits


def test_sorted_neighborhood_window_bounds_candidates(spark):
    """Identical names further than `window-1` apart in sort order are
    NOT paired — the documented blocking tradeoff."""
    from demo_flink_spark.operators.dedup import sorted_neighborhood_pairs

    rows = [(i, "dup") for i in range(1, 7)] + [(99, "unique")]
    df = spark.createDataFrame(rows, "id long, name string")
    got = sorted_neighborhood_pairs(df, "id", "name", window=3).collect()
    # 6 'dup' rows, window 3 -> each row pairs with <= 2 successors:
    # 5 + 4*... = (5 rows with 2 successors is wrong: rows 1..4 have 2,
    # row 5 has 1, row 6 has 0) = 4*2 + 1 = 9 pairs
    assert len(got) == 9
    assert all(r["edit_dist"] == 0 for r in got)


def test_global_sorted_rank_matches_single_partition_window(spark):
    """Two-phase distributed ranking must equal the textbook global
    row_number regardless of partition boundaries."""
    from pyspark.sql.window import Window

    from demo_flink_spark.operators.dedup import global_sorted_rank

    df = spark.range(0, 1000).select(
        (F.col("id") * 37 % 1000).alias("k"),
        F.format_string("v%04d", (F.col("id") * 91) % 1000).alias("nm"),
    )
    got = {
        (r["nm"], r["k"]): r["rn"]
        for r in global_sorted_rank(df, ["nm", "k"], num_partitions=7).collect()
    }
    want = {
        (r["nm"], r["k"]): r["rn"]
        for r in df.withColumn(
            "rn", F.row_number().over(Window.orderBy("nm", "k"))
        ).collect()
    }
    assert got == want


def test_systematic_sample_every_kth(spark):
    from demo_flink_spark.operators.sampling import systematic_sample

    df = spark.range(0, 100).select(
        (99 - F.col("id")).alias("v")  # reversed so sort matters
    )
    got = sorted(
        r["v"] for r in systematic_sample(df, ["v"], k=10, offset=3).collect()
    )
    assert got == [3, 13, 23, 33, 43, 53, 63, 73, 83, 93]


def test_calibration_bins_hand_computed(spark):
    from demo_flink_spark.operators.evaluation import calibration_bins

    rows = [
        (0.05, True), (0.05, False),            # bin 0: rate 0.5, mean 0.05
        (0.95, True), (0.97, True), (1.0, True) # 1.0 clamps into bin 9
    ]
    df = spark.createDataFrame(rows, "s double, y boolean")
    got = {
        r["bin"]: r
        for r in calibration_bins(df, F.col("s"), F.col("y")).collect()
    }
    assert set(got) == {0, 9}
    assert (got[0]["n"], got[0]["n_pos"]) == (2, 1)
    assert got[0]["mean_score_micros"] == 50_000
    assert got[0]["pos_rate_micros"] == 500_000
    assert (got[9]["n"], got[9]["n_pos"]) == (3, 3)
    # mean of 950000, 970000, 1000000 -> 2920000/3 = 973333.33 -> 973333
    assert got[9]["mean_score_micros"] == 973_333
    assert got[9]["pos_rate_micros"] == 1_000_000


def test_degree_powerlaw_on_star_graph(spark):
    """Star K1,5: hub degree 5, leaves degree 1 — tail (d>=2) is just
    the hub, so alpha = 1 + 1/ln(5/2)."""
    import math

    from demo_flink_spark.operators.graph import degree_powerlaw

    edges = spark.createDataFrame(
        [(0, i) for i in range(1, 6)], "src long, dst long"
    )
    r = degree_powerlaw(edges, d_min=2).collect()[0]
    assert r["n_nodes"] == 6 and r["n_tail"] == 1 and r["max_degree"] == 5
    assert r["mean_tail_degree_micros"] == 5_000_000
    want = 1.0 + 1.0 / (round(math.log(5 / 2), 6))
    assert abs(r["alpha"] - want) < 1e-6


def test_assortativity_signs(spark):
    """A star is maximally disassortative (hub-leaf only): r = -1...
    except Pearson r is undefined for constant marginals, so use a
    double star; a clean 2-regular cycle has zero variance -> test a
    barbell-ish mix instead for sign behavior."""
    from demo_flink_spark.operators.graph import degree_assortativity

    # two hubs joined, each with 3 leaves: hub-hub edge is
    # assortative, hub-leaf edges disassortative -> overall negative
    edges = [(0, 100), (1, 100), (2, 100), (100, 200),
             (3, 200), (4, 200), (5, 200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    r = degree_assortativity(df).collect()[0]
    assert r["n_edge_ends"] == 14  # 7 undirected edges, both directions
    assert r["assortativity"] < 0


def test_word_burstiness_bursty_vs_uniform(spark):
    from demo_flink_spark.operators.textstats import word_burstiness

    # 'aa' once in every doc (F = 0: constant count, zero variance);
    # 'zz' 10 times in one doc only (F = 10*(5-1)/5 = 8)
    docs = spark.createDataFrame(
        [
            (1, "aa " + "zz " * 10),
            (2, "aa"),
            (3, "aa"),
            (4, "aa"),
            (5, "aa"),
        ],
        "doc_id long, text string",
    )
    got = {r["word"]: r for r in word_burstiness(docs, top_k=5).collect()}
    assert got["aa"]["fano_micros"] == 0
    assert got["aa"]["n_docs_with"] == 5
    assert got["zz"]["fano_micros"] == 8_000_000
    assert got["zz"]["n_docs_with"] == 1


def test_sketch_residual_quantile_equals_full_sort(spark):
    """The sketch path must return bit-identical elements to the
    full-sort path, including under adversarial duplicates, and the
    fallback must rescue bands on degenerate tiny groups."""
    from pyspark.sql.window import Window

    from demo_flink_spark.operators.scale import sketch_residual_quantile

    rows = []
    # key 'a': 1000 distinct values; key 'b': heavy duplicates
    # (constant blocks); key 'c': tiny group (3 rows)
    for i in range(1000):
        rows.append(("a", float(i * 7 % 1000), i))
    for i in range(500):
        rows.append(("b", float(i // 100), 10_000 + i))
    for i in range(3):
        rows.append(("c", float(i), 20_000 + i))
    df = spark.createDataFrame(rows, "k string, v double, tb long")

    got = {
        r["k"]: r
        for r in sketch_residual_quantile(df, "k", "v", "tb").collect()
    }
    w = Window.partitionBy("k").orderBy("v", "tb")
    full = df.select(
        "k",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("k")).alias("n"),
    )
    for pct in (50, 90, 99):
        want = {
            r["k"]: r["v"]
            for r in full.filter(
                F.expr(f"rn = (n - 1) * {pct} div 100 + 1")
            ).collect()
        }
        for k in want:
            assert got[k][f"p{pct}"] == want[k], (k, pct)
    assert got["a"]["n"] == 1000 and got["c"]["n"] == 3


def test_cross_correlation_perfect_and_anti(spark):
    from demo_flink_spark.operators.timeseries import cross_correlation

    rows = []
    # 'a' counts 1,2,3,4 per hour; 'b' counts 4,3,2,1 -> r = -1
    for h, (na, nb) in enumerate([(1, 4), (2, 3), (3, 2), (4, 1)]):
        for _ in range(na):
            rows.append(("a", f"2024-03-01 0{h}:10:00"))
        for _ in range(nb):
            rows.append(("b", f"2024-03-01 0{h}:20:00"))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    r = cross_correlation(ev, "a", "b").collect()[0]
    assert r["n_buckets"] == 4
    assert abs(r["r"] - (-1.0)) < 1e-12


def test_cross_correlation_zero_fills_missing_buckets(spark):
    """A bucket where only one side fired must enter as (c, 0) — not
    be dropped by an inner join."""
    from demo_flink_spark.operators.timeseries import cross_correlation

    rows = [("a", "2024-03-01 00:00:00"), ("a", "2024-03-01 01:00:00"),
            ("b", "2024-03-01 01:00:00"), ("b", "2024-03-01 02:00:00")]
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    r = cross_correlation(ev, "a", "b").collect()[0]
    assert r["n_buckets"] == 3  # union of hours 0,1,2
    # series a = (1,1,0), b = (0,1,1) -> r = -0.5
    assert abs(r["r"] - (-0.5)) < 1e-12


def test_ece_perfectly_calibrated_is_zero(spark):
    from demo_flink_spark.operators.evaluation import (
        expected_calibration_error,
    )

    # bin 2 (scores 0.25): half positive; mean 250000, rate 500000
    # -> per-bin gap 250000; single bin -> ECE = 250000
    df = spark.createDataFrame(
        [(0.25, True), (0.25, False)], "s double, y boolean"
    )
    r = expected_calibration_error(df, F.col("s"), F.col("y")).collect()[0]
    assert r["n_bins_used"] == 1 and r["n"] == 2
    assert r["ece_micros"] == 250_000
    # perfectly calibrated: score 0.5, half positive -> gap 0
    df2 = spark.createDataFrame(
        [(0.5, True), (0.5, False)], "s double, y boolean"
    )
    r2 = expected_calibration_error(df2, F.col("s"), F.col("y")).collect()[0]
    assert r2["ece_micros"] == 0


def test_target_encode_loo_excludes_own_row(spark):
    """Hand-check: cat 'x' has targets 100, 300 cents; m=0 degenerates
    to the plain LOO mean — row with y=100 must see 300, not 200."""
    from demo_flink_spark.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [(1, "x", 1.00), (2, "x", 3.00), (3, "z", 5.00), (4, "z", 7.00)],
        "id long, cat string, price double",
    )
    got = {
        r["id"]: r["encoded"]
        for r in target_encode_loo(
            df, "cat", F.round(F.col("price") * 100), ("id",), m=0
        ).collect()
    }
    assert got[1] == 300.0 and got[2] == 100.0
    assert got[3] == 700.0 and got[4] == 500.0


def test_target_encode_loo_smoothing_pulls_to_global(spark):
    from demo_flink_spark.operators.features import target_encode_loo

    df = spark.createDataFrame(
        [(1, "x", 1.00), (2, "x", 3.00), (3, "z", 5.00), (4, "z", 7.00)],
        "id long, cat string, price double",
    )
    got = {
        r["id"]: r["encoded"]
        for r in target_encode_loo(
            df, "cat", F.round(F.col("price") * 100), ("id",), m=1000
        ).collect()
    }
    g = 400.0  # global mean cents
    for v in got.values():
        assert abs(v - g) < 5  # huge m -> everything near the global mean


def test_winsorize_clips_exact_fences(spark):
    from demo_flink_spark.operators.timeseries import winsorize

    # 100 values 0..99 per key: p1 element = rank (99*1)//100+1 = 1
    # -> value 0; p99 element = rank 99*99//100+1 = 99 -> value 98
    rows = [("k", float(i), i) for i in range(100)]
    df = spark.createDataFrame(rows, "key string, v double, id long")
    out = winsorize(df, "key", "v", "id", 1, 99).collect()
    clipped = {r["id"]: r for r in out}
    assert clipped[99]["value_winsorized"] == 98.0
    assert clipped[99]["was_clipped"]
    assert clipped[0]["value_winsorized"] == 0.0
    assert not clipped[0]["was_clipped"]
    assert sum(1 for r in out if r["was_clipped"]) == 1  # only id=99


def test_stl_residual_anomaly_sees_through_seasonality(spark):
    """A clean daily rhythm with one planted genuine anomaly: plain
    magnitude-based flagging would mark every daily peak; the STL
    residual path must flag ONLY the planted hour."""
    from demo_flink_spark.operators.timeseries import (
        mad_outliers,
        stl_decompose,
    )

    rows = []
    for d in range(6):
        for h in range(24):
            # baseline noise floor (deterministic) so the residual MAD
            # is not degenerate-zero, + strong noon seasonal peak
            n = 8 + (d * 7 + h * 3) % 4 + (15 if h == 12 else 0)
            if d == 3 and h == 7:
                n += 40  # the genuine anomaly, off-peak
            for _ in range(n):
                rows.append(("k", f"2024-04-0{d+1} {h:02d}:00:00"))
    ev = spark.createDataFrame(rows, "event_type string, ts_s string").select(
        "event_type", F.col("ts_s").cast("timestamp").alias("ts")
    )
    dec = stl_decompose(ev)
    r = mad_outliers(
        dec, "key", "residual_micros", "window_start", k=3.0
    ).collect()[0]
    # the noon peak is absorbed by the seasonal component; flagged
    # rows are the planted hour, its five phase-siblings (the anomaly
    # lifts its own phase mean by ~40/6, so the sibling 7am rows dip
    # — honest MAD behavior) and a few MA-edge wobbles — far from the
    # 144-row blowup a degenerate-MAD or magnitude rule would give
    assert 1 <= r["n_outliers"] <= 15, r["n_outliers"]
    top = (
        dec.orderBy(F.abs(F.col("residual_micros")).desc())
        .limit(1)
        .collect()[0]
    )
    assert top["window_start"].day == 4 and top["window_start"].hour == 7


def test_dau_wau_hand_computed(spark):
    """3 users over 3 days: WAU(d) counts users active in [d-6, d]."""
    rows = [
        (1, "2024-05-01 10:00:00"),
        (2, "2024-05-01 11:00:00"),
        (1, "2024-05-02 09:00:00"),
        (3, "2024-05-03 08:00:00"),
        (1, "2024-05-03 23:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, ts_s string").select(
        "user_id",
        F.col("ts_s").cast("timestamp").alias("ts"),
        F.lit("click").alias("event_type"),
    )
    import demo_flink_spark.plans.temporal as tp

    # swap the module-level loader so the plan function runs over the
    # fabricated frame
    orig = tp.load_table
    try:
        tp.load_table = lambda spark_, sf_dir, name: ev  # noqa: ARG005
        out = {
            r["day"].day: r for r in tp.q_dau_wau(spark, "ignored").collect()
        }
    finally:
        tp.load_table = orig
    assert (out[1]["dau"], out[1]["wau"]) == (2, 2)
    assert (out[2]["dau"], out[2]["wau"]) == (1, 2)
    assert (out[3]["dau"], out[3]["wau"]) == (2, 3)
    # stickiness: dau*1e6/wau round-half-away
    assert out[3]["stickiness_micros"] == (2 * 2_000_000 + 3) // 6


def test_sketch_and_winsorize_ignore_nulls(spark):
    """NULL values must neither shift quantile target ranks (sketch
    path) nor influence winsorize fences — Spark sorts NULLS FIRST,
    DuckDB NULLS LAST, so any NULL participation would desync the
    engines."""
    from demo_flink_spark.operators.scale import sketch_residual_quantile
    from demo_flink_spark.operators.timeseries import winsorize

    rows = [("k", float(i), i) for i in range(100)]
    with_nulls = rows + [("k", None, 1000 + i) for i in range(50)]
    clean = spark.createDataFrame(rows, "k string, v double, tb long")
    dirty = spark.createDataFrame(with_nulls, "k string, v double, tb long")

    a = sketch_residual_quantile(clean, "k", "v", "tb").collect()[0]
    b = sketch_residual_quantile(dirty, "k", "v", "tb").collect()[0]
    assert (a["n"], a["p50"], a["p90"], a["p99"]) == (
        b["n"], b["p50"], b["p90"], b["p99"],
    )

    wa = {
        r["tb"]: r["value_winsorized"]
        for r in winsorize(clean, "k", "v", "tb").collect()
    }
    wb = {
        r["tb"]: r["value_winsorized"]
        for r in winsorize(dirty, "k", "v", "tb").collect()
        if r["tb"] < 1000
    }
    assert wa == wb


def test_chi_square_counts_empty_cells(spark):
    """A table with a structurally-empty cell: chi2 must include that
    cell's full expected count (perfect-dependence 2x2 with zeros off
    the diagonal -> chi2 == N exactly)."""
    from demo_flink_spark.operators.quality_checks import (
        chi_square_independence,
    )

    rows = [("a", "x")] * 10 + [("b", "y")] * 10  # no (a,y), no (b,x)
    df = spark.createDataFrame(rows, "r string, c string")
    got = chi_square_independence(df, "r", "c").collect()[0]
    assert got["dof"] == 1 and got["n"] == 20
    # perfect association in a 2x2: chi2 = N = 20
    assert got["chi2_micros"] == 20_000_000
