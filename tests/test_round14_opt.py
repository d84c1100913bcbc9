"""Round-14 optimization receipts: pin the properties the r14
rewrites rely on, so a regression in Spark semantics (or a later
refactor) fails HERE with a named reason instead of as an opaque
oracle hash mismatch.

Covered rewrites (all output-identical, oracle-verified at sf0.001/
sf0.01 full-registry and sf0.1 for every touched query):
- label_propagation: two-level plurality vote -> one deterministic
  mode() aggregate (depends on mode(col, deterministic=True)
  breaking frequency ties by SMALLEST value);
- bfs_hops: per-hop lazy-union visited set + exact-count broadcast
  hints (depends on loop algebra: union-of-frontiers == accumulated
  distance table, and on the early-exit break);
- bm25 doc length via size(tokens) (depends on zero-token docs being
  excluded exactly as the old explode+groupBy excluded them);
- load_table session handle cache (metadata-only, keyed by session
  and sf_dir);
- _copurchase_edges list-based pair generation (depends on
  multiplicity-exact equivalence with the old lineitem self-join —
  duplicate (order, part) rows pair with every later distinct part).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def spark():
    from demo_flink_spark.session import get_spark

    s = get_spark("test_round14_opt")
    s.sparkContext.setLogLevel("ERROR")
    return s


def test_mode_deterministic_breaks_ties_to_smallest(spark):
    """The LPA rewrite's load-bearing assumption about Spark's API:
    mode(col, deterministic=True) == plurality with smallest-value
    tie-break, verified against a Python reference on a seeded
    multiset that includes ties, negatives and single votes."""
    import random

    rng = random.Random(14)
    rows = []
    expected = {}
    for g in range(40):
        votes = [rng.randrange(-5, 6) for _ in range(rng.randrange(1, 12))]
        rows += [(g, v) for v in votes]
        counts: dict[int, int] = {}
        for v in votes:
            counts[v] = counts.get(v, 0) + 1
        best = max(counts.values())
        expected[g] = min(v for v, c in counts.items() if c == best)
    got = {
        r["g"]: r["m"]
        for r in spark.createDataFrame(rows, "g int, v long")
        .groupBy("g")
        .agg(F.mode("v", True).alias("m"))
        .collect()
    }
    assert got == expected


def test_bfs_hops_lazy_union_loop(spark):
    """Known-graph receipt for the r14 loop restructure: min-hop
    distances over a chain+branch graph, including the early break
    when a frontier empties before max_hops."""
    from demo_flink_spark.operators.graph import bfs_hops

    # 1->2->3->4 chain, 1->5, 6 isolated from the seeds
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (1, 5), (6, 7)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, seeds, max_hops=10).collect()}
    assert got == {1: 0, 2: 1, 5: 1, 3: 2, 4: 3}


def test_bm25_dl_excludes_zero_token_docs_exactly(spark):
    """The size(tokens) doc-length rewrite must reproduce the old
    explode+groupBy semantics: a doc that normalizes to zero tokens
    contributes NOTHING (not a dl=0 row) to n_docs/avgdl, so adding
    one changes no score."""
    from demo_flink_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        [(1, "apple banana apple"), (2, "banana cherry"), (3, "apple date")],
        "doc_id long, text string",
    )
    with_empty = docs.union(
        spark.createDataFrame([(4, "12345 !!! ...")], "doc_id long, text string")
    )
    base = {
        (r["doc_id"]): (r["n_matched"], r["score"])
        for r in bm25_scores(docs, ["apple", "cherry"]).collect()
    }
    plus = {
        (r["doc_id"]): (r["n_matched"], r["score"])
        for r in bm25_scores(with_empty, ["apple", "cherry"]).collect()
    }
    assert base == plus


def test_bm25_dl_sums_duplicate_doc_ids(spark):
    """Review r14: the dl rewrite must keep the old explode+groupBy
    semantics under DUPLICATE doc_ids — one dl row per doc_id with
    the SUMMED token count, one n_docs contribution per doc_id."""
    from demo_flink_spark.operators.search import bm25_scores

    uni = spark.createDataFrame(
        [(1, "apple banana apple cherry"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    dup = spark.createDataFrame(
        [(1, "apple banana"), (1, "apple cherry"), (2, "banana cherry")],
        "doc_id long, text string",
    )
    # same multiset of tokens per doc_id => identical dl/n_docs/avgdl
    # => identical tf-normalized scores
    r_uni = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_scores(uni, ["apple", "cherry"]).collect()
    }
    r_dup = {
        r["doc_id"]: (r["n_matched"], r["score"])
        for r in bm25_scores(dup, ["apple", "cherry"]).collect()
    }
    assert r_uni == r_dup


def test_load_table_handle_cache_is_per_session(spark):
    """Review r14: a `newSession()` sibling shares the applicationId
    but must get its OWN handle (a DataFrame is bound to the session
    that created it)."""
    from demo_flink_spark.sources import load_table

    sib = spark.newSession()
    a = load_table(spark, SF_DIR, "lineitem")
    b = load_table(sib, SF_DIR, "lineitem")
    assert a is not b
    assert b is load_table(sib, SF_DIR, "lineitem")
    assert b.sparkSession is sib


def test_load_table_handle_cache(spark):
    """Repeat load_table calls return the SAME DataFrame handle per
    (session, sf_dir, table) — metadata caching only — and distinct
    handles across sf_dirs; the events ts normalization survives the
    cached path."""
    from demo_flink_spark.sources import load_table

    a = load_table(spark, SF_DIR, "lineitem")
    b = load_table(spark, SF_DIR, "lineitem")
    assert a is b
    c = load_table(spark, "/root/testdata/sf0.01", "lineitem")
    assert c is not a
    ev = load_table(spark, SF_DIR, "events")
    assert ev is load_table(spark, SF_DIR, "events")
    assert dict(ev.dtypes)["ts"] == "timestamp"


def test_copurchase_pairgen_multiplicity_exact(spark, tmp_path):
    """The list-based pair generator must count duplicate
    (order, part) rows exactly like the old lineitem self-join with
    l_partkey < p2: order [a, a, b] yields (a, b) TWICE (each a-row
    pairs with b), never (a, a). With the >= 2 co-order floor, one
    such order alone is enough to keep the edge."""
    from demo_flink_spark.plans.graph import _copurchase_edges

    rows = [
        # order 1: parts [10, 10, 20] -> pair (10,20) x2 => n_co=2, kept
        (1, 10), (1, 10), (1, 20),
        # order 2: parts [30, 40] -> pair (30,40) x1 => dropped (<2)
        (2, 30), (2, 40),
        # orders 3+4 both contain [50, 60] -> n_co=2, kept
        (3, 50), (3, 60), (4, 50), (4, 60),
    ]
    sf = tmp_path / "sf_tiny"
    sf.mkdir()
    spark.createDataFrame(
        rows, "l_orderkey long, l_partkey long"
    ).coalesce(1).write.parquet(str(sf / "lineitem.parquet"))
    got = {
        (r["src"], r["dst"])
        for r in _copurchase_edges(spark, str(sf)).collect()
    }
    assert got == {(10, 20), (50, 60)}
