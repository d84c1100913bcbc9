"""PageRank correctness vs a NumPy power-iteration twin.

The declared query is rows-only for the driver (iterative double sums
are partition-order-dependent), so this test is the numeric ground
truth: the Spark ranks must match a dense NumPy implementation of the
same update rule to tight tolerance.
"""

from __future__ import annotations

import numpy as np

from demo_flink_spark.operators.graph import pagerank

# directed graph WITH a dangling node (d has no out-edges) so the
# leak semantics documented on the operator are pinned too
EDGES = [
    ("a", "b"),
    ("a", "c"),
    ("b", "c"),
    ("c", "a"),
    ("b", "d"),
]


def _numpy_pagerank(edges, damping, n_iter):
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    outdeg = np.zeros(n)
    for u, _ in edges:
        outdeg[idx[u]] += 1
    rank = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nxt = np.full(n, (1.0 - damping) / n)
        for u, v in edges:
            nxt[idx[v]] += damping * rank[idx[u]] / outdeg[idx[u]]
        rank = nxt
    return dict(zip(nodes, rank))


def test_pagerank_matches_numpy(spark):
    edges = spark.createDataFrame(EDGES, "src string, dst string")
    got = {
        r["node"]: r["rank"]
        for r in pagerank(edges, damping=0.85, n_iter=12).collect()
    }
    want = _numpy_pagerank(EDGES, 0.85, 12)
    assert set(got) == set(want)
    for node, w in want.items():
        assert abs(got[node] - w) < 1e-9, node
    # dangling node d leaks mass: total < 1, and c (two in-edges from
    # the main cycle) outranks the dangling sink
    assert sum(got.values()) < 1.0
    assert got["c"] > got["d"]


def test_pagerank_exact_early_exit(spark):
    """On a d-regular graph the uniform start is within ulps of the
    quantized fixed point, so the Q52-exact convergence signature
    fires within a few rounds: the early exit must (a) run measurably
    fewer iterations than requested and (b) return EXACTLY the ranks
    the full run produces — the exit only triggers at a true fixed
    point, so equality is bitwise, not approximate."""
    # circulant 4-regular graph on 8 nodes: every node has out-deg 4
    n, offs = 8, (1, 2, 6, 7)
    edges = [(f"v{i}", f"v{(i + o) % n}") for i in range(n) for o in offs]
    df = spark.createDataFrame(edges, "src string, dst string")
    stats: dict = {}
    fast = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=40, stats=stats, checkpoint_every=3).collect()
    }
    assert stats["iterations"] < 40, "early exit never fired"
    full = {
        r["node"]: r["rank"]
        for r in pagerank(df, n_iter=40, early_exit=False).collect()
    }
    assert fast == full  # bitwise, not approx


def test_pagerank_symmetric_conserves_mass(spark):
    sym = EDGES + [(v, u) for u, v in EDGES]
    edges = spark.createDataFrame(sym, "src string, dst string")
    got = pagerank(edges, damping=0.85, n_iter=8).collect()
    total = sum(r["rank"] for r in got)
    assert abs(total - 1.0) < 1e-9


def test_triangle_count_known_graphs(spark):
    from demo_flink_spark.operators.graph import triangle_count

    # K4 = 4 triangles; duplicate/reversed edge rows must not inflate
    k4 = [(a, b) for a in range(4) for b in range(4) if a != b]
    df = spark.createDataFrame(k4 + k4[:3], "src int, dst int")
    row = triangle_count(df).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (4, 6, 4)


def test_triangle_count_hub_star_plus_cycle(spark):
    from demo_flink_spark.operators.graph import triangle_count

    # star hub 0--{1..20} has no triangles; adding edge 1-2 closes one
    edges = [(0, i) for i in range(1, 21)] + [(1, 2)]
    row = triangle_count(
        spark.createDataFrame(edges, "src int, dst int")
    ).collect()[0]
    assert (row.n_nodes, row.n_edges, row.n_triangles) == (21, 21, 1)


def test_bm25_ranks_by_term_frequency(spark):
    from demo_flink_spark.operators.search import bm25_scores

    docs = spark.createDataFrame(
        [
            (1, "alpha alpha alpha beta"),
            (2, "alpha beta gamma delta"),
            (3, "gamma delta gamma delta"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in bm25_scores(docs, ["alpha"]).collect()}
    assert set(got) == {1, 2}  # doc 3 never matches
    assert got[1].n_matched == 1 and got[2].n_matched == 1
    assert got[1].score > got[2].score > 0  # higher tf, same dl -> higher
