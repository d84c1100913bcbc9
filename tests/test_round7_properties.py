"""Property tests for the round-7 exactness claims: PPJoin
losslessness and BFS correctness against pure-Python references over
randomized inputs — the fixture tests pin known cases; these pin the
LEMMAS."""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


def _py_shingles(text: str, n: int = 3) -> set[str]:
    """Python twin of operators.dedup.shingles' semantics."""
    import re

    toks = re.sub(r"\s+", " ", re.sub(r"[^a-z\s]", "", text.lower())).strip()
    toks = toks.split(" ") if toks else []
    return {" ".join(toks[i : i + n]) for i in range(max(len(toks) - n, 0) + 1)}


_WORDS = ["aa", "bb", "cc", "dd", "ee", "ff", "gg", "hh"]


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=10),
        min_size=2,
        max_size=6,
    )
)
def test_ppjoin_lossless_property(spark, docs):
    """For random tiny corpora over a shared vocabulary (maximal
    shingle collisions), the prefix-filtered join must emit EXACTLY
    the brute-force pair set at threshold 2/5."""
    from demo_flink_spark.operators.dedup import ppjoin_prefix_pairs

    rows = [(i, " ".join(words)) for i, words in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_a"], r["doc_b"]): r["n_common"]
        for r in ppjoin_prefix_pairs(
            df, n=3, threshold_num=2, threshold_den=5
        ).collect()
    }
    sh = {i: _py_shingles(t) for i, t in rows}
    want = {}
    for a in sh:
        for b in sh:
            if a < b and sh[a] and sh[b]:
                c = len(sh[a] & sh[b])
                if 5 * c >= 2 * (len(sh[a]) + len(sh[b]) - c):
                    want[(a, b)] = c
    assert got == want


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    edges=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=7),
            st.integers(min_value=0, max_value=7),
        ),
        min_size=1,
        max_size=15,
    ),
    seed=st.integers(min_value=0, max_value=7),
)
def test_bfs_hops_property(spark, edges, seed):
    """Frontier-iteration BFS must equal a Python BFS on random small
    directed graphs (cycles, self-loops, disconnected parts)."""
    from collections import deque

    # pure-python reference
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
    want = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if want[u] >= 4:
            continue
        for v in adj.get(u, ()):
            if v not in want:
                want[v] = want[u] + 1
                q.append(v)

    from demo_flink_spark.operators.graph import bfs_hops

    e = spark.createDataFrame(edges, "src long, dst long")
    seeds = spark.createDataFrame([(seed,)], "node long")
    got = {r["node"]: r["hops"] for r in bfs_hops(e, seeds, 4).collect()}
    assert got == want
