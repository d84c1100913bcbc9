"""Iterative graph operators on edge-list DataFrames.

Connected components (min-label and large-star/small-star) live in
`operators.dedup` where their consumer (duplicate-cluster resolution)
is; this module holds the general-purpose iterative algorithms. The
design rules for iteration on Spark, applied throughout:

- the edge list is the loop invariant: materialize it ONCE with
  `localCheckpoint` and reuse, so each iteration re-reads a local
  shuffle-free RDD instead of re-running the upstream plan;
- per-iteration lineage must not accumulate: checkpoint the evolving
  rank/label state every few rounds or the plan tree (and task
  serialization time) grows linearly with iterations;
- everything is joins + aggregations on the key — no driver-side
  adjacency, so the graph can be arbitrarily larger than any single
  machine. Per-iteration cost: one shuffle join (contributions) plus
  one shuffle agg (per-dst sum).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.operators.checkpointing import cut_lineage, cut_lineage_lazy
from demo_flink_spark.operators.hints import broadcast_if_small

# Q52 fixed-point scale for exact, engine-portable contribution sums
_Q52 = float(1 << 52)


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src_col: str = "src",
    dst_col: str = "dst",
    checkpoint_every: int = 3,
    early_exit: bool = True,
    stats: dict | None = None,
) -> DataFrame:
    """Power-iteration PageRank over a directed edge list; returns
    (node, rank) for every node that appears in the edge list.

    rank_{t+1}(v) = (1-d)/N + d * Σ_{u→v} rank_t(u)/outdeg(u)

    Dangling nodes (no out-edges) leak their mass under this update —
    standard behavior for the simple formulation; callers who need
    mass conservation should symmetrize the edge list (see
    `q_pagerank_copurchase`, which uses an undirected bipartite graph,
    so every node has out-edges and total rank stays 1).

    Floating-point note: contributions accumulate in Q52 fixed point —
    each per-edge product (a deterministic IEEE double ≤ 1) is scaled
    by 2^52 (EXACT: power-of-two multiply), floored to a long, summed
    exactly (longs; per-dst total ≤ 2^52, no overflow), and divided
    back by 2^52 (exact: quotient has ≤ 53 significant bits). Every
    step is bit-deterministic under any partitioning AND identical in
    any engine mirroring the formula (see the unrolled DuckDB oracle in
    plans/graph.py), while staying on the codegen'd long-sum fast path
    — decimal(38,30) accumulation gave the same determinism at ~5x the
    aggregation cost. Quantization error is 2^-52 per edge, orders
    below float noise for ranking.

    The per-iteration body stays lazy (no job per iteration), with
    lineage cut by an eager `localCheckpoint` every `checkpoint_every`
    iterations — without the cut the plan doubles per iteration;
    checkpointing EVERY iteration, or collecting the broadcast-sized
    rank vector and re-creating a local relation, each added ~0.5-2 s
    of per-iteration materialization overhead and lost to this hybrid
    at every scale tested.

    Exact early exit (`early_exit=True`): the Q52 representation makes
    rank equality well-defined in bits, so at each checkpoint boundary
    (where the vector is materialized anyway) a 2-value convergence
    signature — (count, Σ xxhash64(node, rank)) — is collected, the
    same pattern as the connected-components fixed point
    (`operators/dedup.py` star contraction). When two consecutive
    boundaries agree, ONE verification iteration confirms a true
    fixed point (`f(r) = r`, not merely an `f^k` cycle) and — because
    a 64-bit signature can in principle collide — the final exit is
    gated on an EXACT anti-join equality check of the two vectors
    (one |V|-row job, runs at most once per call), after which the
    early return is bit-identical to running all `n_iter` rounds. With damping 0.85 the residual shrinks ~0.85^t, so
    exact convergence needs O(52·ln2/0.16) ≈ 220 rounds on generic
    graphs — the exit is for near-regular graphs (uniform start is
    already ulps from the fixed point) and high-`n_iter` callers, not
    a speedup for 10-round runs. `stats["iterations"]` reports the
    executed round count.
    """
    e = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # loop invariant: (src, dst, 1/deg) materialized once; carrying the
    # reciprocal keeps the loop body a multiply, not a division
    withdeg = (
        e.join(deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("deg")).alias("inv_deg"))
        .transform(cut_lineage_lazy)
    )
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
        .transform(cut_lineage_lazy)
    )
    n = nodes.count()
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("rank", F.lit(1.0 / n))

    def _step(r: DataFrame) -> DataFrame:
        # rank vector is |V| rows — on catalog-keyed graphs tiny next
        # to |E|, so it rides a broadcast and the edge list never
        # moves. But |V| can grow with the data (user/URL graphs), and
        # a forced broadcast there is an OOM, not a slow plan — so the
        # hint is conditional on |V| fitting the session's broadcast
        # threshold (n is already counted above for the base term; the
        # estimate costs nothing) and degrades to a shuffle join. The
        # only unconditional per-iteration shuffle is the per-dst
        # contribution sum, which map-side partials compress to ~|V|
        # rows per task.
        contribs = (
            withdeg.join(broadcast_if_small(r, n), withdeg.src == r.node)
            .select("dst", (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("dst")
            # Q52 fixed-point accumulation (see docstring): exact,
            # order-independent, cross-engine-identical, codegen-fast
            .agg(
                (
                    F.sum(F.floor(F.col("c") * F.lit(_Q52)).cast("long"))
                    .cast("double")
                    / F.lit(_Q52)
                ).alias("contrib")
            )
        )
        # contribs is also ≤|V|-sized: same conditional hint, so small
        # graphs get a broadcast rebuild and large ones a shuffle join
        return nodes.join(
            broadcast_if_small(contribs, n), nodes.node == contribs.dst, "left"
        ).select(
            "node",
            (
                F.lit(base)
                + F.lit(damping) * F.coalesce(F.col("contrib"), F.lit(0.0))
            ).alias("rank"),
        )

    def _sig(r: DataFrame):
        # 2-value convergence signature over the (materialized) vector
        row = r.agg(
            F.count(F.lit(1)).alias("n"), F.sum(F.xxhash64("node", "rank")).alias("h")
        ).collect()[0]
        return row["n"], row["h"]

    prev_sig = None
    i = 0
    while i < n_iter:
        ranks = _step(ranks)
        i += 1
        # cut lineage: without this the plan doubles per iteration
        if i % checkpoint_every == 0 and i < n_iter:
            ranks = ranks.transform(cut_lineage)
            if early_exit:
                sig = _sig(ranks)
                if sig == prev_sig:
                    # f^checkpoint_every fixed point — verify a TRUE
                    # fixed point with one extra iteration before
                    # exiting (a k-cycle that is not a fixed point is
                    # theoretically possible under quantization)
                    nxt = _step(ranks).transform(cut_lineage)
                    i += 1
                    nxt_sig = _sig(nxt)
                    # signature agreement is necessary but (64-bit
                    # hash) not sufficient: prove f(r) = r exactly
                    # with one |V|-row anti-join before exiting
                    if nxt_sig == sig and nxt.join(
                        ranks, ["node", "rank"], "left_anti"
                    ).isEmpty():
                        ranks = nxt
                        break
                    ranks = nxt
                    sig = nxt_sig
                prev_sig = sig
    if stats is not None:
        stats["iterations"] = i
    return ranks


def triangle_count(
    edges: DataFrame, src_col: str = "src", dst_col: str = "dst"
) -> DataFrame:
    """Count triangles in an undirected graph given as (possibly
    duplicated, possibly both-direction) edge rows. Returns one row
    (n_nodes, n_edges, n_triangles).

    Degree-ordered forward counting — the MapReduce-era standard
    (Suri & Vassilvitskii's "node-iterator++"): orient each undirected
    edge from its lower-(degree, id) endpoint to the higher one, form
    wedges only at each edge's *lower* endpoint, and close them against
    the oriented edge list. Out-degree under this orientation is
    O(sqrt(m)) regardless of skew, so the wedge set — the quadratic
    hazard in triangle counting — stays near-linear even when a
    celebrity node has 10^7 neighbors. Everything is an equi-join on
    node ids (8-byte shuffle keys); the oriented edge list is
    checkpointed once and reused by both sides of the wedge join.
    """
    a, b = F.col(src_col), F.col(dst_col)
    # e feeds FOUR plan branches (degree union x2, orientation join,
    # final edge count) — checkpoint or the caller's edge derivation
    # (often a fact-table self-join) re-executes per branch
    e = (
        edges.select(F.least(a, b).alias("a"), F.greatest(a, b).alias("b"))
        .filter(F.col("a") != F.col("b"))
        .distinct()
        .transform(cut_lineage_lazy)
    )
    deg = (
        e.select(F.col("a").alias("node"))
        .union(e.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("deg").alias("deg_a"))
    db = deg.select(F.col("node").alias("b"), F.col("deg").alias("deg_b"))
    lower_first = (F.col("deg_a") < F.col("deg_b")) | (
        (F.col("deg_a") == F.col("deg_b")) & (F.col("a") < F.col("b"))
    )
    oriented = (
        e.join(da, "a")
        .join(db, "b")
        .select(
            F.when(lower_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(lower_first, F.col("b")).otherwise(F.col("a")).alias("v"),
            F.when(lower_first, F.col("deg_b"))
            .otherwise(F.col("deg_a"))
            .alias("deg_v"),
        )
        .transform(cut_lineage_lazy)  # reused three times below
    )
    # wedges at the low-degree center u: (v, w) out-neighbor pairs,
    # ordered by the same (deg, id) rank so each triangle closes once
    o1 = oriented.select("u", F.col("v").alias("v1"), F.col("deg_v").alias("d1"))
    o2 = oriented.select("u", F.col("v").alias("v2"), F.col("deg_v").alias("d2"))
    wedges = o1.join(o2, "u").filter(
        (F.col("d1") < F.col("d2"))
        | ((F.col("d1") == F.col("d2")) & (F.col("v1") < F.col("v2")))
    )
    closed = wedges.join(
        oriented.select(F.col("u").alias("v1"), F.col("v").alias("v2")),
        ["v1", "v2"],
        "left_semi",
    )
    return (
        closed.agg(F.count(F.lit(1)).alias("n_triangles"))
        .crossJoin(e.agg(F.count(F.lit(1)).alias("n_edges")))
        .crossJoin(deg.agg(F.count(F.lit(1)).alias("n_nodes")))
        .select("n_nodes", "n_edges", "n_triangles")
    )
