"""Planted-structure synthetic scaling probe for the iterative graph
family (pagerank / label propagation / multi-source BFS).

    python tools/scale_probe_graph.py [max_nodes]

The registry probe's graph evidence stops at the sf1 synthetic
(~10M directed edge rows for the co-purchase bipartite graph); these
queries are the bench's cost ceiling, so their asymptote deserves the
same synthetic-decade treatment the dedup family got in r9
(tools/scale_probe_synth.py). This probe generates graphs with
PLANTED, closed-form truth — every cell asserts exact correctness
before its timing counts, so a convergence/recall regression fails
the probe rather than flattering it:

- pagerank: C disjoint SYMMETRIZED STARS of 17 nodes (hub = min id).
  Symmetry ⇒ every hub rank identical, every leaf rank identical —
  assert exactly 2 distinct Q52 rank values, hub > leaf, node count,
  and Σrank = 1 (no dangling nodes ⇒ mass conserved; Q52 quantization
  bounds the drift far under the 1e-6 assert). Uniform start is NOT
  the fixed point (hub ≠ leaf), so all n_iter=10 rounds run — same
  shape as the declared query.
- label propagation: C disjoint undirected CHAINS of 5 nodes with the
  min id at the head. Synchronous-with-self-vote LPA with min tie-
  break converges in exactly k-1 = 4 rounds (label_i after round r is
  min over the [i-r, i+r] window), i.e. exactly the declared query's
  default n_rounds=4 — assert EVERY node's community equals its chain
  head (node div 5 * 5): a full per-node equality check, not a count
  heuristic.
- BFS: the same chains, directed head→tail, seeds = the C heads —
  assert the hop histogram is exactly {h: C for h in 0..4}.
- `cc` mode (`python tools/scale_probe_graph.py cc [max_nodes]`):
  connected_components_star over LONG chains (length 1000 — diameter
  999, the adversarial shape the large-star/small-star variant exists
  for; the min-label walker would need 999 rounds and raises at its
  20-round cap by design). Asserts EVERY node's component equals its
  chain head. The differentiating receipt: round count stays ~log²
  (the convergence loop's iteration cap is 30 and is never hit)
  while the work per round is linear in edges.
- `skew` mode (`python tools/scale_probe_graph.py skew [max_nodes]`):
  the planted stars/chains above are uniform-degree; the 100 TB
  brief's named hazard is the HOT KEY (celebrity node / hot trade
  id), so this mode plants hub-dominated graphs and re-times
  pagerank/BFS (VERDICT r10 item 3):
  - pagerank: ONE mega-star over the first n/10 nodes (hub = node 0,
    degree n/10 − 1 — one node owning ~10.6% of all edge rows, so
    the contributions groupBy(dst) has a single key carrying 10% of
    the shuffle) + uniform 17-stars over the remaining 9n/10. Truth
    stays closed-form BY GROUP: symmetry makes every mega-leaf /
    small-hub / small-leaf rank identical, and the four group values
    follow an exact 4-term scalar recurrence (the same update the
    engine computes, collapsed by symmetry) — the probe iterates the
    recurrence in Python and asserts each group's measured rank
    matches it to 1e-6 relative (the Q52 pipeline is deterministic;
    worst-case quantization drift is ~1.4e-10 absolute on the mega
    hub, orders below the tolerance), plus per-group rank
    uniqueness, node count, and Σrank = 1.
  - BFS: a star-of-chains — hub 0 → C chain heads, each chain 5
    nodes (n = 5C + 1): the hop-1 expansion explodes one frontier
    row into C = ~n/5 neighbors (maximal frontier skew), and the
    planted histogram is exactly {0: 1, h: C for h ∈ 1..5}.
  n must be divisible by 170 (both shapes tile); the default sizes
  mirror the uniform probe's, so SCALING.md shows the skewed slopes
  beside the uniform ones through the same 25.7M-node top cell.

Methodology carried from the r9 synth probe: warm run + MEDIAN of 3
measured reps per cell; edges persist()ed and released between sizes;
reliable disk checkpoint dir under a per-run mkdtemp (removed at
exit); shuffle partitions sized to the data (128 — the documented
"err high, AQE coalesces" deployment rule; the iterative state joins
at the top sizes would spill at the 32 default exactly like the r9
PPJoin cells). Node counts default 102k → 6.426M (pass 25704000 —
sizes are multiples of lcm(17, 5) = 85 — for the top decade recorded
in SCALING.md); edge-row counts per cell are printed so the table
reads in edges. Results are appended to
SCALING.md by hand (the probe prints a markdown table).
"""

from __future__ import annotations

import math
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.graph import (
        bfs_hops,
        label_propagation,
        pagerank,
    )
    from demo_flink_spark.session import get_spark

    mode = sys.argv[1] if len(sys.argv) > 1 and sys.argv[1] in ("cc", "skew") else None
    cc_mode = mode == "cc"
    skew_mode = mode == "skew"
    if mode:
        size_arg = sys.argv[2] if len(sys.argv) > 2 else None
    else:
        size_arg = sys.argv[1] if len(sys.argv) > 1 else None
    # default covers the first four sizes; pass 25704000 for the top
    # decade recorded in SCALING.md (sizes are multiples of
    # lcm(17, 5) = 85 so both component shapes tile exactly)
    max_nodes = int(size_arg) if size_arg else 6_426_000
    # optional trailing min-size arg: rerun a single upper cell
    # without re-measuring the recorded smaller ones
    min_idx = 3 if mode else 2
    min_nodes = int(sys.argv[min_idx]) if len(sys.argv) > min_idx else 0
    spark = get_spark(
        "scale_probe_graph",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            "spark.sql.shuffle.partitions": "128",
            # reliable checkpoints of GC'd RDDs are deleted (paired
            # with the forced GC in reclaim() below): without this,
            # every round's cut_lineage checkpoint of every rep
            # accumulates for the whole session — the cc 1.6M cell
            # exhausted the box's ~80 GB of free disk mid-rep on the
            # first r11 attempt
            "spark.cleaner.referenceTracking.cleanCheckpoints": "true",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    import atexit
    import gc
    import shutil
    import tempfile

    ckpt_root = tempfile.mkdtemp(prefix="spark_graft_graph_ckpt_")
    atexit.register(shutil.rmtree, ckpt_root, ignore_errors=True)
    reclaim_state = {"rep": 0, "dir": None}

    def reclaim() -> None:
        """Between-reps disk reclamation: each heavy-cell rep writes
        tens of GB of reliable checkpoints + shuffle files that local
        mode only reclaims on driver GC. Point the NEXT rep at a fresh
        checkpoint subdir, drop Python-side wrappers, force a JVM GC
        so ContextCleaner deletes dead shuffles/checkpoints, then
        remove the dead rep's subdir outright — bounding peak disk at
        ~one rep's footprint regardless of GC timing. Runs OUTSIDE
        the timed window (timed_median calls it after each rep's
        clock stops)."""
        old = reclaim_state["dir"]
        reclaim_state["rep"] += 1
        new = os.path.join(ckpt_root, f"rep{reclaim_state['rep']}")
        os.makedirs(new, exist_ok=True)
        spark.sparkContext.setCheckpointDir(new)
        reclaim_state["dir"] = new
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        time.sleep(3)
        if old:
            shutil.rmtree(old, ignore_errors=True)

    reclaim()  # set the first checkpoint subdir

    K_STAR = 17  # star component size (hub + 16 leaves)
    K_CHAIN = 5  # chain component size

    def star_edges(n: int):
        """Symmetrized star edges over n nodes (n divisible by 17):
        hub(c) = 17c; every leaf id (id % 17 != 0) yields both
        directions. Generated as a narrow map over range(n)."""
        hub = (F.col("id") - F.col("id") % K_STAR).alias("hub")
        return (
            spark.range(n)
            .filter(F.col("id") % K_STAR != 0)
            .select(
                F.explode(
                    F.array(
                        F.struct(
                            F.col("id").alias("src"), hub.alias("dst")
                        ),
                        F.struct(
                            hub.alias("src"), F.col("id").alias("dst")
                        ),
                    )
                ).alias("e")
            )
            .select("e.src", "e.dst")
        )

    def chain_edges(n: int, symmetric: bool):
        """Chain edges over n nodes (n divisible by 5): i → i+1 within
        each block of 5; both directions when symmetric (LPA)."""
        nxt = (F.col("id") + 1).alias("nxt")
        base = spark.range(n).filter(F.col("id") % K_CHAIN != K_CHAIN - 1)
        if not symmetric:
            return base.select(F.col("id").alias("src"), nxt.alias("dst"))
        return base.select(
            F.explode(
                F.array(
                    F.struct(F.col("id").alias("src"), nxt.alias("dst")),
                    F.struct(nxt.alias("src"), F.col("id").alias("dst")),
                )
            ).alias("e")
        ).select("e.src", "e.dst")

    def timed_median(run_and_assert, label: str) -> float:
        run_and_assert()  # warm (codegen, shuffle files)
        reclaim()
        ts = []
        for _ in range(3):
            t0 = time.time()
            run_and_assert()
            ts.append(time.time() - t0)
            reclaim()  # outside the timed window
        # per-cell progress line: the top cells run minutes each, so
        # a long run should be monitorable before its size completes
        print(f"  {label}: reps {[round(t, 1) for t in ts]}", flush=True)
        return sorted(ts)[1]

    def probe_pagerank(n: int) -> tuple[float, int]:
        edges = star_edges(n).persist()
        m = edges.count()

        def run():
            r = pagerank(edges)  # query defaults: n_iter=10, d=0.85
            agg = r.agg(
                F.count(F.lit(1)).alias("n"),
                F.countDistinct("rank").alias("ndv"),
                F.sum("rank").alias("s"),
                F.max(F.when(F.col("node") % K_STAR == 0, F.col("rank"))).alias("hub"),
                F.max(F.when(F.col("node") % K_STAR != 0, F.col("rank"))).alias("leaf"),
            ).collect()[0]
            assert agg["n"] == n, f"pagerank node count {agg['n']} != {n}"
            assert agg["ndv"] == 2, (
                f"pagerank symmetry broken: {agg['ndv']} distinct ranks != 2"
            )
            assert abs(agg["s"] - 1.0) < 1e-6, (
                f"pagerank mass not conserved: sum={agg['s']}"
            )
            assert agg["hub"] > agg["leaf"], "hub rank must exceed leaf rank"

        t = timed_median(run, f"pagerank n={n}")
        edges.unpersist(blocking=True)
        spark.catalog.clearCache()
        return t, m

    def probe_lpa(n: int) -> tuple[float, int]:
        edges = chain_edges(n, symmetric=True).persist()
        m = edges.count()

        def run():
            lab = label_propagation(edges)  # query default n_rounds=4
            bad = lab.filter(
                F.col("community")
                != F.col("node") - F.col("node") % K_CHAIN
            ).count()
            assert bad == 0, f"LPA planted-community mismatch on {bad} nodes"
            total = lab.count()
            assert total == n, f"LPA node count {total} != {n}"

        t = timed_median(run, f"lpa n={n}")
        edges.unpersist(blocking=True)
        spark.catalog.clearCache()
        return t, m

    def probe_bfs(n: int) -> tuple[float, int]:
        edges = chain_edges(n, symmetric=False).persist()
        m = edges.count()
        c = n // K_CHAIN
        seeds = spark.range(c).select(
            (F.col("id") * K_CHAIN).alias("node")
        )

        def run():
            hops = bfs_hops(edges, seeds, max_hops=K_CHAIN - 1)
            hist = {
                r["hops"]: r["cnt"]
                for r in hops.groupBy("hops")
                .agg(F.count(F.lit(1)).alias("cnt"))
                .collect()
            }
            want = {h: c for h in range(K_CHAIN)}
            assert hist == want, f"BFS hop histogram {hist} != planted {want}"

        t = timed_median(run, f"bfs n={n}")
        edges.unpersist(blocking=True)
        spark.catalog.clearCache()
        return t, m

    if skew_mode:
        K_MEGA_FRAC = 10  # mega block = n / 10 nodes, hub = node 0

        def skew_star_edges(n: int):
            """One symmetrized mega-star over [0, n/10) (hub 0) plus
            symmetrized 17-stars over [M, n): the hot-key graph. n
            must be divisible by 170 so both shapes tile exactly."""
            M = n // K_MEGA_FRAC
            mega = (
                spark.range(1, M)
                .select(
                    F.explode(
                        F.array(
                            F.struct(
                                F.col("id").alias("src"),
                                F.lit(0).cast("long").alias("dst"),
                            ),
                            F.struct(
                                F.lit(0).cast("long").alias("src"),
                                F.col("id").alias("dst"),
                            ),
                        )
                    ).alias("e")
                )
                .select("e.src", "e.dst")
            )
            hub = (
                F.col("id") - (F.col("id") - F.lit(M)) % K_STAR
            ).alias("hub")
            small = (
                spark.range(M, n)
                .filter((F.col("id") - F.lit(M)) % K_STAR != 0)
                .select(
                    F.explode(
                        F.array(
                            F.struct(F.col("id").alias("src"), hub.alias("dst")),
                            F.struct(hub.alias("src"), F.col("id").alias("dst")),
                        )
                    ).alias("e")
                )
                .select("e.src", "e.dst")
            )
            return mega.unionAll(small)

        def expected_group_ranks(n: int, d: float = 0.85, n_iter: int = 10):
            """The engine's update collapsed by symmetry: four scalar
            values (mega hub/leaf, small hub/leaf) iterated exactly
            like the distributed Q52 pipeline — the planted truth."""
            M = n // K_MEGA_FRAC
            rmh = rml = rsh = rsl = 1.0 / n
            for _ in range(n_iter):
                rmh, rml, rsh, rsl = (
                    (1 - d) / n + d * (M - 1) * rml,
                    (1 - d) / n + d * rmh / (M - 1),
                    (1 - d) / n + d * 16 * rsl,
                    (1 - d) / n + d * rsh / 16,
                )
            return {"mh": rmh, "ml": rml, "sh": rsh, "sl": rsl}

        def probe_pagerank_skew(n: int) -> tuple[float, int]:
            M = n // K_MEGA_FRAC
            edges = skew_star_edges(n).persist()
            m = edges.count()
            want = expected_group_ranks(n)

            def run():
                r = pagerank(edges)
                grp = F.when(F.col("node") == 0, F.lit("mh")).when(
                    F.col("node") < M, F.lit("ml")
                ).when(
                    (F.col("node") - M) % K_STAR == 0, F.lit("sh")
                ).otherwise(F.lit("sl"))
                rows = (
                    r.groupBy(grp.alias("g"))
                    .agg(
                        F.count(F.lit(1)).alias("n"),
                        F.countDistinct("rank").alias("ndv"),
                        F.max("rank").alias("rank"),
                        F.sum("rank").alias("mass"),
                    )
                    .collect()
                )
                got = {row["g"]: row for row in rows}
                want_counts = {
                    "mh": 1,
                    "ml": M - 1,
                    "sh": (n - M) // K_STAR,
                    "sl": (n - M) // K_STAR * (K_STAR - 1),
                }
                assert set(got) == set(want_counts), f"groups {set(got)}"
                mass = 0.0
                for g, row in got.items():
                    assert row["n"] == want_counts[g], (
                        f"group {g} count {row['n']} != {want_counts[g]}"
                    )
                    assert row["ndv"] == 1, (
                        f"group {g} symmetry broken: {row['ndv']} ranks"
                    )
                    rel = abs(row["rank"] - want[g]) / want[g]
                    assert rel < 1e-6, (
                        f"group {g} rank {row['rank']} != planted "
                        f"{want[g]} (rel {rel:.2e})"
                    )
                    mass += row["mass"]
                assert abs(mass - 1.0) < 1e-6, f"mass {mass}"

            t = timed_median(run, f"pagerank_skew n={n}")
            edges.unpersist(blocking=True)
            spark.catalog.clearCache()
            return t, m

        def hub_chain_edges(c: int):
            """Star-of-chains: hub 0 → c chain heads (ids 5j+1), each
            chain 4 more hops. n = 5c + 1 nodes, n - 1 edges; hub
            out-degree c = the skewed frontier expansion."""
            heads = spark.range(c).select(
                F.lit(0).cast("long").alias("src"),
                (F.col("id") * K_CHAIN + 1).alias("dst"),
            )
            body = (
                spark.range(1, c * K_CHAIN + 1)
                .filter((F.col("id") - 1) % K_CHAIN != K_CHAIN - 1)
                .select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
            )
            return heads.unionAll(body)

        def probe_bfs_skew(n: int) -> tuple[float, int]:
            c = n // K_CHAIN
            edges = hub_chain_edges(c).persist()
            m = edges.count()
            seeds = spark.range(1).select(F.lit(0).cast("long").alias("node"))

            def run():
                hops = bfs_hops(edges, seeds, max_hops=K_CHAIN)
                hist = {
                    r["hops"]: r["cnt"]
                    for r in hops.groupBy("hops")
                    .agg(F.count(F.lit(1)).alias("cnt"))
                    .collect()
                }
                want = {0: 1, **{h: c for h in range(1, K_CHAIN + 1)}}
                assert hist == want, f"BFS skew histogram {hist} != {want}"

            t = timed_median(run, f"bfs_skew n={5 * c + 1}")
            edges.unpersist(blocking=True)
            spark.catalog.clearCache()
            return t, m

        skew_sizes = [
            n
            for n in (102_000, 408_000, 1_632_000, 6_426_000, 25_704_000)
            if min_nodes <= n <= max_nodes
        ]
        srows = []
        for n in skew_sizes:
            t_pr, m_pr = probe_pagerank_skew(n)
            t_bfs, m_bfs = probe_bfs_skew(n)
            srows.append((n, m_pr, t_pr, m_bfs, t_bfs))
            print(
                f"n={n:,} pagerank_skew={t_pr:.1f}s ({m_pr:,} edges,"
                f" hub_deg={n // K_MEGA_FRAC - 1:,})"
                f" bfs_skew={t_bfs:.1f}s ({m_bfs:,} edges,"
                f" hub_deg={n // K_CHAIN:,})",
                flush=True,
            )
        print(
            "\n| nodes | pr edges | hub deg | pagerank_skew | slope |"
            " bfs edges | hub deg | bfs_skew | slope |"
        )
        print("|---|---|---|---|---|---|---|---|---|")
        for i, (n, mp, tp, mb, tb) in enumerate(srows):
            if i == 0:
                sp = sb = "—"
            else:
                ratio = math.log10(n / srows[i - 1][0])
                sp = f"{math.log10(tp / srows[i - 1][2]) / ratio:.2f}"
                sb = f"{math.log10(tb / srows[i - 1][4]) / ratio:.2f}"
            print(
                f"| {n:,} | {mp:,} | {n // K_MEGA_FRAC - 1:,} | {tp:.1f}s"
                f" | {sp} | {mb:,} | {n // K_CHAIN:,} | {tb:.1f}s | {sb} |"
            )
        return

    if cc_mode:
        from demo_flink_spark.operators.dedup import connected_components_star

        K_LONG = 1000  # chain length: diameter 999

        def long_chain_edges(n: int):
            nxt = (F.col("id") + 1).alias("nxt")
            return (
                spark.range(n)
                .filter(F.col("id") % K_LONG != K_LONG - 1)
                .select(F.col("id").alias("doc_a"), nxt.alias("doc_b"))
            )

        def probe_cc(n: int) -> tuple[float, int]:
            edges = long_chain_edges(n).persist()
            m = edges.count()

            def run():
                comp = connected_components_star(edges)
                bad = comp.filter(
                    F.col("comp") != F.col("node") - F.col("node") % K_LONG
                ).count()
                assert bad == 0, f"CC planted-head mismatch on {bad} nodes"
                total = comp.count()
                assert total == n, f"CC node count {total} != {n}"

            t = timed_median(run, f"cc_star n={n}")
            edges.unpersist(blocking=True)
            spark.catalog.clearCache()
            return t, m

        cc_sizes = [
            n for n in (100_000, 400_000, 1_600_000, 6_400_000)
            if min_nodes <= n <= max_nodes
        ]
        cc_rows = []
        for n in cc_sizes:
            t, m = probe_cc(n)
            cc_rows.append((n, m, t))
            print(f"n={n:,} cc_star={t:.1f}s ({m:,} edges)", flush=True)
        print("\n| nodes | edges | cc_star (chains of 1000) | slope |")
        print("|---|---|---|---|")
        for i, (n, m, t) in enumerate(cc_rows):
            s = (
                "—"
                if i == 0
                else f"{math.log10(t / cc_rows[i - 1][2]) / math.log10(n / cc_rows[i - 1][0]):.2f}"
            )
            print(f"| {n:,} | {m:,} | {t:.1f}s | {s} |")
        return

    # node counts divisible by both 17 and 5 (lcm 85): 85 × 10^k-ish
    # decades, 4× steps
    sizes = [
        n
        for n in (102_000, 408_000, 1_632_000, 6_426_000, 25_704_000)
        if min_nodes <= n <= max_nodes
    ]

    rows = []
    for n in sizes:
        t_pr, m_pr = probe_pagerank(n)
        t_lpa, m_lpa = probe_lpa(n)
        t_bfs, m_bfs = probe_bfs(n)
        rows.append((n, m_pr, t_pr, m_lpa, t_lpa, m_bfs, t_bfs))
        print(
            f"n={n:,} pagerank={t_pr:.1f}s ({m_pr:,} edges)"
            f" lpa={t_lpa:.1f}s ({m_lpa:,}) bfs={t_bfs:.1f}s ({m_bfs:,})",
            flush=True,
        )

    print(
        "\n| nodes | pagerank edges | pagerank | slope | lpa edges | lpa |"
        " slope | bfs edges | bfs | slope |"
    )
    print("|---|---|---|---|---|---|---|---|---|---|")
    for i, (n, mp, tp, ml, tl, mb, tb) in enumerate(rows):
        if i == 0:
            sp = sl = sb = "—"
        else:
            ratio = math.log10(n / rows[i - 1][0])
            sp = f"{math.log10(tp / rows[i - 1][2]) / ratio:.2f}"
            sl = f"{math.log10(tl / rows[i - 1][4]) / ratio:.2f}"
            sb = f"{math.log10(tb / rows[i - 1][6]) / ratio:.2f}"
        print(
            f"| {n:,} | {mp:,} | {tp:.1f}s | {sp} | {ml:,} | {tl:.1f}s"
            f" | {sl} | {mb:,} | {tb:.1f}s | {sb} |"
        )


if __name__ == "__main__":
    main()
