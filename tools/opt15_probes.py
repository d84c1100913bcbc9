"""Round-15 optimization probes (run on a quiet box).

  python tools/opt15_probes.py smj        # preferSortMergeJoin A/B (VERDICT #5)
  python tools/opt15_probes.py hybrid     # hybrid_search_rrf branch timing (VERDICT #4)
  python tools/opt15_probes.py bfs        # bfs_hops loop A/B old-vs-new shape (VERDICT #2)

All probes follow the same-session A/B protocol (OPTIMIZATION_r14.md
"the box lies"): variants alternate inside ONE process so host-steal
drift cancels; equality is asserted before timing.
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def _session():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demo_flink_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark("opt15_probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    return spark


SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def probe_smj() -> None:
    """Per-query same-session A/B of spark.sql.join.preferSortMergeJoin
    (a runtime-settable SQL conf): the six cells the r14 driver run
    regressed plus textrank_keywords. Frames are rebuilt under each
    conf value so the planner re-picks the strategy."""
    spark = _session()
    import __spark_entry__ as e

    qs = e.queries()
    names = [
        "tf_idf_top3",
        "quality_auc_eval",
        "window_topn_users_hourly",
        "similarity_topk_ivf",
        "ts_anomaly_zscore",
        "stateful_fraud_alerts",
        "textrank_keywords",
    ]
    reps = 6
    for name in names:
        sinks = {"false": [], "true": []}
        for r in range(reps):
            order = ("false", "true") if r % 2 == 0 else ("true", "false")
            for conf in order:
                spark.conf.set("spark.sql.join.preferSortMergeJoin", conf)
                t0 = time.time()
                qs[name](spark, SF).count()
                sinks[conf].append(round(time.time() - t0, 3))
        shj, smj = sinks["false"], sinks["true"]
        print(
            f"{name}: SHJ med {statistics.median(shj):.3f}s {sorted(shj)}"
            f"  SMJ med {statistics.median(smj):.3f}s {sorted(smj)}"
        )
        sys.stdout.flush()


def probe_hybrid() -> None:
    """Where do hybrid_search_rrf's seconds go? Time each branch
    (bm25 ranked, cosine ranked, the fuse) separately with noop sinks,
    then the full query."""
    spark = _session()
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from demo_flink_spark.operators import similarity as sim
    from demo_flink_spark.operators.search import bm25_batch, rrf_fuse
    from demo_flink_spark.plans.similarity import _N_QUERIES, _RRF_DEPTH, _queries_df
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, SF, "documents")
    qdocs = docs.filter(F.col("doc_id") < _N_QUERIES).select(
        F.col("doc_id").alias("query_id"), "text"
    )
    bm = bm25_batch(docs, qdocs).filter(F.col("doc_id") != F.col("query_id"))
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    bm_ranked = (
        bm.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= _RRF_DEPTH)
        .select("query_id", F.col("doc_id").alias("vec_id"), "rk")
    )
    emb = load_table(spark, SF, "embeddings")
    cos_ranked = sim.cosine_topk_bruteforce(
        emb, _queries_df(spark, SF), k=_RRF_DEPTH
    ).select("query_id", "vec_id", "rk")
    fused = rrf_fuse(bm_ranked, cos_ranked, k_rrf=60, topn=10,
                     rk_a_name="rk_bm25", rk_b_name="rk_cos")

    def t(df, label, n=3):
        reps = []
        for _ in range(n):
            t0 = time.time()
            df.write.format("noop").mode("overwrite").save()
            reps.append(round(time.time() - t0, 3))
        print(f"{label}: med {statistics.median(reps):.3f}s {reps}")
        sys.stdout.flush()

    t(bm_ranked, "bm25 ranked branch")
    t(cos_ranked, "cosine ranked branch")
    t(fused, "full hybrid (fused)")


def probe_profile() -> None:
    """profile_table executes its two jobs AT CONSTRUCTION (wide agg
    first() + melt-distinct collect()), so timing must include the
    constructor — the earlier noop A/B on the returned 5-row local
    frame measured nothing. A/B: raw single-row-group lineitem scan
    vs widen_if_narrow()ed input."""
    spark = _session()
    from demo_flink_spark.operators.hints import widen_if_narrow
    from demo_flink_spark.operators.relational import profile_table
    from demo_flink_spark.sources import load_table

    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate",
            "l_extendedprice"]
    li = load_table(spark, SF, "lineitem")
    wide = widen_if_narrow(li)
    a = profile_table(li, cols).collect()
    b = profile_table(wide, cols).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b)), "result drift"
    t_old, t_new = [], []
    for r in range(5):
        pair = ((li, t_old), (wide, t_new)) if r % 2 == 0 else ((wide, t_new), (li, t_old))
        for src, sink in pair:
            t0 = time.time()
            profile_table(src, cols).count()
            sink.append(round(time.time() - t0, 3))
    print(f"profile: narrow med {statistics.median(t_old):.3f}s {sorted(t_old)}")
    print(f"profile: widened med {statistics.median(t_new):.3f}s {sorted(t_new)}")


def probe_bfs() -> None:
    """Old (r13 re-materializing, unhinted) vs new (r14 lazy-union +
    exact-count hints) bfs_hops loop, same session, alternating —
    the driver-visible floors read WORSE for the new shape; settle it."""
    spark = _session()
    from functools import reduce

    from pyspark.sql import DataFrame
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.checkpointing import cut_lineage, cut_lineage_lazy
    from demo_flink_spark.operators.graph import bfs_hops
    from demo_flink_spark.plans.graph import _bipartite_edges
    from demo_flink_spark.sources import load_table

    edges = _bipartite_edges(spark, SF)
    seeds = (
        load_table(spark, SF, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
        .limit(5)
        .select((F.col("o_custkey") * 2).alias("node"))
    )

    def old_bfs(edges, seeds, max_hops=4):
        e = edges.select("src", "dst").transform(cut_lineage_lazy)
        dist = seeds.select(F.col(seeds.columns[0]).alias("node")).distinct()
        dist = dist.withColumn("hops", F.lit(0)).transform(cut_lineage)
        frontier = dist.select("node")
        for h in range(1, max_hops + 1):
            nxt = (
                frontier.join(e, frontier.node == e.src)
                .select(F.col("dst").alias("node"))
                .distinct()
                .join(dist.select("node"), "node", "left_anti")
                .withColumn("hops", F.lit(h))
            )
            dist = dist.union(nxt).transform(cut_lineage)
            if nxt.isEmpty():
                break
            frontier = nxt.select("node")
        return dist.select("node", F.col("hops").cast("int").alias("hops"))

    o = old_bfs(edges, seeds)
    n = bfs_hops(edges, seeds, max_hops=4)
    print("sym-diff:", o.exceptAll(n).count(), n.exceptAll(o).count())
    to, tn = [], []
    for r in range(5):
        a, b = (old_bfs, bfs_hops) if r % 2 == 0 else (bfs_hops, old_bfs)
        ta, tb = [], []
        t0 = time.time(); a(edges, seeds, max_hops=4).count(); ta.append(time.time() - t0)
        t0 = time.time(); b(edges, seeds, max_hops=4).count(); tb.append(time.time() - t0)
        (to if a is old_bfs else tn).extend(ta)
        (tn if a is old_bfs else to).extend(tb)
        print(f"rep{r}: {'old,new' if a is old_bfs else 'new,old'} {ta[0]:.2f}s {tb[0]:.2f}s")
        sys.stdout.flush()
    print(f"old med {statistics.median(to):.2f}s  new med {statistics.median(tn):.2f}s")


if __name__ == "__main__":
    {
        "smj": probe_smj,
        "hybrid": probe_hybrid,
        "bfs": probe_bfs,
        "profile": probe_profile,
    }[sys.argv[1]]()
