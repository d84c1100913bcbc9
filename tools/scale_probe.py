"""Empirical scaling probe: time representative queries at every
available scale factor and fit the growth exponent.

    python tools/scale_probe.py            # writes SCALING.md + prints JSON

The point: "would this survive 100×?" should be measured, not argued.
A slope near 1.0 on the log-log fit between adjacent SFs means linear
scaling in input size (what a scan-shaped or banded-join operator
should show); a slope near 2 would expose an all-pairs hazard the
plan audit missed. Slopes well below 1 mean fixed overheads still
dominate at these sizes (fine — the asymptote hasn't kicked in yet).

Caveats stated in the artifact: documents/embeddings are 500 rows at
BOTH sf0.001 and sf0.01 (TESTDATA.md), so document-shaped queries get
their slope from the 0.01→0.1 step only; lineitem/orders/events scale
10× per step and support both steps.

Third decade (relational core): the driver ships no sf1, so the probe
BUILDS one at /tmp/spark_graft_sf1 — fact tables (lineitem, orders,
events) replicated ×10 from sf0.1 with key-shifted replicas
(orderkeys/event ids offset per replica so join fan-outs and group
cardinalities scale like a real SF step, events additionally get
shifted user ids so keyed-window group counts grow), dims copied
unchanged. TPC-H-shaped and window probes then get a measured
0.1→1 slope instead of an extrapolated one.
"""

from __future__ import annotations

import json
import os
import sys
import time

SFS = ["0.001", "0.01", "0.1"]

# query -> primary input table (decides which steps carry signal)
PROBES = {
    "q1_pricing_summary": "lineitem",
    "q9_product_profit": "lineitem",
    "window_topn_users_hourly": "events",
    "asof_join_last_purchase": "orders",
    "heavy_hitter_words": "documents",
    "dedup_exact": "documents",
    "dedup_minhash_lsh": "documents",
    "dedup_embedding_cosine": "embeddings",
    "similarity_topk_bruteforce": "embeddings",
    "hybrid_search_rrf": "documents",
    "graph_pagerank_copurchase": "orders",
    "graph_label_propagation": "orders",
    "mau_rolling_28d": "events",
    "layout_zorder_part": "part",
    "sequence_packing": "documents",
    "token_budget_mixture": "documents",
    "pipeline_attrition_funnel": "documents",
    "cdc_chunk_dedup": "documents",
    "split_leakage_audit": "documents",
    "bigram_novelty_vs_train": "documents",
    "ngram_diversity_by_source": "documents",
    "perplexity_bucket_filter": "documents",
    "repetition_removal": "documents",
    # r10 (VERDICT r9 item 2): the bench-cost ceiling — the slowest
    # registry queries previously unprobed
    "graph_bfs_hops": "orders",
    "graph_adamic_adar": "lineitem",
    "dedup_cluster_keep_longest": "documents",
    "dedup_ppjoin_prefix": "documents",
    "textrank_keywords": "documents",
    "sql_recursive_date_spine": "orders",
    "profile_lineitem": "lineitem",
    # r11 (VERDICT r10 item 4): the last unprobed multi-second bench
    # cells. (pysource_event_counts, the third one named, generates
    # its own input — sf_dir is unused by design — so it gets a
    # dedicated n_rows-decade probe: tools/scale_probe_pysource.py.)
    "anomaly_mad_hampel": "events",
    "anomaly_stl_residual": "events",
}

# tables that genuinely grow 10x per SF step (documents/embeddings
# are flat 500 rows between sf0.001 and sf0.01)
_SCALES_FROM_0001 = {"lineitem", "orders", "events", "customer", "part"}

# probes that get the synthetic sf1 third decade — r7 extends it from
# the relational core to the document/embedding families (their
# replicas are content-perturbed, see ensure_sf1)
THIRD_DECADE = {
    "q1_pricing_summary",
    "q9_product_profit",
    "window_topn_users_hourly",
    "asof_join_last_purchase",
    "graph_pagerank_copurchase",
    "graph_label_propagation",
    "mau_rolling_28d",
    "heavy_hitter_words",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_embedding_cosine",
    "similarity_topk_bruteforce",
    "hybrid_search_rrf",
    "split_leakage_audit",
    "ngram_diversity_by_source",
    "perplexity_bucket_filter",
    # r9: the remaining "—" cells (part scales in sf1 as of v3, so
    # layout_zorder_part carries third-decade signal too)
    "layout_zorder_part",
    "sequence_packing",
    "token_budget_mixture",
    "cdc_chunk_dedup",
    "bigram_novelty_vs_train",
    "pipeline_attrition_funnel",
    # r9b: the round's registry addition — zero-exchange array
    # machinery per doc, expected linear (per-replica token suffixes
    # preserve intra-doc repetition structure exactly)
    "repetition_removal",
    # r10: the cost-ceiling additions. All have honest sf1 growth:
    # the co-order/bipartite graphs gain 10 disjoint replicas (v3
    # part scaling), documents gain 10 shingle-disjoint replicas,
    # lineitem/orders replicate with key shifts. The date spine's
    # SPAN is fixed (replicas keep order dates) — its sf1 step
    # measures the daily-count aggregation over 10× orders joined to
    # the same ~2.4k-day spine, which is the honest scale shape of a
    # calendar report.
    "graph_bfs_hops",
    "graph_adamic_adar",
    "dedup_cluster_keep_longest",
    "dedup_ppjoin_prefix",
    "textrank_keywords",
    "sql_recursive_date_spine",
    "profile_lineitem",
    # r11: events replicas in sf1 shift event/user ids (the event_type
    # key set stays fixed), so these cells measure 10×-denser series
    # per key — the honest scale shape for per-key robust statistics
    # and decomposition.
    "anomaly_mad_hampel",
    "anomaly_stl_residual",
}

# queries whose pair work is quadratic BY DEFINITION (exact all-pairs
# baselines) — a super-linear largest-step slope is expected for
# these and only these; anything else super-linear is a regression
EXPECTED_SUPERLINEAR = {"dedup_embedding_cosine"}

SF1_DIR = "/tmp/spark_graft_sf1"


def ensure_sf1(spark) -> str:
    """Build (once, cached) a ×10 synthetic decade above sf0.1.

    Replication with key shifts, not bare duplication: lineitem and
    orders offset their orderkeys by replica·(max+1) so each replica
    contributes NEW orders joining to NEW lineitems (join fan-out and
    group count scale, referential integrity holds); events offset
    event_id and user_id the same way so event-keyed windows gain 10×
    groups.

    part (r9, v3): replicated ×10 with a shared p_partkey stride that
    lineitem's l_partkey also shifts by, so replica r lineitems join
    replica r parts — part-keyed joins keep their per-replica fan-out
    while the part scan AND the part-derived graphs scale honestly
    (the co-order graph becomes 10 disjoint copies of the sf0.1
    graph; the cust↔part bipartite graph keeps its customers as
    cross-replica hubs with 10× degree — realistic dim-key skew).
    Before v3, part was a fixed dim, so the graph probes' sf1 step
    measured a bigger SCAN over the same graph; v3 slopes are
    expected to be nearer 1.0 than the v2 numbers and are the honest
    ones.

    documents/embeddings (r7): replicated ×10 with key shifts AND a
    per-replica content perturbation, so the decade scales the
    WORKLOAD, not just the row count. Bare text copies would make
    every doc a 10-way exact/near dup (posting lists ×10 → candidate
    pairs ×100 — a corpus-structure change masquerading as quadratic
    cost), so replica r suffixes every alphabetic token with a
    replica letter: token counts, lengths and WITHIN-replica dup
    structure are preserved exactly, while replicas share no
    shingles. Embedding replicas circularly shift coordinates by r —
    intra-replica cosines are permutation-invariant (structure
    preserved), cross-replica directions decorrelate.

    Small dims (nation…part) copy unchanged — fact-dominated growth,
    which is what the third-decade slope should measure.
    """
    import shutil

    from pyspark.sql import functions as F

    from demo_flink_spark.sources.tables import TABLES, load_table

    # versioned marker: bumping it invalidates sf1 dirs built by
    # older probe versions (v1 copied documents/embeddings unchanged;
    # v2 kept part a fixed dim)
    ready = os.path.join(SF1_DIR, "_READY_v3")
    if os.path.exists(ready):
        return SF1_DIR
    # Crash-safety: a build interrupted mid-copy leaves SF1_DIR
    # without _READY; the per-table existence checks below would then
    # skip the repair (and copytree raises on a partial dir). A
    # missing _READY means the whole dir is suspect — rebuild from
    # scratch.
    if os.path.exists(SF1_DIR):
        shutil.rmtree(SF1_DIR)
    os.makedirs(SF1_DIR, exist_ok=True)
    src = "/root/testdata/sf0.1"
    replicas = F.explode(F.array([F.lit(i) for i in range(10)])).alias("_r")

    def shifted(name: str, shifts: dict[str, int]):
        df = load_table(spark, src, name)
        out = df.select("*", replicas)
        for col, stride in shifts.items():
            out = out.withColumn(col, F.col(col) + F.col("_r") * F.lit(stride))
        out.drop("_r").write.mode("overwrite").parquet(
            os.path.join(SF1_DIR, f"{name}.parquet")
        )

    # ONE orderkey stride shared by orders and lineitem: replica r of a
    # lineitem must still join replica r of its order
    ok_stride = (
        load_table(spark, src, "orders").agg(F.max("o_orderkey")).collect()[0][0]
        + 1
    )
    # ONE partkey stride shared by part and lineitem (v3): replica r
    # of a lineitem still joins replica r of its part
    pk_stride = (
        load_table(spark, src, "part").agg(F.max("p_partkey")).collect()[0][0]
        + 1
    )
    ev = load_table(spark, src, "events")
    ev_maxes = ev.agg(F.max("event_id"), F.max("user_id")).collect()[0]
    shifted("orders", {"o_orderkey": ok_stride})
    shifted("lineitem", {"l_orderkey": ok_stride, "l_partkey": pk_stride})
    shifted("part", {"p_partkey": pk_stride})
    shifted(
        "events", {"event_id": ev_maxes[0] + 1, "user_id": ev_maxes[1] + 1}
    )

    # documents: per-replica token suffix (see docstring), union of 10
    # statically-transformed replicas so the regex replacement string
    # stays a literal per replica
    docs = load_table(spark, src, "documents")
    doc_stride = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    doc_parts = []
    for r in range(10):
        suffix = chr(ord("a") + r)
        doc_parts.append(
            docs.select(
                (F.col("doc_id") + r * doc_stride).alias("doc_id"),
                F.regexp_replace(
                    "text", "([A-Za-z]+)", "$1" + suffix
                ).alias("text"),
                "lang",
                "source",
            ).withColumn("n_chars", F.length("text").cast("long"))
        )
    d = doc_parts[0]
    for p in doc_parts[1:]:
        d = d.union(p)
    d.write.mode("overwrite").parquet(os.path.join(SF1_DIR, "documents.parquet"))

    # embeddings: circular coordinate shift per replica
    emb = load_table(spark, src, "embeddings")
    vec_stride = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    emb_parts = []
    for r in range(10):
        emb_parts.append(
            emb.select(
                (F.col("vec_id") + r * vec_stride).alias("vec_id"),
                F.expr(
                    f"concat(slice(embedding, {r} + 1,"
                    f" size(embedding) - {r}),"
                    f" slice(embedding, 1, {r}))"
                    if r
                    else "embedding"
                ).alias("embedding"),
                "label",
            )
        )
    v = emb_parts[0]
    for p in emb_parts[1:]:
        v = v.union(p)
    v.write.mode("overwrite").parquet(os.path.join(SF1_DIR, "embeddings.parquet"))

    for name in TABLES:
        if name in (
            "orders", "lineitem", "part", "events", "documents", "embeddings"
        ):
            continue
        dst = os.path.join(SF1_DIR, f"{name}.parquet")
        s = os.path.join(src, f"{name}.parquet")
        if not os.path.exists(dst):
            shutil.copytree(s, dst) if os.path.isdir(s) else shutil.copy(s, dst)
    open(ready, "w").write("ok")
    return SF1_DIR


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import math

    from demo_flink_spark.plans import all_specs
    from demo_flink_spark.session import get_spark

    spark = get_spark(
        "scale_probe", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()

    # JVM/codegen warm-up so sf0.001 isn't charged startup
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()

    sf1_dir = ensure_sf1(spark)

    from demo_flink_spark.plans.memo import clear_session_memos

    def timed_median(fn, sf_dir: str) -> float:
        """Median of 3 reps, session memos cleared before EVERY rep.

        Two disciplines learned from the synthetic probe (r9): single
        reps on this shared box swing 2-3× (GC, page cache), so one-rep
        slopes are noise; and memo hits must not leak between reps or
        between queries — without the clear, a query probed after a
        memo-mate at the same sf measured the HIT path while the first
        query measured the BUILD, so cells mixed semantics depending on
        dict order. Every cell now uniformly includes its shared-build
        stage (the memoized amortization the bench measures is reported
        there, not here). Median absorbs the first-rep codegen cost.
        """
        ts = []
        for _ in range(3):
            clear_session_memos()
            t0 = time.time()
            fn(spark, sf_dir).count()
            ts.append(time.time() - t0)
        return round(sorted(ts)[1], 3)

    rows = []
    for name, table in PROBES.items():
        times = {}
        for sf in SFS:
            times[sf] = timed_median(specs[name].fn, f"/root/testdata/sf{sf}")
        t_sf1 = None
        if name in THIRD_DECADE:
            t_sf1 = timed_median(specs[name].fn, sf1_dir)
        # growth exponent per 10x data step: log10(t_hi/t_lo)
        step2 = math.log10(times["0.1"] / times["0.01"]) if times["0.01"] > 0 else None
        step1 = (
            math.log10(times["0.01"] / times["0.001"])
            if table in _SCALES_FROM_0001 and times["0.001"] > 0
            else None
        )
        step3 = (
            math.log10(t_sf1 / times["0.1"])
            if t_sf1 is not None and times["0.1"] > 0
            else None
        )
        rows.append(
            {
                "query": name,
                "table": table,
                "t_sf0.001": times["0.001"],
                "t_sf0.01": times["0.01"],
                "t_sf0.1": times["0.1"],
                "t_sf1synth": t_sf1,
                "slope_0.001_to_0.01": None if step1 is None else round(step1, 2),
                "slope_0.01_to_0.1": None if step2 is None else round(step2, 2),
                "slope_0.1_to_1": None if step3 is None else round(step3, 2),
            }
        )

    out = {"probes": rows, "sfs": SFS}
    print(json.dumps(out))

    md = [
        "# SCALING.md — measured growth exponents",
        "",
        "Generated by `tools/scale_probe.py`. Each cell is the MEDIAN",
        "of 3 reps with session memos cleared before every rep, so",
        "every cell uniformly includes its shared-build stage and",
        "single-rep box noise is absorbed (r9 methodology — cells are",
        "NOT comparable to pre-r9 single-rep tables, where a query",
        "probed after a memo-mate at the same sf silently measured the",
        "memo-HIT path). Each slope is",
        "log10(t_hi/t_lo) across one 10× data step: ~1.0 = linear,",
        "~2.0 = quadratic (an all-pairs hazard), << 1 = fixed overheads",
        "still dominate at this size (the asymptote hasn't kicked in).",
        "documents/embeddings hold 500 rows at BOTH sf0.001 and sf0.01",
        "(TESTDATA.md), so document-shaped queries carry signal only on",
        "the 0.01 → 0.1 step — their first-step slope is omitted.",
        "The sf1 column is the SYNTHETIC third decade: fact tables",
        "replicated ×10 above sf0.1 with key-shifted replicas, and",
        "(r7) documents/embeddings replicated ×10 with per-replica",
        "content perturbation — replica r suffixes every token with a",
        "replica letter / circularly shifts embedding coordinates, so",
        "within-replica dup/similarity structure is preserved exactly",
        "while replicas stay disjoint (a bare copy would square the",
        "candidate-pair count — a corpus change, not a scale step).",
        "As of v3 (r9) `part` also replicates ×10 with a p_partkey",
        "stride that lineitem's l_partkey shares, so part-keyed joins",
        "keep their per-replica fan-out while part scans and the",
        "part-derived graphs scale honestly — the graph-family sf1",
        "numbers are NOT comparable to the pre-r9 (v2) table, where",
        "part was a fixed dim and the co-order graph did not grow.",
        "See tools/scale_probe.py::ensure_sf1 — built locally, never",
        "part of the driver's data.",
        "",
        "| query | input | t@sf0.001 | t@sf0.01 | t@sf0.1 | t@sf1synth | slope 0.001→0.01 | slope 0.01→0.1 | slope 0.1→1 |",
        "|---|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        s1 = "—" if r["slope_0.001_to_0.01"] is None else f"{r['slope_0.001_to_0.01']:.2f}"
        s2 = "—" if r["slope_0.01_to_0.1"] is None else f"{r['slope_0.01_to_0.1']:.2f}"
        s3 = "—" if r["slope_0.1_to_1"] is None else f"{r['slope_0.1_to_1']:.2f}"
        t1 = "—" if r["t_sf1synth"] is None else f"{r['t_sf1synth']:.2f}s"
        md.append(
            f"| {r['query']} | {r['table']} | {r['t_sf0.001']:.2f}s "
            f"| {r['t_sf0.01']:.2f}s | {r['t_sf0.1']:.2f}s | {t1} | {s1} | {s2} | {s3} |"
        )
    md.append("")
    # derive the summary from the data — never assert "all linear"
    # when a measured slope says otherwise, and never auto-explain a
    # super-linear slope as expected unless the query is on the
    # known-quadratic-by-definition list
    hot = [
        (r["query"], r["slope_0.1_to_1"])
        for r in rows
        if r["slope_0.1_to_1"] is not None and r["slope_0.1_to_1"] > 1.0
    ]
    expected = [(q, sl) for q, sl in hot if q in EXPECTED_SUPERLINEAR]
    regressions = [(q, sl) for q, sl in hot if q not in EXPECTED_SUPERLINEAR]
    if not hot:
        md.append(
            "Every probed operator stays at or below linear growth on "
            "the largest measured step; none approaches the quadratic "
            "regime."
        )
    else:
        parts = []
        if expected:
            listed = ", ".join(f"{q} ({s:.2f})" for q, s in expected)
            parts.append(
                f"Super-linear as EXPECTED on the largest measured step: "
                f"{listed} — exact all-pairs baselines whose pair work "
                "is Θ(n²) by definition (the block-GEMM computes every "
                "cosine; the documented scale path is the LSH/IVF "
                "variants probed alongside, which stay sub-linear)."
            )
        if regressions:
            listed = ", ".join(f"{q} ({s:.2f})" for q, s in regressions)
            parts.append(
                f"**SCALING REGRESSION — investigate before shipping: "
                f"{listed}** (super-linear on the largest step and NOT "
                "on the known-quadratic list)."
            )
        parts.append(
            "Every other probed operator is at or below linear."
        )
        md.append(" ".join(parts))
    md.append("")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, "SCALING.md")
    # preserve sections other tools own (the synthetic-corpus probe
    # appends below this marker): only the header+table are ours
    keep = ""
    marker = "## Synthetic-corpus probe"
    if os.path.exists(path):
        old = open(path).read()
        if marker in old:
            keep = old[old.index(marker) :]
    with open(path, "w") as f:
        f.write("\n".join(md))
        if keep:
            f.write("\n" + keep)


if __name__ == "__main__":
    main()
