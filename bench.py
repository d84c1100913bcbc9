"""Benchmark harness: runs every declared query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) and prints ONE JSON
line {"metric": ..., "value": total_sec, "unit": "sec", "queries":
{name: sec}, "sf": ...}.

The stdout line's `queries` map carries the HEADLINE queries only
(one per operator family) and is kept under ~1.5 KB: the driver
captures a bounded tail of stdout, and round 3's full 139-entry map
(~5 KB) overflowed it — BENCH_r03 recorded `parsed: null`. The full
per-query timing map still runs and is written to
`BENCH_DETAIL_{$SPARK_GRAFT_BENCH_TAG:-local}.json` next to this
script: the driver's untagged runs land in `BENCH_DETAIL_local.json`,
while the builder tags its own uncontended runs (e.g.
`SPARK_GRAFT_BENCH_TAG=builder_r05`) so the two provenances stay
separately comparable round over round.

Each query is executed to completion via count() — an action that
runs the whole plan without materializing results on the driver. Run
with `python bench.py`; select a subset with `python bench.py q1 q2`.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    # bench needs eager memo-build materialization so each shared
    # build's cost is owned by its build event (`memo_builds`
    # attribution); non-bench sessions default to lazy builds.
    # Force-set (not setdefault): an inherited =0 in the environment
    # would silently fuse build costs into the first consumer and the
    # detail file's memo_builds would under-report (ADVICE r11).
    os.environ["SPARK_GRAFT_MEMO_EAGER"] = "1"

    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark

    # no console progress bars: their \r-spam shares stdout with the
    # one JSON line the driver parses from a bounded tail
    spark = get_spark(
        "bench", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    only = set(sys.argv[1:])

    # Warm up the JVM + parquet footer caches so the first measured
    # query isn't charged ~5 s of session startup.
    from pyspark.sql import functions as F

    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()

    def calibrate() -> float:
        """Median of 3 runs of a fixed CPU-bound probe (the warmup
        aggregation, re-timed post-warmup). Recorded at bench START
        and END plus loadavg so a contended run self-certifies: a
        BENCH total that doubled while the calibration probe also
        doubled is machine noise, not a code regression (the r8
        478.6 s adjudication, made in-band). Raw evidence only — the
        headline number is never normalized by it."""
        runs = []
        for _ in range(3):
            t0 = time.time()
            spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()
            runs.append(time.time() - t0)
        return round(sorted(runs)[1], 4)

    calib_start = calibrate()
    load_start = os.getloadavg()
    for tbl in ("lineitem", "orders", "part", "customer", "documents", "embeddings", "events"):
        # hash every column: a bare count() reads only footer metadata,
        # leaving page decompression + codec init to be charged to the
        # first query that actually touches each table's data
        df = spark.read.parquet(os.path.join(sf_dir, f"{tbl}.parquet"))
        df.select(
            F.xxhash64(*[F.col(c).cast("string") for c in df.columns])
        ).count()
    # spawn the Python workers + Arrow serialization path once, so the
    # first pandas-backed query isn't charged worker startup
    spark.range(64).repartition(32).mapInPandas(
        lambda it: it, "id long"
    ).count()
    # Warm the Python DataSource machinery (r14 measurement fix,
    # documented in OPTIMIZATION_r14.md): the FIRST datasource
    # registration + read in a session pays ~2.5 s of one-time
    # machinery (lazy pyspark.sql.datasource import, the JVM-side
    # Python plan-runner process, the Arrow source-eval path). That
    # is session startup of the same kind as the JVM/worker/codegen
    # warm-ups above, but it was charged to the alphabetically-only
    # query using the API (`pysource_event_counts`: 3.3 s of which
    # ~2.5 s machinery). Warming uses a THROWAWAY one-row source
    # defined here — not the engine's connector, whose registration,
    # planning and generation stay inside the timed cell.
    from pyspark.sql.datasource import DataSource, DataSourceReader

    class _WarmupSource(DataSource):
        @classmethod
        def name(cls):
            return "bench_warmup_src"

        def schema(self):
            return "i long"

        def reader(self, schema):
            class _R(DataSourceReader):
                def read(self, partition):
                    yield (0,)

            return _R()

    spark.dataSource.register(_WarmupSource)
    spark.read.format("bench_warmup_src").load().count()
    # JIT the string-expression codegen path (regexp/split/explode):
    # whole-stage Janino compilation of these operators is a one-time
    # ~2-3 s cost otherwise charged to the alphabetically-first query
    spark.createDataFrame([("a b. C",)], "text string").select(
        F.explode(
            F.split(F.regexp_replace(F.lower("text"), r"[^a-z\s]", ""), r"\s+")
        ).alias("w")
    ).filter(~F.col("w").isin("a", "the")).groupBy("w").count().collect()

    from demo_flink_spark.plans.memo import drain_memo_events

    qs = e.queries()
    timings: dict[str, float] = {}
    # which queries paid which shared memo builds (VERDICT r9 item 6):
    # the session memos make per-query timings order-dependent — the
    # first consumer of a shared pair/CC/graph/shingle build absorbs
    # its one-time cost. session_memo times each materialized build;
    # recording {query: {cache: build_secs}} in the detail header
    # keeps consumer timings comparable without NOTES lore. Raw
    # evidence only — timings are never normalized by it.
    memo_builds: dict[str, dict[str, float]] = {}
    drain_memo_events()  # discard warm-up noise
    # Fixed name order: registry order changes between rounds (driver
    # concerns), and whichever query runs first absorbs one-time
    # codegen/JIT warm-up — sorted order keeps per-query times
    # comparable round over round.
    for name, fn in sorted(qs.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            # count() forces full execution without driver-side
            # materialization of large results.
            fn(spark, sf_dir).count()
            timings[name] = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            timings[name] = -1.0
            print(f"# {name} failed: {exc}", file=sys.stderr)
        builds: dict[str, float] = {}
        for ev in drain_memo_events():
            # sum: one cache namespace can build twice in a query
            # (e.g. "graph" keys by kind — co-order AND bipartite)
            if ev["event"] == "build":
                builds[ev["cache"]] = round(
                    builds.get(ev["cache"], 0.0) + ev["secs"], 3
                )
        if builds:
            memo_builds[name] = builds

    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    failed = sorted(n for n, t in timings.items() if t < 0)
    # one headline per family — small enough that the driver's bounded
    # stdout-tail capture always holds the complete JSON line
    headline = [
        "q1_pricing_summary",
        "q9_product_profit",
        "advanced_word_count",
        "window_topn_users_hourly",
        "asof_join_last_purchase",
        "stateful_fraud_alerts",
        "dedup_minhash_lsh",
        "dedup_embedding_cosine",
        "similarity_topk_ivf",
        "graph_pagerank_copurchase",
        "tf_idf_top3",
        "hybrid_search_rrf",
        "sequence_packing",
        "profile_lineitem",
        "ts_anomaly_zscore",
        "similarity_topk_hamming",
        "pipeline_attrition_funnel",
        "cdc_chunk_dedup",
        "quality_auc_eval",
        "pysource_event_counts",
    ]
    tag = os.environ.get("SPARK_GRAFT_BENCH_TAG", "local")
    detail_name = f"BENCH_DETAIL_{tag}.json"
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), detail_name
    )
    calib_end = calibrate()
    load_end = os.getloadavg()
    summary = {
        "metric": "total_query_wall_clock",
        "value": round(sum(t for t in timings.values() if t >= 0), 3),
        "unit": "sec",
        "queries": {n: timings[n] for n in headline if n in timings},
        "n_queries": len(timings),
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "failed": failed,
        "detail": detail_name,
        # environment self-certification (see calibrate()): compare
        # per-query times across runs against the calibration ratio
        "calib_start_s": calib_start,
        "calib_end_s": calib_end,
        "loadavg_start": [round(x, 2) for x in load_start],
        "loadavg_end": [round(x, 2) for x in load_end],
        # total seconds of one-time shared memo builds embedded in the
        # per-query timings; the per-query attribution map lives in
        # the detail file (`memo_builds`) — kept out of the stdout
        # line to respect the driver's bounded tail capture
        "memo_build_total_s": round(
            sum(s for m in memo_builds.values() for s in m.values()), 3
        ),
    }
    if not only:
        with open(detail_path, "w") as f:
            json.dump(
                {**summary, "memo_builds": memo_builds, "queries": timings},
                f,
                indent=1,
            )
    else:
        # subset runs report exactly what was asked
        summary["queries"] = timings
    print(json.dumps(summary))
    if failed:
        # A broken query must fail the bench loudly, not hide as -1 in
        # an otherwise-plausible total (the round-2 lesson).
        print(f"# BENCH FAILED: {len(failed)} queries errored: {failed}",
              file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
