"""Invariants for the sketch aggregates and the UDTF surface
(plans/modern.py) — the properties the rows-only driver check can't
see."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR
from demo_flink_spark.sources import load_table


def test_hll_estimate_close_and_merge_equals_direct(spark):
    ev = load_table(spark, SF_DIR, "events")
    exact = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    direct = ev.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg("user_id")).alias("e")
    ).collect()[0]["e"]
    merged = (
        ev.groupBy("event_type")
        .agg(F.hll_sketch_agg("user_id").alias("sk"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("e"))
        .collect()[0]["e"]
    )
    # HLL union of same-lgK sketches is register-lossless, but the union
    # path may fall back from the HIP estimator to the composite one
    # (DataSketches internals), so merged and direct are close, not
    # necessarily bit-identical across Spark/DataSketches versions.
    assert abs(merged - direct) / max(direct, 1.0) < 0.01
    assert abs(direct - exact) / exact < 0.05
    assert abs(merged - exact) / exact < 0.05


def test_cms_readback_bounds(spark):
    ev = load_table(spark, SF_DIR, "events")
    raw = ev.agg(
        F.count_min_sketch("event_type", F.lit(0.001), F.lit(0.99), F.lit(42))
        .alias("cms")
    ).collect()[0]["cms"]
    jvm = spark.sparkContext._jvm
    sketch = jvm.org.apache.spark.util.sketch.CountMinSketch.readFrom(
        bytes(raw)
    )
    truth = {
        r["event_type"]: r["cnt"]
        for r in ev.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("cnt")
        ).collect()
    }
    total = sum(truth.values())
    for t, c in truth.items():
        est = sketch.estimateCount(t)
        assert est >= c  # CMS never underestimates
        assert est - c <= 0.001 * total + 1  # eps * stream length


def test_cms_binary_deterministic_across_partitionings(spark):
    ev = load_table(spark, SF_DIR, "events")
    def build(df):
        return df.agg(
            F.hex(
                F.count_min_sketch(
                    "event_type", F.lit(0.001), F.lit(0.99), F.lit(42)
                )
            ).alias("h")
        ).collect()[0]["h"]
    assert build(ev) == build(ev.repartition(7, "user_id"))


def test_udtf_run_length_golden(spark):
    from demo_flink_spark.functions.udtfs import RunLengthTokens

    spark.udtf.register("rle_tokens_t", RunLengthTokens)
    spark.createDataFrame(
        [(1, "Aa aa BB! bb cc"), (2, ""), (3, None)],
        "doc_id long, text string",
    ).createOrReplaceTempView("_rle_docs")
    rows = spark.sql(
        """SELECT d.doc_id, f.token, f.run_len, f.start_idx
           FROM _rle_docs d, LATERAL rle_tokens_t(d.text) f"""
    ).collect()
    got = {(r.doc_id, r.token): (r.run_len, r.start_idx) for r in rows}
    # "aa aa bb bb cc" -> runs: aa×2@0, bb×2@2, cc×1@4; empty/null: none
    assert got == {
        (1, "aa"): (2, 0),
        (1, "bb"): (2, 2),
        (1, "cc"): (1, 4),
    }


def test_approx_percentile_error_bound_and_determinism(spark):
    """percentile_approx (r4 hash-checkable form): the declared query
    carries its own pinned-error assertion — the `approx_within_1pct`
    boolean must hold for every group, identically across repeated
    runs (GK sketch is deterministic for a fixed dataset)."""
    from demo_flink_spark.plans import all_specs

    fn = all_specs()["percentile_approx"].fn
    rows = {r.l_returnflag: r for r in fn(spark, SF_DIR).collect()}
    assert rows
    for flag, r in rows.items():
        assert r.approx_within_1pct, (flag, r.exact_median)
        assert r.exact_median > 0
    again = {r.l_returnflag: (r.exact_median, r.approx_within_1pct)
             for r in fn(spark, SF_DIR).collect()}
    assert again == {
        k: (v.exact_median, v.approx_within_1pct) for k, v in rows.items()
    }


def test_approx_count_distinct_error_bound(spark):
    """agg_approx_distinct (r4 hash-checkable form): the declared
    query's `approx_within_10pct` pinned-error boolean must hold for
    every group, and the exact ndv must be genuinely large enough to
    make the bound meaningful."""
    from demo_flink_spark.plans import all_specs

    rows = all_specs()["agg_approx_distinct"].fn(spark, SF_DIR).collect()
    assert rows
    for r in rows:
        assert r.approx_within_10pct, (r.l_linestatus, r.exact_parts)
        assert r.exact_parts > 100
