"""AQE runtime skew-join splitting — the AUTOMATIC complement to the
manual salting operators (`operators/scale.py::salted_join/salted_agg`,
which exist for the cases AQE can't reach: stream-static joins and
pre-AQE clusters). This pins that the session's AQE config actually
re-plans a skewed sort-merge join at runtime: the final adaptive plan
must carry `skew=true` on the join, i.e. the hot partition was split
across tasks instead of serializing on one reducer."""

from __future__ import annotations

from pyspark.sql import functions as F

SKEW_CONFS = {
    # sized for the tiny local dataset — on a real cluster the
    # defaults (256MB threshold, 5x factor) play the same role
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "16KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "16KB",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    # force SMJ: a broadcast join has no skew problem to solve
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
}


def test_aqe_splits_skewed_sort_merge_join(spark):
    old = {k: spark.conf.get(k, None) for k in SKEW_CONFS}
    for k, v in SKEW_CONFS.items():
        spark.conf.set(k, v)
    try:
        # 90% of 800k rows share one join key — the degenerate shape
        # where one reducer would own the whole join
        big = spark.range(800000).select(
            F.when(F.col("id") % 10 < 9, F.lit("hot"))
            .otherwise((F.col("id") % 50).cast("string"))
            .alias("k"),
            F.concat(
                F.lit("payload-payload-payload-payload-payload-"),
                F.col("id").cast("string"),
            ).alias("pay"),
        )
        dim = (
            spark.range(60)
            .select((F.col("id") % 60).cast("string").alias("k"), F.col("id").alias("v"))
            .union(
                spark.range(1).select(
                    F.lit("hot").alias("k"), F.lit(999).alias("v")
                )
            )
        )
        j = big.join(dim, "k").select(F.count(F.lit(1)).alias("n"))
        # collect() executes THIS DataFrame's QueryExecution, so its
        # adaptive plan afterwards is the final (post-reoptimization)
        # one — count()/write() would build a different QE
        [row] = j.collect()
        assert row.n == 800000
        plan = j._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "simple"
            )
        )
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
