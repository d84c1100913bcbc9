"""Tests for the hot-key scale utilities."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import functions as F

from demo_flink_spark.operators.scale import (
    observed_watermark,
    salted_agg,
    salted_join,
)


def test_salted_agg_matches_plain(spark):
    # one hot key (90% of rows) + long tail
    rows = [("hot", float(i)) for i in range(900)] + [
        (f"k{i}", float(i)) for i in range(100)
    ]
    df = spark.createDataFrame(rows, "key string, v double")
    plain = {
        r["key"]: (r["s"], r["n"], r["mx"])
        for r in df.groupBy("key")
        .agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx"))
        .collect()
    }
    salted = {
        r["key"]: (r["sum_v"], r["n_v"], r["max_v"])
        for r in salted_agg(
            df,
            ["key"],
            {
                "sum_v": F.sum("v"),
                "n_v": F.count("v"),
                "max_v": F.max("v"),
            },
        ).collect()
    }
    assert salted.keys() == plain.keys()
    for k in plain:
        assert abs(salted[k][0] - plain[k][0]) < 1e-6
        assert salted[k][1:] == plain[k][1:]


def test_salted_join_matches_plain(spark):
    big = spark.createDataFrame(
        [("hot", i) for i in range(500)] + [("cold", i) for i in range(5)],
        "key string, v int",
    )
    dim = spark.createDataFrame(
        [("hot", "H"), ("cold", "C")], "key string, label string"
    )
    plain = sorted(
        (r["key"], r["v"], r["label"]) for r in big.join(dim, "key").collect()
    )
    salted = sorted(
        (r["key"], r["v"], r["label"])
        for r in salted_join(big, dim, "key").collect()
    )
    assert salted == plain


def test_observed_watermark(spark):
    stage = tempfile.mkdtemp()
    df = spark.createDataFrame([(60_000, "a")], "ts_ms long, word string")
    df.coalesce(1).write.mode("overwrite").parquet(stage)
    stream = (
        spark.readStream.schema(df.schema)
        .parquet(stage)
        .withColumn("ts", F.timestamp_millis("ts_ms"))
    )
    agg = (
        stream.withWatermark("ts", "10 seconds")
        .groupBy(F.window("ts", "10 seconds"), "word")
        .count()
    )
    q = (
        agg.writeStream.format("memory")
        .queryName(f"wm_{uuid.uuid4().hex[:8]}")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp())
        .start()
    )
    try:
        q.processAllAvailable()
        wm = observed_watermark(q)
    finally:
        q.stop()
    # watermark = max event time (60s) − delay (10s) = 50s
    assert wm is not None and wm.startswith("1970-01-01T00:00:50")


def test_bucketed_join_has_zero_exchanges(spark):
    # pay the shuffle at write time, join shuffle-free forever after —
    # the bucketing contract write_bucketed documents
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.scale import write_bucketed

    sf = "/root/testdata/sf0.001"
    write_bucketed(
        spark.read.parquet(f"{sf}/orders.parquet"), "tb_orders", "o_orderkey", 8
    )
    write_bucketed(
        spark.read.parquet(f"{sf}/lineitem.parquet"), "tb_lineitem", "l_orderkey", 8
    )
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = spark.table("tb_orders").join(
            spark.table("tb_lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange") == 0, plan
        assert "SortMergeJoin" in plan
        assert joined.count() == spark.read.parquet(f"{sf}/lineitem.parquet").count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS tb_orders")
        spark.sql("DROP TABLE IF EXISTS tb_lineitem")
