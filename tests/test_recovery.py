"""Checkpoint recovery: stateful streaming state survives a full query
stop/restart (the fault-tolerance the reference never configures —
SURVEY §4.1 notes checkpointing is absent there; Spark gives it per
micro-batch).

Sink note: the memory sink refuses checkpoint recovery, so this test
collects through foreachBatch — one of the recovery-capable sinks."""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql.streaming.state import GroupStateTimeout

from demo_flink_spark.streaming.stateful_ops import RUNNING_COUNTER


def _start(spark, stage, schema, ckpt, sink_rows):
    stream = (
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(stage)
    )
    transformed = stream.groupBy("user_id").applyInPandasWithState(
        RUNNING_COUNTER.fn,
        outputStructType=RUNNING_COUNTER.output_schema,
        stateStructType=RUNNING_COUNTER.state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
    return (
        transformed.writeStream.foreachBatch(
            lambda df, _bid: sink_rows.extend(
                (r["seq"], r["clicks"]) for r in df.collect()
            )
        )
        .queryName(f"recov_{uuid.uuid4().hex[:6]}")
        .option("checkpointLocation", ckpt)
        .start()
    )


def test_state_survives_query_restart(spark):
    stage = tempfile.mkdtemp(prefix="recov_src_")
    ckpt = tempfile.mkdtemp(prefix="recov_ckpt_")
    schema = "seq long, user_id string"

    batch0 = spark.createDataFrame([(1, "u1"), (2, "u1"), (3, "u2")], schema)
    batch0.coalesce(1).write.mode("append").parquet(stage)
    rows1: list = []
    q1 = _start(spark, stage, batch0.schema, ckpt, rows1)
    try:
        q1.processAllAvailable()
    finally:
        q1.stop()
    assert dict(rows1) == {1: 1, 2: 2, 3: 1}

    # new data lands while the query is DOWN; restart from checkpoint
    batch1 = spark.createDataFrame([(4, "u1"), (5, "u3")], schema)
    batch1.coalesce(1).write.mode("append").parquet(stage)
    rows2: list = []
    q2 = _start(spark, stage, batch0.schema, ckpt, rows2)
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    # u1 had 2 clicks before the restart -> seq 4 must continue at 3;
    # u3 is new -> 1. Pre-restart offsets must NOT be reprocessed.
    assert dict(rows2) == {4: 3, 5: 1}
