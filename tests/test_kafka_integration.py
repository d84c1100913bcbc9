"""End-to-end Kafka validation for the reference's shipped main job
(`TradeChangeDetectionJob.java:28-52`).

Capability-gated: this container ships neither the Spark Kafka
connector jar (`spark-sql-kafka-0-10`) nor a broker, so the test
auto-skips here — but auto-ACTIVATES in any environment where

1. the connector jar is on the classpath (e.g. `--packages
   org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-ver>`), and
2. `KAFKA_TEST_BOOTSTRAP` points at a reachable broker
   (e.g. `localhost:9092` from a docker-compose kafka).

Producing uses Spark's own batch Kafka sink, so no extra Python
client library is needed — the connector jar alone covers both sides.
"""

from __future__ import annotations

import json
import os
import uuid

import pytest

from demo_flink_spark.sources.streams import kafka_available

BOOTSTRAP = os.environ.get("KAFKA_TEST_BOOTSTRAP")


def _kafka_ready(spark) -> bool:
    return BOOTSTRAP is not None and kafka_available(spark)


# F6 trades (FIXTURES.md): three updates of one trade -> known diffs
_T = {"id": "TRD1000", "symbol": "AAPL", "price": 189.25, "quantity": 100}


def test_trade_change_detection_end_to_end(spark, tmp_path):
    if not _kafka_ready(spark):
        pytest.skip(
            "needs spark-sql-kafka-0-10 on the classpath and "
            "KAFKA_TEST_BOOTSTRAP set to a reachable broker"
        )
    from demo_flink_spark.jobs import trade_change_detection

    topic = f"trades_test_{uuid.uuid4().hex[:8]}"
    records = [
        _T,
        {**_T, "price": 190.10},                      # MODIFIED price
        {**_T, "price": 190.10, "note": "filled"},    # ADDED note
    ]
    (
        spark.createDataFrame(
            [(json.dumps(r),) for r in records], "value string"
        )
        .write.format("kafka")
        .option("kafka.bootstrap.servers", BOOTSTRAP)
        .option("topic", topic)
        .save()
    )

    changes = trade_change_detection(spark, BOOTSTRAP, topic)
    name = f"cdc_{uuid.uuid4().hex[:8]}"
    query = (
        changes.writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        query.processAllAvailable()
    finally:
        query.stop()

    rows = {
        (r["field"], r["action"], r["old_value"], r["new_value"])
        for r in spark.table(name).collect()
    }
    # first record is stored silently (no diff rows for it)
    assert ("price", "MODIFIED", "189.25", "190.1") in rows
    assert ("note", "ADDED", None, '"filled"') in rows
    assert not any(f == "symbol" for f, *_ in rows)


def test_kafka_gate_reports_clearly_when_absent(spark):
    """Without the connector jar, builders must raise a clear error at
    build time, not Spark's opaque ClassNotFound at .load() time."""
    if kafka_available(spark):
        pytest.skip("connector present; gate inactive")
    from demo_flink_spark.jobs import trade_change_detection

    with pytest.raises(RuntimeError, match="spark-sql-kafka"):
        trade_change_detection(spark, "localhost:9092", "trades")
