"""Custom Python DataSource (Spark 4 DataSource API): batch
determinism + partition planning, and the streaming offset contract
(bounded micro-batches, no dups/gaps across batches, replay
determinism)."""

from __future__ import annotations

import time

from pyspark.sql import functions as F


def _register(spark):
    from demo_flink_spark.sources.pysource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)


def test_batch_read_deterministic_and_partitioned(spark):
    from demo_flink_spark.sources.pysource import expected_rows

    _register(spark)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 200)
        .option("numPartitions", 7)
        .load()
    )
    assert df.rdd.getNumPartitions() == 7
    rows = sorted(df.collect())
    assert len(rows) == 200
    assert [tuple(r) for r in rows] == expected_rows(200)
    # second read: byte-identical (the replay contract)
    again = sorted(
        spark.read.format("synthetic_events").option("n_rows", 200).load().collect()
    )
    assert [tuple(r) for r in again] == expected_rows(200)
    # generated events aggregate like any other table
    agg = df.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    assert sum(r["n"] for r in agg) == 200 and len(agg) == 4


def test_stream_offsets_no_dups_no_gaps(spark, tmp_path):
    _register(spark)
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 40)
        .option("numPartitions", 3)
        .option("maxRows", 120)
        .load()
        .writeStream.format("memory")
        .queryName("syn_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            got = spark.sql("SELECT event_id FROM syn_stream").count()
            if got >= 120:
                break
            time.sleep(0.5)
        ids = [
            r["event_id"]
            for r in spark.sql("SELECT event_id FROM syn_stream").collect()
        ]
    finally:
        q.stop()
    # maxRows caps the offset: exactly 0..119, each exactly once
    assert sorted(ids) == list(range(120))


def test_stream_offset_json_roundtrip():
    from demo_flink_spark.sources.pysource import (
        SyntheticEventsStreamReader,
        offsets_roundtrip,
    )

    r = SyntheticEventsStreamReader({"rowsPerBatch": "10", "numPartitions": "2"})
    assert r.initialOffset() == {"next": 0}
    o1 = offsets_roundtrip(r.latestOffset())
    o2 = offsets_roundtrip(r.latestOffset())
    assert (o1, o2) == ({"next": 10}, {"next": 20})
    # replay: identical partitioning for the same committed range
    p_a = [(p.start, p.end) for p in r.partitions(o1, o2)]
    p_b = [(p.start, p.end) for p in r.partitions(o1, o2)]
    assert p_a == p_b
    # ranges tile [10, 20) without overlap
    covered = sorted(i for s, e in p_a for i in range(s, e))
    assert covered == list(range(10, 20))


def test_stream_offsets_survive_restart(spark, tmp_path):
    """The offset contract end-to-end: stop the query mid-stream,
    restart from the same checkpoint — the WAL-replayed offsets resume
    where they left off, and the union of both runs is exactly one of
    each event (no dups, no gaps). Collected through foreachBatch (the
    memory sink refuses checkpoint recovery)."""
    _register(spark)
    ckpt = str(tmp_path / "ckpt2")
    got: list[int] = []

    def _start():
        return (
            spark.readStream.format("synthetic_events")
            .option("rowsPerBatch", 25)
            .option("numPartitions", 2)
            .option("maxRows", 100)
            .load()
            .writeStream.foreachBatch(
                lambda df, _bid: got.extend(
                    r["event_id"] for r in df.collect()
                )
            )
            .option("checkpointLocation", ckpt)
            .start()
        )

    q1 = _start()
    deadline = time.time() + 60
    while time.time() < deadline and len(got) < 50:
        time.sleep(0.3)
    q1.stop()
    assert len(got) >= 25, "first run made no progress"

    q2 = _start()
    deadline = time.time() + 60
    while time.time() < deadline and len(set(got)) < 100:
        time.sleep(0.3)
    q2.stop()
    assert sorted(set(got)) == list(range(100))
    # replayed batches are allowed (at-least-once into foreachBatch),
    # but with the commit/partitions offset fast-forward the ONLY
    # legal duplication is whole-batch replay of the single
    # uncommitted batch at the restart boundary: at most one batch's
    # worth of ids, and each dup id delivered at most twice
    from collections import Counter

    counts = Counter(got)
    dups = [i for i, c in counts.items() if c > 1]
    assert len(dups) <= 25, f"{len(dups)} dup ids — offset regressed"
    assert all(counts[i] <= 2 for i in dups)


def test_ledger_sink_manifest_commit(spark, tmp_path):
    """Custom DataSink: parts written per task, manifest published
    atomically at driver commit; an orphan part (failed/speculative
    attempt) is invisible to the manifest-trusting reader."""
    from demo_flink_spark.sources.pysource import (
        LedgerDataSource,
        read_ledger,
    )

    spark.dataSource.register(LedgerDataSource)
    _register(spark)
    out = str(tmp_path / "ledger")
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 120)
        .option("numPartitions", 5)
        .load()
    )
    df.write.format("ledger").option("path", out).mode("append").save()

    import json as _json
    import os

    with open(os.path.join(out, "_MANIFEST.json")) as f:
        manifest = _json.load(f)
    assert manifest["n_rows"] == 120
    assert sum(p["n_rows"] for p in manifest["parts"]) == 120
    rows = read_ledger(out)
    assert sorted(r["event_id"] for r in rows) == list(range(120))

    # plant an orphan part (a lost speculative attempt): the reader
    # must not see it
    with open(os.path.join(out, "part-orphan.jsonl"), "w") as f:
        f.write('{"event_id": 999}\n')
    rows2 = read_ledger(out)
    assert 999 not in {r["event_id"] for r in rows2}
    assert len(rows2) == 120


def test_ledger_stream_writer_end_to_end(spark, tmp_path):
    """Custom source -> custom streaming sink: per-batch manifests,
    exactly-once through the manifest set (one manifest per batch id),
    rows complete across micro-batches."""
    from demo_flink_spark.sources.pysource import (
        LedgerDataSource,
        read_ledger_stream,
    )

    spark.dataSource.register(LedgerDataSource)
    _register(spark)
    out = str(tmp_path / "stream_ledger")
    q = (
        spark.readStream.format("synthetic_events")
        .option("rowsPerBatch", 30)
        .option("numPartitions", 2)
        .option("maxRows", 90)
        .load()
        .writeStream.format("ledger")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt3"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            rows = read_ledger_stream(out)
            if len(rows) >= 90:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = read_ledger_stream(out)
    assert sorted(r["event_id"] for r in rows) == list(range(90))
    # one manifest per batch id (replays replace, never duplicate)
    import glob
    import os

    manifests = glob.glob(os.path.join(out, "_MANIFEST-*.json"))
    batch_ids = {os.path.basename(m) for m in manifests}
    assert len(batch_ids) == len(manifests)
