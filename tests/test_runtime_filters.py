"""Runtime bloom-filter join pruning: Spark can inject a bloom filter
built from the selective (creation) side of a shuffle join into the
big (application) side's scan, pruning rows BEFORE the shuffle — the
automatic complement to dedup's explicit bloom pruning
(operators/bloom.py) and the AQE skew pin (test_aqe_skew.py).

Local datasets sit far below the production thresholds (application
side >= 10 GB by default), so the test lowers them to prove the
mechanism and pins that row results are unchanged by the rewrite."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.sources import load_table
from tests.conftest import SF_DIR

_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # local parquet is tiny: drop the size gates so injection triggers
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "100MB",
    # broadcast joins don't need runtime filters — force the shuffle path
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


def test_bloom_filter_injected_and_answers_unchanged(spark):
    old = {}
    for k, v in _CONFS.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        orders = load_table(spark, SF_DIR, "orders").filter(
            F.col("o_orderpriority") == "1-URGENT"
        )
        li = load_table(spark, SF_DIR, "lineitem")
        joined = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "l_quantity", "o_orderpriority")
        plan = _optimized(joined)
        assert "bloom" in plan.lower(), plan[:2000]
        n_with = joined.count()
        # answers identical with the rewrite disabled
        spark.conf.set(
            "spark.sql.optimizer.runtime.bloomFilter.enabled", "false"
        )
        joined2 = li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).select("l_orderkey", "l_quantity", "o_orderpriority")
        assert "bloom" not in _optimized(joined2).lower()
        assert joined2.count() == n_with
        assert n_with > 0
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
