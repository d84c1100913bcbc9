"""One-off larger-SF scaling probe (VERDICT r14 #8).

Every r14 scaling ratio (32 vs 8 cores) read ≈1 because sf0.1 cells
are dominated by fixed per-action costs AND every sf parquet table is
a single row group (one scan task regardless of cores). This probe
builds a ~10x key-shifted copy of sf0.1 under /tmp/sf1synth — written
as 32 files per table so scans actually split — and times a handful
of heavy queries at SPARK_GRAFT_CPUS=32 vs 8 to measure real
parallelism. NOT part of the bench (the driver contract is
untouched); results are recorded in OPTIMIZATION_r15.md / SCALING.md.

  python tools/opt15_scale_probe.py gen          # build /tmp/sf1synth
  python tools/opt15_scale_probe.py time q1 ...  # 2 count() reps each

Key shifting preserves referential integrity: copy k adds k*10^9 to
order keys and k*10^7 to customer/part/doc/vec/event/user ids, in
every table that carries them, so joins land exactly as in the base
data (10x rows, 10x groups). Text/embedding payloads are reused —
fine for the aggregate/join/tokenize shapes probed here; the dedup
pair family is NOT probed on this corpus (10x-duplicated text would
change its cost shape, not just its size).
"""

from __future__ import annotations

import os
import sys

OUT = "/tmp/sf1synth"
SRC = "/root/testdata/sf0.1"
COPIES = 10
BIG = 10**9
SMALL = 10**7

SHIFTS = {
    "lineitem": {"l_orderkey": BIG, "l_partkey": SMALL, "l_suppkey": 0},
    "orders": {"o_orderkey": BIG, "o_custkey": SMALL},
    "customer": {"c_custkey": SMALL},
    "part": {"p_partkey": SMALL},
    "supplier": {},
    "region": {},
    "nation": {},
    "documents": {"doc_id": SMALL},
    "embeddings": {"vec_id": SMALL},
    "events": {"event_id": BIG, "user_id": SMALL},
}


def gen() -> None:
    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    os.makedirs(OUT, exist_ok=True)
    for tbl, shifts in SHIFTS.items():
        src = pq.read_table(f"{SRC}/{tbl}.parquet")
        if not shifts:
            pq.write_table(src, f"{OUT}/{tbl}.parquet")
            print(f"{tbl}: copied ({src.num_rows} rows)")
            continue
        parts = []
        for k in range(COPIES):
            t = src
            for col, step in shifts.items():
                if step and k:
                    idx = t.schema.get_field_index(col)
                    t = t.set_column(
                        idx, col, pc.add(t.column(col), k * step)
                    )
            parts.append(t)
        big = pa.concat_tables(parts)
        # 32 row groups so the scan splits across cores
        pq.write_table(
            big,
            f"{OUT}/{tbl}.parquet",
            row_group_size=max(big.num_rows // 32, 1),
        )
        print(f"{tbl}: {big.num_rows} rows, 32 row groups")


def time_queries(names: list[str]) -> None:
    import statistics
    import time

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark
    from pyspark.sql import functions as F

    spark = get_spark(
        "opt15_scale", extra_conf={"spark.ui.showConsoleProgress": "false"}
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()
    spark.range(64).repartition(32).mapInPandas(lambda it: it, "id long").count()
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    qs = e.queries()
    for name in names:
        reps = []
        for _ in range(2):
            t0 = time.time()
            qs[name](spark, OUT).count()
            reps.append(round(time.time() - t0, 3))
        print(f"cpus={cpus} {name}: med {statistics.median(reps):.3f}s {reps}")
        sys.stdout.flush()


if __name__ == "__main__":
    if sys.argv[1] == "gen":
        gen()
    else:
        time_queries(sys.argv[2:])
