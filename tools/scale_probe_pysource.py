"""Decade scaling probe for the custom Python DataSource
(`pysource_event_counts` — VERDICT r10 item 4).

    python tools/scale_probe_pysource.py [max_rows]

The registry query generates its own input (sf_dir is unused — that
is the point of the connector), so the sf-directory probe cannot
carry its scaling story. This probe scales the `n_rows` option
through four decades (20k → 20M; the registry cell is 2k) with
`numPartitions` fixed at 32 (one generation task per local core —
the shape a 1000-executor cluster would use, more partitions per
executor, same per-partition work), timing the registry query's
aggregation over the source.

Planted truth: every attribute of event `i` is a pure md5 function
of `i` (`sources/pysource.py::_row`), so the probe computes the FULL
expected aggregate (per-type count, distinct users, value sum) in
plain Python once per size and asserts exact equality — counts and
users as integers; the value sum as exact integral MICROS (every
generated value has 2 decimals, so round-then-cast-long recovers the
integer on both sides; the registry query's decimal(38,6) sum is the
oracle-checked equivalent), so the comparison is exact, not
toleranced. A connector that dropped a partition, double-read an
offset range, or mangled a batch boundary fails the cell before its
timing counts.

What the timing measures: Arrow-batch generation in Python workers
(embarrassingly parallel, zero shuffle input) + a 4-group
aggregation. Expected linear (slope ~1.0) once the ~fixed Python
worker startup is amortized; the interesting receipt is that the
Arrow path's throughput holds through the decades.

Methodology as the other probes: warm run + median of 3 per cell.
"""

from __future__ import annotations

import math
import os
import sys
import time


def expected_aggregate(n: int) -> dict[str, tuple[int, int, int]]:
    """(n_events, n_users, value_sum_micros) per event type, computed
    from the same pure row function the connector uses. value micros
    are exact: each value has 2 decimals, so 1e6-scaled longs sum
    without float error (the query accumulates decimal(38,6))."""
    import hashlib

    types = ("view", "click", "purchase", "error")
    counts: dict[str, int] = {t: 0 for t in types}
    users: dict[str, set] = {t: set() for t in types}
    sums: dict[str, int] = {t: 0 for t in types}
    for i in range(n):
        h = hashlib.md5(f"syn:{i}".encode()).hexdigest()
        t = types[int(h[4], 16) % 4]
        counts[t] += 1
        users[t].add(int(h[:4], 16) % 100)
        # round(x/100, 2) of an integer/100 is exact in micros
        sums[t] += int(h[5:9], 16) % 20000 * 10000
    return {t: (counts[t], len(users[t]), sums[t]) for t in types if counts[t]}


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from demo_flink_spark.session import get_spark
    from demo_flink_spark.sources.pysource import SyntheticEventsDataSource

    max_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    spark = get_spark(
        "scale_probe_pysource",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.dataSource.register(SyntheticEventsDataSource)

    sizes = [n for n in (20_000, 200_000, 2_000_000, 20_000_000) if n <= max_rows]
    rows = []
    for n in sizes:
        want = expected_aggregate(n)

        def run():
            df = (
                spark.read.format("synthetic_events")
                .option("n_rows", n)
                .option("numPartitions", 32)
                .load()
            )
            got = {
                r["event_type"]: (
                    r["n_events"],
                    r["n_users"],
                    r["value_sum_micros"],
                )
                for r in df.groupBy("event_type")
                .agg(
                    F.count(F.lit(1)).cast("long").alias("n_events"),
                    F.countDistinct("user_id").cast("long").alias("n_users"),
                    # exact: 2-decimal values scale to integral
                    # micros; ROUND before the cast (value*1e6 can
                    # land a hair under the integer — 0.29 → 289999.99…
                    # — and a bare long cast truncates)
                    F.sum(
                        F.round(F.col("value") * 1_000_000).cast("long")
                    ).alias("value_sum_micros"),
                )
                .collect()
            }
            assert got == want, (
                f"connector aggregate mismatch at n={n}: "
                f"{ {k: (got.get(k), want.get(k)) for k in set(got) | set(want) if got.get(k) != want.get(k)} }"
            )

        run()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            run()
            ts.append(time.time() - t0)
        t = sorted(ts)[1]
        rows.append((n, t))
        print(
            f"n={n:,} pysource={t:.2f}s reps={[round(x, 2) for x in ts]}"
            f" ({n / t / 1e6:.2f}M rows/s)",
            flush=True,
        )

    print("\n| rows | pysource_event_counts | slope | throughput |")
    print("|---|---|---|---|")
    for i, (n, t) in enumerate(rows):
        s = (
            "—"
            if i == 0
            else f"{math.log10(t / rows[i - 1][1]) / math.log10(n / rows[i - 1][0]):.2f}"
        )
        print(f"| {n:,} | {t:.2f}s | {s} | {n / t / 1e6:.2f}M rows/s |")


if __name__ == "__main__":
    main()
