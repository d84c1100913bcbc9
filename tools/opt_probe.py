"""Optimization-round probe: capture plans and/or time declared queries.

Usage:
  python tools/opt_probe.py plans OUTDIR SUFFIX q1 q2 ...   # dump explain("formatted")
  python tools/opt_probe.py time N q1 q2 ...                # N count() reps each, medians

Timing uses the bench methodology (count() on the query frame) so the
numbers compare 1:1 with bench.py cells; run on a quiet box. Plans are
load-independent. Note: session memos are NOT cleared between
queries, so a memo-consumer query captured after another consumer
shows an InMemoryTableScan of the shared build (which is also what it
hits in a bench session); capture it in a fresh process for the
cold-build plan.
"""

from __future__ import annotations

import os
import statistics
import sys
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    mode = sys.argv[1]
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark

    spark = get_spark("opt_probe", extra_conf={"spark.ui.showConsoleProgress": "false"})
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qs = e.queries()

    if mode == "plans":
        outdir, suffix = sys.argv[2], sys.argv[3]
        names = sys.argv[4:]
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = qs[name](spark, sf_dir)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            path = os.path.join(outdir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(txt)
            print(f"wrote {path} ({len(txt)} bytes)")
    elif mode == "time":
        n = int(sys.argv[2])
        names = sys.argv[3:]
        from pyspark.sql import functions as F

        # bench-identical warmup
        spark.range(1_000_000).groupBy(F.col("id") % 7).count().collect()
        for name in names:
            reps = []
            for _ in range(n):
                t0 = time.time()
                qs[name](spark, sf_dir).count()
                reps.append(round(time.time() - t0, 3))
            med = statistics.median(reps)
            print(f"{name}: median {med:.3f}s  reps {reps}")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    main()
