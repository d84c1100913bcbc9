"""Lineage cuts that survive executor loss when asked to.

Iterative operators (PageRank power iteration, connected-components
star contraction, self-join reuse points) must cut lineage or the plan
doubles per round. Two mechanisms exist:

- `localCheckpoint` — blocks cached on the executors that computed
  them. Zero extra I/O, ideal for the single-JVM harness, but the
  blocks die with their executor: on a 1000-executor cluster running
  hours-long jobs, one preempted node forces a recompute that the
  truncated lineage can no longer serve (Spark fails the job).
- reliable `checkpoint` — blocks written to the fault-tolerant
  checkpoint dir (HDFS/S3). Costs a write per cut, survives any
  executor loss.

`cut_lineage` picks per-session: if the caller has configured
`spark.sparkContext.setCheckpointDir(...)` (the knob — set it on a
real cluster, leave it unset locally), cuts are reliable; otherwise
they fall back to `localCheckpoint`. Operators never choose — the
deployment does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def cut_lineage(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate `df`'s lineage, reliably when a checkpoint dir is set.

    `eager=False` defers materialization to first use (keeps a lazy
    loop body lazy); reliable checkpoints honor the same flag.
    """
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)


def cut_lineage_lazy(df: DataFrame) -> DataFrame:
    """`cut_lineage(df, eager=False)` in `.transform(...)`-chainable form."""
    return cut_lineage(df, eager=False)
