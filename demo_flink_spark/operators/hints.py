"""Scale-conditional join-strategy hints.

A forced ``F.broadcast`` is the one Spark construct that turns into an
executor OOM instead of a slow plan when its input outgrows memory: it
bypasses ``spark.sql.autoBroadcastJoinThreshold`` entirely, so the
optimizer never gets the chance to fall back to a shuffle join.

Iterative graph operators broadcast O(|V|) relations (rank vectors,
component maps). On catalog-keyed graphs |V| is tiny next to |E| and
the broadcast is the right plan; on node-heavy graphs (users, URLs)
|V| grows with the data and the broadcast must degrade to a shuffle
join — a slower plan, never a failure. ``broadcast_if_small`` makes
that choice explicit: the caller passes the row count it already knows
(these loops count |V| anyway for their convergence/base terms, so the
estimate is free — no extra job), and the hint is applied only when
the estimated in-memory size fits the session's own broadcast
threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Conservative per-row estimate for the narrow (key, value) relations
# these loops broadcast: two 8-byte columns plus UnsafeRow + hashmap
# overhead. Erring high only means falling back to a shuffle join a
# little early — safe in both directions.
_EST_ROW_BYTES = 64


def broadcast_threshold_bytes(df: DataFrame) -> int:
    """The session's broadcast budget in bytes.

    Reads ``spark.sql.autoBroadcastJoinThreshold`` (supports plain
    byte counts and the k/m/g suffixed forms Spark accepts); ``-1``
    (auto-broadcast disabled) maps to 0 so nothing force-broadcasts.
    """
    raw = (
        df.sparkSession.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
        or "10485760"
    )
    s = raw.strip().lower()
    mult = 1
    for suffix, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                      ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                      ("b", 1)):
        if s.endswith(suffix):
            s = s[: -len(suffix)]
            mult = m
            break
    try:
        val = int(float(s)) * mult
    except ValueError:
        val = 10 << 20
    return max(val, 0)


def broadcast_if_small(
    df: DataFrame, est_rows: int, row_bytes: int = _EST_ROW_BYTES
) -> DataFrame:
    """Broadcast-hint ``df`` only when ``est_rows * row_bytes`` fits
    the session's broadcast threshold; otherwise return it unhinted so
    the join planner picks a shuffle strategy.

    ``est_rows`` is a count the caller already holds (loop invariants
    like |V|); this helper never runs a job to find out.
    """
    if est_rows * row_bytes <= broadcast_threshold_bytes(df):
        return F.broadcast(df)
    return df
