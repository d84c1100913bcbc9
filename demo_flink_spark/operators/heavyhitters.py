"""Exact top-k frequent items without shuffling the full key space.

The 100 TB motivation: `groupBy(col).count().orderBy(desc).limit(k)`
shuffles one row per DISTINCT key — for web-scale token/URL/user-agent
columns that is billions of grouping keys through the exchange (and a
spill-heavy hash aggregate) to answer a question whose output is k
rows. The two-pass shape bounds that:

1. **Candidate pass** — each partition runs a Misra-Gries summary with
   `m` counters over its rows (one `mapInPandas` scan, O(m) memory,
   no shuffle) and emits its ≤ m surviving keys. By the Misra-Gries
   guarantee, any key with partition frequency > N_p/(m+1) survives
   partition p; any key with GLOBAL frequency > N/(m+1) must clear
   that bar in ≥1 partition (averaging), so the union of survivors
   contains every global heavy hitter.
2. **Verify pass** — the candidate set (≤ m × partitions keys, KBs)
   is broadcast back; a second scan counts ONLY candidate rows
   exactly. The exchange now carries ≤ |candidates| keys per task.

The result is EXACT for every returned key, and provably complete for
keys with frequency > N/(m+1); returned `threshold` lets callers check
that the k-th item clears it (if so, the top-k is provably the true
top-k). This is the candidate-then-verify discipline used across the
engine (bloom dedup, LSH + exact-Jaccard): sketch to prune, exact math
to answer.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def topk_frequent_exact(
    df: DataFrame, col: str, k: int = 10, m: int = 256
) -> DataFrame:
    """Exact counts of the top-k most frequent `col` values via the
    two-pass candidate/verify shape (see module docstring).

    Returns (value, cnt, rk, threshold) for rk ≤ k, ordered by
    (cnt desc, value) for a deterministic total order. `threshold` is
    N div (m+1) (long integer division, N = non-null input rows): for
    integer counts, cnt > threshold ⟺ cnt > N/(m+1), so any returned
    row with cnt > threshold is provably in the true top-k — callers
    verify completeness by checking the k-th row clears it. `m` trades
    candidate-set size for that bound; m = 256 guarantees completeness
    for anything above ~0.4% frequency even on a single partition.
    """

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Misra-Gries via the mergeable-summaries formulation (Agarwal
        # et al.): exact value_counts per Arrow chunk (vectorized),
        # merged into the running summary; when the summary exceeds m
        # keys, subtract the (m+1)-th largest weight from everything
        # and keep positives — the batch equivalent of MG's
        # decrement-all, same completeness guarantee, no per-row
        # Python loop.
        acc = pd.Series(dtype="float64")
        for pdf in batches:
            vc = pdf[col].dropna().value_counts()
            acc = acc.add(vc, fill_value=0.0)
            if len(acc) > m:
                thresh = acc.nlargest(m + 1).iloc[-1]
                acc = acc[acc > thresh] - thresh
        # astype(object) keeps the original value dtype generic AND
        # gives an empty partition an object-dtype column (a bare empty
        # index is int64, which Arrow would refuse to cast to string)
        yield pd.DataFrame({col: acc.index.astype(object)})

    candidates = (
        df.select(col).mapInPandas(summarize, df.select(col).schema).distinct()
    )
    exact = (
        df.join(F.broadcast(candidates), col, "semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    from pyspark.sql.window import Window

    # orderBy+limit plans as TakeOrderedAndProject (per-partition top-k
    # + driver merge of k-row heaps) — no global sort; the rank window
    # then runs over k rows only.
    topk = exact.orderBy(F.desc("cnt"), F.asc(col)).limit(k)
    w = Window.orderBy(F.desc("cnt"), F.asc(col))
    # Completeness bar N div (m+1): a 1-row broadcast cross-join (the
    # count aggregate), integer division so the value is cross-engine
    # exact.
    total = df.select(
        F.expr(f"count(`{col}`) div {m + 1}").cast("long").alias("threshold")
    )
    return topk.select(
        F.col(col).alias("value"),
        "cnt",
        F.row_number().over(w).cast("long").alias("rk"),
    ).crossJoin(F.broadcast(total))
