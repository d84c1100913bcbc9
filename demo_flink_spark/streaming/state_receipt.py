"""State-boundedness receipts for streaming state (VERDICT r12 #3).

The streaming operators CLAIM bounded state: `stream_stream_join`
documents watermark-evicted join buffers ("state per side ≈ rate ×
(watermark delay + join window)" — streaming/joins.py), and the
watermarked window aggregates evict closed windows. At 100 TB/day
those claims are the difference between a runnable job and an
executor OOM — so they need a MEASURED receipt, not a docstring:
without eviction, a join buffer grows with total input forever.

`batch_state_metrics` extracts the per-micro-batch state-store row
counts Spark itself reports (`StreamingQueryProgress.stateOperators[].
numRowsTotal` — the state the checkpoint actually holds) so a test
can drive a sliding key population through ≥20 micro-batches and
assert the series PLATEAUS at the watermark-window bound instead of
tracking cumulative input. tests/test_state_bounded.py holds the
receipts; SCALING.md records the measured numbers.
"""

from __future__ import annotations


def batch_state_metrics(query) -> list[dict]:
    """Per-micro-batch state metrics from a query's recentProgress.

    Returns one dict per progress event that ran a batch with state:
    ``batch_id``, ``input_rows`` (rows ingested that batch), and
    ``state_rows`` — the summed ``numRowsTotal`` across the batch's
    stateful operators (for single-operator queries this IS that
    operator's buffered row count). Call after
    ``query.processAllAvailable()``; Spark retains the last
    ``spark.sql.streaming.numRecentProgressUpdates`` (default 100)
    progress events, so drive fewer batches than that or sample as
    you go.
    """
    out: list[dict] = []
    for p in query.recentProgress:
        ops = p.get("stateOperators") or []
        if not ops:
            continue
        out.append(
            {
                "batch_id": p["batchId"],
                "input_rows": int(p.get("numInputRows", 0)),
                "state_rows": sum(int(o.get("numRowsTotal", 0)) for o in ops),
            }
        )
    return out


def assert_plateaus(
    series: list[int],
    total_ingested: int,
    tail: int = 8,
    max_total_fraction: float = 0.35,
    tail_growth_slack: float = 1.15,
) -> None:
    """Assert a per-batch state-row series is BOUNDED, not cumulative.

    Four independent checks; a non-evicting (unbounded) buffer fails
    1, 2 and 3 by construction on a sliding key population:
      1. the final plateau holds at most ``max_total_fraction`` of all
         state rows ever ingested (a cumulative buffer holds ~100%);
      2. the maximum over the last ``tail`` batches is within
         ``tail_growth_slack`` of the maximum over the preceding
         window — i.e. the series stopped growing. Two ADJACENT
         windows, so a slow leak under ~slack^(1/tail)-1 per batch
         (≈1.8% at the defaults) slips through this check alone
         (ADVICE r13);
      3. whole-series slow-leak check: the tail maximum is within
         ``tail_growth_slack`` of the maximum over the EARLIEST
         post-warmup window (``series[tail : 2*tail]``, truncated to
         stay disjoint from the tail). The gap this compares across
         grows with the series length, so the per-batch leak rate it
         tolerates shrinks toward zero as a receipt drives more
         batches — a monotone leak fails here long before the
         cumulative-fraction bound of check 1 trips. At the minimum
         permitted length (exactly ``2*tail`` batches) no disjoint
         early window exists and this check does not bind — drive
         more than ``2*tail`` batches for slow-leak coverage (the
         repo's receipts drive 22 vs the 16 minimum);
      4. spike check: the GLOBAL maximum is within
         ``tail_growth_slack`` of the tail maximum — a mid-run spike
         that drained before the tail would otherwise be blessed as
         "bounded" even though the store needed spike-sized memory.
    Bounds are deliberately loose: micro-batch watermark advancement
    lags one batch, so the plateau spans 2-3 batches of rows, not 1.
    """
    assert len(series) >= 2 * tail, (
        f"need >= {2 * tail} stateful batches for a plateau claim, "
        f"got {len(series)}"
    )
    assert max(series) > 0, "state never materialized — vacuous receipt"
    final_plateau = max(series[-tail:])
    assert final_plateau <= max_total_fraction * total_ingested, (
        f"state did not evict: tail max {final_plateau} vs "
        f"{total_ingested} total ingested "
        f"(bound {max_total_fraction:.0%})"
    )
    mid_max = max(series[-2 * tail : -tail])
    assert final_plateau <= tail_growth_slack * mid_max, (
        f"state still growing across the tail: last-{tail} max "
        f"{final_plateau} vs preceding-{tail} max {mid_max}"
    )
    early = series[tail : min(2 * tail, len(series) - tail)]
    if early:  # empty at the minimum length — see docstring
        early_max = max(early)
        assert final_plateau <= tail_growth_slack * early_max, (
            f"slow monotone leak: last-{tail} max {final_plateau} vs "
            f"earliest post-warmup window max {early_max} over "
            f"{len(series) - 2 * tail} intervening batches"
        )
    global_max = max(series)
    assert global_max <= tail_growth_slack * final_plateau, (
        f"state peaked mid-run above the settled plateau: global max "
        f"{global_max} vs tail max {final_plateau} — the store needed "
        f"spike-sized memory even though the tail looks bounded"
    )
