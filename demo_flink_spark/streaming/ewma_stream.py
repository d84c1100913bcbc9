"""Streaming twin of `operators.timeseries.ewma_trailing`: per-key
trailing EWMA maintained continuously, with bounded-disorder repair.

Batch semantics being mirrored: every reading's EWMA is computed over
its `n_trailing`-reading EVENT-TIME window (order (ts, event_id)), with
power-of-two weights folded oldest→newest — bit-exact IEEE doubles
(see the batch docstring). A streaming twin must produce the SAME
number for the same reading even when readings arrive out of order,
which greedy arrival-order smoothing cannot do.

Kernel contract (per key):

- state = the last `horizon` readings by event time (+ a count of
  readings evicted past the horizon, + the emission seq). Bounded by
  `horizon`, never by the stream.
- an in-horizon arrival is inserted in event-time order; every
  buffered reading whose trailing window contains the insertion point
  (the next `n_trailing - 1` positions) gets a CORRECTION row with a
  higher seq — downstream takes max-seq per event_id (the
  `streaming/materialized` keyed-upsert pattern), converging to the
  exact batch answer.
- an arrival needing predecessors already evicted past the horizon
  (insertion position < n_trailing - 1 while evictions exist) cannot
  be computed exactly any more: it is emitted ONCE with
  `late = true, ewma = NULL` — the explicit late-data side-output
  discipline (`streaming/late_data.py`), never a silently-wrong
  number. Disorder tolerance is therefore `horizon - n_trailing`
  readings, the knob a deployment sets from its watermark.

The EWMA arithmetic in the kernel is the SAME IEEE ops in the SAME
order as the batch fold (Python floats are IEEE doubles), so in-order
replay equals the batch column bit-for-bit — pinned in
tests/test_ewma_stream.py.
"""

from __future__ import annotations

import bisect
from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = (
    "event_id long, event_type string, ts timestamp, value double, "
    "n_win int, ewma double, late boolean, seq long"
)
STATE_SCHEMA = (
    "ts array<long>, ids array<long>, vals array<double>, "
    "n_evicted long, seq long"
)


def _ewma(window: list[float]) -> float:
    """Bit-for-bit the batch fold: exact power-of-two weights, strict
    oldest→newest summation from +0.0."""
    length = len(window)
    num = 0.0
    den = 0.0
    for j, v in enumerate(window):
        w = 1.0 / (1 << (length - 1 - j))
        num = num + v * w
        den = den + w
    return num / den


def ewma_op(n_trailing: int = 8, horizon: int = 64) -> StatefulOp:
    if horizon < n_trailing:
        raise ValueError("horizon must be >= n_trailing")

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (etype,) = key
        arrivals: list[tuple[int, int, float]] = []  # (ts_us, id, value)
        for pdf in pdfs:
            for ev, ts, val in zip(pdf["event_id"], pdf["ts"], pdf["value"]):
                arrivals.append(
                    (int(pd.Timestamp(ts).value // 1000), int(ev), float(val))
                )
        if not arrivals:
            return
        arrivals.sort()

        if state.exists:
            tss, ids, vals, n_evicted, seq = state.get
            buf = [(int(t), int(i), float(v)) for t, i, v in zip(tss, ids, vals)]
        else:
            buf, n_evicted, seq = [], 0, 0
        seq += 1

        late_rows: list[tuple[int, int, float]] = []
        dirty_from = None  # earliest insertion position this batch
        for a in arrivals:
            p = bisect.bisect_left(buf, a)
            if n_evicted > 0 and p < n_trailing - 1:
                # true window reaches past the evicted horizon:
                # explicit late side-output, never a wrong number
                late_rows.append(a)
                continue
            buf.insert(p, a)
            dirty_from = p if dirty_from is None else min(dirty_from, p)

        out: list[tuple] = []
        if dirty_from is not None:
            # every reading whose trailing window can contain an
            # inserted position: from the earliest insertion to the
            # end (insertions shift positions, so recomputing the
            # whole suffix is both safe and cheap — it is bounded by
            # the horizon)
            for q in range(dirty_from, len(buf)):
                lo = max(0, q - n_trailing + 1)
                window = [v for _, _, v in buf[lo : q + 1]]
                ts_us, ev, val = buf[q]
                out.append(
                    (ev, etype, pd.Timestamp(ts_us * 1000), val,
                     len(window), _ewma(window), False, seq)
                )
        for ts_us, ev, val in late_rows:
            out.append(
                (ev, etype, pd.Timestamp(ts_us * 1000), val,
                 None, None, True, seq)
            )
        yield pd.DataFrame(
            out,
            columns=[
                "event_id", "event_type", "ts", "value",
                "n_win", "ewma", "late", "seq",
            ],
        )

        if len(buf) > horizon:
            n_evicted += len(buf) - horizon
            buf = buf[-horizon:]
        state.update(
            (
                [t for t, _, _ in buf],
                [i for _, i, _ in buf],
                [v for _, _, v in buf],
                n_evicted,
                seq,
            )
        )

    return StatefulOp(
        name="ewma_trailing_stream",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
