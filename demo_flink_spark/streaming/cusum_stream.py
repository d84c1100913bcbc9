"""Streaming twin of `operators.timeseries.cusum_drift`: Page's CUSUM
maintained incrementally per key with O(1) integer state.

The closed form the batch operator uses (S_i = P_i − min(0, min P_j))
is sequential in event time, and — unlike the OLS sufficient
statistics (`trend_stream`) — it is NOT algebraically mergeable: a
late arrival before position p shifts every later prefix sum AND the
running min in a way (P_last, runmin) alone cannot reconstruct. So
the twin's contract is the EWMA twin's, made stricter:

- in-(event-time)-order arrivals update state exactly: with all
  quantities held as scale-6 integer micros, the streamed summary is
  BIT-IDENTICAL to the batch operator after every batch (pytest pins
  tuple equality, not approx);
- an arrival at or before the key's high-water (ts, tiebreak) mark is
  emitted on the late side output (`late=true`, the W5 routing
  pattern) and does NOT touch state — never a silently-wrong
  statistic.

State per key: 8 integers — prefix sum, running min, high-water ts/tb,
n, n_alarms, max S, first-alarm ts — regardless of stream length.

Input quantization contract: `value` must be exactly representable at
≤ 6 decimals via its shortest repr (the synthetic feed carries 2),
so the kernel's half-away micros quantization equals the batch
`CAST(value AS DECIMAL(38,6))` HALF_UP conversion bit-for-bit.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = (
    "event_type string, seq long, late boolean, late_ts_us long, "
    "n long, n_alarms long, max_cusum_micros long, first_alarm_us long"
)
STATE_SCHEMA = (
    "pfx long, runmin long, hw_ts long, hw_tb long, n long, "
    "n_alarms long, max_s long, first_alarm long, seq long"
)


def _micros(v: float) -> int:
    """Half-away scale-6 quantization == Spark/DuckDB double→
    decimal(38,6) for values exactly representable at ≤6 dp."""
    return (
        int(math.floor(v * 1_000_000 + 0.5))
        if v >= 0
        else -int(math.floor(-v * 1_000_000 + 0.5))
    )


def cusum_op(
    target: float = 100.0, slack: float = 5.0, h: float = 500.0
) -> StatefulOp:
    t_micros = _micros(target) + _micros(slack)
    h_micros = _micros(h)

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (etype,) = key
        arrivals: list[tuple[int, int, int]] = []  # (ts_us, tb, v_micros)
        for pdf in pdfs:
            for ts, tb, val in zip(pdf["ts"], pdf["event_id"], pdf["value"]):
                arrivals.append(
                    (
                        int(pd.Timestamp(ts).value // 1000),
                        int(tb),
                        _micros(float(val)),
                    )
                )
        if not arrivals:
            return
        arrivals.sort()

        if state.exists:
            pfx, runmin, hw_ts, hw_tb, n, n_alarms, max_s, first_alarm, seq = (
                state.get
            )
        else:
            pfx, runmin, hw_ts, hw_tb = 0, 0, -1, -1
            n, n_alarms, max_s, first_alarm, seq = 0, 0, 0, -1, 0
        seq += 1

        late_rows = []
        for ts_us, tb, v in arrivals:
            if (ts_us, tb) <= (hw_ts, hw_tb):
                late_rows.append((ts_us, tb))
                continue
            hw_ts, hw_tb = ts_us, tb
            n += 1
            pfx += v - t_micros
            if pfx < runmin:
                runmin = pfx
            s = pfx - min(0, runmin)
            if s > max_s:
                max_s = s
            if s > h_micros:
                n_alarms += 1
                if first_alarm < 0:
                    first_alarm = ts_us
        out = {
            "event_type": [etype],
            "seq": [seq],
            "late": [False],
            "late_ts_us": [None],
            "n": [n],
            "n_alarms": [n_alarms],
            "max_cusum_micros": [max_s],
            "first_alarm_us": [None if first_alarm < 0 else first_alarm],
        }
        for ts_us, _tb in late_rows:
            out["event_type"].append(etype)
            out["seq"].append(seq)
            out["late"].append(True)
            out["late_ts_us"].append(ts_us)
            for c in ("n", "n_alarms", "max_cusum_micros", "first_alarm_us"):
                out[c].append(None)
        yield pd.DataFrame(out)
        state.update(
            (pfx, runmin, hw_ts, hw_tb, n, n_alarms, max_s, first_alarm, seq)
        )

    return StatefulOp(
        name="cusum",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
