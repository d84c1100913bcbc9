"""Streaming twin of `operators.timeseries.linear_trend`: per-key
least-squares trend maintained incrementally, bit-exact vs batch.

Why this twin is EXACT with bounded state (unlike EWMA, which needs a
horizon buffer): OLS sufficient statistics are ADDITIVE integers —
(n, Σx, Σy, Σxy, Σx²) merge across micro-batches with plain integer
addition, in any arrival order. The one wrinkle is the basis: the
batch operator measures x as microseconds since the key's FIRST
reading, and a late arrival can move that minimum. Rather than
reprocessing, the kernel RE-BASES algebraically: shifting every x by
an integer d maps the sums exactly —

    Σx'  = Σx + n·d
    Σx²' = Σx² + 2·d·Σx + n·d²
    Σxy' = Σxy + d·Σy

so state stays five integers + the basis, forever, and the emitted
fit equals the batch fit on the same rows BIT-FOR-BIT (the final
slope/intercept divisions are the same IEEE ops on the same
integers). Python ints are arbitrary-precision, carried in state as
strings so no width limit applies.

Per key per micro-batch, one row (key, n, slope_per_hour, intercept,
seq) is emitted — the downstream keyed-upsert snapshot keeps the
latest. This is the continuous drift/capacity monitor shape: state is
O(1) per key regardless of stream length.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = (
    "event_type string, n long, slope_per_hour double, "
    "intercept double, seq long"
)
STATE_SCHEMA = (
    "base_us long, n long, sx string, sy string, sxy string, sxx string, "
    "seq long"
)


def _cents(v: float) -> int:
    """Half-AWAY-from-zero cents quantization — matches the batch
    operator's `F.round` (HALF_UP) and the DuckDB oracle's `round`.
    Python's built-in `round()` is banker's (half-to-even): for any
    value whose v*100 is an exactly representable .5 double
    (0.125 → 12.5) it differs by one cent and breaks the documented
    bit-for-bit batch parity."""
    return (
        int(math.floor(v * 100 + 0.5))
        if v >= 0
        else -int(math.floor(-v * 100 + 0.5))
    )


def _fit(n: int, sx: int, sy: int, sxy: int, sxx: int) -> tuple[float, float]:
    """The batch operator's exact arithmetic: integer num/den, two
    double divisions, literal 3.6e7 / 100.0 scalings."""
    num = n * sxy - sx * sy
    den = n * sxx - sx * sx
    slope = float(num) / float(den) if den != 0 else 0.0
    intercept = (
        float(sy) / float(n) - slope * (float(sx) / float(n))
    ) / 100.0
    return slope * 3.6e7, intercept


def trend_op() -> StatefulOp:
    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (etype,) = key
        arrivals: list[tuple[int, int]] = []  # (ts_us, y_cents)
        for pdf in pdfs:
            for ts, val in zip(pdf["ts"], pdf["value"]):
                arrivals.append(
                    (
                        int(pd.Timestamp(ts).value // 1000),
                        _cents(float(val)),
                    )
                )
        if not arrivals:
            return
        arrivals.sort()

        if state.exists:
            base, n, sx, sy, sxy, sxx, seq = state.get
            sx, sy, sxy, sxx = int(sx), int(sy), int(sxy), int(sxx)
        else:
            base, n, sx, sy, sxy, sxx, seq = arrivals[0][0], 0, 0, 0, 0, 0, 0
        seq += 1

        new_min = min(a[0] for a in arrivals)
        if new_min < base:
            # a late arrival precedes the current basis: shift every
            # accumulated x by d (exact integer algebra, no replay)
            d = base - new_min
            sxx = sxx + 2 * d * sx + n * d * d
            sxy = sxy + d * sy
            sx = sx + n * d
            base = new_min
        for ts_us, y in arrivals:
            x = ts_us - base
            n += 1
            sx += x
            sy += y
            sxy += x * y
            sxx += x * x

        slope, intercept = _fit(n, sx, sy, sxy, sxx)
        yield pd.DataFrame(
            [(etype, n, slope, intercept, seq)],
            columns=["event_type", "n", "slope_per_hour", "intercept", "seq"],
        )
        state.update((base, n, str(sx), str(sy), str(sxy), str(sxx), seq))

    return StatefulOp(
        name="linear_trend_stream",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
