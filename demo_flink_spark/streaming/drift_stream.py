"""Streaming twin of `operators.quality_checks.psi_drift_report`: a
continuously-updated PSI drift monitor against a FROZEN reference
profile.

Why this one is exact under ANY arrival order (unlike CUSUM): with
the reference profile frozen — bin edges + reference bin counts, the
way drift monitors are deployed (profile the blessed snapshot once,
watch production against it) — the current side's sufficient
statistic is just the per-bin count vector, an ALGEBRAIC aggregate:
counts merge commutatively, so late/out-of-order/shuffled arrivals
all converge to the same integers. Every emission recomputes the PSI
terms from those integers through `softln_py` — a line-for-line
Python twin of the engine's portable `softln_ratio` column expression
(same IEEE ops, same order, equality pinned by hypothesis in
tests/test_drift_stream.py) — and Spark-`round(_, 6)`-identical
half-up decimal quantization, so the streamed report is BIT-IDENTICAL
to the batch operator run over the same rows, per micro-batch, not
just at convergence.

NaN contract (scope of "the same rows"): the stream DROPS NaN values
(the `v == v` filter below), because Arrow→pandas float columns
represent SQL NULL as NaN — inside the stateful kernel NULL and NaN
are indistinguishable, and the batch query (`q_psi_drift`) filters
NULLs. The batch OPERATOR, fed a literal (non-NULL) NaN, would bin it
into bin 1 (`edge < NaN` is false). Callers who can emit literal NaN
must pre-filter it (`isnan(value) = false`) on BOTH sides; the
bit-identical guarantee holds over NaN-free, NULL-free rows.

State per key: n_bins + 2 integers, forever.
"""

from __future__ import annotations

import math
from collections.abc import Iterator
from decimal import ROUND_HALF_UP, Decimal

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = (
    "key string, bin int, c_ref long, c_cur long, term_micros long, "
    "psi_total_micros long, n_seen long, seq long"
)
STATE_SCHEMA = "counts array<long>, n_seen long, seq long"

_LN2 = 0.6931471805599453


def softln_py(num: int, den: int) -> float:
    """Python twin of `operators.relational.softln_ratio` (ln(num/den)
    for 0 < num <= den): the SAME expression tree evaluated in the
    same order — Python floats are IEEE doubles, so every intermediate
    is bit-identical to the Spark column / DuckDB SQL forms."""
    q = int(math.floor(float(den) / float(num)))
    k = q.bit_length()  # == length(bin(q)) for q >= 1
    pow2k = 2.0**k  # exact power of two
    r = (float(num) * pow2k) / float(den)
    y = (r - 1.0) / (r + 1.0)
    t = y * y
    h = 1.0 / 19.0
    for c in (17.0, 15.0, 13.0, 11.0, 9.0, 7.0, 5.0, 3.0):
        h = h * t + 1.0 / c
    series = 2.0 * y * (h * t + 1.0)
    return series - float(k) * _LN2


def round6_half_up_micros(x: float) -> int:
    """Spark `F.round(x, 6)` twin as integer micros: BigDecimal.valueOf
    uses the double's SHORTEST repr then rounds HALF_UP decimally —
    `Decimal(repr(x))` is the same construction in Python."""
    d = Decimal(repr(float(x))).quantize(
        Decimal("0.000001"), rounding=ROUND_HALF_UP
    )
    return int(d * 1_000_000)


def psi_terms_micros(
    c_ref: list[int], c_cur: list[int], n_ref: int, n_cur: int
) -> list[int]:
    """Per-bin PSI term micros from exact integer counts — the same
    arithmetic as the batch operator's column expressions."""
    n_bins = len(c_ref)
    out = []
    for cr, cc in zip(c_ref, c_cur):
        a = (cr + 1) * (n_cur + n_bins)
        b = (cc + 1) * (n_ref + n_bins)
        ln_pq = softln_py(a, b) if a <= b else -softln_py(b, a)
        p = float(cr + 1) / float(n_ref + n_bins)
        q = float(cc + 1) / float(n_cur + n_bins)
        out.append(round6_half_up_micros((p - q) * ln_pq))
    return out


def bin_of(v: float, edges: list[float]) -> int:
    """1 + count of edges strictly below v — the batch operator's
    assignment rule (deterministic double comparisons)."""
    return 1 + sum(1 for e in edges if e < v)


def drift_op(
    edges: list[float], ref_counts: list[int], n_ref: int
) -> StatefulOp:
    """Keyed stateful op: key = monitor group (e.g. event_type); rows
    carry `value`. The reference profile (edges from the blessed
    snapshot's rank-selected elements, its bin counts and total) is
    frozen into the operator — the production deployment shape."""
    n_bins = len(ref_counts)
    if len(edges) != n_bins - 1:
        raise ValueError(
            f"{n_bins} bins need {n_bins - 1} edges, got {len(edges)}"
        )

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (grp,) = key
        arrivals = []
        for pdf in pdfs:
            # v == v drops NaN == drops SQL NULL (Arrow float columns
            # carry NULL as NaN); see the NaN contract in the module
            # docstring.
            arrivals.extend(float(v) for v in pdf["value"] if v == v)
        if not arrivals:
            return
        if state.exists:
            counts, n_seen, seq = state.get
            counts = [int(x) for x in counts]
        else:
            counts, n_seen, seq = [0] * n_bins, 0, 0
        seq += 1
        for v in arrivals:
            counts[bin_of(v, edges) - 1] += 1
            n_seen += 1
        terms = psi_terms_micros(ref_counts, counts, n_ref, n_seen)
        total = sum(terms)
        yield pd.DataFrame(
            {
                "key": grp,
                "bin": list(range(1, n_bins + 1)),
                "c_ref": ref_counts,
                "c_cur": counts,
                "term_micros": terms,
                "psi_total_micros": total,
                "n_seen": n_seen,
                "seq": seq,
            }
        )
        state.update((counts, int(n_seen), int(seq)))

    return StatefulOp(
        name="psi_drift",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
