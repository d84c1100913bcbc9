"""Streaming twin of `operators.textstats.kl_unigram_by_source`: a
continuously-updated unigram-KL drift monitor against a FROZEN
reference vocabulary profile.

Deployment shape (the PSI-stream pattern, `streaming/drift_stream.py`):
profile the blessed corpus once — word counts d_w and total m — and
watch a production token stream against it. The current side's
sufficient statistic is the per-word count vector (algebraic: counts
merge commutatively), so late/out-of-order/shuffled arrivals converge
to the same integers, and every emission recomputes

    KL = (1/n) Σ_w c_w · ln( (c_w·m) / (d_w·n) )

from those integers through `softln_py` + the half-up 6dp
quantization — the EXACT integer-micros kernel of the batch operator,
so at any point where the stream has seen exactly a source's rows its
emission equals the batch `kl_unigram_by_source` row for that source,
bit for bit (pinned in tests/test_kl_stream.py).

Out-of-vocabulary contract: a stream CAN carry words the frozen
reference has never seen (q = 0 → KL undefined). Those words are
COUNTED (`n_oov` in every emission — the drift signal a vocabulary
shift produces first) but excluded from the divergence sum, and the
bit-parity guarantee applies to OOV-free streams. State per key: the
observed vocabulary's (word, count) pairs + 3 scalars — bounded by
the stream's distinct-word count; cap upstream (e.g. hash-bucket the
vocabulary) if that is unbounded in your deployment.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.drift_stream import (
    round6_half_up_micros,
    softln_py,
)
from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = (
    "key string, n_tokens long, n_types long, n_oov long, "
    "kl_micros long, seq long"
)
STATE_SCHEMA = (
    "words array<string>, counts array<long>, n long, n_oov long, seq long"
)


def kl_micros_from_counts(
    counts: dict[str, int], n: int, ref: dict[str, int], m: int
) -> int:
    """The batch operator's exact integer-micros KL over observed
    counts vs the frozen reference — term micros are
    half-up-6dp(c · half-up-6dp(ln ratio)) summed exactly, final
    division round-half-away (operators/textstats.py recipe)."""
    total = 0
    for w, c in counts.items():
        a = c * m
        b = ref[w] * n
        ln = softln_py(a, b) if a <= b else -softln_py(b, a)
        ln6 = round6_half_up_micros(ln) / 1e6  # the 6dp-rounded double
        total += round6_half_up_micros(c * ln6)
    if n == 0:
        return 0
    sign = -1 if total < 0 else 1
    return sign * ((abs(total) * 2 + n) // (2 * n))


def kl_drift_op(ref_counts: dict[str, int], m: int) -> StatefulOp:
    """Keyed stateful op: key = monitor group; rows carry `word`."""

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (grp,) = key
        arrivals: list[str] = []
        for pdf in pdfs:
            arrivals.extend(w for w in pdf["word"] if w is not None)
        if not arrivals:
            return
        if state.exists:
            words, cnts, n, n_oov, seq = state.get
            counts = dict(zip(list(words), [int(x) for x in cnts]))
            n, n_oov = int(n), int(n_oov)
        else:
            counts, n, n_oov, seq = {}, 0, 0, 0
        seq += 1
        for w in arrivals:
            if w in ref_counts:
                counts[w] = counts.get(w, 0) + 1
                n += 1
            else:
                n_oov += 1
        kl = kl_micros_from_counts(counts, n, ref_counts, m)
        yield pd.DataFrame(
            {
                "key": [grp],
                "n_tokens": [n],
                "n_types": [len(counts)],
                "n_oov": [n_oov],
                "kl_micros": [kl],
                "seq": [seq],
            }
        )
        state.update(
            (list(counts), [counts[w] for w in counts], n, n_oov, seq)
        )

    return StatefulOp(
        name="kl_drift",
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )
