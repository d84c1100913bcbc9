"""Python UDTFs — the 1→N row-generating user-function surface
(SURVEY §2.10: Flink's `FlatMapFunction` is exactly a UDTF; reference
call sites `WindowWordCount.java:30`, `AdvancedWordCount.java:52`).

Plain tokenization needs no UDTF (`explode(split(...))` stays
JVM-side and always wins — see operators/wordcount.py), so the UDTF
here does something column expressions can't express in one pass:
run-length encoding of consecutive repeated tokens, a single stateful
sweep per document. The SQL equivalent is the two-window
gaps-and-islands rewrite (the DuckDB oracle runs it), which costs a
shuffle + two window passes; the UDTF emits runs in one narrow map.

Arrow note: `spark.sql.execution.pythonUDTF.arrow.enabled` batches
rows across the JVM↔Python hop (set in session.py); the UDTF itself
is row-logic either way.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf

_NON_ALPHA = re.compile(r"[^a-z\s]")
_WS = re.compile(r"\s+")


def _norm_tokens(text: str | None) -> list[str]:
    """Mirror of the engine's tokenize: lower, strip non-[a-z\\s],
    split on whitespace, drop empties (operators/textstats.py)."""
    if not text:
        return []
    return [t for t in _WS.split(_NON_ALPHA.sub("", text.lower())) if t]


@udtf(returnType="token string, run_len int, start_idx int")
class RunLengthTokens:
    """One output row per maximal run of consecutive equal tokens:
    (token, run length, 0-based start index in the token sequence)."""

    def eval(self, text: str | None):  # noqa: D102 — UDTF contract
        toks = _norm_tokens(text)
        i = 0
        while i < len(toks):
            j = i
            while j < len(toks) and toks[j] == toks[i]:
                j += 1
            yield toks[i], j - i, i
            i = j
