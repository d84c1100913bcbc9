"""Streaming twin of `operators.sampling.token_budget_cut`: a hard
per-group token budget enforced continuously as documents arrive.

This completes the batch/streaming story for the curation pipeline
(the quality gate and LSH dedup already have streaming twins): a
training-mixture recipe says "at most N tokens of each language", and
the ingest stream must converge to EXACTLY the cut the batch operator
would have chosen over the same corpus — not a greedy
first-come-first-kept approximation, which would make the selected
subset depend on arrival order and differ run to run.

Batch semantics being mirrored (`operators/sampling.py:157`): docs
rank within their group by md5(salt‖doc_id) and the kept set is the
longest rank-prefix whose token sum fits the budget. The streaming
kernel maintains, per group, the CURRENTLY-KEPT prefix as state.
Key monotonicity property that makes this tractable: inserting a new
doc into the ranked prefix only *increases* cumulative sums at later
ranks, so docs can flip kept→dropped (eviction) but never
dropped→kept. Therefore:

- state holds only the kept docs (bounded by budget/min-doc-tokens,
  NOT by stream length — a group's state cannot outgrow its budget);
- an arrival whose own cumulative already overflows is dropped
  forever, with no state footprint;
- an eviction is emitted as a retraction row (same doc_id, kept=false,
  higher seq), so a downstream upsert sink (`streaming/materialized`
  keyed-snapshot pattern) converges to the batch answer: take each
  doc's highest-seq row.

The md5 rank is computed in the kernel with hashlib — bit-identical
to the batch operator's `F.md5(concat(salt, doc_id))` string, so the
two paths order identically on any engine.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from demo_flink_spark.streaming.stateful_ops import StatefulOp

OUTPUT_SCHEMA = "doc_id long, grp string, n_tokens long, kept boolean, seq long"
# kept-prefix parallel arrays, sorted by rank key; `cut` is the rank
# key where the budget first overflowed ('' = never) — REQUIRED for
# exactness: the batch rule's running sum includes dropped docs'
# tokens, so any doc ranked at/after the overflow stays dropped even
# though the dropped docs themselves are not in state. seq is the
# per-key emission revision counter (retractions carry a higher seq
# than the original kept row, so "max seq per doc" is the converged
# answer).
STATE_SCHEMA = (
    "rks array<string>, ids array<long>, toks array<long>, "
    "cut string, seq long"
)


def _rank_key(doc_id: int, salt: str) -> str:
    return hashlib.md5(f"{salt}{doc_id}".encode()).hexdigest()


def _count_tokens(text) -> int:
    if text is None or (isinstance(text, float) and pd.isna(text)):
        return 0
    return len([w for w in str(text).split() if w])


def _kept_prefix_op(
    name: str,
    limit_of_group,  # grp -> int limit, or -1 for unlimited
    prefix_rule,  # (merged sorted [(rk,id,toks)], limit) -> kept list
    salt: str,
) -> StatefulOp:
    """Shared kernel for monotone kept-prefix selections.

    Both selections here (token-budget sum, exact-k count) share the
    property that inserting a lower-ranked late arrival can only push
    docs OUT of the kept rank-prefix, never pull them in — so state
    holds only the current prefix (bounded by the limit, not the
    stream) plus the rank boundary where the limit first ran out, and
    evictions emit retraction rows.

    The boundary (`cut`) is what makes the sum rule EXACT: the batch
    window's running sum includes dropped docs' tokens, so a doc
    ranked after an overflow must stay dropped even though the
    overflow doc is not in state (found by hypothesis replay: without
    the cut, dropping a 4-token doc and then admitting a later-ranked
    1-token doc "re-freed" the spent budget). Inserting earlier docs
    only moves the cut earlier, never later, so a remembered cut is
    permanent. `prefix_rule(merged, limit) -> (kept, cut_or_None)` is
    the only rule-specific part; exact-k needs no cut (its prefix end
    is always the current k-th entry, which insertions only lower).
    """

    def fn(key, pdfs, state) -> Iterator[pd.DataFrame]:
        (grp,) = key
        limit = limit_of_group(grp)
        arrivals: list[tuple[str, int, int]] = []  # (rk, doc_id, n_tokens)
        for pdf in pdfs:
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                arrivals.append(
                    (_rank_key(int(doc_id), salt), int(doc_id),
                     _count_tokens(text))
                )
        if not arrivals:
            return
        # deterministic in-batch order (same discipline as the other
        # stateful kernels: batch contents must not depend on Arrow
        # chunking order)
        arrivals.sort()

        if state.exists:
            rks, ids, toks, cut, seq = state.get
            kept_old = list(zip(rks, ids, toks))
            cut = cut or None
        else:
            kept_old, cut, seq = [], None, 0
        seq += 1

        if limit < 0:
            # unlimited group: stateless pass-through
            yield pd.DataFrame(
                {
                    "doc_id": [d for _, d, _ in arrivals],
                    "grp": grp,
                    "n_tokens": [t for _, _, t in arrivals],
                    "kept": True,
                    "seq": seq,
                }
            )
            state.update(([], [], [], "", seq))
            return

        # replay idempotence: Structured Streaming sources can replay
        # a batch into applyInPandasWithState after recovery, so an
        # arrival may be a doc this kernel has already processed. A
        # doc already in kept state must NOT merge twice (it would
        # double-count its tokens and permanently evict other docs —
        # divergence no retraction repairs); a duplicate within the
        # same batch collapses to one. Docs at/after the cut are
        # handled below (they re-drop, which is naturally idempotent).
        held = {d for _, d, _ in kept_old}
        seen_batch: set[int] = set()
        deduped = []
        for a in arrivals:
            if a[1] in held or a[1] in seen_batch:
                continue
            seen_batch.add(a[1])
            deduped.append(a)
        # anything ranked at/after the overflow boundary is dropped
        # forever — its cumulative can only have grown since the cut
        within = [a for a in deduped if cut is None or a[0] < cut]
        merged = sorted(kept_old + within)
        kept_new, new_cut = prefix_rule(merged, limit)
        if new_cut is not None and (cut is None or new_cut < cut):
            cut = new_cut
        kept_ids = {d for _, d, _ in kept_new}
        out_ids, out_toks, out_kept = [], [], []
        for _, d, t in arrivals:
            out_ids.append(d)
            out_toks.append(t)
            out_kept.append(d in kept_ids)
        for rk, d, t in kept_old:
            if d not in kept_ids:
                # retraction: a lower-ranked late arrival pushed this
                # previously-kept doc out of the prefix
                out_ids.append(d)
                out_toks.append(t)
                out_kept.append(False)
        yield pd.DataFrame(
            {
                "doc_id": out_ids,
                "grp": grp,
                "n_tokens": out_toks,
                "kept": out_kept,
                "seq": seq,
            }
        )
        state.update(
            (
                [rk for rk, _, _ in kept_new],
                [d for _, d, _ in kept_new],
                [t for _, _, t in kept_new],
                cut or "",
                seq,
            )
        )

    return StatefulOp(
        name=name,
        fn=fn,
        output_schema=OUTPUT_SCHEMA,
        state_schema=STATE_SCHEMA,
    )


def _budget_prefix(merged, budget):
    cum, kept = 0, []
    for rk, d, t in merged:
        cum += t
        if cum > budget:
            # prefix cut: everything at/after this rank is out, and
            # the boundary must be remembered (this doc's tokens are
            # spent budget even though the doc itself is dropped)
            return kept, rk
        kept.append((rk, d, t))
    return kept, None


def token_budget_op(
    budgets: dict[str, int], salt: str = "tb1"
) -> StatefulOp:
    """Build the keyed stateful op (key = group column, e.g. lang).

    Groups without a declared budget are unlimited: every arrival is
    emitted kept=true and no state accumulates.
    """
    return _kept_prefix_op(
        "token_budget", lambda g: budgets.get(g, -1), _budget_prefix, salt
    )


def exact_k_op(k: int, salt: str = "exk") -> StatefulOp:
    """Streaming twin of `operators.sampling.exact_k_per_group`:
    converge to exactly min(k, |group|) kept docs per group — the
    count-rule instance of the same monotone kept-prefix kernel
    (state ≤ k entries per group)."""
    return _kept_prefix_op(
        "exact_k", lambda g: k, lambda merged, lim: (merged[:lim], None), salt
    )
