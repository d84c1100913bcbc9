"""Session-scoped persisted memos for shared builds.

Several declared queries analyze the same derived frame (the part
co-order graph, the cust↔part bipartite graph, the canonicalized
shingle table, the ngram-pair near-dup components); each build costs
more than some of the analytics on top of it. At 100 TB these are
materialized tables maintained once per corpus snapshot — not rebuilt
per analytic query — and this memo is the single-session equivalent:
the first query pays the build and ``persist()``s the frame, the rest
reuse it. Content is deterministic, so reuse is invisible to
correctness; the shake gate clears the memos between partition
settings (``clear_session_memos``) so the BUILD stages are exercised
under every partitioning, then re-hashes the consumers.

Keys always include ``spark.sparkContext.applicationId`` and the
``sf_dir`` (plus build parameters), so a new session or a different
scale factor rebuilds. Each named cache is a bounded LRU (a hit
refreshes recency — ``OrderedDict.move_to_end`` — so a session
alternating across many keys evicts the coldest entry, not the
hottest): past ``_MAX_ENTRIES`` keys the least-recently-used frame is
evicted and unpersisted, so a long-lived session sweeping many
sf_dirs cannot pin executor storage memory forever.
"""

from __future__ import annotations

import os
import time
from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame

_MAX_ENTRIES = 8

# cache name -> (key -> persisted DataFrame); one namespace per
# shared-build family so eviction pressure in one family (e.g. a
# shingle sweep across sf_dirs) cannot evict another family's frames
_CACHES: dict[str, OrderedDict] = {}

# build/hit event log (ADVICE r9 / VERDICT r9 item 6): the memoized
# builds make per-query bench timings order-dependent — whichever
# consumer runs first silently absorbs the one-time build cost. Each
# build is therefore MATERIALIZED (count()) inside session_memo and
# timed, and the event recorded here; bench.py drains the log after
# every query and writes a `memo_builds` map into the BENCH_DETAIL
# header, so the per-query table says in-band which queries paid
# which builds (raw evidence — timings are never normalized by it).
# The eager count() adds one pass over the already-persisted frame
# for the first consumer; in exchange the build cost is cleanly
# attributable instead of fused invisibly into that consumer's plan.
# It is GATED behind SPARK_GRAFT_MEMO_EAGER (bench.py sets it; so do
# the tests that assert on build-event costs or materialization-time
# failure handling) so non-bench sessions keep lazy builds and pay no
# extra pass (ADVICE r10).
_EVENTS: list[dict] = []
# a session that never drains (anything but bench) must not grow the
# log unboundedly: once _MAX_EVENTS is hit, trim to the newest half
_MAX_EVENTS = 4096
# per-nesting-level accumulator of child build seconds (see the
# exclusive-time note in session_memo)
_CHILD_SECS: list[float] = []


def _eager() -> bool:
    """Eager (count()) materialization of builds — ON only when bench
    (or a test) sets SPARK_GRAFT_MEMO_EAGER to an explicit true-ish
    spelling ("1"/"true"/"yes"/"on"). Everything else — unset, empty,
    "0"/"false"/"no"/"off", or any unknown spelling — means lazy, so
    a typo can never silently enable the extra materialization pass
    (ADVICE r11: the old deny-list made e.g. "off" eager)."""
    return os.environ.get("SPARK_GRAFT_MEMO_EAGER", "").strip().lower() in (
        "1",
        "true",
        "yes",
        "on",
    )


def session_memo(
    cache: str, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized persisted frame for `key`, building it on
    first use. Under SPARK_GRAFT_MEMO_EAGER (bench mode) the build is
    also MATERIALIZED here (count()), so its cost is owned by the
    build event and a failing build surfaces — and unpersists —
    inside this call; by default the build stays lazy and executes at
    the first consumer action (a failure then surfaces there).
    LRU-bounded per cache name; every build/hit appends to the event
    log (see `drain_memo_events`)."""
    entries = _CACHES.setdefault(cache, OrderedDict())
    if len(_EVENTS) >= _MAX_EVENTS:
        del _EVENTS[: -_MAX_EVENTS // 2]
    df = entries.get(key)
    if df is not None:
        entries.move_to_end(key)
        _EVENTS.append({"cache": cache, "event": "hit"})
        return df
    if len(entries) >= _MAX_ENTRIES:
        _, old = entries.popitem(last=False)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — dead session's frame
            pass
    # Builds nest (the ngram-pair build triggers the shingle build);
    # recorded durations are EXCLUSIVE — child build time is
    # subtracted from the parent via the accumulator stack — so the
    # per-query build charges in bench's `memo_builds` sum to the
    # true total instead of double-counting nested stages.
    _CHILD_SECS.append(0.0)
    t0 = time.time()
    ok = False
    try:
        df = build().persist()
        if _eager():
            # materialize so the build event owns its cost (bench
            # attribution) and a materialization failure surfaces —
            # and unpersists — here instead of poisoning the cache.
            # Lazy otherwise: non-bench sessions skip the extra pass
            # over the built frame (ADVICE r10).
            try:
                df.count()
            except BaseException:
                # a frame whose materialization failed is never
                # placed in entries, so no cleanup path could reach
                # it — unpersist here or the failed build pins
                # storage for the session
                try:
                    df.unpersist()
                except Exception:  # noqa: BLE001 — dead session
                    pass
                raise
        ok = True
    finally:
        # pop even on failure so a raising build cannot corrupt an
        # enclosing build's accounting. Charge the parent the full
        # elapsed only on SUCCESS — a failed child records no build
        # event, so its own time must stay inside the parent's
        # exclusive seconds or a build callable that catches the
        # failure and continues would leave memo_builds summing short
        # of true wall cost (ADVICE r10). On FAILURE, still pass up
        # the recorded-descendant time (`child`): a grandchild that
        # succeeded before this level failed has its own build event,
        # and discarding its charge here would double-count it in the
        # enclosing level's exclusive seconds.
        elapsed = time.time() - t0
        child = _CHILD_SECS.pop()
        if _CHILD_SECS:
            _CHILD_SECS[-1] += elapsed if ok else child
    _EVENTS.append(
        {"cache": cache, "event": "build", "secs": round(elapsed - child, 3)}
    )
    entries[key] = df
    return df


def drain_memo_events() -> list[dict]:
    """Return and clear the build/hit events recorded since the last
    drain. Consumers (bench.py) call this after each query to
    attribute shared-build costs to the query that triggered them."""
    global _EVENTS
    out, _EVENTS = _EVENTS, []
    return out


def clear_session_memos() -> None:
    """Unpersist and drop every memoized frame, every cache.

    Used by the shake gate between shuffle-partition settings so the
    memoized BUILD stages re-run under each partitioning (a reused
    persisted frame would silently shrink the gate's coverage to one
    layout), and available to any flow that mutates tables
    in-session.
    """
    for entries in _CACHES.values():
        for df in entries.values():
            try:
                df.unpersist()
            except Exception:  # noqa: BLE001 — dead session's frame
                pass
        entries.clear()
