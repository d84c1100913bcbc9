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

from collections import OrderedDict
from typing import Callable

from pyspark.sql import DataFrame

_MAX_ENTRIES = 8

# cache name -> (key -> persisted DataFrame); one namespace per
# shared-build family so eviction pressure in one family (e.g. a
# shingle sweep across sf_dirs) cannot evict another family's frames
_CACHES: dict[str, OrderedDict] = {}


def session_memo(
    cache: str, key: tuple, build: Callable[[], DataFrame]
) -> DataFrame:
    """Return the memoized persisted frame for `key`, building (and
    persisting) it on first use. LRU-bounded per cache name."""
    entries = _CACHES.setdefault(cache, OrderedDict())
    df = entries.get(key)
    if df is not None:
        entries.move_to_end(key)
        return df
    if len(entries) >= _MAX_ENTRIES:
        _, old = entries.popitem(last=False)
        try:
            old.unpersist()
        except Exception:  # noqa: BLE001 — dead session's frame
            pass
    df = build().persist()
    entries[key] = df
    return df


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
