"""Query registry: every implemented operator declared as a named,
oracle-checked query.

Each plan module exposes ``SPECS: list[QuerySpec]``; ``all_specs()``
aggregates them into the dict that ``__spark_entry__.py`` publishes to
the driver. Keeping the Spark callable and its DuckDB oracle SQL side
by side in one spec is what keeps column names/aliases in sync — the
driver's compare sorts columns by name before hashing values.
"""

from __future__ import annotations

from demo_flink_spark.plans.spec import QuerySpec  # noqa: F401


def all_specs() -> dict[str, "QuerySpec"]:
    # Imports live inside the function so a broken plan module surfaces
    # at driver time with a clear traceback instead of at package import.
    from demo_flink_spark.plans import (
        dedup,
        features,
        graph,
        modern,
        multimodal,
        pipeline,
        quality,
        relational,
        similarity,
        stateful,
        temporal,
        text,
        timeseries,
        tpch_ext,
        webtext,
        windows,
    )

    collected: dict[str, QuerySpec] = {}
    for mod in (
        timeseries,
        modern,
        features,
        graph,
        pipeline,
        quality,
        tpch_ext,
        temporal,
        dedup,
        similarity,
        multimodal,
        relational,
        windows,
        stateful,
        text,
        webtext,
    ):
        for spec in mod.SPECS:
            if spec.name in collected:
                raise ValueError(f"duplicate query name: {spec.name}")
            collected[spec.name] = spec

    return _rotate_by_driver_evidence(collected)


def _rotate_by_driver_evidence(
    collected: dict[str, "QuerySpec"],
    root: "str | None" = None,
) -> dict[str, "QuerySpec"]:
    """Order the registry so the driver's ~50-query sample lands on the
    queries with the least/oldest driver evidence.

    The driver samples in registry order and writes one
    ``CORRECTNESS_r{N}.json`` per round at the repo root. Reading those
    files here (instead of hardcoding last round's gap list) makes the
    rotation self-updating: never-sampled queries come first, then
    queries whose latest driver record is not fully green (hash fail /
    err / rows-only), then green queries oldest-round-first. Ties keep
    declaration order, so the ordering is deterministic for a given set
    of CORRECTNESS files. Any read/parse problem degrades to
    declaration order — the rotation is an optimization, never a
    correctness dependency.
    """
    import json
    import re
    from pathlib import Path

    last_round: dict[str, int] = {}
    last_green: dict[str, bool] = {}
    try:
        base = Path(root) if root else Path(__file__).resolve().parents[2]
        for f in sorted(base.glob("CORRECTNESS_r*.json")):
            m = re.search(r"r(\d+)", f.name)
            if not m:
                continue
            rnd = int(m.group(1))
            try:
                recs = json.loads(f.read_text())
            except (OSError, ValueError):
                continue
            if not isinstance(recs, dict):
                continue
            for name, v in recs.items():
                if not isinstance(v, dict):
                    continue
                if last_round.get(name, -1) <= rnd:
                    last_round[name] = rnd
                    last_green[name] = (
                        bool(v.get("hash_match"))
                        and bool(v.get("rows_match"))
                        and v.get("err") is None
                    )
    except OSError:
        return collected

    def age_key(item: tuple[int, str]) -> tuple[int, int, int]:
        idx, name = item
        if name not in last_round:
            return (0, 0, idx)  # never sampled: most urgent
        if not last_green[name]:
            return (1, last_round[name], idx)  # stale fail/err record
        return (2, last_round[name], idx)  # green: oldest round first

    ordered = sorted(enumerate(collected), key=age_key)
    return {name: collected[name] for _, name in ordered}
