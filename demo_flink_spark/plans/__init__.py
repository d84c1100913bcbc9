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
        relational,
        similarity,
        stateful,
        temporal,
        text,
        timeseries,
        tpch_ext,
        windows,
    )

    out: dict[str, QuerySpec] = {}
    # dedup/similarity/multimodal first: round 1's driver run recorded
    # only 50 of 60 declared queries and the 10 missing rows were all
    # from these three modules (VERDICT.md round 1, item 1) — if the
    # driver caps or truncates, the never-yet-checked queries must come
    # first so CORRECTNESS_r02 gains them rather than re-proving the
    # long-green relational rows.
    for mod in (
        timeseries,
        modern,
        features,
        graph,
        pipeline,
        tpch_ext,
        temporal,
        dedup,
        similarity,
        multimodal,
        relational,
        windows,
        stateful,
        text,
    ):
        for spec in mod.SPECS:
            if spec.name in out:
                raise ValueError(f"duplicate query name: {spec.name}")
            out[spec.name] = spec
    return out
