"""Round-13 receipts (VERDICT r12 items 1-2).

1. The capped-LSH driver receipt must be NON-VACUOUS at the driver's
   scale factor: r12's star-policy query produced output byte-identical
   to the unguarded query's at sf0.01 (every verified pair on the
   fixture spans its bucket rep), so its hash-PASS could not
   distinguish "cap honored" from "cap ignored". The declared query is
   now `dedup_minhash_capped_drop` (bucket_cap=2, drop overflow), and
   this module pins the divergence AT sf0.01 — if a future fixture or
   parameter change makes capped == uncapped again, the receipt has
   regressed to vacuous and this test fails.

2. The 100 TB near-dup curation playbook (capped-star LSH → connected
   components → keep-longest) is now a declared end-to-end query
   (`pipeline_curation_neardup`); its invariants are pinned here
   against the individually-verified stages.
"""

from __future__ import annotations

import pytest

from demo_flink_spark.operators import dedup as dd

DRIVER_SF_DIR = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def docs001(spark):
    from demo_flink_spark.sources import load_table

    return load_table(spark, DRIVER_SF_DIR, "documents")


@pytest.fixture(scope="module")
def sigs001(spark, docs001):
    # one signature build for the whole module (the declared queries
    # share the same memo via _shared_minhash_sigs); unpersisted on
    # teardown so the cached blocks don't outlive the module inside
    # the session-scoped SparkSession (ADVICE r13)
    sigs = (
        dd.minhash_signatures(docs001, n=3, n_hashes=64, bands=16)
        .select("doc_id", "shingles", "bands")
        .persist()
    )
    yield sigs
    sigs.unpersist()


def _pairs(df) -> set[tuple[int, int]]:
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_capped_drop_diverges_at_driver_sf(spark, docs001, sigs001):
    """The anti-vacuity receipt: at the sf the driver hashes (0.01),
    the declared capped query's verified output must DIFFER from the
    unguarded query's. An implementation that ignored bucket_cap would
    produce the unguarded output and fail here (and hash-FAIL against
    the drop-policy DuckDB twin)."""
    uncapped = _pairs(
        dd.minhash_lsh_pairs(
            docs001, n=3, threshold=0.2, signatures_df=sigs001
        )
    )
    dropped = _pairs(
        dd.minhash_lsh_pairs(
            docs001,
            n=3,
            threshold=0.2,
            signatures_df=sigs001,
            bucket_cap=2,
            overflow="drop",
        )
    )
    # THE GATE: drop only removes candidates, so capped output is a
    # STRICT subset — this is the non-vacuity property, and it holds
    # for any fixture that has at least one over-cap bucket whose
    # dropped candidates contained a verified pair
    assert dropped < uncapped, (
        f"capped output identical to uncapped ({len(uncapped)} pairs) — "
        "the declared receipt regressed to vacuous at the driver sf"
    )
    # fixture-coupled detail (ADVICE r13: demoted from the gate): the
    # exact counts on the CURRENT sf0.01 testdata. If the driver
    # regenerates testdata this assert moves while the gate above
    # still decides vacuity.
    assert (len(uncapped), len(dropped)) == (25, 23), (
        f"fixture drift: measured ({len(uncapped)}, {len(dropped)}) — "
        "update the pinned counts after confirming the gate still holds"
    )


def test_curation_neardup_composite_invariants(spark):
    """pipeline_curation_neardup = capped-star LSH → connected
    components → keep-longest, as one declared query. Pins the
    keep-list contract: exactly one kept member per cluster, the kept
    member is the cluster's (score desc, doc_id asc) argmax, and
    unpaired docs keep themselves under their own id."""
    from collections import defaultdict

    from demo_flink_spark.plans.dedup import q_pipeline_curation_neardup

    rows = q_pipeline_curation_neardup(spark, DRIVER_SF_DIR).collect()
    assert len(rows) == 500  # one row per document
    clusters = defaultdict(list)
    for r in rows:
        clusters[r.cluster_id].append(r)
    for cid, members in clusters.items():
        kept = [m for m in members if m.is_kept]
        assert len(kept) == 1
        best = min(members, key=lambda m: (-m.score, m.doc_id))
        assert kept[0].doc_id == best.doc_id
        if len(members) == 1:
            # unpaired docs keep themselves under their own id
            assert cid == members[0].doc_id
    # the fixture plants near-dup clusters: some multi-doc cluster
    # must exist, else the composite degenerated to a no-op
    assert any(len(m) > 1 for m in clusters.values())


def test_profile_approx_ndv_bound(spark):
    """profile_table(exact_ndv=False) — the 100x-scale profiling path
    (VERDICT r12 #4): per-column HLL++ sketches (rsd=0.02) inside the
    ONE wide aggregation, no melt shuffle. Pins (a) every non-NDV
    field byte-identical to the exact path's, (b) per-column relative
    NDV error <= 5% at sf0.01 lineitem (2.5x the sketch's standard
    relative error — headroom for the estimator's tail without
    tolerating a broken sketch)."""
    from demo_flink_spark.operators.relational import profile_table
    from demo_flink_spark.sources import load_table

    li = load_table(spark, DRIVER_SF_DIR, "lineitem")
    exact = {r.column: r for r in profile_table(li).collect()}
    approx = {
        r.column: r for r in profile_table(li, exact_ndv=False).collect()
    }
    assert set(exact) == set(approx) == set(li.columns)
    for c, e in exact.items():
        a = approx[c]
        assert (a.n_rows, a.n_null, a.min_value, a.max_value) == (
            e.n_rows,
            e.n_null,
            e.min_value,
            e.max_value,
        )
        rel_err = abs(a.n_distinct - e.n_distinct) / max(e.n_distinct, 1)
        assert rel_err <= 0.05, (
            f"{c}: approx ndv {a.n_distinct} vs exact {e.n_distinct} "
            f"({rel_err:.1%})"
        )


def test_capped_star_is_output_invariant_here(spark, docs001, sigs001):
    """Documents WHY the declared receipt had to switch policies: on
    this fixture the star overflow re-admits every verified pair at
    sf0.01 (each spans its bucket rep), so star capped == uncapped —
    the measured fact behind VERDICT r12 finding #1. If the fixture
    ever changes such that star diverges, this test flags it: the
    declared receipt could then pin the production star policy
    directly."""
    uncapped = _pairs(
        dd.minhash_lsh_pairs(
            docs001, n=3, threshold=0.2, signatures_df=sigs001
        )
    )
    starred = _pairs(
        dd.minhash_lsh_pairs(
            docs001,
            n=3,
            threshold=0.2,
            signatures_df=sigs001,
            bucket_cap=2,
            overflow="star",
        )
    )
    assert starred == uncapped
