"""Synthetic-corpus scaling probe for the dedup flagship operators.

    python tools/scale_probe_synth.py [max_n]
    python tools/scale_probe_synth.py --template [max_n] [bucket_cap]

The parquet fixtures top out at 5k documents (sf0.1), where fixed
overheads still dominate — `tools/scale_probe.py`'s slopes sit well
under 1 because the asymptote hasn't kicked in. This probe generates
corpora large enough (10k → 640k docs by default; pass 1280000 or
2560000 for the fifth/sixth decades recorded in SCALING.md) that the asymptotic
exponent is measurable, with NON-degenerate duplicate structure:
docs come in pairs sharing all 25 tokens, tokens unique per pair
(letters only — the dedup canonicalizer strips digits), so the
correct answer is exactly n/2 pairs and posting lists stay
constant-size. A quadratic regression in the banding/inverted-index
shape would show up as a slope ≥ 2 here long before it OOMs a
cluster.

--template mode (VERDICT r11 #1) plants the DEGENERATE case the
default corpus deliberately avoids: one near-dup template cluster
owning 10% of the corpus — k = n/10 docs of 50 tokens sharing a
49-token template, each with a unique last token (pairwise shingle
Jaccard 47/49 ~ 0.96: near-identical boilerplate that exact dedup
does NOT collapse, the real-crawl hazard). Closed-form truth: the
cluster owes k(k-1)/2 pairs on top of the background's (n-k)/2, so
  - UNGUARDED minhash_lsh_pairs / ppjoin_prefix_pairs must count
    exactly (n-k)/2 + k(k-1)/2 — and their cost is Theta(k^2), which
    the probe measures until a cell exceeds its time budget (then
    records an honest cost model, the r11 CC-probe standard);
  - GUARDED minhash_lsh_pairs(bucket_cap=C) must keep CLUSTER-level
    truth: connected components over its pairs = (n-k)/2 + 1
    components with the largest exactly k — asserted every rep —
    at Theta(k) cost per over-cap bucket;
  - lsh_bucket_stats must DETECT the plant: max bucket width within
    [k/2, k] (the modal band bucket holds ~J^4*k ~ 0.85k members).

Results are appended to SCALING.md by hand (the probe prints a
markdown table); pair counts are asserted so a recall regression
fails the probe rather than flattering its timing.
"""

from __future__ import annotations

import math
import os
import sys
import time


def _session():
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demo_flink_spark.session import get_spark

    spark = get_spark(
        "scale_probe_synth",
        extra_conf={
            "spark.ui.showConsoleProgress": "false",
            # Size shuffles to the data, the way a deployment does
            # (session.py: "err high, AQE coalesces"): at the default
            # 32 partitions the ≥1.28M steps put ~2M posting rows per
            # partition into the rank/agg sorts and the measurements
            # become spill-bound — PPJoin at 2.56M measured median
            # 103 s with a 3× rep spread at 32 partitions vs 73.2 s
            # median-of-3 at 128 (the apparent slope fell from a fake
            # 2.36 to 1.16 on the final step, aggregate 0.55; the
            # first 128-partition diagnostic measured 41 s, superseded
            # by the authoritative rerun in SCALING.md). AQE coalesces
            # the excess at the small sizes, so one setting serves
            # every decade.
            "spark.sql.shuffle.partitions": "128",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    # Reliable (disk) checkpoints are the documented scale
    # configuration (operators/checkpointing.py honors this dir):
    # without it every cut_lineage localCheckpoints into the same
    # heap the broadcast builds need, which is what a cluster never
    # does. Makes the probe measure the shape a real deployment runs.
    # Spark never deletes reliable checkpoint files itself
    # (spark.cleaner.referenceTracking.cleanCheckpoints defaults to
    # false), so the probe owns its checkpoint dir's lifecycle: a
    # per-run mkdtemp (unique — concurrent probe runs cannot wipe
    # each other's live checkpoints) removed at exit (multi-GB of
    # shingle + signature checkpoints per run would otherwise
    # accumulate in /tmp forever). A dir configured via
    # SPARK_GRAFT_CHECKPOINT_DIR is the USER'S — its lifecycle is
    # theirs, the probe neither wipes nor registers cleanup for it.
    import atexit
    import shutil
    import tempfile

    if spark.sparkContext.getCheckpointDir() is None:
        ckpt_dir = tempfile.mkdtemp(prefix="spark_graft_synth_ckpt_")
        spark.sparkContext.setCheckpointDir(ckpt_dir)
        atexit.register(shutil.rmtree, ckpt_dir, ignore_errors=True)
    return spark


def main() -> None:
    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
    spark = _session()
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ppjoin_prefix_pairs,
    )

    def tok(grp, i: int):
        return F.translate(
            F.substring(
                F.md5(F.concat(grp.cast("string"), F.lit("_"), F.lit(i))), 1, 8
            ),
            "0123456789",
            "ghijklmnop",
        )

    def corpus(n: int):
        grp = (F.col("id") / 2).cast("long")
        return spark.range(n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[tok(grp, i) for i in range(25)]).alias("text"),
        )

    sizes = [
        n
        for n in (10_000, 40_000, 160_000, 640_000, 1_280_000, 2_560_000)
        if n <= max_n
    ]

    # warm run, then MEDIAN of 3 measured reps: single large-size
    # measurements on this box swing 2-3× rep-to-rep (checkpoint
    # write I/O and page-cache state dominate — measured 103.7 s
    # then 36.1 s for consecutive same-session 1.28M LSH reps), so
    # any one-rep slope at the big sizes is noise. The warm run
    # additionally absorbs first-touch codegen/shuffle-file costs
    # that would otherwise masquerade as superlinear growth at
    # exactly one size.
    def timed_median(make_df, expected: int, label: str) -> float:
        make_df().count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.time()
            got = make_df().count()
            ts.append(time.time() - t0)
            assert got == expected, (
                f"{label} recall regression: {got} != {expected}"
            )
        return sorted(ts)[1]

    rows = []
    for n in sizes:
        # persist (NOT localCheckpoint): Dataset.unpersist() only
        # releases CacheManager entries, so a localCheckpointed
        # corpus's blocks would survive the per-size cleanup below
        # until the JVM happens to GC the reference — exactly the
        # cross-size accumulation the cleanup exists to prevent. The
        # corpus lineage (range + expressions) is trivial, so persist
        # gives the same materialize-outside-the-timings effect with
        # a deterministic release.
        df = corpus(n).persist()
        df.count()  # materialize outside the timings
        t_lsh = timed_median(
            lambda: minhash_lsh_pairs(df, n=3, threshold=0.2), n // 2, "LSH"
        )
        t_exact = timed_median(lambda: exact_dedup(df), n // 2, "exact dedup")
        # PPJoin is the documented LOSSLESS near-dup scale path
        # (plans use it where the max_df cut would be an
        # approximation) — so its asymptote needs the same
        # asserted-recall receipt as the LSH path. Identical paired
        # texts give Jaccard 1.0 >= 0.4; cross-pair docs share no
        # shingles, so the exact answer is again n/2.
        t_ppjoin = timed_median(
            lambda: ppjoin_prefix_pairs(
                df, n=3, threshold_num=2, threshold_den=5
            ),
            n // 2,
            "PPJoin",
        )
        rows.append((n, t_lsh, t_exact, t_ppjoin))
        print(
            f"n={n} lsh={t_lsh:.1f}s exact={t_exact:.1f}s"
            f" ppjoin={t_ppjoin:.1f}s",
            flush=True,
        )
        # Session hygiene between sizes: without releasing the
        # corpus, the 640k step runs against a JVM holding every
        # smaller corpus plus all prior shuffle state — measured 5×
        # slower (158.8 s vs ~30-50 s clean-session) before this was
        # added, which read as a fake super-linear slope. Blocking
        # unpersist works because the corpus is persist()ed (see
        # above); clearCache sweeps anything the operators cached.
        df.unpersist(blocking=True)
        spark.catalog.clearCache()

    print(
        "\n| docs | minhash_lsh_pairs | slope | exact_dedup | slope |"
        " ppjoin_prefix_pairs | slope |"
    )
    print("|---|---|---|---|---|---|---|")
    for i, (n, tl, te, tp) in enumerate(rows):
        if i == 0:
            sl = se = sp = "—"
        else:
            pn, pl, pe, pp_prev = rows[i - 1]
            ratio = math.log10(n / pn)
            sl = f"{math.log10(tl / pl) / ratio:.2f}"
            se = f"{math.log10(te / pe) / ratio:.2f}"
            sp = f"{math.log10(tp / pp_prev) / ratio:.2f}"
        print(f"| {n:,} | {tl:.1f}s | {sl} | {te:.1f}s | {se} | {tp:.1f}s | {sp} |")


def template_main(max_n: int, bucket_cap: int) -> None:
    """Degenerate template-cluster probe (see module docstring)."""
    spark = _session()
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.dedup import (
        connected_components,
        dedup_keep_best,
        lsh_bucket_stats,
        minhash_lsh_pairs,
        ppjoin_prefix_pairs,
    )

    def tok(seed, i):
        return F.translate(
            F.substring(
                F.md5(F.concat(seed.cast("string"), F.lit("_"), F.lit(i))), 1, 8
            ),
            "0123456789",
            "ghijklmnop",
        )

    def corpus(n: int):
        """k = n/10 template docs (49 shared tokens + unique last, so
        every pair has shingle Jaccard 47/49 ~ 0.96 — near-dup, NOT
        exact-dup) + background docs in identical pairs sharing no
        shingle with anything else. Single-token md5 collisions across
        groups can't create a shared 3-token shingle, so the groups
        are disjoint in shingle space by construction."""
        k = n // 10
        template = F.concat_ws(
            " ", *[tok(F.lit("tmpl"), i) for i in range(49)]
        )
        cluster = spark.range(k).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(
                " ",
                template,
                tok(F.concat(F.lit("uniq"), F.col("id").cast("string")), 0),
            ).alias("text"),
        )
        grp = (F.col("id") / 2).cast("long")
        background = spark.range(k, n).select(
            F.col("id").alias("doc_id"),
            F.concat_ws(" ", *[tok(grp, i) for i in range(25)]).alias("text"),
        )
        return cluster.unionByName(background)

    # Unguarded cells run while affordable; past the budget (or past
    # the candidate-volume hard cap, predicted from lsh_bucket_stats
    # BEFORE attempting the join) the cell is recorded as a cost
    # model (the r11 long-chain-CC standard for "genuinely
    # unmeasurable": the measured slope IS the receipt).
    budget_s = float(os.environ.get("SPARK_GRAFT_PROBE_BUDGET_S", "600"))
    cand_hard_cap = float(
        os.environ.get("SPARK_GRAFT_PROBE_CAND_CAP", "5e9")
    )

    def timed_median(fn) -> tuple[float, int]:
        """Warm + median of 3, collapsing to a single measured rep
        when the warm run shows the cell is expensive (>120 s) — the
        pair-mode probe showed rep-to-rep spread matters at seconds,
        not at tens of minutes, and a 4x repeat of a 10-minute cell
        buys spread data at an unaffordable price. Returns
        (median_s, reps)."""
        t0 = time.time()
        fn()  # warm
        warm = time.time() - t0
        reps = 1 if warm > 120 else 3
        ts = []
        for _ in range(reps):
            t0 = time.time()
            fn()
            ts.append(time.time() - t0)
        return sorted(ts)[len(ts) // 2], reps

    sizes = [
        n
        for n in (10_000, 40_000, 160_000, 640_000, 1_280_000, 2_560_000)
        if n <= max_n
    ]
    rows = []
    unguarded_alive = {"lsh": True, "ppjoin": True}
    # Per-size checkpoint-subdir rotation (the r11 CC-probe lesson
    # generalized): reliable checkpoint files accumulate for the
    # whole session otherwise — harmless for disk at these sizes but
    # the growing dir's writeback perturbs the later big cells' X1
    # (signature-checkpoint) stage, measured as a 3.6x rep spread at
    # 2.56M before this rotation.
    import shutil as _shutil
    from urllib.parse import urlparse

    ckpt_root = spark.sparkContext.getCheckpointDir()
    # rotation is a LOCAL-filesystem optimization: os.makedirs/rmtree
    # on an HDFS/S3 checkpoint URI would create bogus local 's3:/...'
    # dirs while the real remote files silently kept accumulating
    # (ADVICE r12) — on a remote scheme, skip rotation entirely
    if ckpt_root is not None and urlparse(ckpt_root).scheme not in ("", "file"):
        ckpt_root = None
    prev_sub: str | None = None
    for n in sizes:
        if ckpt_root is not None:
            sub = os.path.join(
                ckpt_root.removeprefix("file:"), f"size_{n}"
            )
            os.makedirs(sub, exist_ok=True)
            spark.sparkContext.setCheckpointDir(sub)
            if prev_sub is not None:
                _shutil.rmtree(prev_sub, ignore_errors=True)
            prev_sub = sub
        k = n // 10
        truth_pairs = (n - k) // 2 + k * (k - 1) // 2
        df = corpus(n).persist()
        df.count()

        # 1) detection: the monitoring stats must SEE the plant
        stats = lsh_bucket_stats(df, n=3, bucket_cap=bucket_cap).collect()[0]
        assert k // 2 <= stats["max_width"] <= k, stats
        assert stats["n_over_cap"] >= 1, stats
        # sum of w*(w-1)/2 = the candidate volume the unguarded band
        # join must pay — the hazard's own number, printed per cell
        cand_pairs = stats["candidate_pairs"]

        # 2) guarded LSH, timed like the pair-mode cells (construction
        #    + count); per-rep truth = count determinism, per-size
        #    truth = cluster-level recall via connected components
        #    (untimed — the guard's contract is cluster recall, and
        #    connectivity across k nodes also implies >= k-1 pairs)
        guard_counts: list[int] = []

        def guarded_fn():
            guard_counts.append(
                minhash_lsh_pairs(
                    df, n=3, threshold=0.2, bucket_cap=bucket_cap
                ).count()
            )

        t_guard, r_guard = timed_median(guarded_fn)
        assert len(set(guard_counts)) == 1, guard_counts
        guarded_pairs = minhash_lsh_pairs(
            df, n=3, threshold=0.2, bucket_cap=bucket_cap
        ).select("doc_a", "doc_b")
        comp = connected_components(guarded_pairs)
        res = (
            comp.groupBy("comp")
            .count()
            .agg(
                F.count(F.lit(1)).alias("n_comp"),
                F.max("count").alias("biggest"),
            )
            .collect()[0]
        )
        assert res["n_comp"] == (n - k) // 2 + 1, (res, n, k)
        assert res["biggest"] == k, (res, n, k)

        # 2b) resolution: keep-longest over the guarded pairs — the
        #     declared composite's final rung (pipeline_curation_
        #     neardup = capped pairs -> CC -> keep-best), closed-form
        #     at every size: one keeper per cluster, the template
        #     cluster keeps its min id (all 50 tokens, id tiebreak),
        #     each 25-token background pair keeps one — so total kept
        #     score is exactly 50 + 25 * (n - k) / 2. Untimed: the
        #     rung is one cluster-keyed window; what this buys is the
        #     END-TO-END playbook truth at probe scale, not a slope.
        kept = dedup_keep_best(
            df,
            guarded_pairs,
            F.size(F.split(F.col("text"), " ")).cast("long"),
            components=comp,
        )
        krow = kept.agg(
            F.sum(F.col("is_kept").cast("long")).alias("n_kept"),
            F.sum(
                F.when(F.col("is_kept"), F.col("score")).otherwise(F.lit(0))
            ).alias("kept_score"),
            F.min(
                F.when(
                    F.col("is_kept") & (F.col("cluster_id") == 0),
                    F.col("doc_id"),
                )
            ).alias("tmpl_keeper"),
        ).collect()[0]
        assert krow["n_kept"] == (n - k) // 2 + 1, (krow, n, k)
        assert krow["kept_score"] == 50 + 25 * ((n - k) // 2), (krow, n, k)
        assert krow["tmpl_keeper"] == 0, (krow, n, k)

        # 3) unguarded LSH / PPJoin: exact closed-form pair count
        #    asserted every rep, run while the previous cell stayed
        #    under budget and the predicted volume is attemptable
        def unguarded(make):
            got = make().count()
            assert got == truth_pairs, (got, truth_pairs, n, k)

        t_lsh = t_pp = None
        r_lsh = r_pp = 0
        if unguarded_alive["lsh"] and cand_pairs <= cand_hard_cap:
            t_lsh, r_lsh = timed_median(
                lambda: unguarded(
                    lambda: minhash_lsh_pairs(df, n=3, threshold=0.2)
                )
            )
            unguarded_alive["lsh"] = t_lsh < budget_s
        else:
            unguarded_alive["lsh"] = False
        if unguarded_alive["ppjoin"] and cand_pairs <= cand_hard_cap:
            t_pp, r_pp = timed_median(
                lambda: unguarded(
                    lambda: ppjoin_prefix_pairs(
                        df, n=3, threshold_num=2, threshold_den=5
                    )
                )
            )
            unguarded_alive["ppjoin"] = t_pp < budget_s
        else:
            unguarded_alive["ppjoin"] = False
        rows.append((n, k, cand_pairs, t_guard, t_lsh, t_pp))
        print(
            f"n={n} k={k} cand={cand_pairs} truth_pairs={truth_pairs}"
            f" guard_pairs={guard_counts[0]}"
            f" guarded={t_guard:.1f}s(x{r_guard})"
            f" lsh={('%.1f(x%d)' % (t_lsh, r_lsh)) if t_lsh else 'SKIP'}"
            f" ppjoin={('%.1f(x%d)' % (t_pp, r_pp)) if t_pp else 'SKIP'}",
            flush=True,
        )
        df.unpersist(blocking=True)
        spark.catalog.clearCache()

    def slope(cur, prev, ncur, nprev):
        if cur is None or prev is None:
            return "—"
        return f"{math.log10(cur / prev) / math.log10(ncur / nprev):.2f}"

    print(
        f"\n| docs | cluster k | band candidates | guarded lsh (cap={bucket_cap})"
        " | slope | unguarded lsh | slope | ppjoin | slope |"
    )
    print("|---|---|---|---|---|---|---|---|---|")
    prev = None
    for r in rows:
        n, k, cand, tg, tl, tp = r
        if prev is None:
            sg = sl = sp = "—"
        else:
            sg = slope(tg, prev[3], n, prev[0])
            sl = slope(tl, prev[4], n, prev[0])
            sp = slope(tp, prev[5], n, prev[0])
        fmt = lambda t: f"{t:.1f}s" if t is not None else "cost-model"
        print(
            f"| {n:,} | {k:,} | {cand:,} | {tg:.1f}s | {sg}"
            f" | {fmt(tl)} | {sl} | {fmt(tp)} | {sp} |"
        )
        prev = r


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--template":
        template_main(
            int(sys.argv[2]) if len(sys.argv) > 2 else 640_000,
            int(sys.argv[3]) if len(sys.argv) > 3 else 64,
        )
    else:
        main()
