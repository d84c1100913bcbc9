"""Synthetic-corpus scaling probe for the dedup flagship operators.

    python tools/scale_probe_synth.py [max_n]

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

Results are appended to SCALING.md by hand (the probe prints a
markdown table); pair counts are asserted so a recall regression
fails the probe rather than flattering its timing.
"""

from __future__ import annotations

import math
import os
import sys
import time


def main() -> None:
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.dedup import (
        exact_dedup,
        minhash_lsh_pairs,
        ppjoin_prefix_pairs,
    )
    from demo_flink_spark.session import get_spark

    max_n = int(sys.argv[1]) if len(sys.argv) > 1 else 640_000
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


if __name__ == "__main__":
    main()
