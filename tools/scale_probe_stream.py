"""Streaming LSH width-guard scale probe (r14): planted-truth closed
forms for `incremental_lsh_dedup`'s per-epoch candidate volume,
guarded vs unguarded, at probe scale — the streaming twin of the
batch template probe (tools/scale_probe_synth.py, SCALING.md).

Fixture: every template doc canonicalizes to the SAME text, so all
T docs per epoch land in the same band bucket in all `bands` bands,
and the threshold is set above 1.0 so NOTHING verifies — every doc
stays novel and folds into the index. That isolates exactly the
quantity the guard bounds (candidate-generation volume; verification
is downstream of it and unchanged by the guard) and makes every
epoch's sidecar numbers CLOSED FORM:

  unguarded: n_candidates(e) = T^2 * e + T(T-1)/2   (hist + intra)
  star cap : n_candidates(0) = T-1; n_candidates(e>0) = T
  drop cap : n_candidates(e) = 0
  both caps: n_over_cap = bands; docs_in_over_cap = T(e+1)

so the probe asserts EXACT equalities (no tolerance), and the
guarded/unguarded totals give the slope: unguarded total candidate
volume over B epochs is Theta(T^2 * B^2 / 2) — quadratic in the
accumulated cluster — while the star guard's is Theta(T * B).

Run:  python tools/scale_probe_stream.py [T1 T2 ...]   (default 1000 2000)
Writes one summary line per (T, policy) and a closed-form verdict.
Don't run other Spark work alongside — timings assume a quiet box.
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

N_BATCHES = 4
CAP = 8
TEMPLATE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu anchor beacon candle"
)


def run_probe(spark, T: int, policy: str | None, root: str) -> dict:
    """Drive N_BATCHES epochs of T identical-canonical template docs
    through process_dedup_batch; return per-epoch sidecar stats and
    wall times. policy None = unguarded."""
    from pyspark.sql import functions as F  # noqa: F401

    from demo_flink_spark.streaming.dedup_stream import (
        process_dedup_batch,
        seed_index,
    )

    tag = policy or "raw"
    index_dir = f"{root}/idx_{tag}_{T}"
    verdict_dir = f"{root}/v_{tag}_{T}"
    stats_dir = f"{root}/s_{tag}_{T}"
    seed_index(
        spark.createDataFrame(
            [(1, "seed history document about nothing in particular here")],
            "doc_id long, text string",
        ),
        index_dir,
    )
    kwargs = {}
    if policy is not None:
        kwargs = {"bucket_cap": CAP, "overflow": policy}
    epoch_secs = []
    for e in range(N_BATCHES):
        # distinct ids, identical canonical text (punctuation differs
        # per doc but _canonical strips it)
        base = 100 + e * T
        batch = spark.range(base, base + T).selectExpr(
            "id AS doc_id", f"'{TEMPLATE}' AS text"
        )
        t0 = time.time()
        process_dedup_batch(
            batch, e, index_dir, verdict_dir,
            threshold=1.01,  # candidate-volume isolation: nothing verifies
            stats_dir=stats_dir, **kwargs,
        )
        epoch_secs.append(time.time() - t0)
    stats = {
        r.epoch_id: r for r in spark.read.parquet(stats_dir).collect()
    }
    series = [stats[e].n_candidates for e in range(N_BATCHES)]
    return {
        "T": T,
        "policy": tag,
        "series": series,
        "total_candidates": sum(series),
        "n_over_cap_last": stats[N_BATCHES - 1].n_over_cap,
        "docs_over_last": stats[N_BATCHES - 1].docs_in_over_cap,
        "epoch_secs": [round(s, 2) for s in epoch_secs],
    }


def expect(T: int, policy: str) -> list[int]:
    if policy == "raw":
        return [T * T * e + T * (T - 1) // 2 for e in range(N_BATCHES)]
    if policy == "star":
        return [T - 1] + [T] * (N_BATCHES - 1)
    return [0] * N_BATCHES


def main() -> int:
    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    )
    from demo_flink_spark.session import get_spark

    sizes = [int(a) for a in sys.argv[1:]] or [1000, 2000]
    spark = get_spark("scale_probe_stream")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="probe_stream_")
    failures = 0
    results = []
    try:
        for T in sizes:
            for policy in (None, "star", "drop"):
                r = run_probe(spark, T, policy, root)
                want = expect(T, r["policy"])
                ok = r["series"] == want
                if r["policy"] != "raw":
                    ok = ok and r["n_over_cap_last"] == 16
                    ok = ok and r["docs_over_last"] == T * N_BATCHES
                failures += 0 if ok else 1
                results.append(r)
                print(
                    f"{'OK ' if ok else 'BAD'} T={T} {r['policy']:4s} "
                    f"series={r['series']} (want {want}) "
                    f"total={r['total_candidates']} "
                    f"epoch_secs={r['epoch_secs']}"
                )
        # slope verdict across sizes: unguarded total is quadratic in
        # T (4x per 2x), star is linear (2x per 2x)
        if len(sizes) >= 2:
            for pol in ("raw", "star"):
                tot = {r["T"]: r["total_candidates"] for r in results
                       if r["policy"] == pol}
                t1, t2 = sizes[0], sizes[-1]
                ratio = tot[t2] / max(tot[t1], 1)
                print(
                    f"SLOPE {pol}: total {tot[t1]} -> {tot[t2]} "
                    f"= {ratio:.3f}x per {t2 / t1:.0f}x docs"
                )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    print(f"probe: {'ALL CLOSED-FORM ASSERTS GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
