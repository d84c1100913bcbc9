"""Receipts for the round-15 optimization changes.

Each test pins an exactness claim the optimization relies on:
the batched-MD5 kernel is byte-identical to hashlib, the vectorized
MinHash kernel (factorize + md5 batch + segment-min + batched band
fold) reproduces the r14 loop kernel bit-for-bit through Spark, the
Mersenne-fold `_modp_affine` equals integer math on boundary values,
and `widen_if_narrow` only repartitions when the plan is narrower
than the session's parallelism.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pytest

SF_DIR = "/root/testdata/sf0.001"


def test_md5_u64_batch_matches_hashlib_across_block_boundaries():
    from demo_flink_spark.operators.fasthash import md5_u64_batch

    random.seed(1)
    msgs = [
        bytes(random.randrange(256) for _ in range(n))
        # 55/56 and 119/120 straddle the 1->2 and 2->3 padded-block
        # boundaries; 0 and 1000 pin the degenerate and long tails
        for n in (0, 1, 3, 54, 55, 56, 63, 64, 65, 118, 119, 120, 121, 1000)
    ]
    msgs += [
        bytes(random.randrange(256) for _ in range(random.randrange(0, 200)))
        for _ in range(2000)
    ]
    ref = np.array(
        [int.from_bytes(hashlib.md5(m).digest()[:8], "little") for m in msgs],
        dtype=np.uint64,
    )
    got = md5_u64_batch(msgs)
    assert (ref == got).all()
    assert md5_u64_batch([]).shape == (0,)


def test_modp_affine_fold_boundary_values():
    """The r15 Mersenne-fold rewrite must equal integer (a*x+b) % p on
    the fold boundaries (0, 1, p-1, p, 2^61-1) and random draws — the
    existing hypothesis test covers the bulk, this pins the edges."""
    from demo_flink_spark.operators.dedup import (
        MINHASH_P,
        _modp_affine,
        minhash_params,
    )

    a_list, b_list = minhash_params(64)
    a = np.array(a_list, dtype=np.uint64)
    b = np.array(b_list, dtype=np.uint64)
    rng = np.random.RandomState(7)
    xs = rng.randint(0, 1 << 61, size=512, dtype=np.uint64)
    xs[:5] = [0, 1, MINHASH_P - 1, MINHASH_P, (1 << 61) - 1]
    got = _modp_affine(xs[:, None], a[None, :], b[None, :])
    for i in list(range(5)) + [17, 100, 511]:
        for h in range(0, 64, 11):
            ref = (int(a[h]) * int(xs[i]) + int(b[h])) % MINHASH_P
            assert int(got[i, h]) == ref


def _loop_kernel_signatures(spark, shingles_df):
    """The r14 loop kernel (per-occurrence dict memo, hashlib.md5 per
    distinct shingle, per-doc min, per-(doc, band) hashlib fold),
    reproduced verbatim as the twin oracle for the vectorized kernel."""
    from demo_flink_spark.operators.dedup import (
        MINHASH_P,
        _modp_affine,
        minhash_params,
    )

    n_hashes, bands = 64, 16
    a_list, b_list = minhash_params(n_hashes)

    def sign(batches):
        import hashlib

        import numpy as np
        import pandas as pd

        p = np.uint64(MINHASH_P)
        a = np.array(a_list, dtype=np.uint64)
        b = np.array(b_list, dtype=np.uint64)
        empty_sig = (b % p).astype(np.int64)
        rows = n_hashes // bands
        for pdf in batches:
            memo: dict = {}

            def shingle_idx(s):
                i = memo.get(s)
                if i is None:
                    i = len(memo)
                    memo[s] = i
                return i

            lists = list(pdf["shingles"])
            idx_lists = [
                None
                if sl is None or len(sl) == 0
                else np.array([shingle_idx(s) for s in sl], dtype=np.int64)
                for sl in lists
            ]
            doc_sigs: list = [None] * len(lists)
            if memo:
                hs = np.array(
                    [
                        int.from_bytes(
                            hashlib.md5(s.encode()).digest()[:8], "little"
                        )
                        % MINHASH_P
                        for s in memo
                    ],
                    dtype=np.uint64,
                )
                aff = _modp_affine(
                    hs[:, None], a[None, :], b[None, :]
                ).astype(np.int64)
                for i, idxs in enumerate(idx_lists):
                    if idxs is not None:
                        doc_sigs[i] = aff[idxs].min(axis=0)
            sigs, band_col = [], []
            for i in range(len(lists)):
                sig = doc_sigs[i] if doc_sigs[i] is not None else empty_sig
                sigs.append(sig.tolist())
                chunk = sig.reshape(bands, rows)
                band_col.append(
                    [
                        int.from_bytes(
                            hashlib.md5(
                                (
                                    f"{j}:"
                                    + ",".join(
                                        str(int(v)) for v in chunk[j]
                                    )
                                ).encode()
                            ).digest()[:8],
                            "little",
                        )
                        % (1 << 63)
                        for j in range(bands)
                    ]
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "signature": sigs,
                    "shingles": pdf["shingles"],
                    "bands": band_col,
                }
            )

    return shingles_df.mapInPandas(
        sign,
        "doc_id long, signature array<long>, shingles array<string>,"
        " bands array<long>",
    )


def test_minhash_vectorized_kernel_twin_oracle(spark):
    """Byte-identical signatures AND band folds between the r14 loop
    kernel and the r15 vectorized kernel on the real corpus, through
    Spark, including empty-shingle docs (doc A below) and the widened
    (multi-partition) input the memo now produces."""
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.dedup import minhash_signatures, shingles
    from demo_flink_spark.operators.hints import widen_if_narrow
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    extra = spark.createDataFrame(
        [(100001, ""), (100002, "7 !!"), (100003, "one two three four")],
        "doc_id long, text string",
    )
    docs = docs.unionByName(extra)
    sh = shingles(widen_if_narrow(docs), n=3).persist()
    try:
        old = _loop_kernel_signatures(spark, sh)
        new = minhash_signatures(docs, n=3, n_hashes=64, bands=16, shingles_df=sh)
        cols = [
            "doc_id",
            F.col("signature").cast("string").alias("sig"),
            F.col("bands").cast("string").alias("bnd"),
        ]
        o, n = old.select(*cols), new.select(*cols)
        assert o.exceptAll(n).count() == 0
        assert n.exceptAll(o).count() == 0
        assert n.count() == docs.count()
    finally:
        sh.unpersist()


def test_mad_outliers_single_execution_shape_and_value_twin(spark):
    """ADVICE r14: dropping Window from the audit's required
    final-plan nodes for anomaly_mad_hampel/anomaly_stl_residual
    removed its ability to see the windowed median at all. This
    receipt pins BOTH halves: (a) the final plan keeps the r14
    single-execution shape — the rank windows live behind lineage
    cuts, so Window/Sort must NOT reappear inline (a regression that
    re-executes the sort per broadcast consumer would resurface
    them); (b) the output equals an inline no-cut twin whose plan
    visibly contains the two rank windows — so the cut can never
    silently degrade the median computation itself."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.timeseries import mad_outliers
    from demo_flink_spark.sources import load_table

    ev = load_table(spark, SF_DIR, "events").select(
        "event_type", "value", "event_id"
    )
    out = mad_outliers(ev, "event_type", "value", "event_id", k=3.0)
    plan = out._sc._jvm.PythonSQLUtils.explainString(
        out._jdf.queryExecution(), "formatted"
    )
    assert "Window" not in plan and "Sort (" not in plan

    # inline twin: same median-by-rank algebra, no lineage cuts
    w = Window.partitionBy("key").orderBy("v", "tb")
    wn = Window.partitionBy("key")
    base = ev.select(
        F.col("event_type").alias("key"),
        F.col("value").alias("v"),
        F.col("event_id").alias("tb"),
    )
    ranked = base.select(
        "key",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    med = ranked.filter(F.expr("rn = (n + 1) div 2")).select(
        "key", F.col("v").alias("med"), "n"
    )
    dev = base.join(med.select("key", "med"), "key").select(
        "key", "v", "tb", F.abs(F.col("v") - F.col("med")).alias("absdev")
    )
    w2 = Window.partitionBy("key").orderBy("absdev", "tb")
    dev_ranked = dev.select(
        "key",
        "absdev",
        F.row_number().over(w2).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    mad = dev_ranked.filter(F.expr("rn = (n + 1) div 2")).select(
        "key", F.col("absdev").alias("mad")
    )
    stats = med.join(mad, "key")
    twin = (
        dev.join(stats.select("key", "mad"), "key")
        .groupBy("key")
        .agg(
            F.sum(
                F.when(F.col("absdev") > F.lit(3.0) * F.col("mad"), 1)
                .otherwise(0)
            )
            .cast("long")
            .alias("n_outliers")
        )
        .join(stats, "key")
        .select(
            F.col("key").alias("event_type"),
            F.col("n").cast("long").alias("n"),
            "med",
            "mad",
            "n_outliers",
        )
    )
    twin_plan = twin._sc._jvm.PythonSQLUtils.explainString(
        twin._jdf.queryExecution(), "formatted"
    )
    assert "Window" in twin_plan  # the twin's windows are visible
    assert out.exceptAll(twin).count() == 0
    assert twin.exceptAll(out).count() == 0


def test_widen_if_narrow_contract(spark):
    from demo_flink_spark.operators.hints import widen_if_narrow

    narrow = spark.range(1000).coalesce(1)
    wide = widen_if_narrow(narrow)
    assert (
        wide.rdd.getNumPartitions()
        == spark.sparkContext.defaultParallelism
    )
    # already at/above target: returned UNCHANGED (no added exchange)
    at_target = spark.range(1000).repartition(
        spark.sparkContext.defaultParallelism
    )
    assert widen_if_narrow(at_target) is at_target
    # explicit target below current width: unchanged too
    assert widen_if_narrow(at_target, target=2) is at_target
    # row preservation under the round-robin repartition
    assert wide.count() == 1000
