"""End-to-end corpus build CLI — the runnable artifact a user actually
executes, chaining the verified operators into a materialized output:

    python tools/build_corpus.py [sf_dir] [out_dir]

Stages (each the already-oracle-checked operator, see
`pipeline_curation_end2end` / `pipeline_attrition_funnel` for the
hash-verified query forms):
  1. exact dedup            (keep min-id per canonical text)
  2. near-dup dedup         (n-gram Jaccard pairs → CC → keep-list)
  3. quality floor          (≥ 20 whitespace tokens)
  4. benchmark decontamination (md5-bucket benchmark, 3-gram overlap)
  5. language rebalance     (temperature-flattened mixture)
  6. train/val/test split   (deterministic md5 thresholds)

Outputs under `out_dir`:
  corpus/          kept documents as parquet, partitioned by split
  manifest.json    per-stage attrition + per-split/lang counts +
                   content checksum (xxhash64-xor of doc ids — cheap,
                   order-independent, re-checkable)

Every stage is deterministic, so re-running the build on the same
input produces the same manifest checksum — the property that makes a
100 TB build auditable and resumable. Runtime at sf0.01: ~30 s on
local[32].
"""

from __future__ import annotations

import json
import os
import sys
import time


def build(spark, sf_dir: str, out_dir: str) -> dict:
    from pyspark.sql import functions as F

    from demo_flink_spark.operators import dedup as dd
    from demo_flink_spark.operators.pipeline import contamination_flags
    from demo_flink_spark.operators.sampling import (
        dataset_split,
        mixture_resample,
    )
    from demo_flink_spark.operators.textstats import token_stats
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, sf_dir, "documents")
    stages: list[dict] = []
    n_prev = docs.count()

    def record(stage: str, df):
        nonlocal n_prev
        n = df.count()
        stages.append(
            {
                "stage": stage,
                "n_in": n_prev,
                "n_out": n,
                "survival": round(n / n_prev, 6) if n_prev else 0.0,
            }
        )
        n_prev = n
        return df

    # 1. exact dedup
    reps = dd.exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    kept = record("exact_dedup", docs.join(reps, "doc_id", "semi"))

    # 2. near-dup dedup (inverted-index pairs -> components -> keepers)
    max_df = max(int(0.01 * n_prev), 100)
    pairs = dd.ngram_jaccard_pairs(kept, n=3, threshold=0.2, max_df=max_df)
    keeplist = dd.dedup_keep_list(kept, pairs).filter(F.col("is_kept"))
    kept = record(
        "neardup_dedup", kept.join(keeplist.select("doc_id"), "doc_id", "semi")
    )

    # 3. quality floor
    ok = token_stats(kept).filter(F.col("n_tokens") >= 20).select("doc_id")
    kept = record("quality_floor", kept.join(ok, "doc_id", "semi"))

    # 4. benchmark decontamination (the held-out eval set must not
    # appear in training text)
    bench = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    flags = contamination_flags(kept, bench, n=3, threshold=0.5)
    clean = flags.filter(~F.col("is_contaminated")).select("doc_id")
    kept = record("decontamination", kept.join(clean, "doc_id", "semi"))

    # 5. language rebalance
    kept = record(
        "mixture_rebalance",
        mixture_resample(kept, "lang", "doc_id", budget_per_group=8.0,
                         salt="cur"),
    )

    # 6. split + write
    final = kept.join(dataset_split(kept, "doc_id"), "doc_id")
    corpus_dir = os.path.join(out_dir, "corpus")
    final.repartition("split").write.mode("overwrite").partitionBy(
        "split"
    ).parquet(corpus_dir)

    written = spark.read.parquet(corpus_dir)
    by_split = {
        r["split"]: r["n"]
        for r in written.groupBy("split")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    by_lang = {
        r["lang"]: r["n"]
        for r in written.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    checksum = written.agg(
        F.expr("bit_xor(xxhash64(CAST(doc_id AS STRING)))").alias("c")
    ).collect()[0]["c"]
    manifest = {
        "input": sf_dir,
        "stages": stages,
        "n_final": sum(by_split.values()),
        "by_split": by_split,
        "by_lang": by_lang,
        "checksum": checksum,
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1, sort_keys=True)
    return manifest


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/corpus_build"
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from demo_flink_spark.session import get_spark

    spark = get_spark("build_corpus")
    spark.sparkContext.setLogLevel("ERROR")
    t0 = time.time()
    manifest = build(spark, sf_dir, out_dir)
    manifest["wall_sec"] = round(time.time() - t0, 1)
    print(json.dumps(manifest, sort_keys=True))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
