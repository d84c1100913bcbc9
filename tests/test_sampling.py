"""Tests for deterministic sampling / split assignment."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.operators.sampling import dataset_split, hash_sample


def test_split_deterministic_and_complete(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs).collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs.repartition(7)).collect()}
    assert a == b  # partitioning-independent
    assert len(a) == docs.count()  # every doc assigned exactly once
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    frac_val = sum(1 for s in a.values() if s == "val") / n
    assert 0.7 < frac_train < 0.9
    assert 0.04 < frac_val < 0.17


def test_split_salt_rerolls(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in dataset_split(docs, salt="v1").collect()}
    b = {r["doc_id"]: r["split"] for r in dataset_split(docs, salt="v2").collect()}
    assert a != b


def test_hash_sample_is_subset_and_stable(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    s1 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.2).collect()}
    bigger = {r["doc_id"] for r in hash_sample(docs, "doc_id", 0.5).collect()}
    assert s1 == s2
    assert s1 <= bigger  # threshold growth only adds rows
    assert 0.1 < len(s1) / docs.count() < 0.35


def test_stratified_sample_fractions_and_determinism(spark):
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.sampling import stratified_sample

    df = spark.range(0, 4000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 2 == 0, "en").otherwise("zh").alias("lang"),
    )
    kept = stratified_sample(
        df, "lang", "doc_id", {"en": 0.25, "zh": 0.75}, salt="t"
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    assert abs(counts["en"] / 2000 - 0.25) < 0.05
    assert abs(counts["zh"] / 2000 - 0.75) < 0.05
    again = stratified_sample(df, "lang", "doc_id", {"en": 0.25, "zh": 0.75}, salt="t")
    assert sorted(r["doc_id"] for r in kept.collect()) == sorted(
        r["doc_id"] for r in again.collect()
    )


def test_full_fraction_keeps_everything(spark):
    # regression: cut == 256 formatted as 3-char "100" sorted below
    # almost every 2-char hex bucket, silently emptying the sample
    from demo_flink_spark.operators.sampling import dataset_split, hash_sample

    df = spark.range(0, 500).select(F.col("id").alias("doc_id"))
    assert hash_sample(df, "doc_id", 1.0).count() == 500
    splits = (
        dataset_split(df, "doc_id", train_frac=0.9, val_frac=0.1)
        .groupBy("split")
        .count()
        .collect()
    )
    by = {r.split: r["count"] for r in splits}
    # nothing may leak into test when train+val == 1.0
    assert by.get("test", 0) == 0
    assert by.get("train", 0) + by.get("val", 0) == 500
    assert by.get("val", 0) > 0


def test_weighted_sample_odd_identifiers(spark):
    # weighted_sample is Column-composed: odd column names must work
    from demo_flink_spark.operators.sampling import weighted_sample

    df = spark.range(0, 300).select(
        F.col("id").alias("user id"), (F.col("id") % 2 == 0).alias("keep_all")
    )
    w = F.when(F.col("keep_all"), 1.0).otherwise(0.0)
    kept = weighted_sample(df, "user id", w, salt="s'1").collect()
    assert len(kept) == 150
    assert all(r["user id"] % 2 == 0 for r in kept)


def test_mixture_resample_flattens_overrepresented(spark):
    from demo_flink_spark.operators.sampling import mixture_resample

    rows = [(i, "big" if i < 800 else "small") for i in range(900)]
    df = spark.createDataFrame(rows, "id long, src string")
    out = mixture_resample(df, "src", "id", budget_per_group=10.0)
    counts = {r.src: r.cnt for r in out.groupBy("src").count()
              .withColumnRenamed("count", "cnt").collect()}
    # small group (n=100, rate=1.0) kept whole; big group (n=800,
    # rate 10/sqrt(800)=0.354) cut to roughly a third
    assert counts["small"] == 100
    assert 200 < counts["big"] < 400
    # deterministic: same call, same rows
    again = mixture_resample(df, "src", "id", budget_per_group=10.0)
    assert sorted(r.id for r in out.collect()) == sorted(r.id for r in again.collect())


def test_mixture_resample_general_temperature_path(spark):
    from demo_flink_spark.operators.sampling import mixture_resample

    rows = [(i, "big" if i < 900 else "small") for i in range(1000)]
    df = spark.createDataFrame(rows, "id long, src string")
    # tau=1.0 -> keep rate = budget/n: big 50/900, small 50/100
    out = mixture_resample(df, "src", "id", budget_per_group=50.0,
                           temperature=1.0)
    counts = {r.src: r.cnt for r in out.groupBy("src").count()
              .withColumnRenamed("count", "cnt").collect()}
    assert 20 < counts.get("big", 0) < 90      # ~50 expected
    assert 30 < counts.get("small", 0) < 70    # ~50 expected


def test_token_budget_cut_hard_ceiling(spark):
    from demo_flink_spark.operators.sampling import token_budget_cut

    # ten 5-token docs per group; en budget 23 -> exactly 4 kept
    # (4*5=20 <= 23, 5th would hit 25)
    rows = []
    for i in range(10):
        rows.append((i, "a b c d e", "en"))
        rows.append((100 + i, "a b c d e", "fr"))
        rows.append((200 + i, "a b c d e", "zz"))
    df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = token_budget_cut(df, {"en": 23, "zz": 0}).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append(r)
    en_kept = [r for r in by_grp["en"] if r["kept"]]
    assert len(en_kept) == 4
    assert max(r["cum_tokens"] for r in en_kept) == 20
    # undeclared group keeps everything; zero budget keeps nothing
    assert all(r["kept"] for r in by_grp["fr"])
    assert not any(r["kept"] for r in by_grp["zz"])
    # deterministic: same cut on a second run
    again = {
        r["doc_id"]: r["kept"]
        for r in token_budget_cut(df, {"en": 23, "zz": 0}).collect()
    }
    assert again == {r["doc_id"]: r["kept"] for r in out}


def test_exact_k_per_group_counts_and_determinism(spark):
    from demo_flink_spark.operators.sampling import exact_k_per_group

    df = spark.createDataFrame(
        [(i, "big" if i < 40 else "small") for i in range(45)],
        "doc_id long, lang string",
    )
    out = exact_k_per_group(df, k=10, group_col="lang").collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r["grp"], []).append((r["rn"], r["doc_id"]))
    # exactly k from the big group, the whole small group (5 < k)
    assert len(by_grp["big"]) == 10
    assert len(by_grp["small"]) == 5
    assert sorted(rn for rn, _ in by_grp["big"]) == list(range(1, 11))
    # deterministic: same corpus -> same selection
    again = {
        (r["grp"], r["rn"], r["doc_id"])
        for r in exact_k_per_group(df, k=10, group_col="lang").collect()
    }
    assert again == {(g, rn, d) for g, xs in by_grp.items() for rn, d in xs}
