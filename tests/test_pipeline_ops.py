"""Semantics tests for operators/pipeline.py (contamination check,
distributed prefix sum, sequence packing)."""

from __future__ import annotations

from pyspark.sql import functions as F

from demo_flink_spark.operators import pipeline as pl
from tests.conftest import SF_DIR


def test_global_cumsum_matches_single_task_window(spark):
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 7 + 1).alias("v")
    )
    got = {
        r.k: r.cum
        for r in pl.global_cumsum(df, "k", "v", out_col="cum").collect()
    }
    # naive single-task reference
    rows = sorted((r.k, r.v) for r in df.collect())
    acc = 0
    for k, v in rows:
        acc += v
        assert got[k] == acc


def test_global_cumsum_correct_across_forced_partitions(spark):
    # pin 8 range partitions (AQE coalesces tiny data to 1 otherwise)
    # and confirm the offset arithmetic stitches them correctly
    df = spark.range(0, 1000).select(
        F.col("id").alias("k"), (F.col("id") % 5 + 1).alias("v")
    )
    out = pl.global_cumsum(df, "k", "v", out_col="cum", num_partitions=8)
    got = {r.k: r.cum for r in out.collect()}
    acc = 0
    for k in range(1000):
        acc += k % 5 + 1
        assert got[k] == acc


def test_pack_sequences_bins_are_contiguous_and_budgeted(spark):
    from demo_flink_spark.operators.textstats import _tokens
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    budget = 512
    out = pl.pack_sequences(
        docs, budget=budget, token_count=F.size(_tokens(F.col("text")))
    ).collect()
    out.sort(key=lambda r: r.doc_id)
    # bin ids are non-decreasing in doc order (contiguous packing)
    bins = [r.bin_id for r in out]
    assert bins == sorted(bins)
    # every bin except possibly via its last (straddling) doc fits the
    # budget: tokens before the last doc of the bin are < budget
    per_bin: dict[int, list] = {}
    for r in out:
        per_bin.setdefault(r.bin_id, []).append(r)
    for rows in per_bin.values():
        head = sum(r.n_tokens for r in rows[:-1])
        assert head < budget


def test_contamination_benchmark_members_fully_flagged(spark):
    from demo_flink_spark.sources import load_table

    docs = load_table(spark, SF_DIR, "documents")
    bench = docs.filter(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1) == "0"
    )
    bench_ids = {r.doc_id for r in bench.select("doc_id").collect()}
    assert bench_ids  # split must be non-trivial
    out = pl.contamination_flags(docs, bench, n=3, threshold=0.2).collect()
    by_id = {r.doc_id: r for r in out}
    for bid in bench_ids:
        r = by_id[bid]
        # a benchmark member's shingles are all in the benchmark set
        assert r.n_contaminated == r.n_shingles
        assert r.is_contaminated or r.n_shingles == 0
    # and the corpus is not all flagged (the check discriminates)
    assert sum(1 for r in out if not r.is_contaminated) > 0


def test_chunk_documents_overlap_and_coverage(spark):
    docs = spark.createDataFrame(
        [(1, " ".join(f"t{i}" for i in range(10))), (2, "a b"), (3, "")],
        "doc_id long, text string",
    )
    rows = pl.chunk_documents(docs, window=4, overlap=1).collect()
    by_doc: dict[int, list] = {}
    for r in sorted(rows, key=lambda r: (r.doc_id, r.chunk_idx)):
        by_doc.setdefault(r.doc_id, []).append(r)
    # doc 1: 10 tokens, window 4, stride 3 -> ceil(6/3)+1 = 3 chunks
    c1 = by_doc[1]
    assert [r.chunk_text for r in c1] == [
        "t0 t1 t2 t3",
        "t3 t4 t5 t6",
        "t6 t7 t8 t9",
    ]
    # consecutive chunks share exactly `overlap` tokens
    assert c1[0].chunk_text.split()[-1] == c1[1].chunk_text.split()[0]
    # short doc -> one partial chunk; empty doc -> no rows
    assert [r.chunk_text for r in by_doc[2]] == ["a b"]
    assert 3 not in by_doc


def test_span_corruption_structure(spark):
    import hashlib

    from demo_flink_spark.operators.pipeline import span_corruption

    # 40 tokens -> 2 spans of 3 in strata of width 20
    toks = [f"w{i}" for i in range(40)]
    df = spark.createDataFrame(
        [(7, " ".join(toks))], "doc_id long, text string"
    )
    r = span_corruption(df).collect()[0]
    assert r["n_tokens"] == 40 and r["n_spans"] == 2
    assert r["frac_masked"] == 6 / 40
    # reproduce the seeded offsets: first md5 byte of 't5<doc>_<s>'
    offs = [
        int(hashlib.md5(f"t57_{s}".encode()).hexdigest()[:2], 16) % 18
        for s in range(2)
    ]
    starts = [0 * 20 + offs[0], 1 * 20 + offs[1]]
    expect_inp = []
    for i, t in enumerate(toks):
        if i in starts:
            expect_inp.append(f"<X{starts.index(i)}>")
        elif any(st < i < st + 3 for st in starts):
            continue
        else:
            expect_inp.append(t)
    assert r["input_txt"] == " ".join(expect_inp)
    want_tgt = " ".join(
        f"<X{s}> " + " ".join(toks[starts[s] : starts[s] + 3])
        for s in range(2)
    )
    assert r["targets_txt"] == want_tgt
    # round trip: sentinels in input match targets, masked tokens gone
    assert "<X0>" in r["input_txt"] and "<X1>" in r["input_txt"]
    for s in range(2):
        for tok in toks[starts[s] + 1 : starts[s] + 3]:
            assert tok not in r["input_txt"].split(" ")


def test_span_corruption_short_doc_passthrough(spark):
    from demo_flink_spark.operators.pipeline import span_corruption

    df = spark.createDataFrame(
        [(1, "only five words right here"), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in span_corruption(df).collect()}
    assert out[1]["n_spans"] == 0
    assert out[1]["input_txt"] == "only five words right here"
    assert out[1]["targets_txt"] == ""
    assert out[2]["n_tokens"] == 0 and out[2]["input_txt"] == ""
    assert out[2]["frac_masked"] == 0.0


def test_span_corruption_token_conservation(spark):
    # every original token appears in input or in exactly one target
    from demo_flink_spark.operators.pipeline import span_corruption

    toks = [f"tok{i}" for i in range(47)]
    df = spark.createDataFrame([(3, " ".join(toks))], "doc_id long, text string")
    r = span_corruption(df).collect()[0]
    inp = [w for w in r["input_txt"].split(" ") if not w.startswith("<X")]
    tgt = [w for w in r["targets_txt"].split(" ") if not w.startswith("<X")]
    assert sorted(inp + tgt) == sorted(toks)
    assert len(tgt) == 3 * r["n_spans"]


def test_span_corruption_rejects_span_wider_than_stratum(spark):
    """span_len >= tokens_per_span would make the offset modulus zero
    or negative (NULL offsets, silently unmatched spans) — must raise
    at call time instead."""
    import pytest

    from demo_flink_spark.operators.pipeline import span_corruption

    df = spark.createDataFrame([(1, "a b c d e")], "doc_id long, text string")
    with pytest.raises(ValueError, match="span_len"):
        span_corruption(df, span_len=20, tokens_per_span=20)
    with pytest.raises(ValueError, match="span_len"):
        span_corruption(df, span_len=25, tokens_per_span=20)


def test_fim_transform_piece_lengths_partition_doc(spark):
    """pre+mid+suf == n for every doc, and the split is reproducible."""
    from demo_flink_spark.operators.pipeline import fim_transform

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{j}" for j in range(i % 7))) for i in range(30)],
        "doc_id long, text string",
    )
    rows = fim_transform(docs).collect()
    assert len(rows) == 30
    for r in rows:
        assert r["pre_len"] + r["mid_len"] + r["suf_len"] == r["n_tokens"]
        assert r["pre_len"] >= 0 and r["mid_len"] >= 0 and r["suf_len"] >= 0
        assert r["psm_md5"] is not None
    again = {r["doc_id"]: r["psm_md5"] for r in fim_transform(docs).collect()}
    assert again == {r["doc_id"]: r["psm_md5"] for r in rows}
