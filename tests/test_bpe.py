"""Distributed BPE merge-rule training (operators/bpe.py): parity with
a python reference implementation of the same vocab-table algorithm,
deterministic tie-breaks, and the apply-side compression property."""

from __future__ import annotations

import re
from collections import Counter

from demo_flink_spark.operators.bpe import END, bpe_apply, bpe_train

CORPUS = [
    (1, "low low low low low"),
    (2, "lower lower newest newest"),
    (3, "newest newest newest newest"),
    (4, "widest widest widest"),
    (5, "low lower newest"),
]


def _py_bpe(texts: list[str], n_merges: int) -> list[tuple[str, str]]:
    words: Counter = Counter()
    for t in texts:
        canon = re.sub(r"\s+", " ", re.sub(r"[^a-z\s]", "", t.lower())).strip()
        words.update(w for w in canon.split(" ") if w)
    vocab = {w: (c, list(w) + [END]) for w, (c) in words.items()}
    out = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for _w, (c, syms) in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        # same tie-break as the operator: count desc, left asc, right asc
        (lt, rt), n = min(
            pairs.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if n < 2:
            break
        out.append((lt, rt))
        for w, (c, syms) in vocab.items():
            i, res = 0, []
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == lt and syms[i + 1] == rt:
                    res.append(lt + rt)
                    i += 2
                else:
                    res.append(syms[i])
                    i += 1
            vocab[w] = (c, res)
    return out


def test_matches_python_reference(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    got = bpe_train(docs, n_merges=8)
    want = _py_bpe([t for _i, t in CORPUS], 8)
    assert [(lt, rt) for _r, lt, rt, _m in got] == want
    # ranks are 0..k-1 in order and merged = left+right
    assert [r for r, *_ in got] == list(range(len(got)))
    assert all(m == lt + rt for _r, lt, rt, m in got)


def test_deterministic_across_partitionings(spark):
    d1 = spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(1)
    d32 = spark.createDataFrame(CORPUS, "doc_id long, text string").repartition(32)
    assert bpe_train(d1, n_merges=6) == bpe_train(d32, n_merges=6)


def test_apply_compresses_monotonically(spark):
    docs = spark.createDataFrame(CORPUS, "doc_id long, text string")
    merges = bpe_train(docs, n_merges=8)
    none = {r.doc_id: r.n_subwords for r in bpe_apply(docs, []).collect()}
    full = {r.doc_id: r.n_subwords for r in bpe_apply(docs, merges).collect()}
    # with zero merges every word is chars+END; with the learned table
    # frequent words compress — never expand
    for i, text in CORPUS:
        toks = text.split()
        assert none[i] == sum(len(w) + 1 for w in toks)
        assert full[i] <= none[i]
    # the most repetitive doc compresses strictly
    assert full[1] < none[1]
