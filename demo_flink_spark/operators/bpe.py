"""Distributed BPE (byte-pair-encoding) merge-rule training — the
tokenizer-induction step a training-data pipeline runs over the
corpus before anything else can count "tokens".

Algorithm (Sennrich et al., "Neural Machine Translation of Rare Words
with Subword Units"): start from characters, repeatedly merge the
most frequent adjacent symbol pair. The scale formulation trains on
the WORD-FREQUENCY table, not the corpus: pair counts weighted by
word count are identical to corpus-wide pair counts, and the vocab
table is orders of magnitude smaller than the corpus (the trick every
fast BPE trainer uses). On Spark:

- the vocab (word, cnt, symbols) is built with ONE corpus shuffle and
  then carries every iteration;
- each iteration is one explode→groupBy pair-count (map-side partials
  compress the exchange to |distinct pairs| per task), one 2-field
  `TakeOrdered` collect for the winning pair (driver traffic is one
  pair per iteration, never data), and one narrow Arrow pass applying
  the merge to the symbol arrays;
- lineage is cut through `cut_lineage` every few iterations, so the
  plan does not grow with merges and a checkpoint dir upgrades the
  cuts to executor-loss-safe.

Ties break deterministically on (count desc, left asc, right asc), so
the learned merge table is reproducible anywhere. No SQL twin — the
loop is iterative — so this is pytest-covered (python-reference
parity) rather than oracle-declared, like PCA/k-means.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.operators.checkpointing import cut_lineage

END = "</w>"  # end-of-word marker: lets merges learn word-final units


def _word_vocab(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, cnt, symbols) — one corpus pass + one shuffle."""
    from demo_flink_spark.operators.dedup import _canonical

    words = docs.select(
        F.explode(
            F.filter(F.split(_canonical(F.col(text_col)), " "), lambda x: x != "")
        ).alias("word")
    )
    vocab = words.groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    # initial symbols: characters + end-of-word marker
    return vocab.select(
        "word",
        "cnt",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END))
        ).alias("symbols"),
    )


def _apply_merge(left: str, right: str):
    merged = left + right

    def apply(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for syms in pdf["symbols"]:
                s = list(syms)
                i, res = 0, []
                while i < len(s):
                    if i + 1 < len(s) and s[i] == left and s[i + 1] == right:
                        res.append(merged)
                        i += 2
                    else:
                        res.append(s[i])
                        i += 1
                out.append(res)
            yield pd.DataFrame(
                {"word": pdf["word"], "cnt": pdf["cnt"], "symbols": out}
            )

    return apply


def bpe_train(
    docs: DataFrame,
    n_merges: int = 10,
    text_col: str = "text",
    checkpoint_every: int = 4,
) -> list[tuple[int, str, str, str]]:
    """Learn `n_merges` BPE merge rules from the corpus. Returns
    [(rank, left, right, merged)] in application order. Stops early
    when no adjacent pair repeats."""
    vocab = cut_lineage(_word_vocab(docs, text_col))
    schema = "word string, cnt long, symbols array<string>"
    merges: list[tuple[int, str, str, str]] = []
    for rank in range(n_merges):
        pairs = (
            vocab.select(
                "cnt",
                F.explode(
                    F.expr(
                        "transform(sequence(0, size(symbols) - 2), "
                        "i -> struct(symbols[i] AS l, symbols[i+1] AS r))"
                    )
                ).alias("p"),
            )
            .groupBy("p.l", "p.r")
            .agg(F.sum("cnt").alias("n"))
        )
        top = pairs.orderBy(
            F.desc("n"), F.asc("l"), F.asc("r")
        ).limit(1).collect()
        if not top or top[0]["n"] < 2:
            break
        left, right = top[0]["l"], top[0]["r"]
        merges.append((rank, left, right, left + right))
        vocab = vocab.mapInPandas(_apply_merge(left, right), schema)
        if (rank + 1) % checkpoint_every == 0:
            vocab = cut_lineage(vocab)
    return merges


def bpe_apply(
    docs: DataFrame,
    merges: list[tuple[int, str, str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Segment every document with a learned merge table:
    (doc_id, n_words, n_subwords, subword count after applying the
    merges in rank order). One narrow Arrow pass — the merge table is
    a closure constant (broadcast with the task), never a join."""
    from demo_flink_spark.operators.dedup import _canonical

    rules = [(lt, rt) for _rank, lt, rt, _m in sorted(merges)]

    def seg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, n_words, n_sub = [], [], []
            for doc_id, toks in zip(pdf["doc_id"], pdf["toks"]):
                total = 0
                for w in toks:
                    s = list(w) + [END]
                    for lt, rt in rules:
                        i, res = 0, []
                        while i < len(s):
                            if i + 1 < len(s) and s[i] == lt and s[i + 1] == rt:
                                res.append(lt + rt)
                                i += 2
                            else:
                                res.append(s[i])
                                i += 1
                        s = res
                    total += len(s)
                ids.append(doc_id)
                n_words.append(len(toks))
                n_sub.append(total)
            yield pd.DataFrame(
                {"doc_id": ids, "n_words": n_words, "n_subwords": n_sub}
            )

    toks = docs.select(
        "doc_id",
        F.filter(F.split(_canonical(F.col(text_col)), " "), lambda x: x != "").alias(
            "toks"
        ),
    )
    return toks.mapInPandas(seg, "doc_id long, n_words long, n_subwords long")
