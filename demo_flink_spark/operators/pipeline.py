"""Corpus-pipeline operators: benchmark contamination and sequence
packing.

Two operations every large-scale training-data build runs after dedup
and quality filtering:

- **contamination check** — flag corpus documents that share word
  n-grams with an evaluation benchmark, so eval data can be held out
  of training. The benchmark is small by construction (thousands of
  prompts), so its distinct shingle set broadcasts and the check is a
  broadcast semi-join per posting row: one narrow pass + one
  per-doc-id aggregation, no self-join of the corpus.

- **sequence packing** — assign documents, in a deterministic order,
  to fixed token-budget bins for training-batch construction. The
  running total needs a GLOBAL prefix sum; a naive
  `Window.orderBy(...)` with no partition key collapses the whole
  table onto one task. `global_cumsum` implements the textbook
  distributed prefix sum instead: range-partition by the order key,
  local cumsum per partition, then add per-partition offsets computed
  from the (tiny, |partitions|-row) partial-sum table shipped back as
  a broadcast join. Every stage is parallel; the only serial work is
  the |partitions|-row offset scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_flink_spark.operators.dedup import shingles

from demo_flink_spark.operators.checkpointing import cut_lineage


def contamination_flags(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.2,
) -> DataFrame:
    """Per-document benchmark n-gram overlap.

    Returns (doc_id, n_shingles, n_contaminated, contamination_rate,
    is_contaminated). A document with no shingles (shorter than n
    words) has rate 0.0.

    Scale shape: the corpus side is shingled in one Arrow-batched
    narrow pass, exploded, and semi-joined against the broadcast
    benchmark shingle set — the exchange carries only (doc_id) rows
    that actually hit. No corpus self-join exists; cost is linear in
    corpus shingles. The benchmark set must fit in a broadcast
    (true for real eval suites; guard upstream if not).
    """
    sh = cut_lineage(shingles(docs, text_col, n))
    sizes = sh.select("doc_id", F.size("shingles").alias("n_shingles"))
    posting = sh.select("doc_id", F.explode("shingles").alias("shingle"))
    bench_set = (
        shingles(benchmark, text_col, n)
        .select(F.explode("shingles").alias("shingle"))
        .distinct()
    )
    hits = (
        posting.join(F.broadcast(bench_set), "shingle", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_contaminated"))
    )
    rate = F.col("n_contaminated") / F.greatest(F.col("n_shingles"), F.lit(1))
    return (
        sizes.join(hits, "doc_id", "left_outer")
        .na.fill(0, ["n_contaminated"])
        .select(
            "doc_id",
            F.col("n_shingles").cast("long").alias("n_shingles"),
            F.col("n_contaminated").cast("long").alias("n_contaminated"),
            F.round(rate, 6).alias("contamination_rate"),
            (rate >= threshold).alias("is_contaminated"),
        )
    )


def global_cumsum(
    df: DataFrame,
    order_col: str,
    value_col: str,
    out_col: str = "cum_value",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed inclusive prefix sum of `value_col` in `order_col`
    order (order key must be unique).

    Three stages, all parallel:
      1. range-partition on the order key (partitions hold disjoint,
         ordered key ranges),
      2. within-partition cumsum via a partition-local window,
      3. per-partition totals (|partitions| rows) get their own
         exclusive cumsum on a single task — trivially small — and
         join back as a broadcast to shift each partition.

    This is the scalable replacement for `Window.orderBy` with no
    partitionBy, which Spark executes on ONE task (it even warns:
    "No Partition Defined for Window operation").

    `num_partitions` pins the range-partition fan-out; leave None in
    production (AQE sizes it from the data — at test scale it may
    legitimately coalesce to one partition, which stays correct).
    """
    if num_partitions is None:
        part = df.repartitionByRange(F.col(order_col))
    else:
        part = df.repartitionByRange(num_partitions, F.col(order_col))
    # Materialize the partitioning ONCE: both consumers below (the
    # local window and the per-partition totals) read `part`, and
    # spark_partition_id() is nondeterministic — without this pin,
    # a missed exchange-reuse would let the two branches sample
    # different range boundaries and mis-stitch the offsets.
    part = cut_lineage(part.withColumn("_pid", F.spark_partition_id()))
    w_local = (
        Window.partitionBy("_pid")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = part.withColumn("_local_cum", F.sum(value_col).over(w_local))
    # |partitions|-row side: exclusive prefix over partition totals.
    w_off = (
        Window.orderBy("_pid")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = (
        part.groupBy("_pid")
        .agg(F.sum(value_col).alias("_part_total"))
        .withColumn("_offset", F.sum("_part_total").over(w_off) - F.col("_part_total"))
        .select("_pid", "_offset")
    )
    return (
        local.join(F.broadcast(offsets), "_pid")
        .withColumn(out_col, (F.col("_local_cum") + F.col("_offset")).cast("long"))
        .drop("_pid", "_local_cum", "_offset")
    )


def chunk_documents(
    docs: DataFrame,
    window: int = 256,
    overlap: int = 32,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into overlapping token-window chunks:
    (doc_id, chunk_idx, chunk_text, n_chunk_tokens), stride =
    window − overlap, last partial chunk kept.

    Context-window preparation for embedding/training: each chunk
    carries `overlap` tokens of left context. A document with no
    tokens produces no rows.

    One Arrow-batched narrow pass (mapInPandas) — chunking is
    per-document, embarrassingly parallel, no shuffle. Catalyst
    higher-order slice/explode would express the same thing but
    evaluates interpreted (10-40× slower on array-heavy kernels —
    see `shingles`); the UDF path keeps the whole stage vectorized
    Python with zero exchanges.
    """
    stride = window - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than window")

    def gen(batches):
        import re  # noqa: PLC0415 — worker-side import

        import pandas as pd  # noqa: PLC0415

        # ASCII \s to match Java/RE2 tokenization (Python's default
        # str.split() is unicode-whitespace, which oracles can't see)
        ws = re.compile(r"\s+", re.ASCII)
        for pdf in batches:
            ids, idxs, texts, counts = [], [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = [t for t in ws.split(text or "") if t]
                for ci, start in enumerate(range(0, len(toks), stride)):
                    piece = toks[start : start + window]
                    ids.append(doc_id)
                    idxs.append(ci)
                    texts.append(" ".join(piece))
                    counts.append(len(piece))
                    if start + window >= len(toks):
                        break
            yield pd.DataFrame(
                {
                    "doc_id": ids,
                    "chunk_idx": idxs,
                    "chunk_text": texts,
                    "n_chunk_tokens": counts,
                }
            )

    return docs.select("doc_id", text_col).mapInPandas(
        gen,
        "doc_id long, chunk_idx long, chunk_text string, n_chunk_tokens long",
    )


def pack_sequences(
    docs: DataFrame,
    budget: int,
    token_count: Column,
    order_col: str = "doc_id",
) -> DataFrame:
    """Contiguous fixed-budget packing: walk documents in `order_col`
    order, assign bin = exclusive_cumsum(tokens) / budget.

    Each bin holds consecutive documents and at most `budget` tokens
    before the document that crosses the boundary (which still joins
    the bin it started in, so a bin overflows by at most one document
    — the standard greedy-contiguous packing used when document order
    must be preserved). Deterministic given the order key; no driver
    loop, no single-task window (see `global_cumsum`).
    """
    toks = docs.select(order_col, token_count.cast("long").alias("n_tokens"))
    cum = global_cumsum(toks, order_col, "n_tokens", out_col="cum_tokens")
    return cum.select(
        order_col,
        "n_tokens",
        "cum_tokens",
        F.floor((F.col("cum_tokens") - F.col("n_tokens")) / budget)
        .cast("long")
        .alias("bin_id"),
    )


def span_corruption(
    docs: DataFrame,
    text_col: str = "text",
    span_len: int = 3,
    tokens_per_span: int = 20,
    salt: str = "t5",
) -> DataFrame:
    """T5-style span-corruption sample prep: mask deterministic
    3-token spans (~15% of tokens at the defaults: one span per 20
    tokens), replacing each span with a ``<Xs>`` sentinel in the input
    and emitting ``<Xs> span tokens`` as the target sequence.

    Span placement is seeded, not sampled: the document is cut into
    ``n_spans = n div tokens_per_span`` strata of width
    ``W = n div n_spans``; stratum ``s`` hides the span at offset
    ``md5(salt‖doc_id‖s) byte mod (W - span_len + 1)`` — fully
    reproducible on any engine and never overlapping (W > span_len by
    construction). Docs shorter than `tokens_per_span` pass through
    uncorrupted.

    Everything is higher-order column expressions over the token
    array — a zero-exchange narrow map (pure scan throughput at
    100 TB), like `chunk_documents` beside it.
    """
    if span_len >= tokens_per_span:
        # W can reach tokens_per_span exactly, so span_len >= that
        # bound makes the offset modulus (W - span_len + 1) zero or
        # negative → NULL offsets → spans that silently never match.
        # Fail loudly instead (mirrors sequence_pattern_matches' k<2
        # guard).
        raise ValueError(
            f"span_len ({span_len}) must be < tokens_per_span "
            f"({tokens_per_span}): each width-W stratum (W <= "
            "tokens_per_span) must fit a full span"
        )
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != "",
    )  # NULL text = empty doc
    n = F.size(toks)
    ns = F.floor(n / tokens_per_span).cast("int")
    w = F.when(ns > 0, F.floor(n / ns).cast("int")).otherwise(F.lit(0))

    def offset(s: Column) -> Column:
        h8 = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        s.cast("string"),
                    )
                ),
                1,
                2,
            ),
            16,
            10,
        ).cast("int")
        return h8 % (w - (span_len - 1))

    def piece(tok: Column, i: Column) -> Column:
        s = F.floor(i / w).cast("int")
        within = i - s * w
        o = offset(s)
        return (
            F.when(
                (ns > 0) & (s < ns) & (within == o),
                F.concat(F.lit("<X"), s.cast("string"), F.lit(">")),
            )
            .when(
                (ns > 0) & (s < ns) & (within > o) & (within < o + span_len),
                F.lit(""),
            )
            .otherwise(tok)
        )

    idx = F.when(n > 0, F.sequence(F.lit(0), n - 1)).otherwise(
        F.array().cast("array<int>")
    )
    input_txt = F.array_join(
        F.filter(F.zip_with(toks, idx, piece), lambda x: x != ""), " "
    )

    def target_of(s: Column) -> Column:
        start = s * w + offset(s)  # 0-based span start
        span = F.transform(
            F.sequence(F.lit(1), F.lit(span_len)),
            lambda d: F.element_at(toks, start + d),
        )
        return F.concat(
            F.lit("<X"),
            s.cast("string"),
            F.lit("> "),
            F.array_join(span, " "),
        )

    targets_txt = F.when(
        ns > 0,
        F.array_join(
            F.transform(F.sequence(F.lit(0), ns - 1), target_of), " "
        ),
    ).otherwise(F.lit(""))

    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        ns.cast("long").alias("n_spans"),
        F.when(n > 0, (F.lit(span_len) * ns).cast("double") / n)
        .otherwise(F.lit(0.0))
        .alias("frac_masked"),
        input_txt.alias("input_txt"),
        targets_txt.alias("targets_txt"),
    )


def fim_transform(
    docs: DataFrame, text_col: str = "text", salt: str = "fim"
) -> DataFrame:
    """FIM (fill-in-the-middle, Bavarian et al. 2022) sample prep:
    split each document's token sequence at two seeded cut points and
    emit the PSM permutation `<PRE> prefix <SUF> suffix <MID> middle`
    — training on this teaches a causal LM to infill, the standard
    code/text-completion objective.

    Cut points: c = md5(salt‖doc_id‖tag) 16-bit value mod (n+1) for
    tags 'a'/'b', sorted — both cuts uniform over [0, n] and fully
    reproducible on any engine (exact integer arithmetic; the DuckDB
    twin decodes the same two md5 bytes). Degenerate splits (empty
    prefix/middle/suffix) are legitimate FIM samples and pass through.

    Zero-exchange narrow map, like `span_corruption` beside it —
    pure scan throughput at 100 TB.

    Returns (doc_id, n_tokens, pre_len, mid_len, suf_len, psm_md5):
    the md5 of the PSM string pins the whole permutation for the
    oracle without shipping megabyte rows through the compare.
    """
    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), " "),
        lambda w: w != "",
    )
    n = F.size(toks)

    def cut(tag: str) -> Column:
        h16 = F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.lit(salt),
                        F.col("doc_id").cast("string"),
                        F.lit("_"),
                        F.lit(tag),
                    )
                ),
                1,
                4,
            ),
            16,
            10,
        ).cast("long")
        return h16 % (n + 1)

    c1, c2 = cut("a"), cut("b")
    p, s = F.least(c1, c2), F.greatest(c1, c2)

    def piece(start: Column, length: Column) -> Column:
        # slice() with runtime-zero length is fine, but a start past
        # the array end is not guaranteed across engines — guard to a
        # literal empty array instead
        return F.when(length > 0, F.slice(toks, start, length)).otherwise(
            F.array().cast("array<string>")
        )

    pre = piece(F.lit(1), p)
    mid = piece(p + 1, s - p)
    suf = piece(s + 1, n - s)
    psm = F.concat(
        F.lit("<PRE> "),
        F.array_join(pre, " "),
        F.lit(" <SUF> "),
        F.array_join(suf, " "),
        F.lit(" <MID> "),
        F.array_join(mid, " "),
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        p.cast("long").alias("pre_len"),
        (s - p).cast("long").alias("mid_len"),
        (n - s).cast("long").alias("suf_len"),
        F.md5(psm).alias("psm_md5"),
    )


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Snapshot-over-snapshot corpus diff — the bookkeeping an
    incremental crawl re-run starts from: per document id,
    status ∈ {added, removed, changed, unchanged}.

    Both sides are projected to (id, md5(content)) BEFORE the full
    outer join, so the exchange carries 16-byte digests, never
    document bodies (at 100 TB the bodies stay columnar in their
    scans). Content equality by hash is the same trade `exact_dedup`
    documents; the md5 digest is also what makes the op
    oracle-checkable cross-engine.

    Downstream: `changed ∪ added` is the reprocessing frontier (feeds
    the incremental-bloom / streaming-LSH dedup path); `removed`
    drives retraction from derived stores.
    """
    o = old.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_old_h")
    )
    n = new.select(
        F.col(id_col), F.md5(F.col(text_col)).alias("_new_h")
    )
    return o.join(n, id_col, "full_outer").select(
        id_col,
        F.when(F.col("_old_h").isNull(), F.lit("added"))
        .when(F.col("_new_h").isNull(), F.lit("removed"))
        .when(F.col("_old_h") == F.col("_new_h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status"),
    )
