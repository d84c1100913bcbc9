"""Text analysis for training-data pipelines, over `documents`.

Extensions mandated by the north star (BASELINE.json): token counting,
quality scoring, language ID, document fingerprinting, TF-IDF — the
WordCount lineage (`AdvancedWordCount.java:30-42`) generalized into the
operators a 100 TB text-corpus pipeline actually runs.

Everything except language-ID scoring is built-in column expressions
(codegen'd, shuffle-free per-document narrow maps); the only shuffles
are the TF-IDF document-frequency aggregation and its top-k window.
Language ID uses a single vectorized pandas UDF (Arrow-batched) because
the profile-scoring loop isn't expressible as a column expression.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import StringType
from pyspark.sql.window import Window

from demo_flink_spark.operators.wordcount import STOPWORDS, normalize_text

from demo_flink_spark.operators.checkpointing import cut_lineage

_TOKEN_SPLIT = r"\s+"


def _tokens(col):
    """Non-empty whitespace tokens as an array column."""
    return F.filter(F.split(col, _TOKEN_SPLIT), lambda w: F.length(w) > 0)


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token and char counts (whitespace tokenizer)."""
    return docs.select(
        "doc_id",
        F.size(_tokens(F.col("text"))).cast("long").alias("n_tokens"),
        F.length("text").cast("long").alias("n_chars_measured"),
    )


# BPE-ish pre-tokenization: letter runs, digit runs, single
# non-alnum marks — the GPT-2-style split shape reduced to a subset
# whose semantics are identical in Java regex and DuckDB's RE2, so the
# count is oracle-checkable. A real tokenizer's token count correlates
# ~1:1.3 with this at the corpus level; for budget/billing estimates
# that's the quantity pipelines actually need.
BPE_SPLIT_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_count_bpe(docs: DataFrame) -> DataFrame:
    """Per-document BPE-ish token estimate (JVM regexp_count, no UDF),
    alongside the whitespace count for calibration."""
    return docs.select(
        "doc_id",
        F.regexp_count(F.col("text"), F.lit(BPE_SPLIT_PATTERN))
        .cast("long")
        .alias("n_bpe_tokens"),
        F.size(_tokens(F.col("text"))).cast("long").alias("n_ws_tokens"),
    )


def repetition_signals(docs: DataFrame, n: int = 5) -> DataFrame:
    """Gopher-style repetition quality signals, per document.

    - ``top_bigram_frac``: occurrences of the most frequent word bigram
      over all bigram occurrences — high values flag boilerplate/spam.
    - ``dup_ngram_frac``: fraction of word n-gram occurrences that are
      repeats of an earlier n-gram in the same doc (n=5 default).

    Pure array expressions per row — no UDF, no shuffle, scales as a
    narrow map over the corpus. The inner bigram count is O(d·b) per
    doc (d = distinct bigrams), fine for document-sized rows; for
    book-length rows switch to the explode+groupBy form.
    """
    def grams(width: int):
        # sequence(a, b) counts DOWN when a > b, so guard short docs.
        return F.when(
            F.size(F.col("toks")) >= width,
            F.expr(
                f"transform(sequence(0, size(toks) - {width}), "
                f"i -> concat_ws(' ', slice(toks, i + 1, {width})))"
            ),
        ).otherwise(F.array().cast("array<string>"))

    docs = docs.select(
        "doc_id", _tokens(F.lower(F.col("text"))).alias("toks")
    ).select("doc_id", grams(2).alias("bg"), grams(n).alias("ng"))
    top_bigram = F.array_max(
        F.transform(
            F.array_distinct(F.col("bg")),
            lambda x: F.size(F.filter(F.col("bg"), lambda y: y == x)),
        )
    )
    return docs.select(
        "doc_id",
        F.round(
            F.when(
                F.size("bg") > 0, top_bigram / F.size("bg").cast("double")
            ).otherwise(0.0),
            6,
        ).alias("top_bigram_frac"),
        F.round(
            F.when(
                F.size("ng") > 0,
                (F.size("ng") - F.size(F.array_distinct("ng")))
                / F.size("ng").cast("double"),
            ).otherwise(0.0),
            6,
        ).alias("dup_ngram_frac"),
    )


def remove_repeated_ngrams(docs: DataFrame, n: int = 5) -> DataFrame:
    """Intra-document repetition REMOVAL — the transform half of
    `repetition_signals`, the way `remove_duplicate_spans` is the
    transform half of `substring_span_stats`: delete every token
    covered by a word n-gram window that repeats an EARLIER window of
    the same document (the Gopher/Rae et al. repetition class —
    boilerplate loops, scraped nav menus, degenerate generation — cut
    instead of merely scored), and emit the cleaned canonical text.
    Returns (doc_id, n_tokens, n_removed, cleaned_text); cleaned_text
    is the kept tokens of the lowercased whitespace tokenization
    (same tokenizer as `repetition_signals`), joined by single
    spaces.

    Entirely per-row array expressions — codegen'd, shuffle-free, a
    narrow map over the corpus (corpus-WIDE duplication is
    `remove_duplicate_spans`' job; this operator needs no shuffle
    because its reference set is the document itself). The
    first-occurrence scan is array_position per window — O(m²) worst
    case per doc like `repetition_signals`' top-bigram count; fine
    for document-sized rows, switch to the posexplode + min-position
    window form for book-length rows.
    """
    toks = _tokens(F.lower(F.col("text")))
    d = docs.select("doc_id", toks.alias("t")).select(
        "doc_id",
        "t",
        # guard short docs: sequence(a, b) counts DOWN when a > b
        F.expr(
            f"CASE WHEN size(t) >= {n} THEN "
            f"transform(sequence(0, size(t) - {n}), "
            f"i -> concat_ws(' ', slice(t, i + 1, {n}))) "
            "ELSE CAST(array() AS array<string>) END"
        ).alias("g"),
    )
    # window i (0-based) is a repeat iff the n-gram's FIRST occurrence
    # (array_position, 1-based) is before i+1; covered token
    # positions = the union of [i, i+n-1] over repeat windows
    d = d.select(
        "doc_id",
        "t",
        F.expr(
            "CASE WHEN size(g) > 0 THEN "
            "filter(sequence(0, size(g) - 1), "
            "i -> array_position(g, element_at(g, i + 1)) < i + 1) "
            "ELSE CAST(array() AS array<int>) END"
        ).alias("rep"),
    ).select(
        "doc_id",
        "t",
        F.expr(
            f"array_distinct(flatten(transform(rep, "
            f"i -> sequence(i, i + {n} - 1))))"
        ).alias("cov"),
    )
    return d.select(
        "doc_id",
        F.size("t").cast("long").alias("n_tokens"),
        F.size("cov").cast("long").alias("n_removed"),
        F.expr(
            "array_join(transform("
            "CASE WHEN size(t) > 0 THEN "
            "filter(sequence(0, size(t) - 1), p -> NOT array_contains(cov, p)) "
            "ELSE CAST(array() AS array<int>) END, "
            "p -> element_at(t, p + 1)), ' ')"
        ).alias("cleaned_text"),
    )


# Alternation-free patterns with identical semantics in Java regex
# (Spark) and RE2 (DuckDB) — no backrefs, no lookaround, so
# leftmost-first and leftmost-longest agree.
EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_PATTERN = r"\+?[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def pii_scrub(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact email addresses and phone numbers from a text column.

    JVM `regexp_replace` end to end (global by default) — no UDF, no
    shuffle; at 100 TB this is a pure map stage. Emits per-row match
    counts plus the scrubbed text so downstream stages can filter on
    redaction density.
    """
    t = F.col(text_col)
    n_email = F.regexp_count(t, F.lit(EMAIL_PATTERN)).cast("long")
    scrubbed_email = F.regexp_replace(t, EMAIL_PATTERN, "<EMAIL>")
    n_phone = F.regexp_count(scrubbed_email, F.lit(PHONE_PATTERN)).cast("long")
    scrubbed = F.regexp_replace(scrubbed_email, PHONE_PATTERN, "<PHONE>")
    return df.withColumn("n_emails", n_email).withColumn(
        "n_phones", n_phone
    ).withColumn(text_col, scrubbed)


def url_parts(df: DataFrame, url_col: str = "url") -> DataFrame:
    """Split a URL column into host / path / one query param via the
    built-in `parse_url` (JVM, codegen'd) — the workhorse for
    domain-level corpus curation (per-domain quotas, blocklists)."""
    u = F.col(url_col)
    return df.select(
        "*",
        F.parse_url(u, F.lit("HOST")).alias("host"),
        F.parse_url(u, F.lit("PATH")).alias("path"),
        F.parse_url(u, F.lit("QUERY"), F.lit("lang")).alias("q_lang"),
    )


def quality_score(docs: DataFrame, keep: tuple[str, ...] = ()) -> DataFrame:
    """Heuristic quality signals: stopword / punctuation / distinct ratios.

    All ratios are plain column arithmetic over the token array — one
    narrow pass, no shuffle, rounded to 6dp for oracle stability.
    `keep` passes extra source columns through the projection so a
    consumer needing (score, label) gets both from ONE scan instead of
    a doc-keyed self-join (the quality_auc_eval shape).
    """
    toks = _tokens(F.lower(F.col("text")))
    n = F.size(toks)
    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda w: F.array_contains(stop_arr, w)))
    punct = F.length(F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", ""))
    return docs.select(
        "doc_id",
        *keep,
        n.cast("long").alias("n_tokens"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(n_stop / n.cast("double")), 6
        ).alias("stopword_ratio"),
        F.round(
            punct / F.greatest(F.length("text"), F.lit(1)).cast("double"), 6
        ).alias("punct_ratio"),
        F.round(
            F.when(n == 0, F.lit(0.0)).otherwise(
                F.size(F.array_distinct(toks)) / n.cast("double")
            ),
            6,
        ).alias("distinct_ratio"),
    )


# Tiny built-in character-bigram profiles for the heuristic language ID.
# Deterministic and self-contained (no model files); at scale this is a
# broadcast-size lookup evaluated in one Arrow-batched pandas UDF.
# Latin-script languages only: non-Latin scripts are routed by the
# codepoint-range check below, never by bigram vote (a hanzi text has
# zero latin bigrams and would otherwise win for whichever language
# sorts first — VERDICT r1 §wrong item 4).
_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("th", "he", "in", "er", "an", "re", "on", "at", "en", "nd"),
    "de": ("en", "er", "ch", "de", "ei", "nd", "te", "in", "ie", "ge"),
    "es": ("de", "en", "os", "es", "la", "ar", "el", "ra", "as", "er"),
    "fr": ("es", "le", "de", "en", "re", "nt", "on", "er", "ou", "ai"),
}

# (lo, hi, lang) codepoint ranges for script-based short-circuit.
_SCRIPT_RANGES: tuple[tuple[int, int, str], ...] = (
    (0x3040, 0x30FF, "ja"),  # hiragana + katakana (checked before han:
    #                          Japanese mixes kanji with kana)
    (0xAC00, 0xD7AF, "ko"),  # hangul syllables
    (0x4E00, 0x9FFF, "zh"),  # CJK unified ideographs
    (0x3400, 0x4DBF, "zh"),  # CJK extension A
)


def _script_vote(t: str) -> str | None:
    """Language by dominant non-Latin script, or None for Latin text.

    Counts codepoints per script over the first 512 chars; any kana at
    all ⇒ ja (kanji-heavy Japanese would otherwise read as zh), else
    the script holding >20% of non-space chars wins.
    """
    counts = {"zh": 0, "ja": 0, "ko": 0}
    n_nonspace = 0
    for ch in t[:512]:
        if ch.isspace():
            continue
        n_nonspace += 1
        cp = ord(ch)
        for lo, hi, lang in _SCRIPT_RANGES:
            if lo <= cp <= hi:
                counts[lang] += 1
                break
    if n_nonspace == 0:
        return None
    if counts["ja"] > 0 and counts["ja"] + counts["zh"] > 0.2 * n_nonspace:
        return "ja"
    for lang in ("ko", "zh"):
        if counts[lang] > 0.2 * n_nonspace:
            return lang
    return None


@F.pandas_udf(StringType())
def _predict_lang(texts: pd.Series) -> pd.Series:
    def predict(t: str) -> str:
        if not t:
            return "und"
        t = t.lower()
        script = _script_vote(t)
        if script is not None:
            return script
        bigrams: dict[str, int] = {}
        for i in range(len(t) - 1):
            bg = t[i : i + 2]
            if bg.strip() == bg and len(bg) == 2:
                bigrams[bg] = bigrams.get(bg, 0) + 1
        best_lang, best_score = "und", -1.0
        for lang in sorted(_LANG_PROFILES):
            prof = _LANG_PROFILES[lang]
            score = sum(bigrams.get(bg, 0) * (len(prof) - rank) for rank, bg in enumerate(prof))
            if score > best_score:
                best_lang, best_score = lang, score
        return best_lang

    return texts.map(predict)


def lang_id_ngram(docs: DataFrame) -> DataFrame:
    """Character-bigram heuristic language ID (vectorized pandas UDF)."""
    return docs.select(
        "doc_id",
        F.col("lang").alias("claimed_lang"),
        _predict_lang(F.col("text")).alias("predicted_lang"),
    )


def doc_fingerprint(docs: DataFrame, algo: str = "xxhash64") -> DataFrame:
    """Content fingerprint over normalized, whitespace-collapsed text.

    algo='xxhash64' (default): 64-bit JVM-side hash — the exact-dedup
    shuffle key at scale (8 bytes, hash first, compare rarely).
    algo='md5': 128-bit hex — engine-portable (any SQL engine computes
    the identical value), the choice for cross-system content
    addressing and for the DuckDB oracle.
    """
    canonical = F.trim(
        F.regexp_replace(normalize_text(F.col("text")), _TOKEN_SPLIT, " ")
    )
    fp = F.md5(canonical) if algo == "md5" else F.xxhash64(canonical)
    return docs.select(
        "doc_id",
        fp.alias("fingerprint"),
        F.length(canonical).cast("long").alias("canonical_len"),
    )


def tf_idf_top_terms(docs: DataFrame, k: int = 3, n_docs: int | None = None) -> DataFrame:
    """Top-k TF-IDF terms per document.

    tf = in-doc term count; idf = ln((1+N)/(1+df)). Two shuffles (tf
    group-by, df group-by) + one broadcast join of the vocabulary-sized
    df table back onto tf — at 100 TB the df side is ~vocabulary rows,
    far under broadcast threshold.

    `n_docs` lets callers reuse an already-known corpus size; the
    default `docs.count()` is a parquet-metadata read when `docs` is a
    plain scan, but costs a full pass if `docs` carries upstream
    transforms — pass it explicitly in that case.
    """
    tokens = (
        docs.select(
            "doc_id", F.explode(_tokens(normalize_text(F.col("text")))).alias("word")
        )
        .filter(~F.col("word").isin(*STOPWORDS))
    )
    tf = tokens.groupBy("doc_id", "word").agg(F.count(F.lit(1)).alias("tf"))
    df_tbl = tf.groupBy("word").agg(F.countDistinct("doc_id").alias("df"))
    if n_docs is None:
        n_docs = docs.count()  # scalar, computed once at plan time
    from demo_flink_spark.operators.relational import softln_ratio

    # (1+N)/(1+df) is an integer ratio -> engine-portable softln
    # (bit-identical doubles; libm ln ulp drift can flip roundings).
    # df_tbl is VOCABULARY-sized (grows with the corpus, Heaps' law)
    # so it is NOT force-broadcast: AQE converts the join to broadcast
    # at runtime while the measured table is small, and keeps the
    # shuffle join once vocabulary outgrows the threshold — a slower
    # plan at 100 TB, never an executor OOM.
    scored = tf.join(df_tbl, "word").withColumn(
        "_tfidf_raw",
        F.col("tf")
        * -softln_ratio(F.col("df") + F.lit(1), F.lit(int(n_docs) + 1)),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("_tfidf_raw"), F.asc("word"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
        .select(
            "doc_id",
            "word",
            F.round("_tfidf_raw", 6).alias("tfidf"),
            "rk",
        )
    )


def vocab_build(
    docs: DataFrame,
    min_df: int = 2,
    max_df_frac: float = 0.5,
    n_docs: int | None = None,
) -> DataFrame:
    """Corpus vocabulary with document-frequency cuts: one row per
    surviving normalized token with (df, tf_total).

    `min_df` drops hapax noise (OCR junk, typos); `max_df_frac` drops
    corpus-wide boilerplate — the same two cuts every tokenizer /
    TF-IDF / contamination pipeline applies before building features.

    Scale: explode is a narrow map; the only exchange is the per-token
    aggregate. df needs count(DISTINCT doc_id), which Spark runs as
    two-phase partial-distinct — still map-side-compressed to
    ~vocabulary size per task. No global rank is assigned here: a
    total order over the vocabulary would need a single-task window;
    callers who want ids should run `operators.pipeline.global_cumsum`
    over the df-sorted output instead.
    """
    if n_docs is None:
        n_docs = docs.count()  # parquet-metadata read on a plain scan
    max_df = int(max_df_frac * n_docs)
    tokens = docs.select(
        "doc_id",
        F.explode(_tokens(normalize_text(F.col("text")))).alias("token"),
    )
    return (
        tokens.groupBy("token")
        .agg(
            F.countDistinct("doc_id").alias("df"),
            F.count(F.lit(1)).alias("tf_total"),
        )
        .filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    )


def oov_rate_by_lang(
    docs: DataFrame,
    min_df: int = 2,
    max_df_frac: float = 0.95,
) -> DataFrame:
    """Out-of-vocabulary rate per language against the df-cut
    vocabulary built over the SAME corpus (`vocab_build`) — the
    tokenizer-coverage calibration every multilingual mixture needs:
    a language whose tokens mostly miss the shared vocabulary will
    fragment into bytes/UNKs at training time, and its effective
    token budget silently shrinks.

    Output: (lang, n_tokens, n_oov, oov_rate) — counts exact;
    oov_rate is round-half-away INTEGER division at 6 dp (the
    covariance/dsir recipe — round(double, 6) of an integer ratio
    lands exactly on the half boundary routinely and engines'
    round-on-double disagree there), in decimal(38,0) so the scaled
    numerator cannot wrap at corpus scale.

    Plan: one explode + one per-token aggregate builds the vocab
    (~vocabulary-size rows); the token stream then LEFT-joins it —
    size-based planning broadcasts the vocab while it is small and
    degrades to a shuffle join past the threshold (the r5 rule: never
    force-broadcast a vocabulary-sized relation).
    """
    n_docs = docs.count()
    vocab = vocab_build(docs, min_df, max_df_frac, n_docs=n_docs).select(
        "token", F.lit(True).alias("in_vocab")
    )
    toks = docs.select(
        "lang", F.explode(_tokens(normalize_text(F.col("text")))).alias("token")
    )
    return (
        toks.join(vocab, "token", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).cast("long").alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            F.expr(
                "CAST((CAST(n_oov AS DECIMAL(38,0)) * 2000000"
                "      + CAST(n_tokens AS DECIMAL(38,0)))"
                "     div (2 * CAST(n_tokens AS DECIMAL(38,0))) AS DOUBLE)"
                " / 1000000.0"
            ).alias("oov_rate"),
        )
    )


def lm_bigram_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-self-trained bigram LM quality score per document — the
    CCNet/KenLM shape: score each document by how probable its token
    sequence is under a language model fitted on the corpus itself.
    Low scores flag gibberish, boilerplate, and OCR noise.

    Per document: n_bigrams, avg conditional probability
    avg_p = mean(C(w1,w2)/C(w1·)), and avg_logp = mean(ln of that
    ratio). Every document bigram contributes to the counts it is
    scored against, so probabilities are always > 0 (no smoothing
    needed for self-scoring).

    Scale design: bigram emission is one narrow Arrow pass
    (mapInPandas). The unigram/bigram count tables are vocabulary-
    sized — tiny relative to the corpus — and ride a broadcast join
    back onto the bigram stream; at web scale (1e8+ distinct bigrams)
    switch the bigram join to a shuffle equi-join and keep the unigram
    broadcast. Per-element probabilities are exact ratio doubles;
    log values are rounded before the decimal-exact sum so the
    aggregate is partition-order-independent and engine-portable.
    """
    import re

    non_alpha = re.compile(r"[^a-z\s]")
    ws = re.compile(r"\s+")

    def gen(batches):
        for pdf in batches:
            doc_ids: list[int] = []
            w1s: list[str] = []
            bgs: list[str] = []
            for doc_id, text in zip(pdf["doc_id"], pdf[text_col]):
                toks = (
                    ws.sub(" ", non_alpha.sub("", (text or "").lower()))
                    .strip()
                    .split(" ")
                )
                if toks == [""]:
                    toks = []
                for i in range(len(toks) - 1):
                    doc_ids.append(doc_id)
                    w1s.append(toks[i])
                    bgs.append(toks[i] + " " + toks[i + 1])
            yield pd.DataFrame({"doc_id": doc_ids, "w1": w1s, "bg": bgs})

    bigrams = (
        docs.select("doc_id", text_col)
        .mapInPandas(gen, "doc_id long, w1 string, bg string")
        .transform(lambda d: cut_lineage(d, eager=False))  # feeds three plan branches
    )
    uni = bigrams.groupBy("w1").agg(F.count(F.lit(1)).alias("c_w1"))
    bi = bigrams.groupBy("bg").agg(F.count(F.lit(1)).alias("c_bg"))
    from demo_flink_spark.operators.relational import softln_ratio

    p = F.col("c_bg") / F.col("c_w1")
    # uni/bi are vocabulary-sized (the bigram table is the larger of
    # the two and grows faster than linearly in vocabulary): leave the
    # join strategy to AQE — broadcast while measured-small, shuffle
    # join past the threshold instead of an OOM at corpus scale
    scored = (
        bigrams.join(bi, "bg")
        .join(uni, "w1")
        .select(
            "doc_id",
            p.alias("p"),
            # softln: builtin ln() differs in the last ulp across libm
            # implementations, which flipped a 6-dp rounding at sf0.1;
            # the portable series gives BIT-identical doubles on every
            # engine, so no rounding boundary can ever disagree
            F.round(softln_ratio(F.col("c_bg"), F.col("c_w1")), 6)
            .cast("decimal(38,6)")
            .alias("logp"),
        )
    )
    # the 6-dp averages are produced by round-half-away INTEGER
    # division over the exact decimal sums (covariance_triples
    # recipe) — round(double, 6) of a decimal-sum/count quotient
    # lands exactly on the half boundary routinely (dsir doc 135:
    # 1.46328/96 = 0.0152425) and Spark/DuckDB round-on-double
    # disagree there
    agg = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum(F.col("p").cast("decimal(38,12)")).alias("p_sum"),
        F.sum("logp").alias("logp_sum"),
    )
    return agg.select(
        "doc_id",
        "n_bigrams",
        F.expr(
            "CAST((CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)"
            " * ((abs(CAST(p_sum * 1000000000000 AS DECIMAL(38,0))) * 2"
            "     + CAST(n_bigrams AS DECIMAL(38,0)) * 1000000)"
            "    div (2 * CAST(n_bigrams AS DECIMAL(38,0)) * 1000000))"
            " AS DOUBLE) / 1000000.0"
        ).alias("avg_p"),
        F.expr(
            "CAST((CASE WHEN logp_sum < 0 THEN -1 ELSE 1 END)"
            " * ((abs(CAST(logp_sum * 1000000 AS DECIMAL(38,0))) * 2"
            "     + CAST(n_bigrams AS DECIMAL(38,0)))"
            "    div (2 * CAST(n_bigrams AS DECIMAL(38,0)))) AS DOUBLE)"
            " / 1000000.0"
        ).alias("avg_logp"),
    )


def perplexity_buckets(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score
    every document under the corpus-self-trained bigram LM
    (`lm_bigram_score`), then split each language into equal-count
    head / middle / tail terciles by model score and keep head+middle —
    the tail is where gibberish, OCR noise and boilerplate live.

    Per doc: (doc_id, <group_col>, avg_logp, ppl_bucket, is_kept).
    Bucket edges are INTEGER rank arithmetic (rank·3 ≤ n / ≤ 2n) over a
    total order (avg_logp DESC, doc_id ASC) — no float quantile
    boundary to disagree across engines, and ties break
    deterministically. Documents with fewer than 2 tokens have no
    bigrams and are excluded (CCNet drops them the same way).

    Scale: the LM scoring is `lm_bigram_score`'s shape (narrow Arrow
    pass + vocabulary-sized count joins); the bucketing adds ONE
    window keyed by language — partitions are per-language, so the
    sort parallelizes across languages, and within a language Spark's
    window sort spills rather than OOMs. At 1000-executor scale a
    heavily-skewed language mix would pre-partition by (lang,
    rank-range) first; the fixture's 5 langs are balanced.
    """
    scored = lm_bigram_score(docs)
    labeled = scored.join(docs.select("doc_id", group_col), "doc_id")
    w = Window.partitionBy(group_col)
    ordered = w.orderBy(F.desc("avg_logp"), F.asc("doc_id"))
    ranked = labeled.select(
        "doc_id",
        group_col,
        "avg_logp",
        F.row_number().over(ordered).alias("rnk"),
        F.count(F.lit(1)).over(w).alias("n_grp"),
    )
    bucket = (
        F.when(F.col("rnk") * 3 <= F.col("n_grp"), F.lit("head"))
        .when(F.col("rnk") * 3 <= F.lit(2) * F.col("n_grp"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return ranked.select(
        "doc_id",
        group_col,
        "avg_logp",
        bucket.alias("ppl_bucket"),
        (bucket != "tail").alias("is_kept"),
    )


def ngram_diversity(docs: DataFrame, group_col: str = "source") -> DataFrame:
    """Distinct-n-gram diversity per corpus slice — the self-repetition
    measure (distinct-1/2/3 of Li et al. 2016) used to compare sources
    before mixing: a slice whose trigram diversity collapses is
    template spam even when individual documents pass quality filters.

    Per (group, n) for n ∈ {1,2,3}: total n-gram occurrences, distinct
    n-grams, and diversity = distinct/total (exact-integer division).

    Scale: n-gram emission is pure JVM array expressions (transform +
    slice over the token array — codegen'd, no Python); the only
    shuffle is the (group, n, gram)-keyed count-distinct aggregate,
    which Spark expands map-side (partial distinct per partition), so
    the exchange carries surviving grams, not raw occurrences.
    """
    # materialize the token array as a NAMED COLUMN before any lambda
    # touches it: an expression referenced inside a higher-order
    # function is re-evaluated PER ARRAY ELEMENT (no common-subexpr
    # elimination across the lambda boundary), which made the two
    # canonicalization regexes run once per gram instead of once per
    # row — measured 2.4x on this operator at sf0.1
    tok_df = docs.select(
        F.col(group_col).alias("grp"),
        _tokens(_canon_text(F.col("text"))).alias("t"),
    )
    t = F.col("t")

    def grams(n: int):
        # sequence(a, b) counts DOWN when a > b: guard short docs
        return F.when(
            F.size(t) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(t) - n),
                lambda i: F.array_join(F.slice(t, i + 1, n), " "),
            ),
        ).otherwise(F.array().cast("array<string>"))

    exploded = None
    for n in (1, 2, 3):
        part = tok_df.select(
            "grp",
            F.lit(n).alias("n"),
            F.explode(grams(n)).alias("gram"),
        )
        exploded = part if exploded is None else exploded.unionAll(part)
    # two-level aggregate instead of count(DISTINCT): a fused
    # count+countDistinct forces Catalyst's Expand rewrite (every input
    # row duplicated per aggregate) — here the first level collapses
    # occurrences to distinct grams map-side, and the second level is
    # gram-count-sized, not corpus-sized
    per_gram = exploded.groupBy("grp", "n", "gram").agg(
        F.count(F.lit(1)).alias("occ")
    )
    return (
        per_gram.groupBy("grp", "n")
        .agg(
            F.sum("occ").cast("long").alias("n_total"),
            F.count(F.lit(1)).cast("long").alias("n_distinct"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n",
            "n_total",
            "n_distinct",
            (F.col("n_distinct").cast("double") / F.col("n_total")).alias(
                "diversity"
            ),
        )
    )


def tokenizer_fertility(docs: DataFrame, group_col: str = "lang") -> DataFrame:
    """Tokenizer budget calibration per language: BPE-ish subword
    tokens per whitespace word (fertility) and characters per subword
    token — the numbers that turn "100 TB of text" into a training
    token budget, and that flag languages a tokenizer fragments badly.

    One narrow scan (two regexp counts per row) + one tiny aggregate;
    fertility/chars-per-token are single divisions of exact long sums.
    """
    per_doc = docs.select(
        F.col(group_col).alias("grp"),
        F.regexp_count(F.col("text"), F.lit(BPE_SPLIT_PATTERN))
        .cast("long")
        .alias("bpe"),
        F.size(_tokens(F.col("text"))).cast("long").alias("ws"),
        F.length("text").cast("long").alias("chars"),
    )
    return (
        per_doc.groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("bpe").cast("long").alias("n_bpe_tokens"),
            F.sum("ws").cast("long").alias("n_ws_tokens"),
            F.sum("chars").cast("long").alias("n_chars"),
        )
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "n_bpe_tokens",
            "n_ws_tokens",
            "n_chars",
            (F.col("n_bpe_tokens").cast("double") / F.col("n_ws_tokens"))
            .alias("fertility"),
            (F.col("n_chars").cast("double") / F.col("n_bpe_tokens"))
            .alias("chars_per_token"),
        )
    )


def token_entropy(docs: DataFrame) -> DataFrame:
    """Within-document Shannon entropy of the unigram distribution —
    the information-density quality signal: near-zero entropy flags
    single-token spam, low entropy flags repetitive boilerplate,
    independent of WHICH tokens repeat (the complement of
    `repetition_signals`' positional n-gram measures).

        H = -Σ (c/n)·ln(c/n) = -(1/n) Σ c·ln(c/n)

    (doc_id, n_tokens, n_distinct, entropy). Engine-exact: each
    ln(c/n) is the portable softln series (no libm), rounded to 6dp;
    c·round6 products are exact doubles (≤ 33 significant bits) summed
    in decimal(38,6); the final 6dp division is round-half-away
    integer arithmetic (the lm_bigram_score recipe).

    Scale: ZERO exchanges — distinct tokens and their counts are
    higher-order array expressions per row (the repetition_signals
    shape, O(d·n) per doc, fine for document-sized rows; for
    book-length rows switch to the explode+groupBy form, which is what
    the DuckDB oracle runs — same values, different plan).
    """
    from demo_flink_spark.operators.relational import softln_ratio

    tok_df = docs.select(
        "doc_id", _tokens(_canon_text(F.col("text"))).alias("t")
    )
    t = F.col("t")
    n = F.size(t)
    step2 = tok_df.select(
        "doc_id", "t", F.array_distinct(t).alias("d"), n.alias("n")
    )
    counts = F.transform(
        F.col("d"),
        lambda x: F.size(F.filter(F.col("t"), lambda y: y == x)),
    )
    nn = F.col("n")
    terms = F.transform(
        counts,
        lambda c: c.cast("double") * F.round(softln_ratio(c, nn), 6),
    )
    ent_sum = F.aggregate(
        terms,
        F.lit(0).cast("decimal(38,6)"),
        lambda acc, x: acc + x.cast("decimal(38,6)"),
    )
    step3 = step2.select(
        "doc_id",
        nn.cast("long").alias("n_tokens"),
        F.size("d").cast("long").alias("n_distinct"),
        ent_sum.alias("_s"),
    )
    # H = -Σ/n >= 0 (every ln(c/n) <= 0): 6dp round-half-away integer
    # division over the exact decimal sum
    return step3.select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.when(F.col("n_tokens") == 0, F.lit(0.0))
        .otherwise(
            F.expr(
                "CAST((abs(CAST(_s * 1000000 AS DECIMAL(38,0))) * 2"
                "      + CAST(n_tokens AS DECIMAL(38,0)))"
                "     div (2 * CAST(n_tokens AS DECIMAL(38,0))) AS DOUBLE)"
                " / 1000000.0"
            )
        )
        .alias("entropy"),
    )


def _canon_text(col):
    """lower → strip non-[a-z\\s] → collapse whitespace → trim (the
    dedup._canonical normalization, local to avoid a circular import)."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(col), r"[^a-z\s]", ""), r"\s+", " "
        )
    )


def dsir_log_ratio(
    docs: DataFrame,
    target_col: str = "lang",
    target_value: str = "en",
    text_col: str = "text",
    n_buckets: int = 256,
) -> DataFrame:
    """DSIR-style importance weighting (Xie et al., "Data Selection
    for Language Models via Importance Resampling"): score every
    document by the log-likelihood ratio of its hashed-bigram features
    under a TARGET distribution (here: the ``target_col ==
    target_value`` subset) versus the SOURCE distribution (the whole
    corpus). High scores = looks like the target domain; the standard
    way a pipeline tilts a raw web corpus toward a curated target.

    avg_log_ir(d) = mean over d's bigrams of
        ln( p_target(j) / p_source(j) ),   j = md5-bucket of the bigram,
    with Laplace-smoothed multinomials p(j) = (c_j + 1) / (total + K),
    K = 256 buckets.

    Engine-exact by construction: both count tables come from ONE
    aggregation (cs = all, ct = target-flagged sum) so target counts
    can never exceed source counts; each bucket's log ratio is
    ln((ct+1)/(cs+1)) − ln((T+K)/(S+K)) — two portable-softln terms
    over exact integers (both fixed-sign because target ⊆ source) and
    one IEEE subtraction — rounded to 6dp decimal, summed per
    document exactly. The final average is NOT round(double, 6): a
    sum of scale-6 decimals divided by a small count lands exactly on
    the half boundary all the time (1.46328/96 = 0.0152425 — Spark's
    exact-binary HALF_UP and DuckDB's float-multiply round disagree
    there), so the 6-dp average is produced by round-half-away
    INTEGER division in micro-units, the covariance_triples recipe.

    Scale: one corpus pass emits (doc, bucket) pairs (all-JVM array
    expressions, no Python); the 256-row log-ratio table is built from
    one 256-group aggregate and rides a broadcast back onto the pair
    stream; the only corpus-sized exchange is the doc-keyed sum with
    map-side partials. Counts stay exact in softln's double casts up
    to 2^53 bigrams (~9e15 — beyond a 100 TB corpus).
    """
    if n_buckets != 256:
        raise ValueError("n_buckets must be 256 (byte-aligned md5 bucket)")
    from demo_flink_spark.operators.dedup import _canonical
    from demo_flink_spark.operators.relational import softln_ratio

    toks = F.filter(
        F.split(_canonical(F.col(text_col)), " "), lambda x: x != ""
    )
    base = docs.select(
        "doc_id",
        (F.col(target_col) == target_value).alias("is_t"),
        toks.alias("toks"),
    )
    bigrams = F.when(
        F.size("toks") >= 2,
        F.expr(
            "transform(sequence(0, size(toks) - 2), "
            "i -> concat(toks[i], ' ', toks[i+1]))"
        ),
    ).otherwise(F.array().cast("array<string>"))
    bk = base.select(
        "doc_id",
        "is_t",
        F.explode(bigrams).alias("bg"),
    ).select(
        "doc_id",
        "is_t",
        F.expr("CAST(conv(substr(md5(bg), 1, 2), 16, 10) AS INT)").alias("j"),
    )
    bk = cut_lineage(bk, eager=False)  # feeds the count table AND the per-doc stream
    cnt = bk.groupBy("j").agg(
        F.count(F.lit(1)).alias("cs"),
        F.sum(F.when(F.col("is_t"), 1).otherwise(0)).alias("ct"),
    )
    tot = cnt.agg(F.sum("cs").alias("s_all"), F.sum("ct").alias("t_all"))
    k = F.lit(256)
    lr_tbl = cnt.crossJoin(F.broadcast(tot)).select(
        "j",
        F.round(
            softln_ratio(F.col("ct") + 1, F.col("cs") + 1)
            - softln_ratio(F.col("t_all") + k, F.col("s_all") + k),
            6,
        )
        .cast("decimal(38,6)")
        .alias("lr"),
    )
    per = bk.join(F.broadcast(lr_tbl), "j").groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_feats"),
        F.sum("lr").alias("lr_sum"),
    )
    # round-half-away at 6 decimals via exact integer division:
    # identical in every engine by construction (no round-on-double)
    avg = F.expr(
        "CAST((CASE WHEN lr_sum < 0 THEN -1 ELSE 1 END)"
        " * ((abs(CAST(lr_sum * 1000000 AS DECIMAL(38,0))) * 2"
        "     + CAST(n_feats AS DECIMAL(38,0)))"
        "    div (2 * CAST(n_feats AS DECIMAL(38,0)))) AS DOUBLE)"
        " / 1000000.0"
    )
    return docs.select("doc_id").join(per, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_feats", F.lit(0)).alias("n_feats"),
        F.coalesce(avg, F.lit(0.0)).alias("avg_log_ir"),
        (F.coalesce(avg, F.lit(0.0)) > 0).alias("keep"),
    )


def classifier_weights(dim: int = 256, seed: str = "qc1") -> list[int]:
    """Deterministic integer weight table for the hashed linear quality
    classifier: w_int[j] = (LE64(md5(seed:j)) mod 2^20) - 2^19, a
    dyadic rational in [-1, 1) once divided by 2^19. Integer weights
    keep the per-document accumulation EXACT (long sums) on any
    engine/partitioning; the oracle embeds the same table as a SQL
    literal."""
    import hashlib

    return [
        (
            int.from_bytes(
                hashlib.md5(f"{seed}:{j}".encode()).digest()[:8], "little"
            )
            % (1 << 20)
        )
        - (1 << 19)
        for j in range(dim)
    ]


def quality_classifier(
    docs: DataFrame,
    text_col: str = "text",
    dim: int = 256,
    seed: str = "qc1",
) -> DataFrame:
    """Hashed-feature linear quality classifier — the fasttext-style
    shape every web-corpus pipeline runs (CCNet/fineweb quality
    filters), with deterministic seeded weights so the score is
    reproducible on any engine (a trained weight vector drops in as a
    literal the same way).

    Per document: tokens hash to j = md5(token) mod dim (dim = 256 is
    byte-aligned: j is exactly the first md5 byte on every engine),
    the integer weights accumulate in an exact long sum, and the
    logit is d(sum)/2^19/n_tokens — two IEEE ops over exact inputs,
    bit-identical cross-engine. Returns (doc_id, n_tokens, logit,
    keep = logit > 0).

    Scale: one narrow projection + explode + one groupBy(doc_id) —
    the exchange carries (doc_id, 8-byte weight sums) via map-side
    partial aggregation; the 256-entry weight table is a plan literal
    (no join). At 100 TB this is a single pass over the corpus.
    """
    if dim != 256:
        raise ValueError("dim must be 256 (byte-aligned md5 bucket)")
    w = classifier_weights(dim, seed)
    from demo_flink_spark.operators.dedup import _canonical

    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(_canonical(F.col(text_col)), " "), lambda x: x != "")
        ).alias("token"),
    )
    warr = F.array(*[F.lit(v) for v in w])
    j = F.expr("CAST(conv(substr(md5(token), 1, 2), 16, 10) AS INT)")
    scored = toks.select("doc_id", F.element_at(warr, j + 1).alias("w_int"))
    per_doc = scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("w_int").alias("w_sum"),
    )
    logit = (
        F.col("w_sum").cast("double")
        / F.lit(float(1 << 19))
        / F.col("n_tokens")
    )
    return (
        docs.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
            F.coalesce(logit, F.lit(0.0)).alias("logit"),
            (F.coalesce(logit, F.lit(0.0)) > 0).alias("keep"),
        )
    )


# Gopher document-quality rules (Rae et al. 2021, Appendix A) — the
# word-level subset; line-level rules (bullet/ellipsis line ratios)
# live with the line-structured cleaning in webtext.c4_line_filter.
# 'a' joins the paper's stopword list so the signal splits this
# corpus's vocabulary (the original list: the be to of and that have
# with).
GOPHER_STOPWORDS = ("the", "a", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_filter(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
    min_mean_len: int = 3,
    max_mean_len: int = 10,
    max_symbol_ratio_pct: int = 10,
    min_alpha_pct: int = 80,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher-style document quality rules over a text column.

    One narrow projection (higher-order functions over the token
    array), zero exchanges — the same pure-scan shape as
    `quality_score`, but emitting the PASS/FAIL rule flags a curation
    pipeline filters on rather than raw ratios.

    Every flag is decided in INTEGER arithmetic (cross-multiplied
    thresholds: ``3·n ≤ Σlen ≤ 10·n``, ``10·symbols ≤ n``,
    ``5·alpha ≥ 4·n``), so no float rounding can sit on a rule
    boundary on any engine — the r3/r4 cross-engine hazard class.
    The raw ratios are still emitted for observability; each is one
    division of exact integers, bit-identical on both engines.

    Rules: word count in [min_words, max_words]; mean word length in
    [min_mean_len, max_mean_len]; symbol-to-word ratio (``#`` and
    ``...``) at most max_symbol_ratio_pct/100; at least min_alpha_pct%
    of words contain an alphabetic character; at least min_stopwords
    distinct GOPHER_STOPWORDS present.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text = empty
    toks = _tokens(t)
    n = F.size(toks).cast("long")
    sum_len = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    n_alpha = F.size(F.filter(toks, lambda w: w.rlike("[a-zA-Z]"))).cast(
        "long"
    )
    n_sym = (
        F.regexp_count(t, F.lit("#")) + F.regexp_count(t, F.lit(r"\.\.\."))
    ).cast("long")
    n_stop = sum(
        F.array_contains(toks, w).cast("int") for w in GOPHER_STOPWORDS
    ).cast("long")
    nz = n > 0
    return docs.select(
        "doc_id",
        n.alias("n_words"),
        F.when(nz, sum_len / n).otherwise(F.lit(0.0)).alias("mean_word_len"),
        F.when(nz, n_sym / n).otherwise(F.lit(0.0)).alias("symbol_word_ratio"),
        F.when(nz, n_alpha / n).otherwise(F.lit(0.0)).alias("frac_alpha_words"),
        n_stop.alias("n_stop_present"),
        ((n >= min_words) & (n <= max_words)).alias("ok_word_count"),
        (
            nz
            & (sum_len >= min_mean_len * n)
            & (sum_len <= max_mean_len * n)
        ).alias("ok_mean_len"),
        (nz & (n_sym * 100 <= max_symbol_ratio_pct * n)).alias("ok_symbol"),
        (nz & (n_alpha * 100 >= min_alpha_pct * n)).alias("ok_alpha"),
        (n_stop >= min_stopwords).alias("ok_stop"),
    ).withColumn(
        "keep",
        F.col("ok_word_count")
        & F.col("ok_mean_len")
        & F.col("ok_symbol")
        & F.col("ok_alpha")
        & F.col("ok_stop"),
    )


def pmi_cooccurrence(
    docs: DataFrame,
    text_col: str = "text",
    window: int = 2,
    min_pair_count: int = 3,
) -> DataFrame:
    """Pointwise mutual information over skip-gram co-occurrences:
    unordered token pairs within `window` positions, scored
    ``PMI = ln( (c12/Npairs) / ((c1/N)·(c2/N)) )`` — the classic
    distributional-similarity statistic (collocation mining, phrase
    detection, embedding-corpus diagnostics).

    Shape: tokenize once to (doc, pos, token); pairs come from a
    doc-keyed self-equi-join with the position offset as a post-join
    filter (each row meets at most `window` partners — linear, not
    quadratic); one (w1, w2) aggregate; unigram counts and the two
    scalar totals ride broadcasts back on. PMI's log runs through the
    engine-portable `softln_ratio` on INTEGER products (c12·N²,
    Npairs·c1·c2 — exact in long up to ~10^9 tokens; production-scale
    corpora promote the ratio to decimal before the same series),
    negated when the ratio exceeds 1, so every score is bit-identical
    cross-engine.
    """
    from demo_flink_spark.operators.dedup import _canonical
    from demo_flink_spark.operators.relational import softln_ratio

    tok = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.split(_canonical(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("pos", "w"),
    )
    a, b = tok.alias("a"), tok.alias("b")
    pairs = a.join(
        b,
        (F.col("a.doc_id") == F.col("b.doc_id"))
        & (F.col("b.pos") > F.col("a.pos"))
        & (F.col("b.pos") <= F.col("a.pos") + window),
    ).select(
        F.least(F.col("a.w"), F.col("b.w")).alias("w1"),
        F.greatest(F.col("a.w"), F.col("b.w")).alias("w2"),
    )
    c12 = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c12")
    )
    uni = tok.groupBy("w").agg(F.count(F.lit(1)).cast("long").alias("c"))
    totals = tok.agg(F.count(F.lit(1)).cast("long").alias("n_tokens")).crossJoin(
        F.broadcast(pairs.agg(F.count(F.lit(1)).cast("long").alias("n_pairs")))
    )
    # uni is vocabulary-sized: AQE picks broadcast while it measures
    # small, shuffle join once vocabulary outgrows the threshold (the
    # 1-row totals stays force-broadcast — it can never grow)
    scored = (
        c12.filter(F.col("c12") >= min_pair_count)
        .join(uni.withColumnRenamed("w", "w1").withColumnRenamed("c", "c1"), "w1")
        .join(uni.withColumnRenamed("w", "w2").withColumnRenamed("c", "c2"), "w2")
        .crossJoin(F.broadcast(totals))
    )
    num = F.col("c12") * F.col("n_tokens") * F.col("n_tokens")
    den = F.col("n_pairs") * F.col("c1") * F.col("c2")
    pmi = F.when(num <= den, softln_ratio(num, den)).otherwise(
        -softln_ratio(den, num)
    )
    return scored.select("w1", "w2", "c12", "c1", "c2", pmi.alias("pmi"))


def readability_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Flesch-style reading-ease per document with fully deterministic
    counting rules — the curation-side readability gate (route
    too-hard/too-degenerate text out of a pretraining mix, stratify
    eval sets by difficulty).

    Counting rules (documented proxies, exact on both engines):
    - words: maximal [a-z]+ runs of lower(text) — same tokenization
      family as `lang_id`;
    - syllables: maximal [aeiouy]+ vowel groups of lower(text) (the
      standard cheap syllable proxy; word-splitting characters are
      non-vowels, so the global count equals the per-word sum);
    - sentences: maximal [.!?]+ runs of the raw text.

    Score in exact integer micros (no float in the formula):

        flesch_micros = 206_835_000
                      - (1_015_000 * words)     div max(sentences, 1)
                      - (84_600_000 * syllables) div max(words, 1)

    i.e. the classic 206.835 - 1.015*(W/S) - 84.6*(Syl/W) with each
    ratio term floor-divided in micros — deterministic in any engine
    (all quantities non-negative, so floor == truncate). Band
    thresholds (>=70 easy, >=50 standard, else difficult) follow the
    published Flesch bands.

    Scale: one narrow pass, three regexp scans per row, no shuffle.
    """
    n_words = F.size(F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)"))
    n_syl = F.size(
        F.expr(f"regexp_extract_all(lower({text_col}), '[aeiouy]+', 0)")
    )
    n_sent = F.size(F.expr(f"regexp_extract_all({text_col}, '[.!?]+', 0)"))
    out = docs.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        n_sent.cast("long").alias("n_sentences"),
        n_syl.cast("long").alias("n_syllable_groups"),
    ).withColumn(
        "flesch_micros",
        F.lit(206_835_000).cast("long")
        - F.expr("(1015000 * n_words) div greatest(n_sentences, 1)")
        - F.expr("(84600000 * n_syllable_groups) div greatest(n_words, 1)"),
    )
    return out.withColumn(
        "band",
        F.when(F.col("flesch_micros") >= 70_000_000, F.lit("easy"))
        .when(F.col("flesch_micros") >= 50_000_000, F.lit("standard"))
        .otherwise(F.lit("difficult")),
    )


def zipf_fit_by_lang(
    docs: DataFrame,
    text_col: str = "text",
    lang_col: str = "lang",
    top_k: int = 100,
) -> DataFrame:
    """Zipf's-law fit per language: OLS slope of ln(freq) on ln(rank)
    over the top-`top_k` word frequencies — the corpus-health
    diagnostic that flags synthetic/templated text (slope far from
    ≈ -1) and tokenizer-unfriendly sources before training.

    Engine-exact by the linear_trend recipe: ln(rank) and ln(freq)
    come from the portable softln series (ln k = -softln(1, k)),
    rounded half-up at 6dp to integer micros; all four OLS sufficient
    statistics are exact BIGINT sums (magnitudes ≤ ~5.5e17 at
    top_k = 100, under int64), and only the final slope division is a
    double — bit-identical cross-engine with no rounding step.

    Scale: one groupBy (lang, word) word count — map-side combinable
    — then a per-lang top-k window over ≤ |vocab| rows and a |langs|-
    row aggregate. Nothing driver-side.
    """
    from demo_flink_spark.operators.relational import softln_ratio
    from pyspark.sql.window import Window

    words = docs.select(
        F.col(lang_col).alias("lang"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word"),
    )
    freq = words.groupBy("lang", "word").agg(
        F.count(F.lit(1)).alias("freq")
    )
    w = Window.partitionBy("lang").orderBy(F.col("freq").desc(), "word")
    top = freq.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= top_k
    )
    # ln k in half-up 6dp micros. The rounded double goes through
    # decimal(38,6) BEFORE the ×1e6: a double multiply could land a
    # hair under the integer and Spark's double→long cast TRUNCATES
    # while DuckDB's ROUNDS — the decimal route is exact on both.
    ln_micros = lambda c: (  # noqa: E731
        F.round(F.lit(-1.0) * softln_ratio(F.lit(1), c), 6).cast(
            "decimal(38,6)"
        )
        * 1000000
    ).cast("long")
    base = top.select(
        "lang",
        ln_micros(F.col("rank")).alias("x"),
        ln_micros(F.col("freq")).alias("y"),
    )
    agg = base.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.expr("x * y")).alias("sxy"),
        F.sum(F.expr("x * x")).alias("sxx"),
    )
    n_types = freq.groupBy("lang").agg(
        F.count(F.lit(1)).cast("long").alias("n_types")
    )
    return (
        agg.join(n_types, "lang")
        .select(
            "lang",
            "n_types",
            F.col("n").cast("long").alias("n_top"),
            (
                (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy"))
                .cast("double")
                / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
                .cast("double")
            ).alias("zipf_slope"),
        )
    )


def kl_unigram_by_source(
    docs: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """KL divergence of each source's unigram distribution from the
    full-corpus distribution, D(P_source || Q_corpus) — the drift/mix
    diagnostic that ranks which slices pull the token distribution
    hardest (complementing `drift_psi_report`'s binned numeric PSI
    with an exact vocabulary-level divergence).

    Q is the corpus MIXTURE, so q(w) > 0 wherever p(w) > 0 — no
    smoothing needed, and every per-source KL is finite and >= 0.

        D = Σ_w (c_w/n)·ln( (c_w·m) / (d_w·n) )

    with c_w = source count, n = source total, d_w = corpus count,
    m = corpus total. Engine-exact by the token_entropy recipe: each
    log-ratio is the portable softln series on exact integer products
    (sign-split around a <= b), rounded half-up at 6dp; c·round6
    products are exact doubles summed in decimal(38,6); the final
    division by n is round-half-away integer micros.

    Scale: two map-side-combinable word-count aggregates (per-source,
    corpus) joined on word — the corpus side is |vocab|-sized and
    broadcast-eligible; no row ever carries text past tokenization.
    """
    from demo_flink_spark.operators.relational import softln_ratio

    words = docs.select(
        F.col(group_col).alias("grp"),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
        ).alias("word"),
    )
    c = words.groupBy("grp", "word").agg(F.count(F.lit(1)).alias("c"))
    d = words.groupBy("word").agg(F.count(F.lit(1)).alias("d"))
    n = c.groupBy("grp").agg(F.sum("c").alias("n"))
    # total corpus tokens stays IN the lazy plan (broadcast 1-row
    # crossJoin, like the sibling operators) — an eager words.count()
    # here would run a full scan+tokenize job at plan-BUILD time and
    # freeze m as a literal, stale if the source changes before
    # execution
    m = words.agg(F.count(F.lit(1)).alias("m"))
    joined = (
        c.join(d, "word")
        .join(F.broadcast(n), "grp")
        .crossJoin(F.broadcast(m))
        .withColumn("a", F.col("c") * F.col("m"))
        .withColumn("b", F.col("d") * F.col("n"))
    )
    ln_ratio = F.when(
        F.col("a") <= F.col("b"),
        F.round(softln_ratio(F.col("a"), F.col("b")), 6),
    ).otherwise(
        F.lit(-1.0) * F.round(softln_ratio(F.col("b"), F.col("a")), 6)
    )
    terms = joined.select(
        "grp",
        "n",
        (F.col("c").cast("double") * ln_ratio)
        .cast("decimal(38,6)")
        .alias("term"),
    )
    agg = terms.groupBy("grp").agg(
        F.first("n").alias("n"), F.sum("term").alias("s")
    )
    return agg.select(
        F.col("grp").alias("source"),
        F.col("n").cast("long").alias("n_tokens"),
        F.expr(
            "CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)"
            " * ((abs(CAST(s * 1000000 AS DECIMAL(38,0))) * 2"
            "      + CAST(n AS DECIMAL(38,0)))"
            "     div (2 * CAST(n AS DECIMAL(38,0)))) AS BIGINT)"
        ).alias("kl_micros"),
    )


def word_burstiness(
    docs: DataFrame,
    text_col: str = "text",
    top_k: int = 20,
) -> DataFrame:
    """Fano factor (variance-to-mean ratio of per-document counts) for
    the corpus's top-`top_k` words — the burstiness/dispersion
    diagnostic: function words disperse evenly (F ≈ 1, Poisson-like),
    topical words are bursty (F ≫ 1, they pile into few docs), and a
    templated/spam corpus shows F ≈ 0 for its boilerplate tokens
    (identical count in EVERY doc). Complements `repetition_signals`
    (within-doc) with the ACROSS-doc dispersion axis.

    Exact arithmetic: with N docs and per-doc counts c_i (0 for docs
    without the word — N enters as a constant),

        F = (N·Σc² − (Σc)²) / (N·Σc)

    — population variance over mean, cleared of fractions. Every term
    is an exact BIGINT/decimal product; `fano_micros` is one
    round-half-away integer division. Ordering ties break by word.

    One (word, doc) count aggregate + a word-keyed reduction; the
    global top-k is `orderBy().limit()` — Spark plans it as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows), NOT a single-partition rank window. Nothing driver-side
    beyond the k merged rows.
    """
    n_docs = docs.count()  # one scalar: the corpus size
    wc = (
        docs.select(
            "doc_id",
            F.explode(
                F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)")
            ).alias("word"),
        )
        .groupBy("word", "doc_id")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    per_word = wc.groupBy("word").agg(
        F.sum("c").alias("sc"),
        F.sum(F.expr("c * c")).alias("sc2"),
        F.count(F.lit(1)).alias("n_docs_with"),
    )
    top = per_word.orderBy(F.col("sc").desc(), "word").limit(top_k)
    return top.select(
        "word",
        F.col("sc").cast("long").alias("n_occurrences"),
        F.col("n_docs_with").cast("long").alias("n_docs_with"),
        F.expr(
            f"(({n_docs} * sc2 - sc * sc) * 2000000 + {n_docs} * sc)"
            f" div (2 * {n_docs} * sc)"
        )
        .cast("long")
        .alias("fano_micros"),
    )


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    k: int = 20,
    n_iter: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """TextRank keyword extraction (Mihalcea & Tarau 2004): PageRank
    over the word co-occurrence graph — the classic unsupervised
    keyword/keyphrase ranker, and the composition proof that the
    hardened iterative pagerank runs unchanged on a TEXT-derived
    graph with string node ids.

    Graph contract (deterministic, oracle-mirrorable):
    - tokens: `regexp_extract_all(lower(text), '[a-z]+')` — the
      kl_unigram tokenizer;
    - edges: the SET of adjacent ordered pairs (w_i, w_{i+1}),
      w_i ≠ w_{i+1}, symmetrized (window-2 co-occurrence, unweighted
      — the original paper's default for keyword extraction);
    - the reference's 11 stopwords (AdvancedWordCount.java:26-28)
      are removed as nodes: any edge touching one is dropped;
    - rank: `operators.graph.pagerank`, Q52 fixed point, `n_iter`
      rounds — bit-identical on any engine/partitioning, so the
      top-`k` (rank DESC, word ASC) carries a full value-hash oracle
      via plans/graph.py::pagerank_oracle_sql.

    Scale: |V| = vocabulary, |E| ≤ total tokens (narrow explode +
    distinct) — both tiny next to the corpus; the expensive stage is
    the tokenize scan, shared shape with every textstats operator.
    """
    from demo_flink_spark.operators.graph import pagerank
    from demo_flink_spark.operators.wordcount import STOPWORDS

    toks = docs.select(
        F.expr(f"regexp_extract_all(lower({text_col}), '[a-z]+', 0)").alias(
            "ts"
        )
    )
    adj = (
        toks.select(
            F.explode(
                F.expr(
                    "filter(transform(ts, (w, i) ->"
                    " IF(i < size(ts) - 1 AND w <> ts[i + 1],"
                    " struct(w AS a, ts[i + 1] AS b), NULL)),"
                    " p -> p IS NOT NULL)"
                )
            ).alias("p")
        )
        .select("p.a", "p.b")
        .distinct()
    )
    sw = list(STOPWORDS)
    adj = adj.filter(~F.col("a").isin(sw) & ~F.col("b").isin(sw))
    edges = (
        adj.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        .union(adj.select(F.col("b").alias("src"), F.col("a").alias("dst")))
        .distinct()
    )
    # early_exit off: at damping 0.85 / 6 rounds the exact Q52 fixed
    # point is unreachable (~220 rounds needed — pagerank docstring),
    # so the boundary signature job is pure overhead; output is
    # identical either way (the exit only fires at an exact fixed
    # point, where further rounds are no-ops).
    r = pagerank(edges, damping=damping, n_iter=n_iter, early_exit=False)
    return (
        r.orderBy(F.col("rank").desc(), F.col("node").asc())
        .limit(k)
        .select(F.col("node").alias("word"), "rank")
    )
