"""Declared queries: WordCount lineage + text analysis on `documents`.

The reference's flagship computation (WordCount/AdvancedWordCount,
`WindowWordCount.java`, `AdvancedWordCount.java`) made useful over the
driver's `documents` table, plus the text-analysis extensions a
training-data pipeline needs (language ID, quality scoring, token
counting, fingerprinting, TF-IDF).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import textstats, wordcount
from demo_flink_spark.operators.relational import softln_ratio_sql
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

_STOPWORDS_SQL = ", ".join(f"'{w}'" for w in wordcount.STOPWORDS)

# Engine-portable bigram-LM scoring (twin of operators/textstats.py::
# lm_bigram_score): shared by the lm_bigram_score spec and the
# CCNet-style perplexity-bucket filter layered on top of it.
_LM_BIGRAM_SQL = rf"""
        WITH toks AS (
            SELECT doc_id, string_split(trim(regexp_replace(regexp_replace(
                lower(text), '[^a-z\s]', '', 'g'), '\s+', ' ', 'g')), ' ') AS t
            FROM documents
        ),
        bigrams AS (
            SELECT doc_id, t[i + 1] AS w1,
                   t[i + 1] || ' ' || t[i + 2] AS bg
            FROM toks, unnest(range(0, greatest(len(t) - 1, 0))) AS u(i)
            WHERE len(t) >= 2 AND t[1] <> ''
        ),
        uni AS (SELECT w1, count(*) AS c_w1 FROM bigrams GROUP BY w1),
        bi AS (SELECT bg, count(*) AS c_bg FROM bigrams GROUP BY bg),
        agg AS (
            SELECT doc_id,
                   count(*) AS n_bigrams,
                   sum(CAST(c_bg / CAST(c_w1 AS DOUBLE) AS DECIMAL(38,12)))
                       AS p_sum,
                   sum(CAST(round({{softln}}, 6)
                       AS DECIMAL(38,6))) AS logp_sum
            FROM bigrams JOIN bi USING (bg) JOIN uni USING (w1)
            GROUP BY doc_id
        )
        -- 6-dp averages via round-half-away integer division over the
        -- exact decimal sums (round(double,6) of sum/count quotients
        -- sits exactly on half boundaries — the dsir doc-135 class)
        SELECT doc_id,
               n_bigrams,
               CAST((CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)
                    * ((abs(CAST(p_sum * 1000000000000 AS HUGEINT)) * 2
                        + CAST(n_bigrams AS HUGEINT) * 1000000)
                       // (2 * CAST(n_bigrams AS HUGEINT) * 1000000))
                    AS DOUBLE) / 1000000.0 AS avg_p,
               CAST((CASE WHEN logp_sum < 0 THEN -1 ELSE 1 END)
                    * ((abs(CAST(logp_sum * 1000000 AS HUGEINT)) * 2
                        + CAST(n_bigrams AS HUGEINT))
                       // (2 * CAST(n_bigrams AS HUGEINT))) AS DOUBLE)
                   / 1000000.0 AS avg_logp
        FROM agg
""".replace(
    "{softln}", softln_ratio_sql("c_bg", "c_w1")
)

# Engine-portable bigram-profile language ID (twin of
# operators/textstats.py::lang_id_ngram) — shared by the lang_id spec
# and the confusion-matrix eval built on top of it. The corpus is
# ASCII, so the CJK script short-circuit never fires and the SQL twin
# reproduces the Python scoring (argmax = ORDER BY score DESC, lang
# ASC — the sorted-langs strict-greater loop).
_LANGID_SQL = """
WITH t AS (
    SELECT doc_id, lang AS claimed_lang, lower(text) AS t FROM documents
),
bg AS (
    SELECT doc_id, substring(t, CAST(i AS INTEGER), 2) AS bg
    FROM t, unnest(range(1, length(t))) AS u(i)
),
cnts AS (
    SELECT doc_id, bg, count(*) AS c FROM bg
    WHERE NOT regexp_matches(bg, '^[ \t\n\x0B\f\r]|[ \t\n\x0B\f\r]$')
    GROUP BY doc_id, bg
),
prof(lang, bg, w) AS (VALUES ('en','th',10), ('en','he',9), ('en','in',8), ('en','er',7), ('en','an',6), ('en','re',5), ('en','on',4), ('en','at',3), ('en','en',2), ('en','nd',1), ('de','en',10), ('de','er',9), ('de','ch',8), ('de','de',7), ('de','ei',6), ('de','nd',5), ('de','te',4), ('de','in',3), ('de','ie',2), ('de','ge',1), ('es','de',10), ('es','en',9), ('es','os',8), ('es','es',7), ('es','la',6), ('es','ar',5), ('es','el',4), ('es','ra',3), ('es','as',2), ('es','er',1), ('fr','es',10), ('fr','le',9), ('fr','de',8), ('fr','en',7), ('fr','re',6), ('fr','nt',5), ('fr','on',4), ('fr','er',3), ('fr','ou',2), ('fr','ai',1)),
scores AS (
    SELECT c.doc_id, p.lang, sum(c.c * p.w) AS score
    FROM cnts c JOIN prof p USING (bg)
    GROUP BY c.doc_id, p.lang
),
langs(lang) AS (VALUES ('de'), ('en'), ('es'), ('fr')),
full_scores AS (
    SELECT t.doc_id, t.claimed_lang, l.lang,
           coalesce(s.score, 0) AS score
    FROM t CROSS JOIN langs l
    LEFT JOIN scores s ON s.doc_id = t.doc_id AND s.lang = l.lang
),
pick AS (
    SELECT doc_id, claimed_lang, lang,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang ASC) AS rn
    FROM full_scores
)
SELECT doc_id, claimed_lang, lang AS predicted_lang FROM pick WHERE rn = 1
"""



def q_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount.word_count(load_table(spark, sf_dir, "documents"), "text")


def q_advanced_word_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wordcount.advanced_word_count(load_table(spark, sf_dir, "documents"), "text")


def q_heavy_hitter_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact top-20 words via the two-pass Misra-Gries candidate/verify
    shape (operators/heavyhitters.py) — exact answers at top-k cost
    without shuffling the full vocabulary."""
    from demo_flink_spark.operators.heavyhitters import topk_frequent_exact
    from demo_flink_spark.operators.wordcount import tokenize

    docs = load_table(spark, sf_dir, "documents")
    words = tokenize(docs, "text", "word").select("word")
    return topk_frequent_exact(words, "word", k=20, m=256)


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier (fasttext-style shape;
    operators/textstats.py::quality_classifier): seeded deterministic
    weights, exact integer accumulation, engine-portable logit."""
    return textstats.quality_classifier(load_table(spark, sf_dir, "documents"))


def _quality_classifier_oracle() -> str:
    from demo_flink_spark.operators.textstats import classifier_weights
    from demo_flink_spark.plans.dedup import _CANON

    wl = ", ".join(str(v) for v in classifier_weights())
    return f"""
        WITH toks AS (
            SELECT doc_id,
                   unnest(list_filter(string_split({_CANON}, ' '),
                          x -> x <> '')) AS token
            FROM documents
        ),
        W AS (SELECT [{wl}] AS wl),
        scored AS (
            SELECT doc_id,
                   wl[CAST(md5_number_upper(token) % 256 AS INT) + 1] AS wi
            FROM toks, W
        ),
        per_doc AS (
            SELECT doc_id,
                   CAST(count(*) AS BIGINT) AS n_tokens,
                   sum(wi) AS wsum
            FROM scored GROUP BY doc_id
        )
        SELECT d.doc_id,
               coalesce(p.n_tokens, 0) AS n_tokens,
               coalesce(CAST(p.wsum AS DOUBLE) / 524288.0 / p.n_tokens,
                        0.0) AS logit,
               coalesce(CAST(p.wsum AS DOUBLE) / 524288.0 / p.n_tokens,
                        0.0) > 0 AS keep
        FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """


def q_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_stats(load_table(spark, sf_dir, "documents"))


def q_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.token_count_bpe(load_table(spark, sf_dir, "documents"))


def q_curation_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end corpus curation — the composite the individual
    operators exist FOR, as one declared query: exact dedup (keep the
    min-id representative per canonical text) -> quality floor
    (>= 20 tokens) -> temperature-flattened language rebalance ->
    deterministic train/val/test assignment. Every stage is the
    already-verified operator; the oracle chains their SQL twins, so
    the whole pipeline is value-hash-checked as a unit."""
    from demo_flink_spark.operators.dedup import exact_dedup
    from demo_flink_spark.operators.sampling import dataset_split, mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    kept = docs.join(reps, "doc_id", "semi")
    stats = textstats.token_stats(kept)
    quality = stats.filter(F.col("n_tokens") >= 20).select("doc_id")
    kept = kept.join(quality, "doc_id", "semi")
    kept = mixture_resample(
        kept, "lang", "doc_id", budget_per_group=8.0, salt="cur"
    )
    split = dataset_split(kept, "doc_id")
    return kept.select("doc_id", "lang").join(split, "doc_id").select(
        "doc_id", "lang", "split"
    )


def q_pipeline_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Attrition funnel of the curation composite — the observability
    twin of `pipeline_curation_end2end`: one row per stage with how
    many documents entered, survived, and the survival ratio. This is
    the report a corpus build publishes with every run (how much did
    dedup/quality/mixture each cost us?); the stages and their
    parameters are the composite's, so the funnel's n_out chain is
    the composite's cardinality audit.

    Counts are exact longs assembled from 1-row aggregates (broadcast
    crossJoins — nothing scales with the corpus except the stage
    computations themselves, which are the already-verified
    operators); survival is one long/long IEEE division, identical on
    any engine without rounding.
    """
    from demo_flink_spark.operators.checkpointing import cut_lineage_lazy
    from demo_flink_spark.operators.dedup import exact_dedup
    from demo_flink_spark.operators.sampling import dataset_split, mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    reps = exact_dedup(docs).select(F.col("canonical_id").alias("doc_id"))
    # each stage feeds BOTH the next stage and its own count branch —
    # cut lineage or every rung recomputes the whole upstream pipeline
    s1 = docs.join(reps, "doc_id", "semi").transform(cut_lineage_lazy)
    stats = textstats.token_stats(s1)
    s2 = s1.join(
        stats.filter(F.col("n_tokens") >= 20).select("doc_id"), "doc_id", "semi"
    ).transform(cut_lineage_lazy)
    s3 = mixture_resample(
        s2, "lang", "doc_id", budget_per_group=8.0, salt="cur"
    ).transform(cut_lineage_lazy)
    s4 = s3.join(
        dataset_split(s3, "doc_id").filter(F.col("split") == "train"),
        "doc_id",
        "semi",
    )
    one = (
        docs.agg(F.count(F.lit(1)).alias("n0"))
        .crossJoin(F.broadcast(s1.agg(F.count(F.lit(1)).alias("n1"))))
        .crossJoin(F.broadcast(s2.agg(F.count(F.lit(1)).alias("n2"))))
        .crossJoin(F.broadcast(s3.agg(F.count(F.lit(1)).alias("n3"))))
        .crossJoin(F.broadcast(s4.agg(F.count(F.lit(1)).alias("n4"))))
    )
    funnel = one.selectExpr(
        "stack(4, "
        "1, 'exact_dedup', n0, n1, "
        "2, 'quality_floor', n1, n2, "
        "3, 'mixture_rebalance', n2, n3, "
        "4, 'train_split', n3, n4"
        ") AS (stage_idx, stage, n_in, n_out)"
    )
    return funnel.select(
        "stage_idx",
        "stage",
        F.col("n_in").cast("long").alias("n_in"),
        F.col("n_out").cast("long").alias("n_out"),
        (F.col("n_out") / F.col("n_in")).alias("survival"),
    )


def q_dataset_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    from demo_flink_spark.operators.sampling import dataset_split

    return dataset_split(load_table(spark, sf_dir, "documents"), "doc_id")


def q_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.quality_score(load_table(spark, sf_dir, "documents"))


def q_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lang_id_ngram(load_table(spark, sf_dir, "documents"))


def q_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Confusion matrix of the heuristic language ID against the
    claimed label — the eval step run before trusting the classifier
    as a filter: (claimed_lang, predicted_lang, n, recall_of_claimed).
    One aggregate over the lang_id projection; recall is a single
    division of exact counts."""
    from pyspark.sql.window import Window

    pred = textstats.lang_id_ngram(load_table(spark, sf_dir, "documents"))
    counts = pred.groupBy("claimed_lang", "predicted_lang").agg(
        F.count(F.lit(1)).cast("long").alias("n")
    )
    w = Window.partitionBy("claimed_lang")
    return counts.select(
        "claimed_lang",
        "predicted_lang",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias(
            "frac_of_claimed"
        ),
    )


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable md5 content fingerprint of normalized text (the
    xxhash64 variant is the 8-byte shuffle key for in-engine dedup;
    md5 is the cross-engine content address — both over the same
    canonicalization, see operators/textstats.py::doc_fingerprint)."""
    return textstats.doc_fingerprint(
        load_table(spark, sf_dir, "documents"), algo="md5"
    )


def q_tf_idf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.tf_idf_top_terms(load_table(spark, sf_dir, "documents"), k=3)


def q_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_df_frac 0.95 (not the 0.5 default): the synthetic corpus
    # draws from a ~31-token shared vocabulary where most tokens sit
    # in 50-90% of documents, so a 0.5 cut would keep almost nothing.
    return textstats.vocab_build(
        load_table(spark, sf_dir, "documents"), max_df_frac=0.95
    )



def q_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer-coverage calibration: OOV token fraction per language
    against the df-cut vocabulary built on the same corpus
    (operators/textstats.py::oov_rate_by_lang)."""
    return textstats.oov_rate_by_lang(
        load_table(spark, sf_dir, "documents"), min_df=2, max_df_frac=0.95
    )


def q_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 relevance of every document against the query terms
    {hash, join, vector} — the standard retrieval score on top of the
    shared tokenize pass (operators/search.py)."""
    from demo_flink_spark.operators.search import bm25_scores

    return bm25_scores(
        load_table(spark, sf_dir, "documents"), ["hash", "join", "vector"]
    )


def q_lm_bigram_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.lm_bigram_score(load_table(spark, sf_dir, "documents"))


def q_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet perplexity bucketing (operators/textstats.py::
    perplexity_buckets): per-language head/middle/tail terciles under
    the corpus bigram LM; tail = the gibberish/boilerplate cut."""
    return textstats.perplexity_buckets(load_table(spark, sf_dir, "documents"))


def q_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC (operators/evaluation.py::binary_auc) of the
    stopword-ratio quality signal predicting lang='en' — the
    signal-validation measurement run before any filter threshold is
    trusted. Integer Mann-Whitney midrank arithmetic; one final
    division."""
    from demo_flink_spark.operators.evaluation import binary_auc

    docs = load_table(spark, sf_dir, "documents")
    # keep=("lang",): score and label come from ONE scan — a doc-keyed
    # self-join here would shuffle the corpus against itself for a
    # column both sides already had
    scored = textstats.quality_score(docs, keep=("lang",))
    return binary_auc(
        scored, F.col("stopword_ratio"), F.col("lang") == "en"
    )


def q_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fano-factor burstiness of the top-20 corpus words
    (operators/textstats.py::word_burstiness): across-doc dispersion
    in exact integer micros; top-k via TakeOrderedAndProject."""
    return textstats.word_burstiness(load_table(spark, sf_dir, "documents"))


def q_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability bins of the stopword-ratio quality signal against
    lang='en' (operators/evaluation.py::calibration_bins) — the
    calibration companion to quality_auc_eval, all-integer micros."""
    from demo_flink_spark.operators.evaluation import calibration_bins

    docs = load_table(spark, sf_dir, "documents")
    scored = textstats.quality_score(docs, keep=("lang",))
    return calibration_bins(
        scored, F.col("stopword_ratio"), F.col("lang") == "en"
    )


def q_ece(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row expected-calibration-error headline for the
    stopword-ratio signal vs lang='en'
    (operators/evaluation.py::expected_calibration_error)."""
    from demo_flink_spark.operators.evaluation import (
        expected_calibration_error,
    )

    docs = load_table(spark, sf_dir, "documents")
    scored = textstats.quality_score(docs, keep=("lang",))
    return expected_calibration_error(
        scored, F.col("stopword_ratio"), F.col("lang") == "en"
    )


def q_ngram_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-1/2/3-gram diversity per source slice
    (operators/textstats.py::ngram_diversity): the template-spam
    detector that works on slices whose individual docs pass filters."""
    return textstats.ngram_diversity(load_table(spark, sf_dir, "documents"))


def q_token_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-doc unigram Shannon entropy (operators/textstats.py::
    token_entropy): zero-exchange higher-order exprs, portable-softln
    per term — the information-density quality signal."""
    return textstats.token_entropy(load_table(spark, sf_dir, "documents"))


def q_zipf_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf's-law OLS fit per language over the top-100 word
    frequencies (operators/textstats.py::zipf_fit_by_lang): exact
    integer sufficient statistics from softln micros, one final
    double division."""
    return textstats.zipf_fit_by_lang(load_table(spark, sf_dir, "documents"))


def q_kl_unigram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source KL divergence from the corpus unigram mixture
    (operators/textstats.py::kl_unigram_by_source): exact counts,
    softln log-ratios, decimal(38,6) term sums, round-half-away
    integer micros."""
    return textstats.kl_unigram_by_source(
        load_table(spark, sf_dir, "documents")
    )


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch-style reading-ease per document, integer-micros exact
    (operators/textstats.py::readability_scores): words / vowel-group
    syllables / sentence runs counted by anchored regexes, score and
    band from floor-divided micros."""
    return textstats.readability_scores(load_table(spark, sf_dir, "documents"))


def q_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish tokens per word and chars per token, per language
    (operators/textstats.py::tokenizer_fertility) — corpus-to-token
    budget calibration."""
    return textstats.tokenizer_fertility(load_table(spark, sf_dir, "documents"))


def q_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weighting toward the 'en' subset
    (operators/textstats.py::dsir_log_ratio): hashed-bigram
    log-likelihood ratio of target (en docs) vs source (whole corpus)
    multinomials — the importance-resampling selection signal."""
    return textstats.dsir_log_ratio(
        load_table(spark, sf_dir, "documents"), "lang", "en"
    )


def _dsir_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql
    from demo_flink_spark.plans.dedup import _CANON

    s1 = softln_ratio_sql("(ct + 1)", "(cs + 1)")
    s2 = softln_ratio_sql("(t_all + 256)", "(s_all + 256)")
    return f"""
    WITH toks AS (
        SELECT doc_id, lang,
               list_filter(string_split({_CANON}, ' '), x -> x <> '') AS t
        FROM documents
    ),
    bk AS (
        SELECT doc_id,
               CAST(md5_number_upper(bg) % 256 AS INT) AS j,
               lang = 'en' AS is_t
        FROM (
            SELECT doc_id, lang,
                   unnest(list_transform(range(1, len(t)),
                          i -> t[i] || ' ' || t[i + 1])) AS bg
            FROM toks
            WHERE len(t) >= 2
        )
    ),
    cnt AS (
        SELECT j, count(*) AS cs,
               sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS ct
        FROM bk GROUP BY j
    ),
    tot AS (SELECT sum(cs) AS s_all, sum(ct) AS t_all FROM cnt),
    lr_tbl AS (
        SELECT j, CAST(round(({s1}) - ({s2}), 6) AS DECIMAL(38,6)) AS lr
        FROM cnt, tot
    ),
    per AS (
        SELECT doc_id, count(*) AS n_feats, sum(lr) AS lr_sum
        FROM bk JOIN lr_tbl USING (j)
        GROUP BY doc_id
    ),
    fin AS (
        SELECT doc_id, n_feats,
               CAST((CASE WHEN lr_sum < 0 THEN -1 ELSE 1 END)
                    * ((abs(CAST(lr_sum * 1000000 AS HUGEINT)) * 2 + n_feats)
                       // (2 * n_feats)) AS DOUBLE) / 1000000.0 AS avg_log_ir
        FROM per
    )
    SELECT d.doc_id,
           coalesce(f.n_feats, 0) AS n_feats,
           coalesce(f.avg_log_ir, 0.0) AS avg_log_ir,
           coalesce(f.avg_log_ir, 0.0) > 0 AS keep
    FROM documents d LEFT JOIN fin f USING (doc_id)
    """


def q_posexplode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generator/UDTF surface (SURVEY §2.10 ext): posexplode keeps the
    ordinal alongside each element — the 1→N flatten with provenance
    that tokenization, chunk indexing, and span labeling all need.
    Positions index the RAW split (empties included) so they survive
    the non-empty filter as original offsets."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.posexplode(F.split("text", r"\s+")).alias("pos", "word")
    )
    return toks.filter(F.col("word") != "").select(
        "doc_id", F.col("pos").cast("long").alias("pos"), "word"
    )


def q_repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    return textstats.repetition_signals(load_table(spark, sf_dir, "documents"))


def q_repetition_removal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style intra-document repetition CUT (the transform half
    of repetition_signals): tokens covered by a repeated 5-gram window
    are deleted, cleaned canonical text emitted — a zero-shuffle
    narrow map (operators/textstats.py::remove_repeated_ngrams)."""
    return textstats.remove_repeated_ngrams(
        load_table(spark, sf_dir, "documents"), n=5
    )


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction demonstrated on deterministically synthesized PII:
    the corpus text carries no emails/phones, so both the Spark query
    and the oracle append the same doc_id-derived contact string, then
    Spark redacts via regexp and the result is compared by md5."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or call +1-555-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            F.lit(" now"),
        ).alias("text"),
    )
    return textstats.pii_scrub(docs).select(
        "doc_id", "n_emails", "n_phones", F.md5("text").alias("scrub_md5")
    )


def q_url_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """parse_url differential test: assemble a URL from row fields,
    split it with the built-in, and let the oracle derive the same
    parts directly from the fields."""
    urls = load_table(spark, sf_dir, "documents").select(
        "doc_id",
        F.concat(
            F.lit("https://"),
            F.col("source"),
            F.lit(".example.com/docs/"),
            F.col("doc_id").cast("string"),
            F.lit("?lang="),
            F.col("lang"),
            F.lit("&v=2"),
        ).alias("url"),
    )
    return textstats.url_parts(urls).select("doc_id", "host", "path", "q_lang")


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    from demo_flink_spark.operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(
        docs, "lang", "doc_id", {"en": 0.25, "zh": 0.75}, default_frac=0.5,
        salt="strat",
    ).select("doc_id", "lang")


def q_mixture_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-flattened language mixing (τ=0.5, budget 8 per
    sqrt-unit): overrepresented langs downsampled toward a flatter
    training mixture — operators/sampling.py::mixture_resample."""
    from demo_flink_spark.operators.sampling import mixture_resample

    docs = load_table(spark, sf_dir, "documents")
    return mixture_resample(
        docs, "lang", "doc_id", budget_per_group=8.0, salt="mix"
    ).select("doc_id", "lang")


def q_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted retention: longer docs kept with higher
    probability (length as the stand-in quality signal), decided
    deterministically per doc_id."""
    from demo_flink_spark.operators.sampling import weighted_sample

    docs = load_table(spark, sf_dir, "documents")
    weight = F.least(F.col("n_chars") / F.lit(500.0), F.lit(0.95))
    return weighted_sample(docs, "doc_id", weight, salt="wq").select(
        "doc_id", "n_chars"
    )


def q_systematic_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Every 20th order along the (o_orderdate, o_orderkey) total
    order (operators/sampling.py::systematic_sample): evenly-spread
    audit slice; rank via the two-phase distributed global rank."""
    from demo_flink_spark.operators.sampling import systematic_sample

    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    return systematic_sample(o, ["o_orderdate", "o_orderkey"], k=20).select(
        "o_orderkey", "o_orderdate", "rn"
    )


def q_exact_k_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-count stratified selection (operators/sampling.py::
    exact_k_per_group): exactly min(25, |lang group|) docs per
    language by md5 rank — the benchmark-subset ask a rate-based
    sample cannot answer."""
    from demo_flink_spark.operators.sampling import exact_k_per_group

    docs = load_table(spark, sf_dir, "documents")
    return exact_k_per_group(docs, k=25, group_col="lang", salt="exk")


def q_mixture_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted source-interleave schedule (operators/sampling.py::
    mixture_interleave): WFQ virtual-time order with weight
    1 + (source index mod 4) — any schedule prefix holds sources in
    weight proportion, zero RNG, one window exchange."""
    from demo_flink_spark.operators.sampling import mixture_interleave

    docs = load_table(spark, sf_dir, "documents")
    return mixture_interleave(
        docs,
        group_col="source",
        weight_of=lambda src: F.lit(1.0)
        + (F.expr("CAST(substring(source, 4) AS BIGINT)") % 4).cast("double"),
    )


def q_parse_csv_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.2 T2: parse a "ts,word" line into (long, string) with
    trim — `EventTimeWordCountDebug.java:37-42` — demonstrated by
    round-tripping synthesized lines from events."""
    ev = load_table(spark, sf_dir, "events")
    lines = ev.select(
        "event_id",
        F.concat_ws(
            ",", F.unix_millis("ts").cast("string"), F.concat(F.lit(" "), "event_type")
        ).alias("line"),
    )
    parts = F.split(F.col("line"), ",")
    return lines.select(
        "event_id",
        F.trim(parts.getItem(0)).cast("long").alias("ts_ms"),
        F.trim(parts.getItem(1)).alias("word"),
    )


def q_gopher_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality rules (operators/textstats.py::
    gopher_quality_filter) over documents with deterministic noise
    appended so every rule has both passing and failing docs: doc_id%5
    ``#tag`` words (symbol ratio), doc_id%9 numeric words (alpha
    fraction), a triple ellipsis every 7th doc, word-count floor 20
    (the corpus spans ~10-70 words)."""
    docs = load_table(spark, sf_dir, "documents")
    noisy = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.repeat(F.lit(" #tag"), (F.col("doc_id") % 5).cast("int")),
            F.repeat(F.lit(" 12345"), (F.col("doc_id") % 9).cast("int")),
            F.when(
                F.col("doc_id") % 7 == 0, F.lit(" ... ... ...")
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    from demo_flink_spark.operators.textstats import gopher_quality_filter

    return gopher_quality_filter(noisy, min_words=20)


def _gopher_oracle() -> str:
    from demo_flink_spark.operators.textstats import GOPHER_STOPWORDS

    stop_sum = " + ".join(
        f"(CASE WHEN list_contains(t, '{w}') THEN 1 ELSE 0 END)"
        for w in GOPHER_STOPWORDS
    )
    return rf"""
    WITH noisy AS (
        SELECT doc_id,
               text || repeat(' #tag', CAST(doc_id % 5 AS INT))
                    || repeat(' 12345', CAST(doc_id % 9 AS INT))
                    || CASE WHEN doc_id % 7 = 0 THEN ' ... ... ...'
                       ELSE '' END AS text
        FROM documents
    ),
    tok AS (
        SELECT doc_id, text,
               list_filter(string_split_regex(text, '\s+'),
                           w -> w <> '') AS t
        FROM noisy
    ),
    m AS (
        SELECT doc_id,
               CAST(len(t) AS BIGINT) AS n,
               CAST(coalesce(list_sum(list_transform(t, w -> length(w))), 0)
                    AS BIGINT) AS sum_len,
               CAST(len(list_filter(t, w -> regexp_matches(w, '[a-zA-Z]')))
                    AS BIGINT) AS n_alpha,
               CAST(len(regexp_extract_all(text, '#'))
                    + len(regexp_extract_all(text, '\.\.\.'))
                    AS BIGINT) AS n_sym,
               CAST({stop_sum} AS BIGINT) AS n_stop
        FROM tok
    )
    SELECT doc_id,
           n AS n_words,
           CASE WHEN n > 0 THEN CAST(sum_len AS DOUBLE) / n
                ELSE 0.0 END AS mean_word_len,
           CASE WHEN n > 0 THEN CAST(n_sym AS DOUBLE) / n
                ELSE 0.0 END AS symbol_word_ratio,
           CASE WHEN n > 0 THEN CAST(n_alpha AS DOUBLE) / n
                ELSE 0.0 END AS frac_alpha_words,
           n_stop AS n_stop_present,
           n >= 20 AND n <= 100000 AS ok_word_count,
           n > 0 AND sum_len >= 3 * n AND sum_len <= 10 * n AS ok_mean_len,
           n > 0 AND n_sym * 100 <= 10 * n AS ok_symbol,
           n > 0 AND n_alpha * 100 >= 80 * n AS ok_alpha,
           n_stop >= 2 AS ok_stop,
           (n >= 20 AND n <= 100000)
           AND (n > 0 AND sum_len >= 3 * n AND sum_len <= 10 * n)
           AND (n > 0 AND n_sym * 100 <= 10 * n)
           AND (n > 0 AND n_alpha * 100 >= 80 * n)
           AND n_stop >= 2 AS keep
    FROM m
    """


_TOKEN_BUDGETS = {"en": 4000, "de": 1500, "zh": 0}


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard per-language token-budget cut (operators/sampling.py::
    token_budget_cut): en capped at 4000 tokens, de at 1500, zh fully
    excluded, other languages unlimited — the exact-budget mixture
    recipe (vs mixture_resample's rate-based expected fraction)."""
    from demo_flink_spark.operators.sampling import token_budget_cut

    return token_budget_cut(
        load_table(spark, sf_dir, "documents"), _TOKEN_BUDGETS
    )


def _token_budget_oracle() -> str:
    whens = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in _TOKEN_BUDGETS.items()
    )
    return rf"""
    WITH cur AS (
        SELECT doc_id, lang AS grp,
               CAST(len(list_filter(string_split_regex(text, '\s+'),
                                    w -> w <> '')) AS BIGINT) AS n_tokens,
               CAST(CASE lang {whens} ELSE -1 END AS BIGINT) AS budget,
               md5('tb1' || CAST(doc_id AS VARCHAR)) AS rk
        FROM documents
    )
    SELECT doc_id, grp, n_tokens, budget,
           CAST(sum(n_tokens) OVER (PARTITION BY grp ORDER BY rk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS BIGINT) AS cum_tokens,
           budget < 0 OR sum(n_tokens) OVER (PARTITION BY grp ORDER BY rk
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                <= budget AS kept
    FROM cur
    """


def q_pmi_cooccurrence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skip-gram PMI collocations (operators/textstats.py::
    pmi_cooccurrence): window-2 unordered pairs, counts >= 3, PMI via
    the portable softln over integer products — every score
    bit-identical cross-engine."""
    return textstats.pmi_cooccurrence(load_table(spark, sf_dir, "documents"))


def _pmi_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql
    from demo_flink_spark.plans.dedup import _CANON

    num = "(c12 * n_tokens * n_tokens)"
    den = "(n_pairs * c1 * c2)"
    pos_branch = softln_ratio_sql(num, den)
    neg_branch = softln_ratio_sql(den, num)
    return f"""
    WITH base AS (
        SELECT doc_id, list_filter(string_split({_CANON}, ' '),
                                   x -> x <> '') AS t
        FROM documents
    ),
    tok AS (
        SELECT doc_id, i AS pos, t[i + 1] AS w
        FROM base, unnest(range(0, len(t))) AS u(i)
    ),
    pairs AS (
        SELECT least(a.w, b.w) AS w1, greatest(a.w, b.w) AS w2
        FROM tok a JOIN tok b
          ON a.doc_id = b.doc_id
         AND b.pos > a.pos AND b.pos <= a.pos + 2
    ),
    c12t AS (
        SELECT w1, w2, CAST(count(*) AS BIGINT) AS c12
        FROM pairs GROUP BY w1, w2
    ),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM tok GROUP BY w),
    tot AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM tok) AS n_tokens,
                   (SELECT CAST(count(*) AS BIGINT) FROM pairs) AS n_pairs),
    scored AS (
        SELECT w1, w2, c12, u1.c AS c1, u2.c AS c2, n_tokens, n_pairs
        FROM c12t
        JOIN uni u1 ON u1.w = c12t.w1
        JOIN uni u2 ON u2.w = c12t.w2
        CROSS JOIN tot
        WHERE c12 >= 3
    )
    SELECT w1, w2, c12, c1, c2,
           CASE WHEN {num} <= {den} THEN {pos_branch}
                ELSE -({neg_branch}) END AS pmi
    FROM scored
    """


_PERCEPTRON_ITERS = 3


def q_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed batch-perceptron training (operators/training.py::
    perceptron_train): 3 parameter-server iterations over hashed
    bag-of-words features, lang=='en' as the positive class — every
    weight, margin and update is an integer, so the trained margins
    are engine-exact and the whole training loop is value-hash
    checked against the oracle's unrolled CTE iterations."""
    from demo_flink_spark.operators.training import perceptron_train

    return perceptron_train(
        load_table(spark, sf_dir, "documents"), n_iters=_PERCEPTRON_ITERS
    )


def _perceptron_oracle(n_iters: int = _PERCEPTRON_ITERS) -> str:
    from demo_flink_spark.plans.dedup import _CANON

    ctes = [
        rf"""toks AS (
        SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE -1 END AS y,
               unnest(list_filter(string_split({_CANON}, ' '),
                                  x -> x <> '')) AS token
        FROM documents
    ),
    feats AS (
        SELECT doc_id, y,
               CAST(md5_number_upper(token) % 256 AS INT) AS j,
               count(*) AS cnt
        FROM toks GROUP BY doc_id, y, j
    ),
    w1 AS (SELECT j, sum(y * cnt) AS w FROM feats GROUP BY j)"""
    ]
    for t in range(2, n_iters + 1):
        ctes.append(
            f"""m{t - 1} AS (
        SELECT f.doc_id, f.y, sum(w{t - 1}.w * f.cnt) AS m
        FROM feats f JOIN w{t - 1} USING (j) GROUP BY f.doc_id, f.y
    ),
    d{t} AS (
        SELECT j, sum(y * cnt) AS dw FROM feats
        WHERE doc_id IN (SELECT doc_id FROM m{t - 1} WHERE y * m <= 0)
        GROUP BY j
    ),
    w{t} AS (
        SELECT coalesce(a.j, b.j) AS j,
               coalesce(a.w, 0) + coalesce(b.dw, 0) AS w
        FROM w{t - 1} a FULL JOIN d{t} b ON a.j = b.j
    )"""
        )
    ctes.append(
        f"""mf AS (
        SELECT f.doc_id, sum(w{n_iters}.w * f.cnt) AS m
        FROM feats f JOIN w{n_iters} USING (j) GROUP BY f.doc_id
    )"""
    )
    body = ",\n    ".join(ctes)
    return f"""
    WITH {body}
    SELECT d.doc_id,
           CASE WHEN d.lang = 'en' THEN 1 ELSE -1 END AS label,
           CAST(coalesce(mf.m, 0) AS BIGINT) AS margin,
           coalesce(mf.m, 0) > 0 AS pred,
           (coalesce(mf.m, 0) > 0)
             = (CASE WHEN d.lang = 'en' THEN 1 ELSE -1 END > 0) AS correct
    FROM documents d LEFT JOIN mf ON d.doc_id = mf.doc_id
    """



def q_textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 corpus keywords by TextRank (Mihalcea & Tarau 2004) —
    operators/textstats.py::textrank_keywords: PageRank over the
    window-2 word co-occurrence graph, reference stopwords removed,
    Q52 bit-exact ranks, deterministic (rank DESC, word ASC) top-k."""
    return textstats.textrank_keywords(
        load_table(spark, sf_dir, "documents"), k=20, n_iter=6
    )


def _textrank_oracle() -> str:
    from demo_flink_spark.operators.wordcount import STOPWORDS
    from demo_flink_spark.plans.graph import pagerank_oracle_sql

    sw = ", ".join(f"'{w}'" for w in STOPWORDS)
    edge_cte = f"""
        WITH toks AS (
            SELECT regexp_extract_all(lower(text), '[a-z]+') AS ts
            FROM documents
        ),
        adj AS (
            SELECT DISTINCT ts[i] AS a, ts[i + 1] AS b
            FROM toks, LATERAL unnest(range(1, len(ts))) AS u(i)
            WHERE ts[i] <> ts[i + 1]
              AND ts[i] NOT IN ({sw}) AND ts[i + 1] NOT IN ({sw})
        ),
        e AS (
            SELECT a AS src, b AS dst FROM adj
            UNION
            SELECT b AS src, a AS dst FROM adj
        )"""
    final = """
        SELECT node AS word, rank FROM r6
        ORDER BY rank DESC, node ASC
        LIMIT 20
    """
    return pagerank_oracle_sql(edge_cte, final, n_iter=6, damping=0.85)


SPECS = [
    QuerySpec(
        "word_count",
        q_word_count,
        oracle=r"""
        SELECT word, count(*) AS cnt
        FROM (
            SELECT unnest(string_split_regex(text, '\s+')) AS word
            FROM documents
        )
        WHERE length(word) > 0
        GROUP BY word
        """,
    ),
    QuerySpec(
        "heavy_hitter_words",
        q_heavy_hitter_words,
        oracle=r"""
        WITH words AS (
            SELECT unnest(string_split_regex(text, '\s+')) AS word
            FROM documents
        ),
        counts AS (
            SELECT word, count(*) AS cnt FROM words
            WHERE length(word) > 0 GROUP BY word
        )
        SELECT word AS value, cnt,
               row_number() OVER (ORDER BY cnt DESC, word ASC) AS rk,
               (SELECT CAST(sum(cnt) // 257 AS BIGINT) FROM counts) AS threshold
        FROM counts
        ORDER BY rk LIMIT 20
        """,
    ),
    QuerySpec(
        "quality_classifier_score",
        q_quality_classifier,
        oracle=_quality_classifier_oracle(),
    ),
    QuerySpec(
        "advanced_word_count",
        q_advanced_word_count,
        oracle=rf"""
        SELECT word, count(*) AS cnt
        FROM (
            SELECT unnest(string_split_regex(
                regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+')) AS word
            FROM documents
        )
        WHERE length(word) > 0 AND word NOT IN ({_STOPWORDS_SQL})
        GROUP BY word
        """,
    ),
    QuerySpec(
        "scalar_posexplode",
        q_posexplode_tokens,
        oracle=r"""
        WITH s AS (
            SELECT doc_id, string_split_regex(text, '\s+') AS t FROM documents
        )
        SELECT doc_id, i AS pos, t[i + 1] AS word
        FROM s, unnest(range(0, len(t))) AS u(i)
        WHERE t[i + 1] <> ''
        """,
    ),
    QuerySpec(
        "lm_bigram_score",
        q_lm_bigram_score,
        # per-element softln (portable series, bit-identical across
        # engines — libm ln() ulp drift flipped a 6-dp boundary at
        # sf0.1) rounded to 6 decimals before the decimal sum
        oracle=_LM_BIGRAM_SQL,
    ),
    QuerySpec(
        "dsir_importance_weights",
        q_dsir_importance,
        oracle=_dsir_oracle(),
    ),
    QuerySpec(
        "vocab_min_max_df",
        q_vocab,
        oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   unnest(list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
                       w -> length(w) > 0)) AS token
            FROM documents
        )
        SELECT token,
               count(DISTINCT doc_id) AS df,
               count(*) AS tf_total
        FROM tok
        GROUP BY token
        HAVING count(DISTINCT doc_id) >= 2
           AND count(DISTINCT doc_id)
               <= CAST(floor(0.95 * (SELECT count(*) FROM documents)) AS BIGINT)
        """,
    ),
    QuerySpec(
        "oov_rate_by_lang",
        q_oov_rate,
        # oov_rate is round-half-away integer division at 6 dp on both
        # engines (HUGEINT // in DuckDB, decimal div in Spark) — no
        # round-on-double anywhere
        oracle=r"""
        WITH tok AS (
            SELECT doc_id, lang,
                   unnest(list_filter(string_split_regex(
                       regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
                       w -> length(w) > 0)) AS token
            FROM documents
        ),
        vocab AS (
            SELECT token FROM tok GROUP BY token
            HAVING count(DISTINCT doc_id) >= 2
               AND count(DISTINCT doc_id)
                   <= CAST(floor(0.95 * (SELECT count(*) FROM documents))
                           AS BIGINT)
        ),
        agg AS (
            SELECT lang, count(*) AS n_tokens,
                   count(*) FILTER (
                       WHERE token NOT IN (SELECT token FROM vocab)
                   ) AS n_oov
            FROM tok GROUP BY lang
        )
        SELECT lang,
               CAST(n_tokens AS BIGINT) AS n_tokens,
               CAST(n_oov AS BIGINT) AS n_oov,
               CAST((CAST(n_oov AS HUGEINT) * 2000000 + n_tokens)
                    // (2 * CAST(n_tokens AS HUGEINT)) AS DOUBLE)
                   / 1000000.0 AS oov_rate
        FROM agg
        """,
    ),
    QuerySpec(
        "token_stats",
        q_token_stats,
        oracle=r"""
        SELECT doc_id,
               len(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0))
                   AS n_tokens,
               length(text) AS n_chars_measured
        FROM documents
        """,
    ),
    QuerySpec(
        "quality_score",
        q_quality_score,
        oracle=rf"""
        WITH tok AS (
            SELECT doc_id, text,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        )
        SELECT doc_id,
               len(toks) AS n_tokens,
               round(CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE len(list_filter(toks, w -> w IN ({_STOPWORDS_SQL})))
                          / CAST(len(toks) AS DOUBLE) END, 6) AS stopword_ratio,
               round(length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g'))
                     / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
               round(CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE len(list_distinct(toks)) / CAST(len(toks) AS DOUBLE) END, 6)
                   AS distinct_ratio
        FROM tok
        """,
    ),
    QuerySpec(
        # Fano = (N·Σc² − (Σc)²)/(N·Σc) per top word, round-half-away
        # micros; the oracle repeats the same cleared-fraction form
        "word_burstiness_top20",
        q_burstiness,
        oracle="""
        WITH wc AS (
            SELECT word, doc_id, CAST(count(*) AS BIGINT) AS c
            FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z]+'))
                           AS word
                FROM documents
            ) t GROUP BY 1, 2
        ),
        nd AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
        pw AS (
            SELECT word, CAST(sum(c) AS BIGINT) AS sc,
                   CAST(sum(c * c) AS BIGINT) AS sc2,
                   CAST(count(*) AS BIGINT) AS n_docs_with
            FROM wc GROUP BY word
        ),
        top AS (
            SELECT * FROM pw ORDER BY sc DESC, word LIMIT 20
        )
        SELECT word, sc AS n_occurrences, n_docs_with,
               ((n * sc2 - sc * sc) * 2000000 + n * sc)
                   // (2 * n * sc) AS fano_micros
        FROM top CROSS JOIN nd
        """,
    ),
    QuerySpec(
        # same stopword-ratio construction as the quality_score
        # oracle, then integer-micros binning — no float boundary
        "quality_calibration_bins",
        q_calibration,
        oracle=rf"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        ),
        scored AS (
            SELECT lang,
                   round(CASE WHEN len(toks) = 0 THEN 0.0
                         ELSE len(list_filter(toks,
                                  w -> w IN ({_STOPWORDS_SQL})))
                              / CAST(len(toks) AS DOUBLE) END, 6) AS s
            FROM tok
        ),
        m AS (
            SELECT CAST(CAST(s AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                       AS sm,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
            FROM scored
        ),
        b AS (
            SELECT CAST(least(sm // 100000, 9) AS INTEGER) AS bin, sm, p
            FROM m
        )
        SELECT bin,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(p) AS BIGINT) AS n_pos,
               CAST((CAST(sum(sm) AS HUGEINT) * 2 + count(*))
                    // (2 * count(*)) AS BIGINT) AS mean_score_micros,
               CAST((CAST(sum(p) AS HUGEINT) * 2000000 + count(*))
                    // (2 * count(*)) AS BIGINT) AS pos_rate_micros
        FROM b GROUP BY bin
        """,
    ),
    QuerySpec(
        # ECE over the same bins; the final division round-half-away
        "quality_ece",
        q_ece,
        oracle=rf"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        ),
        scored AS (
            SELECT lang,
                   round(CASE WHEN len(toks) = 0 THEN 0.0
                         ELSE len(list_filter(toks,
                                  w -> w IN ({_STOPWORDS_SQL})))
                              / CAST(len(toks) AS DOUBLE) END, 6) AS s
            FROM tok
        ),
        m AS (
            SELECT CAST(CAST(s AS DECIMAL(38,6)) * 1000000 AS BIGINT)
                       AS sm,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS p
            FROM scored
        ),
        b AS (
            SELECT least(sm // 100000, 9) AS bin, sm, p FROM m
        ),
        bins AS (
            SELECT bin,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST((CAST(sum(sm) AS HUGEINT) * 2 + count(*))
                        // (2 * count(*)) AS BIGINT) AS msm,
                   CAST((CAST(sum(p) AS HUGEINT) * 2000000 + count(*))
                        // (2 * count(*)) AS BIGINT) AS prm
            FROM b GROUP BY bin
        )
        SELECT CAST(count(*) AS BIGINT) AS n_bins_used,
               CAST(sum(n) AS BIGINT) AS n,
               CAST((CAST(sum(n * abs(msm - prm)) AS HUGEINT) * 2
                     + sum(n)) // (2 * sum(n)) AS BIGINT) AS ece_micros
        FROM bins
        """,
    ),
    QuerySpec(
        "lang_id",
        q_lang_id,
        # mirrors the bigram scorer exactly (see _LANGID_SQL)
        oracle=_LANGID_SQL,
    ),
    QuerySpec(
        "doc_fingerprint",
        q_fingerprint,
        oracle=r"""
        WITH canon AS (
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z\s]', '', 'g'),
                       '\s+', ' ', 'g')) AS c
            FROM documents
        )
        SELECT doc_id, md5(c) AS fingerprint,
               CAST(length(c) AS BIGINT) AS canonical_len
        FROM canon
        """,
    ),
    QuerySpec(
        "parse_csv_line",
        q_parse_csv_line,
        oracle="""
        SELECT event_id,
               CAST(trim(string_split(line, ',')[1]) AS BIGINT) AS ts_ms,
               trim(string_split(line, ',')[2]) AS word
        FROM (
            SELECT event_id,
                   concat(CAST(epoch_ms(ts) AS VARCHAR), ',', ' ', event_type) AS line
            FROM events
        )
        """,
    ),
    QuerySpec(
        "tf_idf_top3",
        q_tf_idf,
        oracle=rf"""
        WITH tokens AS (
            SELECT doc_id, unnest(list_filter(
                string_split_regex(regexp_replace(lower(text), '[^a-z\s]', '', 'g'),
                                   '\s+'), w -> length(w) > 0)) AS word
            FROM documents
        ),
        tf AS (
            SELECT doc_id, word, count(*) AS tf
            FROM tokens
            WHERE word NOT IN ({_STOPWORDS_SQL})
            GROUP BY doc_id, word
        ),
        df AS (
            SELECT word, count(DISTINCT doc_id) AS df FROM tf GROUP BY word
        ),
        n AS (SELECT count(*) AS n_docs FROM documents),
        scored AS (
            SELECT tf.doc_id, tf.word,
                   round(tf.tf * (- {softln_ratio_sql('(df.df + 1)', '(n.n_docs + 1)')}), 6) AS tfidf,
                   row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * (- {softln_ratio_sql('(df.df + 1)', '(n.n_docs + 1)')}) DESC,
                                tf.word ASC
                   ) AS rk
            FROM tf JOIN df USING (word) CROSS JOIN n
        )
        SELECT doc_id, word, tfidf, rk
        FROM scored WHERE rk <= 3
        """,
    ),
    QuerySpec(
        "token_count_bpe",
        q_token_count_bpe,
        oracle=r"""
        SELECT doc_id,
               len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))
                   AS n_bpe_tokens,
               len(list_filter(string_split_regex(text, '\s+'), w -> length(w) > 0))
                   AS n_ws_tokens
        FROM documents
        """,
    ),
    QuerySpec(
        "repetition_signals",
        q_repetition_signals,
        oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        ),
        g AS (
            SELECT doc_id,
                   list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1]) AS bg,
                   list_transform(generate_series(1, len(toks) - 4),
                                  i -> concat_ws(' ', toks[i], toks[i + 1],
                                                 toks[i + 2], toks[i + 3],
                                                 toks[i + 4])) AS ng
            FROM tok
        )
        SELECT doc_id,
               round(CASE WHEN len(bg) > 0 THEN
                   list_max(list_transform(list_distinct(bg),
                            x -> len(list_filter(bg, y -> y = x))))
                   / CAST(len(bg) AS DOUBLE) ELSE 0.0 END, 6)
                   AS top_bigram_frac,
               round(CASE WHEN len(ng) > 0 THEN
                   (len(ng) - len(list_distinct(ng)))
                   / CAST(len(ng) AS DOUBLE) ELSE 0.0 END, 6)
                   AS dup_ngram_frac
        FROM g
        """,
    ),
    QuerySpec(
        "repetition_removal",
        q_repetition_removal,
        # same 5-gram windows as repetition_signals' dup_ngram_frac;
        # 1-based list positions here mirror the engine's 0-based
        # window/token indices exactly (window i repeats iff its
        # n-gram's first occurrence is earlier; covered = union of
        # [i, i+4] over repeat windows)
        oracle=r"""
        WITH tok AS (
            SELECT doc_id,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS t
            FROM documents
        ),
        g AS (
            SELECT doc_id, t,
                   list_transform(generate_series(1, len(t) - 4),
                                  i -> concat_ws(' ', t[i], t[i + 1],
                                                 t[i + 2], t[i + 3],
                                                 t[i + 4])) AS gr
            FROM tok
        ),
        r AS (
            SELECT doc_id, t,
                   list_filter(generate_series(1, len(gr)),
                               i -> list_position(gr, gr[i]) < i) AS rep
            FROM g
        ),
        c AS (
            SELECT doc_id, t,
                   list_distinct(flatten(list_transform(
                       rep, i -> generate_series(i, i + 4)))) AS cov
            FROM r
        )
        SELECT doc_id,
               len(t) AS n_tokens,
               len(cov) AS n_removed,
               array_to_string(list_transform(
                   list_filter(generate_series(1, len(t)),
                               p -> NOT list_contains(cov, p)),
                   p -> t[p]), ' ') AS cleaned_text
        FROM c
        """,
    ),
    QuerySpec(
        "pii_scrub",
        q_pii_scrub,
        oracle=rf"""
        WITH synth AS (
            SELECT doc_id,
                   text || ' contact user' || CAST(doc_id AS VARCHAR)
                        || '@mail.example.com or call +1-555-'
                        || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                        || ' now' AS text
            FROM documents
        ),
        e AS (
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       '{textstats.EMAIL_PATTERN}')) AS n_emails,
                   regexp_replace(text, '{textstats.EMAIL_PATTERN}',
                                  '<EMAIL>', 'g') AS t1
            FROM synth
        )
        SELECT doc_id, n_emails,
               len(regexp_extract_all(t1, '{textstats.PHONE_PATTERN}'))
                   AS n_phones,
               md5(regexp_replace(t1, '{textstats.PHONE_PATTERN}',
                                  '<PHONE>', 'g')) AS scrub_md5
        FROM e
        """,
    ),
    QuerySpec(
        "url_extract",
        q_url_extract,
        oracle="""
        SELECT doc_id,
               source || '.example.com' AS host,
               '/docs/' || CAST(doc_id AS VARCHAR) AS path,
               lang AS q_lang
        FROM documents
        """,
    ),
    QuerySpec(
        # every 20th order along the (date, key) total order — the
        # survey-sampling systematic design; rank assignment is the
        # two-phase distributed global rank, never a single-partition
        # Window (operators/sampling.py::systematic_sample)
        "sample_systematic_orders",
        q_systematic_sample,
        oracle="""
        SELECT o_orderkey, o_orderdate, rn FROM (
            SELECT o_orderkey, o_orderdate,
                   CAST(row_number() OVER (
                       ORDER BY o_orderdate, o_orderkey
                   ) AS BIGINT) AS rn
            FROM orders
        ) t WHERE (rn - 1) % 20 = 0
        """,
    ),
    QuerySpec(
        # exactly 25 per lang by (md5 hex, id) rank — rn is the
        # stable selection rank
        "sample_exact_k_per_group",
        q_exact_k_per_group,
        oracle="""
        SELECT doc_id, grp, rn FROM (
            SELECT doc_id, lang AS grp,
                   CAST(row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5('exk' || CAST(doc_id AS VARCHAR)) ASC,
                                doc_id ASC
                   ) AS BIGINT) AS rn
            FROM documents
        ) t WHERE rn <= 25
        """,
    ),
    QuerySpec(
        # per-stratum md5-threshold keep: en 25% (hex < '40'),
        # zh 75% (< 'c0'), others 50% (< '80') — salt 'strat'
        "stratified_sample_by_lang",
        q_stratified_sample,
        oracle="""
        SELECT doc_id, lang
        FROM documents
        WHERE substring(md5('strat' || CAST(doc_id AS VARCHAR)), 1, 2) <
              CASE lang WHEN 'en' THEN '40' WHEN 'zh' THEN 'c0'
                        ELSE '80' END
        """,
    ),
    QuerySpec(
        # keep rate per lang = min(1, 8/sqrt(n_lang)); md5-bucket keep,
        # salt 'mix' — sqrt is correctly rounded everywhere, so the keep
        # set is engine-exact
        "mixture_resample_lang",
        q_mixture_resample,
        oracle="""
        WITH sizes AS (
            SELECT lang, count(*) AS n_g FROM documents GROUP BY lang
        ),
        rates AS (
            SELECT lang, least(1.0, 8.0 / sqrt(n_g)) AS keep_rate
            FROM sizes
        )
        SELECT doc_id, d.lang
        FROM documents d JOIN rates r ON d.lang = r.lang
        WHERE (strpos('0123456789abcdef',
                      substring(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
              * 16 +
              strpos('0123456789abcdef',
                     substring(md5('mix' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1
              < keep_rate * 256
        """,
    ),
    QuerySpec(
        # md5 bucket decoded via hex-char position (portable hex→int);
        # weight = min(n_chars/500, 0.95)
        "weighted_sample_quality",
        q_weighted_sample,
        oracle="""
        SELECT doc_id, n_chars
        FROM documents
        WHERE (strpos('0123456789abcdef',
                      substring(md5('wq' || CAST(doc_id AS VARCHAR)), 1, 1)) - 1)
              * 16 +
              strpos('0123456789abcdef',
                     substring(md5('wq' || CAST(doc_id AS VARCHAR)), 2, 1)) - 1
              < least(n_chars / 500.0, 0.95) * 256
        """,
    ),
    QuerySpec(
        # four verified stages chained; grouping by canonical TEXT in
        # the oracle vs xxhash64(text) in the engine is equivalent
        # absent 64-bit collisions
        "pipeline_curation_end2end",
        q_curation_pipeline,
        oracle="""
        WITH canon AS (
            SELECT doc_id, text, lang,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z\\s]', '', 'g'), '\\s+', ' ', 'g')) AS c
            FROM documents
        ),
        reps AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY c),
        kept AS (
            SELECT d.doc_id, d.text, d.lang
            FROM canon d JOIN reps USING (doc_id)
            WHERE len(list_filter(string_split_regex(d.text, '\\s+'),
                                  t -> length(t) > 0)) >= 20
        ),
        sizes AS (SELECT lang, count(*) AS n_g FROM kept GROUP BY lang),
        rates AS (
            SELECT lang, least(1.0, 8.0 / sqrt(n_g)) AS keep_rate FROM sizes
        ),
        mixed AS (
            SELECT k.doc_id, k.lang
            FROM kept k JOIN rates r ON k.lang = r.lang
            WHERE (strpos('0123456789abcdef',
                          substring(md5('cur' || CAST(k.doc_id AS VARCHAR)), 1, 1)) - 1)
                  * 16 +
                  strpos('0123456789abcdef',
                         substring(md5('cur' || CAST(k.doc_id AS VARCHAR)), 2, 1)) - 1
                  < r.keep_rate * 256
        )
        SELECT doc_id, lang,
               CASE WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                    WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e7'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM mixed
""",
    ),
    QuerySpec(
        # funnel over the composite's stages: the oracle chains the
        # SAME CTEs as pipeline_curation_end2end and counts each rung
        "pipeline_attrition_funnel",
        q_pipeline_attrition,
        oracle="""
        WITH canon AS (
            SELECT doc_id, text, lang,
                   trim(regexp_replace(regexp_replace(lower(text), '[^a-z\\s]', '', 'g'), '\\s+', ' ', 'g')) AS c
            FROM documents
        ),
        reps AS (SELECT min(doc_id) AS doc_id FROM canon GROUP BY c),
        s1 AS (SELECT d.doc_id, d.text, d.lang FROM canon d JOIN reps USING (doc_id)),
        s2 AS (
            SELECT doc_id, lang FROM s1
            WHERE len(list_filter(string_split_regex(text, '\\s+'),
                                  t -> length(t) > 0)) >= 20
        ),
        sizes AS (SELECT lang, count(*) AS n_g FROM s2 GROUP BY lang),
        rates AS (
            SELECT lang, least(1.0, 8.0 / sqrt(n_g)) AS keep_rate FROM sizes
        ),
        s3 AS (
            SELECT k.doc_id FROM s2 k JOIN rates r ON k.lang = r.lang
            WHERE (strpos('0123456789abcdef',
                          substring(md5('cur' || CAST(k.doc_id AS VARCHAR)), 1, 1)) - 1)
                  * 16 +
                  strpos('0123456789abcdef',
                         substring(md5('cur' || CAST(k.doc_id AS VARCHAR)), 2, 1)) - 1
                  < r.keep_rate * 256
        ),
        s4 AS (
            SELECT doc_id FROM s3
            WHERE substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
        ),
        n AS (
            SELECT (SELECT count(*) FROM documents) AS n0,
                   (SELECT count(*) FROM s1) AS n1,
                   (SELECT count(*) FROM s2) AS n2,
                   (SELECT count(*) FROM s3) AS n3,
                   (SELECT count(*) FROM s4) AS n4
        )
        SELECT stage_idx, stage,
               CAST(n_in AS BIGINT) AS n_in,
               CAST(n_out AS BIGINT) AS n_out,
               CAST(n_out AS DOUBLE) / n_in AS survival
        FROM (
            SELECT 1 AS stage_idx, 'exact_dedup' AS stage, n0 AS n_in, n1 AS n_out FROM n
            UNION ALL
            SELECT 2, 'quality_floor', n1, n2 FROM n
            UNION ALL
            SELECT 3, 'mixture_rebalance', n2, n3 FROM n
            UNION ALL
            SELECT 4, 'train_split', n3, n4 FROM n
        )
        """,
    ),
    QuerySpec(
        # deterministic md5-threshold split (operators/sampling.py):
        # train < 0xcd (205/256 ~ 80%), val < 0xe7 (+26/256 ~ 10%)
        "dataset_split_assign",
        q_dataset_split,
        oracle="""
        SELECT doc_id,
               CASE WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 2) < 'cd'
                    THEN 'train'
                    WHEN substring(md5('v1' || CAST(doc_id AS VARCHAR)), 1, 2) < 'e7'
                    THEN 'val'
                    ELSE 'test' END AS split
        FROM documents
        """,
    ),
    QuerySpec(
        "bm25_hash_join_vector",
        q_bm25,
        # constants mirror the Spark side bit-for-bit: k1=1.2, b=0.75,
        # k1+1=2.2 and 1-b=0.25 are exact double round-trips; idf uses
        # the engine-portable softln (integer ratio (2N+2)/(2df+1)),
        # rounded to 9 dp per element before the decimal-exact sum
        oracle=rf"""
        WITH toks AS (
            SELECT doc_id, unnest(list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
                w -> length(w) > 0)) AS term
            FROM documents
        ),
        dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
        stats AS (SELECT count(*) AS n_docs,
                         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
                  FROM dl),
        tf AS (SELECT doc_id, term, count(*) AS tf FROM toks
               WHERE term IN ('hash', 'join', 'vector')
               GROUP BY doc_id, term),
        idf AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
        scored AS (
            SELECT tf.doc_id,
                   round(- {softln_ratio_sql('(2 * df + 1)', '(2 * n_docs + 2)')}, 9)
                     * ((tf * 2.2)
                        / (tf + 1.2 * (0.25 + 0.75 * dl.dl / avgdl)))
                     AS term_score
            FROM tf JOIN idf USING (term) JOIN dl USING (doc_id)
            CROSS JOIN stats
        )
        SELECT doc_id, CAST(count(*) AS BIGINT) AS n_matched,
               CAST(sum(CAST(term_score AS DECIMAL(38,6))) AS DOUBLE)
                 AS score
        FROM scored GROUP BY doc_id
        """,
    ),
    QuerySpec("gopher_quality_filter", q_gopher_quality, oracle=_gopher_oracle()),
    QuerySpec(
        "perceptron_quality_train", q_perceptron_train, oracle=_perceptron_oracle()
    ),
    QuerySpec("pmi_cooccurrence", q_pmi_cooccurrence, oracle=_pmi_oracle()),
    QuerySpec(
        "token_budget_mixture", q_token_budget, oracle=_token_budget_oracle()
    ),
    QuerySpec(
        # CCNet-style per-language perplexity terciles over the bigram
        # LM (lm CTE reused verbatim): bucket edges are integer rank
        # arithmetic over a tie-broken total order, no float quantile
        "perplexity_bucket_filter",
        q_perplexity_buckets,
        oracle=f"""
        WITH lm AS ({_LM_BIGRAM_SQL}),
        lab AS (
            SELECT lm.doc_id, d.lang, lm.avg_logp
            FROM lm JOIN documents d USING (doc_id)
        ),
        rk AS (
            SELECT doc_id, lang, avg_logp,
                   row_number() OVER (PARTITION BY lang
                                      ORDER BY avg_logp DESC, doc_id ASC)
                       AS rnk,
                   count(*) OVER (PARTITION BY lang) AS n_grp
            FROM lab
        )
        SELECT doc_id, lang, avg_logp,
               CASE WHEN rnk * 3 <= n_grp THEN 'head'
                    WHEN rnk * 3 <= 2 * n_grp THEN 'middle'
                    ELSE 'tail' END AS ppl_bucket,
               CASE WHEN rnk * 3 <= n_grp THEN 'head'
                    WHEN rnk * 3 <= 2 * n_grp THEN 'middle'
                    ELSE 'tail' END <> 'tail' AS is_kept
        FROM rk
        """,
    ),
    QuerySpec(
        # Mann-Whitney with midranks: integer counting end-to-end, one
        # double division at the very last step — tie handling is
        # engine-exact by construction
        "quality_auc_eval",
        q_quality_auc,
        oracle=rf"""
        WITH tok AS (
            SELECT doc_id, lang,
                   list_filter(string_split_regex(lower(text), '\s+'),
                               w -> length(w) > 0) AS toks
            FROM documents
        ),
        scored AS (
            SELECT round(CASE WHEN len(toks) = 0 THEN 0.0
                     ELSE len(list_filter(toks, w -> w IN ({_STOPWORDS_SQL})))
                          / CAST(len(toks) AS DOUBLE) END, 6) AS s,
                   CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
            FROM tok
        ),
        by_score AS (
            SELECT s, count(*) AS n_s, sum(y) AS p_s
            FROM scored GROUP BY s
        ),
        ranked AS (
            SELECT s, n_s, p_s,
                   coalesce(sum(n_s) OVER (
                       ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
                       AND 1 PRECEDING), 0) AS c_less
            FROM by_score
        ),
        agg AS (
            SELECT CAST(sum(p_s) AS BIGINT) AS n_pos,
                   CAST(sum(n_s) - sum(p_s) AS BIGINT) AS n_neg,
                   CAST(sum(p_s * (2 * c_less + n_s + 1)) AS BIGINT)
                       AS two_r_pos
            FROM ranked
        )
        SELECT n_pos, n_neg,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   CAST(two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
                   / (2 * n_pos * n_neg) END AS auc,
               CASE WHEN n_pos > 0 AND n_neg > 0 THEN
                   2 * (CAST(two_r_pos - n_pos * (n_pos + 1) AS DOUBLE)
                        / (2 * n_pos * n_neg)) - 1 END AS gini
        FROM agg
        """,
    ),
    QuerySpec(
        # distinct-n diversity per source slice: n-gram emission via
        # correlated lateral unnest, ratios are single divisions of
        # exact counts
        "ngram_diversity_by_source",
        q_ngram_diversity,
        oracle=r"""
        WITH toks AS (
            SELECT source,
                   list_filter(string_split(trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z\s]', '', 'g'),
                       '\s+', ' ', 'g')), ' '), x -> x <> '') AS t
            FROM documents
        ),
        g AS (
            SELECT source AS grp, nn.n AS n,
                   array_to_string(list_slice(t, ii.i + 1, ii.i + nn.n), ' ')
                       AS gram
            FROM toks,
                 unnest([1, 2, 3]) AS nn(n),
                 unnest(range(0, greatest(len(t) - nn.n + 1, 0))) AS ii(i)
        )
        SELECT grp AS source, CAST(n AS INTEGER) AS n,
               CAST(count(*) AS BIGINT) AS n_total,
               CAST(count(DISTINCT gram) AS BIGINT) AS n_distinct,
               count(DISTINCT gram) / CAST(count(*) AS DOUBLE) AS diversity
        FROM g GROUP BY grp, n
        """,
    ),
    QuerySpec(
        # the lang_id SQL twin reused as a CTE; matrix counts + recall
        "langid_confusion_matrix",
        q_langid_confusion,
        oracle=f"""
        WITH pred AS ({_LANGID_SQL}),
        counts AS (
            SELECT claimed_lang, predicted_lang,
                   CAST(count(*) AS BIGINT) AS n
            FROM pred GROUP BY claimed_lang, predicted_lang
        )
        SELECT claimed_lang, predicted_lang, n,
               CAST(n AS DOUBLE)
               / sum(n) OVER (PARTITION BY claimed_lang)
                   AS frac_of_claimed
        FROM counts
        """,
    ),
    QuerySpec(
        # WFQ virtual time: integer rank / literal double weight — one
        # IEEE division, full-precision hashable
        "mixture_interleave_schedule",
        q_mixture_interleave,
        oracle="""
        SELECT doc_id, source,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix1' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS BIGINT) AS src_rank,
               CAST(row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5('mix1' || CAST(doc_id AS VARCHAR)), doc_id
               ) AS DOUBLE)
               / (1.0 + CAST(substring(source, 4) AS BIGINT) % 4)
                   AS virtual_time
        FROM documents
        """,
    ),
    QuerySpec(
        # the oracle runs the explode+groupBy twin of the zero-exchange
        # array-expr plan — same per-term values, different shape
        "token_entropy",
        q_token_entropy,
        oracle=rf"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split(trim(regexp_replace(
                regexp_replace(lower(text), '[^a-z\s]', '', 'g'),
                '\s+', ' ', 'g')), ' '), x -> x <> '') AS t
            FROM documents
        ),
        tok AS (SELECT doc_id, unnest(t) AS w FROM toks),
        c AS (SELECT doc_id, w, count(*) AS c FROM tok GROUP BY doc_id, w),
        nn AS (SELECT doc_id, CAST(len(t) AS BIGINT) AS n,
                      CAST(len(list_distinct(t)) AS BIGINT) AS d
               FROM toks),
        s AS (
            SELECT c.doc_id,
                   sum(CAST(c.c * round({softln_ratio_sql('c.c', 'nn.n')}, 6)
                            AS DECIMAL(38,6))) AS s
            FROM c JOIN nn ON c.doc_id = nn.doc_id
            GROUP BY c.doc_id
        )
        SELECT nn.doc_id, nn.n AS n_tokens, nn.d AS n_distinct,
               CASE WHEN nn.n = 0 THEN 0.0 ELSE
                   CAST((abs(CAST(s.s * 1000000 AS HUGEINT)) * 2
                         + CAST(nn.n AS HUGEINT))
                        // (2 * CAST(nn.n AS HUGEINT)) AS DOUBLE)
                   / 1000000.0 END AS entropy
        FROM nn LEFT JOIN s ON nn.doc_id = s.doc_id
        """,
    ),
    QuerySpec(
        # tokenizer budget calibration: same BPE-ish regex as
        # token_count_bpe, aggregated per language
        "tokenizer_fertility_by_lang",
        q_tokenizer_fertility,
        oracle=r"""
        WITH per_doc AS (
            SELECT lang,
                   len(regexp_extract_all(text,
                       '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS bpe,
                   len(list_filter(string_split_regex(text, '\s+'),
                                   w -> length(w) > 0)) AS ws,
                   length(text) AS chars
            FROM documents
        )
        SELECT lang,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(bpe) AS BIGINT) AS n_bpe_tokens,
               CAST(sum(ws) AS BIGINT) AS n_ws_tokens,
               CAST(sum(chars) AS BIGINT) AS n_chars,
               CAST(sum(bpe) AS DOUBLE) / sum(ws) AS fertility,
               CAST(sum(chars) AS DOUBLE) / sum(bpe) AS chars_per_token
        FROM per_doc GROUP BY lang
        """,
    ),
    QuerySpec(
        "text_readability",
        q_readability,
        # same counting rules, same integer-micros formula; all-int
        # output so the hash is exact by construction
        oracle="""
        WITH c AS (
            SELECT doc_id,
                   CAST(len(regexp_extract_all(lower(text), '[a-z]+'))
                        AS BIGINT) AS n_words,
                   CAST(len(regexp_extract_all(text, '[.!?]+'))
                        AS BIGINT) AS n_sentences,
                   CAST(len(regexp_extract_all(lower(text), '[aeiouy]+'))
                        AS BIGINT) AS n_syllable_groups
            FROM documents
        )
        SELECT doc_id, n_words, n_sentences, n_syllable_groups,
               206835000
                 - (1015000 * n_words) // greatest(n_sentences, 1)
                 - (84600000 * n_syllable_groups) // greatest(n_words, 1)
                   AS flesch_micros,
               CASE WHEN 206835000
                         - (1015000 * n_words) // greatest(n_sentences, 1)
                         - (84600000 * n_syllable_groups)
                           // greatest(n_words, 1) >= 70000000 THEN 'easy'
                    WHEN 206835000
                         - (1015000 * n_words) // greatest(n_sentences, 1)
                         - (84600000 * n_syllable_groups)
                           // greatest(n_words, 1) >= 50000000 THEN 'standard'
                    ELSE 'difficult' END AS band
        FROM c
        """,
    ),
    QuerySpec(
        "zipf_fit_by_lang",
        q_zipf_fit,
        # identical construction: softln micros through decimal(38,6),
        # BIGINT sufficient statistics, one final double division
        oracle=f"""
        WITH words AS (
            SELECT lang,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
            FROM documents
        ),
        freq AS (
            SELECT lang, word, CAST(count(*) AS BIGINT) AS freq
            FROM words GROUP BY 1, 2
        ),
        ranked AS (
            SELECT lang, freq,
                   CAST(row_number() OVER (
                       PARTITION BY lang ORDER BY freq DESC, word
                   ) AS BIGINT) AS rnk
            FROM freq
        ),
        top AS (SELECT * FROM ranked WHERE rnk <= 100),
        xy AS (
            SELECT lang,
                   CAST(CAST(round(-1.0 * ({softln_ratio_sql("1", "rnk")}), 6)
                             AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS x,
                   CAST(CAST(round(-1.0 * ({softln_ratio_sql("1", "freq")}), 6)
                             AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS y
            FROM top
        ),
        agg AS (
            SELECT lang,
                   CAST(count(*) AS BIGINT) AS n,
                   CAST(sum(x) AS BIGINT) AS sx,
                   CAST(sum(y) AS BIGINT) AS sy,
                   CAST(sum(x * y) AS BIGINT) AS sxy,
                   CAST(sum(x * x) AS BIGINT) AS sxx
            FROM xy GROUP BY lang
        ),
        nt AS (
            SELECT lang, CAST(count(*) AS BIGINT) AS n_types
            FROM freq GROUP BY lang
        )
        SELECT a.lang, nt.n_types, a.n AS n_top,
               CAST(a.n * a.sxy - a.sx * a.sy AS DOUBLE)
                 / CAST(a.n * a.sxx - a.sx * a.sx AS DOUBLE) AS zipf_slope
        FROM agg a JOIN nt USING (lang)
        """,
    ),
    QuerySpec(
        "kl_unigram_by_source",
        q_kl_unigram,
        oracle=f"""
        WITH words AS (
            SELECT source AS grp,
                   unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
            FROM documents
        ),
        c AS (
            SELECT grp, word, CAST(count(*) AS BIGINT) AS c
            FROM words GROUP BY 1, 2
        ),
        d AS (
            SELECT word, CAST(count(*) AS BIGINT) AS d
            FROM words GROUP BY 1
        ),
        n AS (SELECT grp, CAST(sum(c) AS BIGINT) AS n FROM c GROUP BY 1),
        m AS (SELECT CAST(count(*) AS BIGINT) AS m FROM words),
        j AS (
            SELECT c.grp, c.c, n.n,
                   c.c * m.m AS a, d.d * n.n AS b
            FROM c JOIN d USING (word) JOIN n USING (grp) CROSS JOIN m
        ),
        terms AS (
            SELECT grp, n,
                   CAST(CAST(c AS DOUBLE)
                        * (CASE WHEN a <= b
                                THEN round({softln_ratio_sql("a", "b")}, 6)
                                ELSE -round({softln_ratio_sql("b", "a")}, 6)
                           END) AS DECIMAL(38,6)) AS term
            FROM j
        ),
        agg AS (
            SELECT grp, any_value(n) AS n, sum(term) AS s
            FROM terms GROUP BY grp
        )
        SELECT grp AS source, n AS n_tokens,
               CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
                    * ((abs(CAST(s * 1000000 AS HUGEINT)) * 2 + n)
                       // (2 * n)) AS BIGINT) AS kl_micros
        FROM agg
        """,
    ),
    QuerySpec(
        "textrank_keywords",
        q_textrank_keywords,
        oracle=_textrank_oracle(),
    ),
]
