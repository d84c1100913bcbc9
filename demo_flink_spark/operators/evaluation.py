"""Dataset-evaluation operators: exact classifier AUC and train/eval
split-leakage auditing.

Two measurements every corpus build runs before a model ever trains:

- **binary_auc** — does a heuristic quality signal actually separate
  the classes? Exact ROC-AUC via the Mann-Whitney U statistic with
  midrank tie handling. The whole computation is integer counting
  until one final double division, so the result is bit-identical on
  any engine (no trapezoid floats, no sampling).

- **split_leakage** — after near-dup detection and train/val/test
  assignment, which EVAL documents have a near-duplicate inside the
  training split? This is the GPT-3-style decontamination audit: a
  benchmark number computed on a leaked eval doc is meaningless. The
  audit is two equi-joins of the (already sub-quadratic) pair list
  against the split map — never a corpus self-join.

Reference lineage: the keyed-aggregate vocabulary of
`AdvancedWordCount.java:30-42` (counts per key), applied to model/
dataset evaluation instead of words.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def binary_auc(
    df: DataFrame, score: Column, label: Column
) -> DataFrame:
    """Exact ROC-AUC of `score` predicting boolean `label`, one row:
    (n_pos, n_neg, auc, gini).

    Mann-Whitney with midranks: group rows by distinct score value,
    cumulate counts in score order, and sum per-value positive counts
    times twice-the-midrank:

        2·R_pos = Σ_s  p_s · (2·c_less(s) + n_s + 1)
        AUC     = (2·R_pos − n_pos·(n_pos+1)) / (2·n_pos·n_neg)

    Everything up to the final division is exact integer arithmetic;
    ties are handled identically on every engine (a trapezoidal float
    scan is not: its sum order depends on partitioning). The rank-sum
    terms grow ~n², so 2·R_pos and the n·(n±1) products accumulate in
    decimal(38,0) — the ts_linear_trend recipe — not int64: at the
    multi-billion-row corpora this targets, a long 2·R_pos silently
    wraps near n ≈ 3·10⁹ with ANSI mode off and yields a wrong AUC
    with no error. Only the final quotient drops to double.
    Degenerate single-class inputs return NULL auc rather than a
    misleading 0/0.

    Scale: one hash aggregate over the corpus (keyed by score value),
    then a window over DISTINCT SCORE VALUES — thousands of rows for
    a 6-dp-rounded signal, regardless of corpus size, so the single
    unpartitioned window task is bounded by the score's cardinality,
    not the data.
    """
    by_score = df.select(
        score.alias("s"), label.cast("int").alias("y")
    ).groupBy("s").agg(
        F.count(F.lit(1)).cast("long").alias("n_s"),
        F.sum("y").cast("long").alias("p_s"),
    )
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    ranked = by_score.select(
        "s",
        "n_s",
        "p_s",
        F.coalesce(F.sum("n_s").over(w), F.lit(0)).alias("c_less"),
    )
    agg = ranked.agg(
        F.sum("p_s").cast("long").alias("n_pos"),
        (F.sum("n_s") - F.sum("p_s")).cast("long").alias("n_neg"),
        # decimal BEFORE the multiply: the per-bucket product
        # p_s·(2·c_less+…) is itself ~n² and can wrap int64 on one row
        F.sum(
            F.col("p_s").cast("decimal(38,0)")
            * (F.lit(2) * F.col("c_less") + F.col("n_s") + 1)
        ).alias("two_r_pos"),
    )
    _dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    auc = (
        F.col("two_r_pos") - _dec(F.col("n_pos")) * (F.col("n_pos") + 1)
    ).cast("double") / (
        F.lit(2) * _dec(F.col("n_pos")) * F.col("n_neg")
    ).cast("double")
    return agg.select(
        "n_pos",
        "n_neg",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), auc
        ).alias("auc"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.lit(2) * auc - F.lit(1),
        ).alias("gini"),
    )


def bigram_novelty(
    docs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    train_split: str = "train",
) -> DataFrame:
    """Memorization/novelty signal for eval documents: per val/test
    document, the fraction of its word-bigram occurrences never seen
    in ANY training-split document —
    (doc_id, split, n_bigrams, n_novel, novelty_rate).

    A benchmark doc whose bigrams are all covered by train text is
    answerable from surface memorization; novelty_rate ~ 1 means the
    eval text is genuinely out-of-distribution. This is the
    complement of `split_leakage`: leakage finds whole near-dup
    documents, novelty measures fine-grained n-gram coverage.

    Scale: bigram emission is pure JVM array expressions (the
    ngram_diversity shape — token array materialized BEFORE the
    lambda); the train bigram set is vocabulary-sized, so its
    dedup+join strategy is left to AQE (broadcast while measured
    small, shuffle join past the threshold — the lm_bigram_score
    rationale). Nothing is ever corpus x corpus.
    """
    from demo_flink_spark.operators.wordcount import normalize_text

    tok_df = docs.select(
        F.col(id_col),
        F.filter(
            F.split(
                F.trim(
                    F.regexp_replace(
                        normalize_text(F.col(text_col)), r"\s+", " "
                    )
                ),
                " ",
            ),
            lambda x: F.length(x) > 0,
        ).alias("t"),
    )
    t = F.col("t")
    bigrams = tok_df.select(
        id_col,
        F.explode(
            F.when(
                F.size(t) >= 2,
                F.transform(
                    F.sequence(F.lit(0), F.size(t) - 2),
                    lambda i: F.array_join(F.slice(t, i + 1, 2), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("bg"),
    ).join(splits.select(id_col, "split"), id_col)
    train_set = (
        bigrams.filter(F.col("split") == train_split)
        .select("bg")
        .distinct()
        .withColumn("seen", F.lit(1))
    )
    return (
        bigrams.filter(F.col("split") != train_split)
        .join(train_set, "bg", "left")
        .groupBy(id_col, "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_bigrams"),
            F.sum(F.col("seen").isNull().cast("long"))
            .cast("long")
            .alias("n_novel"),
        )
        .select(
            id_col,
            "split",
            "n_bigrams",
            "n_novel",
            F.round(
                F.col("n_novel") / F.col("n_bigrams").cast("double"), 6
            ).alias("novelty_rate"),
        )
    )


def split_leakage(
    pairs: DataFrame,
    splits: DataFrame,
    id_col: str = "doc_id",
    train_split: str = "train",
    sim_col: str = "jaccard",
) -> DataFrame:
    """Eval-set decontamination audit: one row per NON-train document
    that has at least one near-duplicate inside the training split —
    (doc_id, split, n_train_dups, max_sim).

    `pairs` is any near-dup pair list (doc_a, doc_b, <sim_col>) from
    the dedup family (n-gram Jaccard, MinHash-LSH, SimHash, ...);
    `splits` is (id_col, split). The pair list is symmetrized with a
    union (each undirected pair checked in both directions), joined
    twice against the split map, and filtered to eval-side docs whose
    counterpart is in train. Both joins are equi-joins on the doc id;
    the split map is corpus-sized, so no broadcast is forced — AQE
    picks the strategy from measured sizes.

    At 100 TB this inherits the pair generator's sub-quadratic shape:
    the audit itself is linear in |pairs|.
    """
    sym = pairs.select(
        F.col("doc_a").alias("doc"),
        F.col("doc_b").alias("other"),
        F.col(sim_col).alias("sim"),
    ).unionAll(
        pairs.select(
            F.col("doc_b").alias("doc"),
            F.col("doc_a").alias("other"),
            F.col(sim_col).alias("sim"),
        )
    )
    s_doc = splits.select(
        F.col(id_col).alias("doc"), F.col("split").alias("split")
    )
    s_other = splits.select(
        F.col(id_col).alias("other"), F.col("split").alias("other_split")
    )
    return (
        sym.join(s_doc, "doc")
        .join(s_other, "other")
        .filter(
            (F.col("split") != train_split)
            & (F.col("other_split") == train_split)
        )
        .groupBy("doc", "split")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_train_dups"),
            F.max("sim").alias("max_sim"),
        )
        .select(F.col("doc").alias(id_col), "split", "n_train_dups", "max_sim")
    )


def calibration_bins(
    df: DataFrame,
    score_col: Column,
    label_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram bins for a [0,1] score against a binary
    label — the calibration companion to `binary_auc` (AUC says the
    ranking is good; calibration says the VALUES mean what they say —
    the check run before a classifier score is used as a sampling
    weight or threshold).

    Per equal-width bin: count, positives, mean score and positive
    rate, ALL in exact integer micros: the score enters as
    decimal(38,6) micros (6dp scores are exact there), the bin index
    is integer division, and both means are round-half-away integer
    divisions — engine-exact, no float boundary anywhere. Consumers
    compute ECE as Σ n_b·|mean−rate|/N from these integers.

    One map-side-combinable aggregate over ≤ n_bins output rows.
    """
    if 1_000_000 % n_bins:
        raise ValueError("n_bins must divide 1e6")
    width = 1_000_000 // n_bins
    sm = (score_col.cast("decimal(38,6)") * 1_000_000).cast("long")
    base = df.select(
        sm.alias("sm"),
        F.when(label_col, 1).otherwise(0).alias("p"),
    ).select(
        F.least(F.expr(f"sm div {width}"), F.lit(n_bins - 1))
        .cast("int")
        .alias("bin"),
        "sm",
        "p",
    )
    return base.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("p").cast("long").alias("n_pos"),
        F.expr("(sum(sm) * 2 + count(1)) div (2 * count(1))")
        .cast("long")
        .alias("mean_score_micros"),
        F.expr("(sum(p) * 2000000 + count(1)) div (2 * count(1))")
        .cast("long")
        .alias("pos_rate_micros"),
    )


def expected_calibration_error(
    df: DataFrame,
    score_col: Column,
    label_col: Column,
    n_bins: int = 10,
) -> DataFrame:
    """One-row ECE summary over `calibration_bins`:

        ECE = Σ_b n_b · |mean_score_b − pos_rate_b| / N

    in exact integer micros (the bin means are already integers;
    the final division is round-half-away). The single-number
    calibration headline next to the AUC headline.
    """
    bins = calibration_bins(df, score_col, label_col, n_bins)
    return bins.agg(
        F.count(F.lit(1)).cast("long").alias("n_bins_used"),
        F.sum("n").cast("long").alias("n"),
        F.expr(
            "CAST((sum(n * abs(mean_score_micros - pos_rate_micros)) * 2"
            "      + sum(n)) div (2 * sum(n)) AS BIGINT)"
        ).alias("ece_micros"),
    )
