"""Distributed, engine-exact model training: a batch perceptron over
hashed bag-of-words features.

`textstats.quality_classifier` scores documents with FIXED hashed
weights (the fasttext serving shape); this module closes the loop and
TRAINS the weight vector from labels with a parameter-server-shaped
iteration — the missing piece of a quality-classifier pipeline
(reference lineage: the per-record transform + keyed aggregate
vocabulary of `AdvancedWordCount.java`, iterated).

Scale design (the `graph.pagerank` recipe applied to learning):
- The feature table (doc, bucket, count) is built ONCE — one tokenize
  pass + one (doc, bucket)-keyed aggregate — and reused by every
  iteration (lineage cut via `checkpointing.cut_lineage`).
- Each iteration is two map-side-combinable aggregates over that
  table: per-doc margins (doc-keyed), then the gradient of the
  misclassified set (bucket-keyed). Nothing is ever materialized at
  corpus scale.
- The weight vector (dim = 256) is collected to the driver between
  iterations and re-enters the next plan as an array literal — the
  parameter-server pattern: gradients are distributed, parameters are
  small. At 100 TB the collect is still 256 rows.

Determinism: features, labels, weights, margins and updates are ALL
integers (lr = 1, counts, ±1 labels), so every iteration is exact on
any engine — no float accumulation anywhere. The DuckDB oracle unrolls
the same iterations as CTE stages and must reproduce the final margins
bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from demo_flink_spark.operators.checkpointing import cut_lineage

__all__ = ["perceptron_train", "PERCEPTRON_DIM"]

PERCEPTRON_DIM = 256  # byte-aligned md5 bucket (j = first md5 byte)


def _features(docs: DataFrame, text_col: str, label_col: str, positive: str):
    """(doc_id, y, j, cnt): hashed-token counts with ±1 labels."""
    from demo_flink_spark.operators.dedup import _canonical

    toks = docs.select(
        "doc_id",
        F.when(F.col(label_col) == positive, F.lit(1))
        .otherwise(F.lit(-1))
        .alias("y"),
        F.explode(
            F.filter(
                F.split(_canonical(F.col(text_col)), " "), lambda x: x != ""
            )
        ).alias("token"),
    )
    j = F.expr("CAST(conv(substr(md5(token), 1, 2), 16, 10) AS INT)")
    return toks.select("doc_id", "y", j.alias("j")).groupBy(
        "doc_id", "y", "j"
    ).agg(F.count(F.lit(1)).alias("cnt"))


def perceptron_train(
    docs: DataFrame,
    label_col: str = "lang",
    positive: str = "en",
    n_iters: int = 3,
    text_col: str = "text",
) -> DataFrame:
    """Train a batch perceptron (lr=1, w0=0) for `n_iters` iterations
    and return per-document (doc_id, label, margin, pred, correct)
    under the final weights.

    Update rule per iteration: ``w += Σ_{d: y_d·⟨w,x_d⟩ ≤ 0} y_d·x_d``
    (all misclassified docs, batch update — deterministic, no
    sample-order dependence). With w0 = 0 every doc starts
    misclassified, so iteration 1 is the class-difference vector.

    Docs with no tokens get margin 0, pred False.
    """
    feats = cut_lineage(
        _features(docs, text_col, label_col, positive), eager=True
    )
    w: list[int] = [0] * PERCEPTRON_DIM
    for _ in range(n_iters):
        if any(w):
            warr = F.array(*[F.lit(int(v)) for v in w])
            margins = feats.groupBy("doc_id", "y").agg(
                F.sum(
                    F.element_at(warr, F.col("j") + 1).cast("long")
                    * F.col("cnt")
                ).alias("m")
            )
            mis = margins.filter(
                F.col("y").cast("long") * F.col("m") <= 0
            ).select("doc_id")
            delta_df = (
                feats.join(mis, "doc_id", "left_semi")
                .groupBy("j")
                .agg(F.sum(F.col("y") * F.col("cnt")).alias("dw"))
            )
        else:  # w = 0: every margin is 0, every doc is misclassified
            delta_df = feats.groupBy("j").agg(
                F.sum(F.col("y") * F.col("cnt")).alias("dw")
            )
        for row in delta_df.collect():  # dim-sized: parameter server
            w[row["j"]] += row["dw"]
    warr = F.array(*[F.lit(int(v)) for v in w])
    final = feats.groupBy("doc_id", "y").agg(
        F.sum(
            F.element_at(warr, F.col("j") + 1).cast("long") * F.col("cnt")
        ).alias("margin")
    )
    return (
        docs.select(
            "doc_id",
            F.when(F.col(label_col) == positive, F.lit(1))
            .otherwise(F.lit(-1))
            .alias("label"),
        )
        .join(final.select("doc_id", "margin"), "doc_id", "left")
        .select(
            "doc_id",
            "label",
            F.coalesce("margin", F.lit(0)).cast("long").alias("margin"),
            (F.coalesce("margin", F.lit(0)) > 0).alias("pred"),
            (
                (F.coalesce("margin", F.lit(0)) > 0)
                == (F.col("label") > 0)
            ).alias("correct"),
        )
    )
