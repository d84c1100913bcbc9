"""Data-quality constraint checking and shuffle-skew diagnostics —
the operational side of running a 100 TB corpus/warehouse build.

- `dq_report`: Deequ-style declarative constraints (completeness,
  key uniqueness, value ranges, accepted sets) evaluated in ONE
  multi-aggregate scan and emitted as a (check_name, numerator,
  denominator, ratio, passed) report. Pass/fail is decided by integer
  cross-multiplication against the threshold percentage — no float
  boundary — and the ratio is a single division of exact longs
  (engine-portable, same discipline as `gopher_quality_filter`).
- `skew_report`: per-key group-size distribution of a prospective
  shuffle key — row/key counts, the largest key's share, the
  sum-of-squares concentration (an HHI: 1/n_keys = uniform, 1.0 = one
  key), and exact interpolated percentiles of group sizes. This is
  the measurement that tells you whether a join/agg needs
  `scale.salted_join` / AQE skew handling BEFORE you burn a cluster
  run discovering it.

Scale shape: `dq_report` is one pass over the fact table (count /
conditional-count / count_distinct aggregates, map-side partials);
`skew_report` is the key-count aggregate (one shuffle on the key) plus
a bounded second aggregate over one row per DISTINCT key — never the
raw rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["dq_report", "skew_report"]


def dq_report(
    df: DataFrame,
    completeness: dict[str, int] | None = None,
    unique: list[tuple[str, ...]] | None = None,
    ranges: dict[str, tuple[float, float]] | None = None,
    accepted: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """One row per declared constraint: (check, n_good, n_total,
    ratio, passed).

    - completeness: col -> min percent non-null (integer pct).
    - unique: column tuples whose combination must be globally unique.
    - ranges: col -> inclusive [lo, hi] numeric bounds (100% required).
    - accepted: col -> allowed value set (100% required).

    All non-uniqueness constraints fold into ONE aggregate row;
    uniqueness adds one count_distinct per declared key (same scan,
    Spark expands it map-side). The per-check rows are then unpivoted
    from that single row with literal check names — a constant-width
    stack, not a second scan.
    """
    if not any((completeness, unique, ranges, accepted)):
        # zero constraints would build stack(0, ) — a SQL parse error
        # at action time; fail at call time with the actual problem
        raise ValueError(
            "dq_report: at least one constraint required "
            "(completeness / unique / ranges / accepted)"
        )
    aggs: list[Column] = [F.count(F.lit(1)).alias("_n")]
    rows: list[tuple[str, str, int]] = []  # (check name, agg alias, pct)
    for col, pct in (completeness or {}).items():
        a = f"c_{col}"
        aggs.append(F.count(col).alias(a))
        rows.append((f"completeness({col})>={pct}%", a, pct))
    for cols in unique or []:
        a = "u_" + "_".join(cols)
        aggs.append(F.count_distinct(*[F.col(c) for c in cols]).alias(a))
        rows.append((f"unique({','.join(cols)})", a, 100))
    for col, (lo, hi) in (ranges or {}).items():
        a = f"r_{col}"
        cond = F.col(col).isNotNull() & (F.col(col) >= lo) & (F.col(col) <= hi)
        aggs.append(F.sum(cond.cast("long")).alias(a))
        rows.append((f"range({col} in [{lo},{hi}])", a, 100))
    for col, vals in (accepted or {}).items():
        a = f"s_{col}"
        cond = F.col(col).isin(*vals)
        aggs.append(F.sum(cond.cast("long")).alias(a))
        rows.append((f"accepted({col})", a, 100))
    one = df.agg(*aggs)
    stack = ", ".join(
        f"'{name}', {alias}, {pct}L" for name, alias, pct in rows
    )
    report = one.selectExpr(
        "_n",
        f"stack({len(rows)}, {stack}) AS (check_name, n_good, min_pct)",
    )
    return report.select(
        "check_name",
        F.col("n_good").cast("long").alias("n_good"),
        F.col("_n").cast("long").alias("n_total"),
        F.when(F.col("_n") > 0, F.col("n_good") / F.col("_n"))
        .otherwise(F.lit(1.0))
        .alias("ratio"),
        (F.col("n_good") * 100 >= F.col("min_pct") * F.col("_n")).alias(
            "passed"
        ),
    )


def skew_report(
    df: DataFrame, key: str, percentiles: tuple[float, ...] = (0.5, 0.9, 0.99)
) -> DataFrame:
    """Group-size distribution of `key`: one summary row with
    (n_rows, n_keys, max_key_cnt, top1_share, hhi, p50_cnt, ...).

    top1_share and hhi (Σ cnt² / total²) are single divisions of
    exact integer aggregates; percentiles use Spark's exact
    interpolated `percentile`, which matches DuckDB `quantile_cont`
    (two-sided weighted form — same pairing as `percentile_exact`).
    """
    sizes = df.groupBy(key).agg(F.count(F.lit(1)).alias("cnt"))
    pcols = [
        F.expr(f"percentile(cnt, {p!r})").alias(f"p{int(p * 100)}_cnt")
        for p in percentiles
    ]
    # hhi staged as (ss/t)/t — two identical IEEE divisions on both
    # engines; a single t*t product would overflow long at ~3e9 rows
    return sizes.agg(
        F.sum("cnt").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.max("cnt").cast("long").alias("max_key_cnt"),
        (F.max("cnt") / F.sum("cnt")).alias("top1_share"),
        (
            (F.sum(F.col("cnt") * F.col("cnt")) / F.sum("cnt"))
            / F.sum("cnt")
        ).alias("hhi"),
        *pcols,
    )


def corpus_health_report(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus scorecard — the numbers a data lead reads before
    green-lighting a training run:

    - ``n_docs``, ``n_tokens`` (whitespace), ``n_chars``
    - ``exact_dup_rate``: 1 − distinct(canonical-text hash)/n — the
      zero-cost health proxy before full near-dup runs
    - ``lang_entropy_nats``: Shannon entropy of the language mix,
      Σ (c/N)·ln(N/c) — 0 = monolingual, ln(k) = uniform over k
    - ``top_lang_share``: largest language's fraction
    - ``mean_doc_tokens``: corpus mean length

    Portability: entropy terms are `softln_ratio` over integer counts
    (bit-identical series both engines), each term rounded to 9 dp and
    summed through decimal (order-independent); every other field is
    an exact integer or one division of exact integers.

    Scale shape: one corpus scan feeding (a) a global multi-aggregate,
    (b) a canonical-hash distinct, (c) a per-language count — three
    map-side-combinable aggregates, 1-row outputs crossJoined
    (broadcast). No full-width shuffles.
    """
    from demo_flink_spark.operators.dedup import _canonical
    from demo_flink_spark.operators.relational import dsum, softln_ratio

    toks = F.filter(
        F.split(F.coalesce(F.col(text_col), F.lit("")), r"\s+"),
        lambda w: w != "",
    )
    base = docs.select(
        "doc_id",
        "lang",
        F.size(toks).cast("long").alias("n_toks"),
        F.length(F.coalesce(F.col(text_col), F.lit(""))).cast("long").alias(
            "n_chars"
        ),
        F.xxhash64(_canonical(F.col(text_col))).alias("chash"),
    )
    g = base.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("n_toks").cast("long").alias("n_tokens"),
        F.sum("n_chars").cast("long").alias("n_chars"),
        F.count_distinct("chash").cast("long").alias("n_distinct"),
    )
    lang = base.groupBy("lang").agg(F.count(F.lit(1)).cast("long").alias("c"))
    ent = (
        lang.crossJoin(F.broadcast(g.select("n_docs")))
        .select(
            F.round(
                (F.col("c") / F.col("n_docs"))
                * -softln_ratio(F.col("c"), F.col("n_docs")),
                9,
            ).alias("term"),
            F.col("c"),
        )
        .agg(
            dsum(F.col("term")).alias("lang_entropy_nats"),
            F.max("c").cast("long").alias("top_lang_c"),
        )
    )
    return (
        g.crossJoin(F.broadcast(ent))
        .select(
            "n_docs",
            "n_tokens",
            "n_chars",
            ((F.col("n_docs") - F.col("n_distinct"))
             / F.col("n_docs")).alias("exact_dup_rate"),
            "lang_entropy_nats",
            (F.col("top_lang_c") / F.col("n_docs")).alias("top_lang_share"),
            (F.col("n_tokens") / F.col("n_docs")).alias("mean_doc_tokens"),
        )
    )


def psi_drift_report(
    ref: DataFrame,
    cur: DataFrame,
    value_col: str = "value",
    tiebreak_col: str = "event_id",
    n_bins: int = 10,
) -> DataFrame:
    """Population Stability Index between a reference and a current
    snapshot of a numeric column — the standard ML-ops drift gate
    (PSI < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted):

        PSI = Σ_b (p_b − q_b) · ln(p_b / q_b)

    over `n_bins` equal-frequency bins whose edges come from the
    REFERENCE distribution (rank-selected ELEMENTS at ranks
    (n·i) div n_bins — the quantile_disc recipe, no interpolation).
    Counts are Laplace-smoothed (+1 per bin) so an empty bin is a
    large-but-finite contribution instead of ±inf.

    Engine-exact: bin edges are bit-copied doubles; bin assignment is
    "count of edges strictly below v" (deterministic comparisons);
    ln(p/q) is `softln_ratio` over the exact integer cross-products
    (c_r+1)·(n_c+B) vs (c_c+B)·(n_r+B) with an explicit direction
    branch (softln needs num ≤ den); each term is rounded to 6 dp,
    carried as decimal, and emitted as exact integer MICROS — the
    float-free-contract discipline. Output: one row per bin
    (bin, c_ref, c_cur, term_micros, psi_total_micros).

    Scale shape: one window pass over the reference for edges (the
    audit-exact path; swap in the sketch at 100 TB), then two
    map-side-combinable bin-count aggregates; everything downstream
    is ≤ n_bins rows on broadcasts.
    """
    from pyspark.sql.window import Window

    from demo_flink_spark.operators.relational import softln_ratio

    v, tb = F.col(value_col), F.col(tiebreak_col)
    r = ref.select(v.alias("v"), tb.alias("tb"))
    c = cur.select(v.alias("v"), tb.alias("tb"))
    w = Window.orderBy("v", "tb")
    ranked = r.select(
        "v",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("n"),
    )
    rank_list = ", ".join(f"(n * {i}) div {n_bins}" for i in range(1, n_bins))
    edges = ranked.filter(F.expr(f"rn IN ({rank_list})")).agg(
        F.sort_array(F.collect_list("v")).alias("edges")
    )
    n_r = r.agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    n_c = c.agg(F.count(F.lit(1)).cast("long").alias("n_cur"))

    def binned(side: DataFrame, label: str) -> DataFrame:
        return (
            side.crossJoin(F.broadcast(edges))
            .select(
                (
                    F.lit(1)
                    + F.size(F.filter("edges", lambda e: e < F.col("v")))
                ).alias("bin")
            )
            .groupBy("bin")
            .agg(F.count(F.lit(1)).cast("long").alias(label))
        )
    bins = (
        F.broadcast(
            r.sparkSession.range(1, n_bins + 1).select(
                F.col("id").cast("int").alias("bin")
            )
        )
        .join(binned(r, "c_ref"), "bin", "left")
        .join(binned(c, "c_cur"), "bin", "left")
        .select(
            "bin",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
    )
    B = F.lit(n_bins)
    a = (F.col("c_ref") + 1) * (F.col("n_cur") + B)  # p-side cross product
    b = (F.col("c_cur") + 1) * (F.col("n_ref") + B)  # q-side cross product
    ln_pq = F.when(a <= b, softln_ratio(a, b)).otherwise(-softln_ratio(b, a))
    p = (F.col("c_ref") + 1).cast("double") / (F.col("n_ref") + B).cast("double")
    q = (F.col("c_cur") + 1).cast("double") / (F.col("n_cur") + B).cast("double")
    term6 = F.round((p - q) * ln_pq, 6).cast("decimal(38,6)")
    out = bins.select(
        "bin",
        "c_ref",
        "c_cur",
        (term6 * 1000000).cast("long").alias("term_micros"),
    )
    wall = Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return out.select(
        "bin",
        "c_ref",
        "c_cur",
        "term_micros",
        F.sum("term_micros").over(wall).cast("long").alias("psi_total_micros"),
    )


def heavy_change_detection(
    ref: DataFrame,
    cur: DataFrame,
    key_col: str,
    k: int = 20,
) -> DataFrame:
    """Top-k keys whose RELATIVE frequency changed most between two
    snapshots — the item-level companion to `psi_drift_report` (PSI
    says THAT the distribution moved; this says WHICH keys moved it).

    Change score: |c_ref·n_cur − c_cur·n_ref| — the cross-multiplied
    numerator of |p_ref − p_cur|, so ranking by it equals ranking by
    absolute share change while staying EXACT INTEGER arithmetic (no
    division, no float in the ordering or the output). Missing keys
    count 0 via the full outer join. Deterministic total order:
    (score desc, key asc).

    Scale shape: per-side counts are map-side-combinable aggregates
    (~|keys| rows); the outer join and top-k run on the COUNT tables,
    never the raw rows — bodies never shuffle. The top-k is
    TakeOrderedAndProject (per-partition heaps + driver merge of k),
    not a global sort.
    """
    rc = ref.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c_ref")
    )
    cc = cur.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).cast("long").alias("c_cur")
    )
    n_r = ref.agg(F.count(F.lit(1)).cast("long").alias("n_ref"))
    n_c = cur.agg(F.count(F.lit(1)).cast("long").alias("n_cur"))
    joined = (
        rc.join(cc, "key", "full_outer")
        .select(
            "key",
            F.coalesce("c_ref", F.lit(0)).alias("c_ref"),
            F.coalesce("c_cur", F.lit(0)).alias("c_cur"),
        )
        .crossJoin(F.broadcast(n_r))
        .crossJoin(F.broadcast(n_c))
    )
    score = F.abs(
        F.col("c_ref") * F.col("n_cur") - F.col("c_cur") * F.col("n_ref")
    )
    return (
        joined.select(
            "key", "c_ref", "c_cur", score.cast("long").alias("change_score")
        )
        .orderBy(F.desc("change_score"), F.asc("key"))
        .limit(k)
    )


# Benford first-digit probabilities log10(1 + 1/d), d = 1..9, as 6dp
# micros LITERALS — pinned constants, not engine math, so both engines
# compare against identical integers.
BENFORD_MICROS = {
    1: 301030,
    2: 176091,
    3: 124939,
    4: 96910,
    5: 79181,
    6: 66947,
    7: 57992,
    8: 51153,
    9: 45757,
}


def benford_first_digit(
    df: DataFrame, cents_col: Column, group_col: str | None = None
) -> DataFrame:
    """Benford's-law first-digit audit of a positive integer-cents
    column — the classic fabricated-data / fraud screen (genuine
    multiplicative-growth amounts follow P(d) = log10(1 + 1/d);
    invented numbers don't).

    First digit via exact integer→string conversion (identical in
    both engines — no float log10 in the path); observed shares are
    round-half-away integer micros; deviation is |share - benford|
    per digit. All-integer output — hash-exact. One
    map-side-combinable aggregate, one 9-row broadcast-sized result
    per group.
    """
    base = df.select(
        (F.lit("all") if group_col is None else F.col(group_col)).alias(
            "grp"
        ),
        F.substring(cents_col.cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    ).filter(F.col("digit") >= 1)
    counts = base.groupBy("grp", "digit").agg(
        F.count(F.lit(1)).alias("c")
    )
    totals = counts.groupBy("grp").agg(F.sum("c").alias("n"))
    benford = F.create_map(
        *[F.lit(v) for kv in BENFORD_MICROS.items() for v in kv]
    )
    return (
        counts.join(F.broadcast(totals), "grp")
        .select(
            F.col("grp").alias("group_key"),
            "digit",
            F.col("c").cast("long").alias("n_obs"),
            F.expr("(c * 2000000 + n) div (2 * n)").alias("share_micros"),
            F.element_at(benford, F.col("digit")).cast("long").alias(
                "benford_micros"
            ),
        )
        .withColumn(
            "dev_micros",
            F.abs(F.col("share_micros") - F.col("benford_micros")),
        )
    )


def chi_square_independence(
    df: DataFrame, row_col: str, col_col: str
) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns — the contingency-table DQ primitive (is order priority
    independent of order status? is label independent of source?).

        chi2 = Σ_ij (O_ij·N - r_i·c_j)² / (r_i·c_j·N)

    — the (O-E)²/E form cleared of fractions, so every numerator and
    denominator is an EXACT integer (decimal(38,0): O·N reaches ~1e10
    at sf0.1 and its square ~1e20 overflows int64). Each cell's term
    is round-half-away integer micros; chi2_micros is their exact
    sum. Output also carries the degrees of freedom and N so a
    consumer can threshold against any critical value.

    One contingency aggregate (map-side combinable) + two
    broadcast-sized marginal joins; nothing driver-side.
    """
    obs = df.groupBy(
        F.col(row_col).alias("r"), F.col(col_col).alias("cc")
    ).agg(F.count(F.lit(1)).alias("o"))
    rt = obs.groupBy("r").agg(F.sum("o").alias("rt"))
    ct = obs.groupBy("cc").agg(F.sum("o").alias("ct"))
    tot = obs.agg(F.sum("o").alias("n"))
    # the FULL marginal cross product, not just observed cells: an
    # empty cell (O = 0) still contributes E = r·c/N to the statistic
    # — summing observed cells only understates chi2 exactly when the
    # dependence is strongest. The cross of two category-cardinality
    # frames is broadcast-sized by construction.
    grid = rt.crossJoin(F.broadcast(ct))
    cells = (
        grid.join(obs, ["r", "cc"], "left")
        .na.fill({"o": 0})
        .crossJoin(F.broadcast(tot))
        .select(
            "r",
            "cc",
            "o",
            F.expr("CAST(rt AS DECIMAL(38,0))").alias("rtd"),
            F.expr("CAST(ct AS DECIMAL(38,0))").alias("ctd"),
            F.expr("CAST(n AS DECIMAL(38,0))").alias("nd"),
            F.col("n"),
        )
        .withColumn(
            "num",
            F.expr("(CAST(o AS DECIMAL(38,0)) * nd - rtd * ctd)"),
        )
        .withColumn(
            "term_micros",
            F.expr(
                "CAST((num * num * 1000000 * 2 + rtd * ctd * nd)"
                " div (2 * rtd * ctd * nd) AS DECIMAL(38,0))"
            ),
        )
    )
    n_r = rt.count()
    n_c = ct.count()
    return cells.agg(
        F.sum("term_micros").cast("long").alias("chi2_micros"),
        F.lit((n_r - 1) * (n_c - 1)).cast("long").alias("dof"),
        F.first("n").cast("long").alias("n"),
    )
