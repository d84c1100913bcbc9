"""Declared queries: data-quality constraint report and shuffle-skew
diagnostics (operators/quality_checks.py) — the operational checks a
warehouse/corpus build runs before trusting or joining a table.

The synthetic lineitem makes the report non-trivial deterministically:
(l_orderkey, l_linenumber) is NOT unique (45832/60000 at sf0.01) and
only ~65% of discounts sit under 0.06, so the report carries both
passing and failing constraints.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators.quality_checks import dq_report, skew_report
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style constraint report over lineitem in ONE
    multi-aggregate scan: completeness, compound-key uniqueness,
    numeric ranges, accepted sets — pass/fail by integer
    cross-multiplication, ratio as a single exact-long division."""
    return dq_report(
        load_table(spark, sf_dir, "lineitem"),
        completeness={"l_orderkey": 100, "l_shipdate": 100},
        unique=[("l_orderkey", "l_linenumber")],
        ranges={"l_quantity": (1, 50), "l_discount": (0.0, 0.06)},
        accepted={"l_returnflag": ("A", "N", "R"), "l_linestatus": ("F",)},
    )


_DQ_ORACLE = """
WITH a AS (
    SELECT count(*) AS n,
           count(l_orderkey) AS c_ok,
           count(l_shipdate) AS c_sd,
           count(DISTINCT (l_orderkey, l_linenumber)) AS u_key,
           sum(CASE WHEN l_quantity IS NOT NULL
                     AND l_quantity >= 1 AND l_quantity <= 50
                    THEN 1 ELSE 0 END) AS r_qty,
           sum(CASE WHEN l_discount IS NOT NULL
                     AND l_discount >= 0.0 AND l_discount <= 0.06
                    THEN 1 ELSE 0 END) AS r_disc,
           sum(CASE WHEN l_returnflag IN ('A', 'N', 'R')
                    THEN 1 ELSE 0 END) AS s_rf,
           sum(CASE WHEN l_linestatus IN ('F') THEN 1 ELSE 0 END) AS s_ls
    FROM lineitem
),
r AS (
    SELECT 'completeness(l_orderkey)>=100%' AS check_name, c_ok AS g, 100 AS p, n FROM a
    UNION ALL
    SELECT 'completeness(l_shipdate)>=100%', c_sd, 100, n FROM a
    UNION ALL
    SELECT 'unique(l_orderkey,l_linenumber)', u_key, 100, n FROM a
    UNION ALL
    SELECT 'range(l_quantity in [1,50])', r_qty, 100, n FROM a
    UNION ALL
    SELECT 'range(l_discount in [0.0,0.06])', r_disc, 100, n FROM a
    UNION ALL
    SELECT 'accepted(l_returnflag)', s_rf, 100, n FROM a
    UNION ALL
    SELECT 'accepted(l_linestatus)', s_ls, 100, n FROM a
)
SELECT check_name,
       CAST(g AS BIGINT) AS n_good,
       CAST(n AS BIGINT) AS n_total,
       CASE WHEN n > 0 THEN CAST(g AS DOUBLE) / n ELSE 1.0 END AS ratio,
       g * 100 >= p * n AS passed
FROM r
"""


def q_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew diagnostics for events.user_id — the
    pre-flight measurement for salting/AQE decisions: key counts,
    top-key share, HHI concentration, exact group-size percentiles."""
    return skew_report(load_table(spark, sf_dir, "events"), "user_id")


_SKEW_ORACLE = """
WITH sizes AS (
    SELECT user_id, count(*) AS cnt FROM events GROUP BY user_id
)
SELECT CAST(sum(cnt) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_keys,
       CAST(max(cnt) AS BIGINT) AS max_key_cnt,
       CAST(max(cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE) AS top1_share,
       (CAST(sum(cnt * cnt) AS DOUBLE) / CAST(sum(cnt) AS DOUBLE))
           / CAST(sum(cnt) AS DOUBLE) AS hhi,
       quantile_cont(cnt, 0.5) AS p50_cnt,
       quantile_cont(cnt, 0.9) AS p90_cnt,
       quantile_cont(cnt, 0.99) AS p99_cnt
FROM sizes
"""


def q_corpus_health(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row corpus scorecard (operators/quality_checks.py::
    corpus_health_report): sizes, exact-dup rate, language-mix
    entropy (portable softln), top-language share, mean length."""
    from demo_flink_spark.operators.quality_checks import corpus_health_report

    return corpus_health_report(load_table(spark, sf_dir, "documents"))


def _health_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql
    from demo_flink_spark.plans.dedup import _CANON

    softln = softln_ratio_sql("c", "n_docs")
    return rf"""
    WITH base AS (
        SELECT doc_id, lang,
               CAST(len(list_filter(string_split_regex(
                    coalesce(text, ''), '\s+'), w -> w <> ''))
                 AS BIGINT) AS n_toks,
               CAST(length(coalesce(text, '')) AS BIGINT) AS nc,
               {_CANON} AS canon
        FROM documents
    ),
    g AS (
        SELECT CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_toks) AS BIGINT) AS n_tokens,
               CAST(sum(nc) AS BIGINT) AS n_chars,
               CAST(count(DISTINCT canon) AS BIGINT) AS n_distinct
        FROM base
    ),
    lang AS (
        SELECT lang, CAST(count(*) AS BIGINT) AS c FROM base GROUP BY lang
    ),
    ent AS (
        SELECT CAST(sum(CAST(round(
                   (CAST(c AS DOUBLE) / n_docs) * -({softln}), 9)
                 AS DECIMAL(38,6))) AS DOUBLE) AS lang_entropy_nats,
               CAST(max(c) AS BIGINT) AS top_lang_c
        FROM lang, g
    )
    SELECT n_docs, n_tokens, n_chars,
           CAST(n_docs - n_distinct AS DOUBLE) / n_docs AS exact_dup_rate,
           lang_entropy_nats,
           CAST(top_lang_c AS DOUBLE) / n_docs AS top_lang_share,
           CAST(n_tokens AS DOUBLE) / n_docs AS mean_doc_tokens
    FROM g, ent
    """


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit audit of lineitem extended prices in exact
    integer cents (operators/quality_checks.py::benford_first_digit):
    per-digit observed share vs the pinned log10(1+1/d) constants."""
    from demo_flink_spark.operators.quality_checks import benford_first_digit

    li = load_table(spark, sf_dir, "lineitem")
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    return benford_first_digit(li, cents)


def q_chi_square(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence of order priority × order status
    (operators/quality_checks.py::chi_square_independence): exact
    decimal fraction-cleared form, integer-micros statistic."""
    from demo_flink_spark.operators.quality_checks import (
        chi_square_independence,
    )

    return chi_square_independence(
        load_table(spark, sf_dir, "orders"), "o_orderpriority", "o_orderstatus"
    )


_BENFORD_CASE = (
    "CASE digit WHEN 1 THEN 301030 WHEN 2 THEN 176091 WHEN 3 THEN 124939"
    " WHEN 4 THEN 96910 WHEN 5 THEN 79181 WHEN 6 THEN 66947"
    " WHEN 7 THEN 57992 WHEN 8 THEN 51153 WHEN 9 THEN 45757 END"
)

_BENFORD_ORACLE = f"""
WITH base AS (
    SELECT CAST(substr(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
                            AS VARCHAR), 1, 1) AS INT) AS digit
    FROM lineitem
),
counts AS (
    SELECT digit, CAST(count(*) AS BIGINT) AS c
    FROM base WHERE digit >= 1 GROUP BY 1
),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM counts)
SELECT 'all' AS group_key, digit, c AS n_obs,
       (c * 2000000 + n) // (2 * n) AS share_micros,
       CAST({_BENFORD_CASE} AS BIGINT) AS benford_micros,
       abs((c * 2000000 + n) // (2 * n)
           - CAST({_BENFORD_CASE} AS BIGINT)) AS dev_micros
FROM counts CROSS JOIN tot
"""

_CHI_SQUARE_ORACLE = """
WITH obs AS (
    SELECT o_orderpriority AS r, o_orderstatus AS cc,
           CAST(count(*) AS BIGINT) AS o
    FROM orders GROUP BY 1, 2
),
rt AS (SELECT r, CAST(sum(o) AS BIGINT) AS rt FROM obs GROUP BY 1),
ct AS (SELECT cc, CAST(sum(o) AS BIGINT) AS ct FROM obs GROUP BY 1),
tot AS (SELECT CAST(sum(o) AS BIGINT) AS n FROM obs),
terms AS (
    -- FULL marginal grid: empty cells (O = 0) still contribute E
    SELECT n,
           CAST(coalesce(o, 0) AS HUGEINT) * n
             - CAST(rt AS HUGEINT) * ct AS num,
           CAST(rt AS HUGEINT) * ct * n AS den
    FROM rt CROSS JOIN ct
    LEFT JOIN obs USING (r, cc)
    CROSS JOIN tot
)
SELECT CAST(sum((num * num * 1000000 * 2 + den) // (2 * den)) AS BIGINT)
           AS chi2_micros,
       CAST(((SELECT count(*) FROM rt) - 1)
            * ((SELECT count(*) FROM ct) - 1) AS BIGINT) AS dof,
       any_value(n) AS n
FROM terms
"""


def q_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PSI distribution-drift report between two snapshot halves of
    events.value (reference = even event ids, current = odd — stands
    in for two crawl/ingest snapshots). Equal-frequency bins from the
    reference's rank-selected elements; integer-micros contract."""
    from demo_flink_spark.operators.quality_checks import psi_drift_report

    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    ref = ev.filter(F.col("event_id") % 2 == 0)
    cur = ev.filter(F.col("event_id") % 2 == 1)
    return psi_drift_report(ref, cur, "value", "event_id", n_bins=10)


def _psi_oracle() -> str:
    from demo_flink_spark.operators.relational import softln_ratio_sql

    soft_ab = softln_ratio_sql("a", "b")
    soft_ba = softln_ratio_sql("b", "a")
    return """
    WITH r AS (
        SELECT value AS v, event_id AS tb FROM events
        WHERE value IS NOT NULL AND event_id % 2 = 0
    ),
    c AS (
        SELECT value AS v, event_id AS tb FROM events
        WHERE value IS NOT NULL AND event_id % 2 = 1
    ),
    ranked AS (
        SELECT v, row_number() OVER (ORDER BY v, tb) AS rn,
               count(*) OVER () AS n
        FROM r
    ),
    edges AS (
        SELECT list_sort(list(v)) AS edges FROM ranked
        WHERE rn IN ({ranks})
    ),
    nr AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM r),
    ncur AS (SELECT CAST(count(*) AS BIGINT) AS n_cur FROM c),
    rb AS (
        SELECT 1 + len(list_filter(edges, e -> e < v)) AS bin,
               CAST(count(*) AS BIGINT) AS c_ref
        FROM r, edges GROUP BY 1
    ),
    cb AS (
        SELECT 1 + len(list_filter(edges, e -> e < v)) AS bin,
               CAST(count(*) AS BIGINT) AS c_cur
        FROM c, edges GROUP BY 1
    ),
    bins AS (
        SELECT CAST(i AS INTEGER) AS bin,
               coalesce(rb.c_ref, 0) AS c_ref,
               coalesce(cb.c_cur, 0) AS c_cur,
               n_ref, n_cur
        FROM range(1, 11) t(i)
        LEFT JOIN rb ON rb.bin = i
        LEFT JOIN cb ON cb.bin = i
        CROSS JOIN nr CROSS JOIN ncur
    ),
    terms AS (
        SELECT bin, c_ref, c_cur,
               CAST(CAST(round(
                   (CAST(c_ref + 1 AS DOUBLE) / CAST(n_ref + 10 AS DOUBLE)
                    - CAST(c_cur + 1 AS DOUBLE) / CAST(n_cur + 10 AS DOUBLE))
                   * (CASE WHEN a <= b THEN {soft_ab}
                           ELSE -({soft_ba}) END), 6)
                 AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS term_micros
        FROM (
            SELECT bin, c_ref, c_cur, n_ref, n_cur,
                   (c_ref + 1) * (n_cur + 10) AS a,
                   (c_cur + 1) * (n_ref + 10) AS b
            FROM bins
        )
    )
    SELECT bin, c_ref, c_cur, term_micros,
           CAST(sum(term_micros) OVER () AS BIGINT) AS psi_total_micros
    FROM terms
    """.format(
        ranks=", ".join(f"(n * {i}) // 10" for i in range(1, 10)),
        soft_ab=soft_ab,
        soft_ba=soft_ba,
    )


def q_heavy_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 vocabulary terms whose relative frequency changed most
    between two corpus snapshot halves (doc_id parity) — WHICH keys
    moved the distribution PSI said moved. Exact integer
    cross-multiplied scores, deterministic tiebreak."""
    from demo_flink_spark.operators.quality_checks import heavy_change_detection
    from demo_flink_spark.operators.textstats import _tokens
    from demo_flink_spark.operators.wordcount import normalize_text

    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id",
        F.explode(_tokens(normalize_text(F.col("text")))).alias("token"),
    )
    ref = toks.filter(F.col("doc_id") % 2 == 0)
    cur = toks.filter(F.col("doc_id") % 2 == 1)
    return heavy_change_detection(ref, cur, "token", k=20)


_HEAVY_CHANGE_ORACLE = r"""
WITH tok AS (
    SELECT doc_id,
           unnest(list_filter(string_split_regex(
               regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
               w -> length(w) > 0)) AS token
    FROM documents
),
r AS (SELECT token FROM tok WHERE doc_id % 2 = 0),
c AS (SELECT token FROM tok WHERE doc_id % 2 = 1),
rc AS (SELECT token AS key, CAST(count(*) AS BIGINT) AS c_ref FROM r GROUP BY 1),
cc AS (SELECT token AS key, CAST(count(*) AS BIGINT) AS c_cur FROM c GROUP BY 1),
nr AS (SELECT CAST(count(*) AS BIGINT) AS n_ref FROM r),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cur FROM c)
SELECT key,
       coalesce(c_ref, 0) AS c_ref,
       coalesce(c_cur, 0) AS c_cur,
       CAST(abs(coalesce(c_ref, 0) * n_cur - coalesce(c_cur, 0) * n_ref)
            AS BIGINT) AS change_score
FROM rc FULL OUTER JOIN cc USING (key)
CROSS JOIN nr CROSS JOIN nc
ORDER BY change_score DESC, key ASC
LIMIT 20
"""


SPECS = [
    QuerySpec("dq_constraint_report", q_dq_report, oracle=_DQ_ORACLE),
    QuerySpec("skew_report_events", q_skew_report, oracle=_SKEW_ORACLE),
    QuerySpec("corpus_health_report", q_corpus_health, oracle=_health_oracle()),
    QuerySpec("drift_psi_report", q_psi_drift, oracle=_psi_oracle()),
    QuerySpec(
        "drift_heavy_change", q_heavy_change, oracle=_HEAVY_CHANGE_ORACLE
    ),
    QuerySpec("dq_benford_prices", q_benford, oracle=_BENFORD_ORACLE),
    QuerySpec(
        "dq_chi_square_independence", q_chi_square, oracle=_CHI_SQUARE_ORACLE
    ),
]
