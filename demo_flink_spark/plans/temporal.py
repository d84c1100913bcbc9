"""Declared queries: temporal joins & rollups over `events`.

as-of join and range join carry full DuckDB oracles (DuckDB has native
ASOF JOIN; the range join's twin is a plain inequality join — fine at
oracle scale, which is exactly the asymmetry the bucketed Spark
implementation exists to avoid at 100 TB). The multi-granularity
rollup oracle mirrors the hourly→daily re-aggregation structure.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import temporal as tp
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each click, the user's most recent purchase value at-or-
    before the click (NULL when no purchase precedes)."""
    ev = load_table(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return tp.asof_join(clicks, purchases, key="user_id", value_cols=["value"])


def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """For each error, the user's NEXT purchase value at-or-after the
    error (forward as-of; NULL when no purchase follows) — the
    recovery-tracking twin of the backward join."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "value"
    )
    return tp.asof_join(
        errors, purchases, key="user_id", value_cols=["value"],
        direction="forward",
    )


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(error, click) pairs of the same user within ±5 minutes."""
    ev = load_table(spark, sf_dir, "events")
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", "event_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "event_id", "ts"
    )
    out = tp.range_join_window(errors, clicks, key="user_id", window_ms=300_000)
    return out.select(
        "user_id",
        "event_id",
        F.col("r_event_id").alias("click_event_id"),
        F.col("delta_ms").cast("long").alias("delta_ms"),
    )


def q_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping interval pairs across the whole corpus (UNKEYED —
    the shape the per-user range join can't express): 10-minute error
    windows × 10-minute signup windows, matched by the grid-bucket
    equi-join rewrite (operators/temporal.py::interval_overlap_join),
    never an inequality BNL join."""
    from demo_flink_spark.functions.time import epoch_ms

    ev = load_table(spark, sf_dir, "events")

    def windows(etype: str) -> DataFrame:
        return ev.filter(F.col("event_type") == etype).select(
            F.col("event_id").alias("id"),
            epoch_ms("ts").alias("start_ms"),
            (epoch_ms("ts") + 600_000).alias("end_ms"),
        )

    return tp.interval_overlap_join(
        windows("error"), windows("signup"), grid_ms=600_000
    )


def q_rollup_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour→day continuous-aggregate rollup of value by event_type."""
    ev = load_table(spark, sf_dir, "events")
    return tp.rollup_time_multi(
        ev, "ts", "event_type", "value", grains=("1 hour", "1 day")
    )


def q_scd2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 from an event log: per
    customer, each order becomes a validity interval
    [valid_from, valid_to) closed by the next order, open-ended for
    the latest (`is_current`).

    One window pass over a single shuffle on the key — the standard
    way to rebuild SCD2 history at scale (no self-join). Determinism:
    the window order includes the unique o_orderkey tiebreaker.
    """
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderdate").over(w)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderstatus",
        F.col("o_orderdate").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def q_cep_pattern(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CEP-lite strict-contiguity pattern (operators/temporal.py::
    sequence_pattern_matches): per user, every consecutive
    view→click→purchase run completing within 12 hours (the bound
    excludes roughly half the unbounded runs on this fixture — the
    within clause is load-bearing, not decorative) — the Flink-CEP
    begin.next.next.within chain as one keyed window pass."""
    from demo_flink_spark.operators.temporal import sequence_pattern_matches

    return sequence_pattern_matches(
        load_table(spark, sf_dir, "events"),
        ["view", "click", "purchase"],
        within="12 hours",
    )


_CEP_ORACLE = """
WITH staged AS (
    SELECT user_id,
           event_id AS start_event_id,
           ts AS start_ts,
           event_type AS t0,
           lead(event_type, 1) OVER w AS t1,
           lead(event_type, 2) OVER w AS t2,
           lead(ts, 2) OVER w AS end_ts
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
)
SELECT user_id, start_event_id, start_ts, end_ts
FROM staged
WHERE t0 = 'view' AND t1 = 'click' AND t2 = 'purchase'
  AND end_ts <= start_ts + INTERVAL 12 HOUR
"""


def q_funnel_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: first-view → first-purchase
    latency per converting user, summarized as EXACT rank-selected
    p50/p90 second-elements per user cohort (user_id mod 4 — the
    deterministic stand-in for an acquisition-channel dimension).
    Integer seconds end to end (the quantile_disc float-free
    contract); one user aggregate + one keyed rank window."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.min(
                F.when(F.col("event_type") == "view", F.col("ts"))
            ).alias("t_view"),
            F.min(
                F.when(F.col("event_type") == "purchase", F.col("ts"))
            ).alias("t_purchase"),
        )
        .filter(F.col("t_view") < F.col("t_purchase"))
        .select(
            (F.col("user_id") % 4).cast("int").alias("cohort"),
            "user_id",
            (
                F.unix_timestamp("t_purchase") - F.unix_timestamp("t_view")
            ).alias("latency_s"),
        )
    )
    w = Window.partitionBy("cohort").orderBy("latency_s", "user_id")
    r = per_user.select(
        "cohort",
        "latency_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("cohort")).alias("n"),
    )
    pick = lambda pct: F.max(  # noqa: E731
        F.when(
            F.expr(f"rn = ((n - 1) * {pct}) div 100 + 1"),
            F.col("latency_s"),
        )
    )
    return r.groupBy("cohort").agg(
        F.max("n").cast("long").alias("n_converted"),
        pick(50).alias("p50_s"),
        pick(90).alias("p90_s"),
    )


def _rolling_active_users(
    spark: SparkSession,
    sf_dir: str,
    window_days: int,
    metric: str,
    ratio_name: str,
) -> DataFrame:
    """DAU + trailing-`window_days`-day distinct actives per observed
    activity day. Exact distinct users with NO distinct-over-window
    (not expressible) and NO k-way self-join: each deduped
    (user, active-day) pair is EXPLODED onto the `window_days` target
    days it supports, and the rolling count is a plain count-distinct
    per target day — a bounded ×k linear expansion. The dau join
    already restricts output to observed activity days (every rolling
    day >= its source day), so no extra trimming is needed; the first
    `window_days - 1` days of the data necessarily report a TRUNCATED
    trailing window (counting from data start) — the standard
    dashboard ramp-up semantics. Ratio = round-half-away
    DAU·1e6/metric."""
    ev = load_table(spark, sf_dir, "events")
    ud = ev.select(
        F.col("user_id"), F.date_trunc("day", F.col("ts")).alias("day")
    ).distinct()
    dau = ud.groupBy("day").agg(F.countDistinct("user_id").alias("dau"))
    contrib = ud.select(
        "user_id",
        F.explode(
            F.expr(
                f"sequence(day, day + interval {window_days - 1} days,"
                " interval 1 day)"
            )
        ).alias("day"),
    )
    rolling = contrib.groupBy("day").agg(
        F.countDistinct("user_id").alias(metric)
    )
    return dau.join(rolling, "day").select(
        "day",
        F.col("dau").cast("long").alias("dau"),
        F.col(metric).cast("long").alias(metric),
        F.expr(f"(dau * 2000000 + {metric}) div (2 * {metric})").alias(
            ratio_name
        ),
    )


def _rolling_active_oracle(window_days: int, metric: str, ratio_name: str) -> str:
    """DuckDB twin of `_rolling_active_users` — same explode-onto-
    target-days construction, parameterized once for WAU and MAU."""
    return f"""
        WITH ud AS (
            SELECT DISTINCT user_id, date_trunc('day', ts) AS day
            FROM events
        ),
        dau AS (
            SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
            FROM ud GROUP BY day
        ),
        contrib AS (
            SELECT user_id, day + (k * INTERVAL '1 day') AS day
            FROM ud, LATERAL unnest(range(0, {window_days})) AS u(k)
        ),
        rolling AS (
            SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS {metric}
            FROM contrib GROUP BY day
        )
        SELECT d.day, d.dau, r.{metric},
               (d.dau * 2000000 + r.{metric}) // (2 * r.{metric})
                   AS {ratio_name}
        FROM dau d JOIN rolling r USING (day)
    """


def q_dau_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU / stickiness per day — the engagement
    headline (`_rolling_active_users`, window 7)."""
    return _rolling_active_users(spark, sf_dir, 7, "wau", "stickiness_micros")


def q_mau_rolling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-28-day MAU per day + DAU/MAU stickiness — closes the
    engagement family (`_rolling_active_users`, window 28)."""
    return _rolling_active_users(spark, sf_dir, 28, "mau", "dau_mau_micros")


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """view → click → purchase funnel: per-stage user counts and the
    strictly-ordered conversion count.

    One hash aggregate over (user, conditional-min timestamps) — the
    scalable funnel shape: no self-joins, no per-stage scans; stage
    ordering is checked on the aggregated row. `count_if`-style
    conditional aggregation keeps it a single shuffle on user_id.
    """
    ev = load_table(spark, sf_dir, "events")

    def first_ts(t: str):
        return F.min(F.when(F.col("event_type") == t, F.col("ts")))

    per_user = ev.groupBy("user_id").agg(
        first_ts("view").alias("t_view"),
        first_ts("click").alias("t_click"),
        first_ts("purchase").alias("t_purchase"),
    )
    return per_user.agg(
        F.count("t_view").cast("long").alias("n_viewed"),
        F.count(
            F.when(F.col("t_view") < F.col("t_click"), 1)
        ).cast("long").alias("n_clicked_after_view"),
        F.count(
            F.when(
                (F.col("t_view") < F.col("t_click"))
                & (F.col("t_click") < F.col("t_purchase")),
                1,
            )
        ).cast("long").alias("n_converted"),
    )


def q_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-transition matrix: P(next event | event) per ordered
    user stream — the Markov-chain view of clickstream paths.

    One shuffle on user_id, one window pass for `lead`, one hash
    aggregate over at most |types|² groups. Determinism: the order key
    includes the unique event_id tiebreaker (equal timestamps would
    otherwise make `lead` partition-order-dependent).
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    return pairs.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n_transitions")
    )


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, distinct
    actives counted per (cohort_day, day_offset).

    Two shuffles total: min-day per user (map-side combined), then the
    distinct (cohort, offset, user) aggregate. The per-user first-seen
    day rides the row (no re-join against a cohort table) because the
    window min over user_id reuses the same partitioning Spark already
    needs for the distinct count — at 100 TB the cohort table join
    would be the slower plan.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    day = F.date_trunc("day", "ts")
    w = Window.partitionBy("user_id")
    with_cohort = ev.select(
        "user_id",
        day.alias("day"),
    ).withColumn("cohort_day", F.min("day").over(w))
    return (
        with_cohort.groupBy(
            "cohort_day",
            F.datediff("day", "cohort_day").cast("long").alias("day_offset"),
        )
        .agg(F.count_distinct("user_id").alias("n_active"))
    )


def q_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM user segmentation — the classic behavioral quartiling
    (recency / frequency / monetary) every activation pipeline runs:
    per user, microsecond-exact recency vs the corpus max timestamp,
    event count, decimal-exact spend; each dimension quartiled by
    INTEGER rank arithmetic (rank·4 ≤ q·n — no float quantile
    boundary) over an explicit total order, composed into the segment
    label R{{r}}F{{f}}M{{m}}.

    Scale: the raw events collapse to ONE user-keyed aggregate first;
    the three ranking windows then run over the user table (|users| ≪
    |events|). The windows here are unpartitioned — bounded by user
    count; at 1e9 users swap in `global_cumsum`'s range-partitioned
    rank, same integer quartile arithmetic.
    """
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.max(F.unix_micros("ts")).alias("last_us"),
        F.count(F.lit(1)).cast("long").alias("freq"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("_spend"),
    )
    ref = ev.agg(F.max(F.unix_micros("ts")).alias("ref_us"))
    base = per_user.crossJoin(F.broadcast(ref)).select(
        "user_id",
        (F.col("ref_us") - F.col("last_us")).alias("recency_us"),
        "freq",
        F.col("_spend").cast("double").alias("monetary"),
        "_spend",
    )
    n = F.count(F.lit(1)).over(Window.partitionBy())

    def quartile(rank_col):
        return (
            F.when(rank_col * 4 <= n, 1)
            .when(rank_col * 4 <= 2 * n, 2)
            .when(rank_col * 4 <= 3 * n, 3)
            .otherwise(4)
        )

    r_rank = F.row_number().over(
        Window.orderBy(F.asc("recency_us"), F.asc("user_id"))
    )
    f_rank = F.row_number().over(
        Window.orderBy(F.desc("freq"), F.asc("user_id"))
    )
    m_rank = F.row_number().over(
        Window.orderBy(F.desc("_spend"), F.asc("user_id"))
    )
    out = base.select(
        "user_id",
        "recency_us",
        "freq",
        "monetary",
        quartile(r_rank).alias("r_q"),
        quartile(f_rank).alias("f_q"),
        quartile(m_rank).alias("m_q"),
    )
    return out.select(
        "user_id",
        "recency_us",
        "freq",
        "monetary",
        "r_q",
        "f_q",
        "m_q",
        F.concat(
            F.lit("R"), F.col("r_q"), F.lit("F"), F.col("f_q"),
            F.lit("M"), F.col("m_q"),
        ).alias("segment"),
    )


def q_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch conversion attribution: each purchase credits the
    user's most recent PRECEDING non-purchase event — one
    IGNORE-NULLS last_value window over the per-user event stream
    (single keyed exchange, no self-join), then a count per attributed
    channel. Purchases with no preceding touch attribute to
    'direct'."""
    from pyspark.sql.window import Window

    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    touch = F.last(
        F.when(F.col("event_type") != "purchase", F.col("event_type")),
        ignorenulls=True,
    ).over(w)
    return (
        ev.select("event_type", touch.alias("attributed"))
        .filter(F.col("event_type") == "purchase")
        .groupBy(F.coalesce("attributed", F.lit("direct")).alias("channel"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_purchases"))
    )


SPECS = [
    QuerySpec(
        "attribution_last_touch",
        q_attribution_last_touch,
        oracle="""
        WITH marked AS (
            SELECT event_type,
                   last_value(CASE WHEN event_type <> 'purchase'
                                   THEN event_type END IGNORE NULLS)
                       OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND 1 PRECEDING) AS attributed
            FROM events
        )
        SELECT coalesce(attributed, 'direct') AS channel,
               CAST(count(*) AS BIGINT) AS n_purchases
        FROM marked WHERE event_type = 'purchase'
        GROUP BY coalesce(attributed, 'direct')
        """,
    ),
    QuerySpec(
        "rfm_user_segments",
        q_rfm_segments,
        oracle="""
        WITH per_user AS (
            SELECT user_id,
                   max(epoch_us(ts)) AS last_us,
                   CAST(count(*) AS BIGINT) AS freq,
                   sum(CAST(value AS DECIMAL(38,6))) AS spend
            FROM events GROUP BY user_id
        ),
        base AS (
            SELECT user_id,
                   (SELECT max(epoch_us(ts)) FROM events) - last_us
                       AS recency_us,
                   freq, spend,
                   CAST(spend AS DOUBLE) AS monetary,
                   count(*) OVER () AS n,
                   row_number() OVER (ORDER BY
                       (SELECT max(epoch_us(ts)) FROM events) - last_us ASC,
                       user_id ASC) AS rr,
                   row_number() OVER (ORDER BY freq DESC, user_id ASC) AS fr,
                   row_number() OVER (ORDER BY spend DESC, user_id ASC) AS mr
            FROM per_user
        ),
        qd AS (
            SELECT user_id, recency_us, freq, monetary,
                   CASE WHEN rr * 4 <= n THEN 1 WHEN rr * 4 <= 2 * n THEN 2
                        WHEN rr * 4 <= 3 * n THEN 3 ELSE 4 END AS r_q,
                   CASE WHEN fr * 4 <= n THEN 1 WHEN fr * 4 <= 2 * n THEN 2
                        WHEN fr * 4 <= 3 * n THEN 3 ELSE 4 END AS f_q,
                   CASE WHEN mr * 4 <= n THEN 1 WHEN mr * 4 <= 2 * n THEN 2
                        WHEN mr * 4 <= 3 * n THEN 3 ELSE 4 END AS m_q
            FROM base
        )
        SELECT user_id, recency_us, freq, monetary,
               CAST(r_q AS INTEGER) AS r_q,
               CAST(f_q AS INTEGER) AS f_q,
               CAST(m_q AS INTEGER) AS m_q,
               'R' || CAST(r_q AS VARCHAR) || 'F' || CAST(f_q AS VARCHAR)
                   || 'M' || CAST(m_q AS VARCHAR) AS segment
        FROM qd
        """,
    ),
    QuerySpec(
        "interval_overlap_join",
        q_interval_overlap,
        oracle="""
        WITH a AS (
            SELECT event_id AS a_id, epoch_ms(ts) AS a_start,
                   epoch_ms(ts) + 600000 AS a_end
            FROM events WHERE event_type = 'error'
        ), b AS (
            SELECT event_id AS b_id, epoch_ms(ts) AS b_start,
                   epoch_ms(ts) + 600000 AS b_end
            FROM events WHERE event_type = 'signup'
        )
        SELECT a_id, b_id, a_start, a_end, b_start, b_end,
               least(a_end, b_end) - greatest(a_start, b_start)
                   AS overlap_ms
        FROM a JOIN b ON a_start < b_end AND b_start < a_end
        """,
    ),
    QuerySpec(
        "cep_pattern_view_click_purchase", q_cep_pattern, oracle=_CEP_ORACLE
    ),
    QuerySpec(
        "dau_wau_engagement",
        q_dau_wau,
        oracle=_rolling_active_oracle(7, "wau", "stickiness_micros"),
    ),
    QuerySpec(
        "mau_rolling_28d",
        q_mau_rolling,
        oracle=_rolling_active_oracle(28, "mau", "dau_mau_micros"),
    ),
    QuerySpec(
        "funnel_latency_quantiles",
        q_funnel_latency,
        oracle="""
        WITH pu AS (
            SELECT user_id,
                   min(CASE WHEN event_type = 'view' THEN ts END) AS tv,
                   min(CASE WHEN event_type = 'purchase' THEN ts END) AS tp
            FROM events GROUP BY user_id
        ),
        lat AS (
            -- per-timestamp integer truncation (epoch_us // 1e6)
            -- mirrors Spark's unix_timestamp, which floors EACH
            -- timestamp to seconds before the subtraction; a plain
            -- epoch(tp) - epoch(tv) keeps sub-second fractions and
            -- lands one second off half the time
            SELECT CAST(user_id % 4 AS INTEGER) AS cohort, user_id,
                   epoch_us(tp) // 1000000 - epoch_us(tv) // 1000000
                       AS latency_s
            FROM pu WHERE tv < tp
        ),
        r AS (
            SELECT cohort, latency_s,
                   row_number() OVER (
                       PARTITION BY cohort ORDER BY latency_s, user_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY cohort) AS n
            FROM lat
        )
        SELECT cohort, CAST(max(n) AS BIGINT) AS n_converted,
               max(CASE WHEN rn = ((n - 1) * 50) // 100 + 1
                        THEN latency_s END) AS p50_s,
               max(CASE WHEN rn = ((n - 1) * 90) // 100 + 1
                        THEN latency_s END) AS p90_s
        FROM r GROUP BY cohort
        """,
    ),
    QuerySpec(
        "funnel_conversion",
        q_funnel_conversion,
        oracle="""
        WITH per_user AS (
            SELECT user_id,
                   min(ts) FILTER (event_type = 'view') AS t_view,
                   min(ts) FILTER (event_type = 'click') AS t_click,
                   min(ts) FILTER (event_type = 'purchase') AS t_purchase
            FROM events
            GROUP BY user_id
        )
        SELECT count(t_view) AS n_viewed,
               count(CASE WHEN t_view < t_click THEN 1 END)
                   AS n_clicked_after_view,
               count(CASE WHEN t_view < t_click AND t_click < t_purchase
                          THEN 1 END) AS n_converted
        FROM per_user
        """,
    ),
    QuerySpec(
        "transition_matrix",
        q_transition_matrix,
        oracle="""
        WITH pairs AS (
            SELECT event_type,
                   lead(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id
                   ) AS next_type
            FROM events
        )
        SELECT event_type, next_type, count(*) AS n_transitions
        FROM pairs
        WHERE next_type IS NOT NULL
        GROUP BY event_type, next_type
        """,
    ),
    QuerySpec(
        "cohort_retention",
        q_cohort_retention,
        oracle="""
        WITH d AS (
            SELECT user_id, date_trunc('day', ts) AS day,
                   min(date_trunc('day', ts)) OVER (PARTITION BY user_id)
                       AS cohort_day
            FROM events
        )
        SELECT cohort_day,
               CAST(date_diff('day', cohort_day, day) AS BIGINT) AS day_offset,
               count(DISTINCT user_id) AS n_active
        FROM d
        GROUP BY cohort_day, day_offset
        """,
    ),
    QuerySpec(
        "scd2_orders",
        q_scd2_orders,
        oracle="""
        SELECT o_custkey, o_orderkey, o_orderstatus,
               o_orderdate AS valid_from,
               lead(o_orderdate) OVER w AS valid_to,
               lead(o_orderdate) OVER w IS NULL AS is_current
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
        """,
    ),
    QuerySpec(
        "asof_join_last_purchase",
        q_asof_join,
        oracle="""
        WITH l AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'click'),
             r AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'purchase')
        SELECT l.user_id, l.event_id, l.ts, r.value AS asof_value
        FROM l ASOF LEFT JOIN r
          ON l.user_id = r.user_id AND l.ts >= r.ts
        """,
    ),
    QuerySpec(
        "asof_join_next_purchase",
        q_asof_forward,
        # DuckDB ASOF binds only the backward direction portably, so
        # the forward twin reconstructs via min(next ts) + value lookup
        # (min(value) pins the theoretical equal-ts tie; the synthetic
        # events have no per-user ts collisions, same as the backward
        # oracle relies on)
        oracle="""
        WITH l AS (SELECT user_id, event_id, ts FROM events
                   WHERE event_type = 'error'),
             r AS (SELECT user_id, ts, value FROM events
                   WHERE event_type = 'purchase'),
             nxt AS (
                SELECT l.user_id, l.event_id, min(r.ts) AS next_ts
                FROM l LEFT JOIN r
                  ON l.user_id = r.user_id AND r.ts >= l.ts
                GROUP BY l.user_id, l.event_id
             )
        SELECT l.user_id, l.event_id, l.ts,
               (SELECT min(r2.value) FROM r r2
                WHERE r2.user_id = l.user_id AND r2.ts = n.next_ts)
                   AS asof_value
        FROM l JOIN nxt n
          ON l.user_id = n.user_id AND l.event_id = n.event_id
        """,
    ),
    QuerySpec(
        "range_join_error_click_5m",
        q_range_join,
        oracle="""
        SELECT l.user_id, l.event_id, r.event_id AS click_event_id,
               epoch_ms(l.ts) - epoch_ms(r.ts) AS delta_ms
        FROM events l JOIN events r
          ON l.user_id = r.user_id
         AND l.event_type = 'error' AND r.event_type = 'click'
         AND abs(epoch_ms(l.ts) - epoch_ms(r.ts)) <= 300000
        """,
    ),
    QuerySpec(
        "rollup_time_hour_day",
        q_rollup_multi,
        oracle="""
        WITH hourly AS (
            SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
                   event_type AS key, count(*) AS cnt,
                   SUM(CAST(value AS DECIMAL(38,6))) AS s
            FROM events GROUP BY 1, 2
        ),
        daily AS (
            -- CAST(SUM(cnt) AS BIGINT): DuckDB SUM(BIGINT) returns HUGEINT
            -- (int128); the UNION ALL below would promote the whole cnt
            -- column to HUGEINT, which round-trips as `1` via fetchall()
            -- but float 1.0 via pandas / decimal128 via Arrow — the exact
            -- local-green/driver-red split seen in rounds 3, 5, 6.
            SELECT time_bucket(INTERVAL '1 day', window_start) AS window_start,
                   key, CAST(SUM(cnt) AS BIGINT) AS cnt, SUM(s) AS s
            FROM hourly GROUP BY 1, 2
        )
        SELECT '1 hour' AS granularity, window_start, key, cnt,
               CAST(s * 1000000 AS BIGINT) AS sum_micros FROM hourly
        UNION ALL
        SELECT '1 day', window_start, key, cnt,
               CAST(s * 1000000 AS BIGINT) FROM daily
        """,
    ),
]
