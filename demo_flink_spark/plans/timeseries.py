"""Declared queries: regular-grid time-series operators over `events`
(gap-fill + LOCF, trailing z-score anomalies).

Both carry full DuckDB oracles: the grid twin is generate_series +
LEFT JOIN + `last_value IGNORE NULLS`; the z-score twin repeats the
decimal-exact trailing-sum formula so z bit-matches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators import timeseries as ts
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly grid of high-value (value > 180) event readings per
    event_type, max per occupied bucket, LOCF through the gaps — the
    `time_bucket_gapfill` + `locf` hypertable staple."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value") > 180)
    return ts.gapfill_locf(
        ev, key_col="event_type", ts_col="ts", value_col="value", step="1 hour"
    )


def q_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Events whose value deviates >2.5 trailing sample stddevs from
    their event_type's last-100-reading mean."""
    ev = load_table(spark, sf_dir, "events")
    return ts.zscore_anomalies(
        ev,
        key_col="event_type",
        ts_col="ts",
        order_tiebreak="event_id",
        value_col="value",
        n_trailing=100,
        threshold=2.5,
    )


def q_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier summary (Hampel statistic): lower-median
    ELEMENTS by rank for med and MAD — no interpolation, no rounding —
    and the k=3 outlier count. The robust complement of
    `ts_zscore_anomalies` (50% breakdown point vs 0 for mean/σ)."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ts.mad_outliers(
        ev, key_col="event_type", value_col="value", tiebreak_col="event_id", k=3.0
    )


def q_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page's CUSUM drift monitor per event_type (closed form: prefix
    sum − running min over one keyed window), integer-micros contract."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    return ts.cusum_drift(
        ev, key_col="event_type", ts_col="ts", tiebreak_col="event_id",
        value_col="value", target=100.0, slack=5.0, h=500.0,
    )


def q_ohlc_bars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """15-minute OHLC resample of events per event_type
    (operators/timeseries.py::ohlc_bars): open/close by explicit
    (ts, event_id) total order, high/low/count, decimal-exact sum —
    one keyed exchange for the whole resample."""
    from demo_flink_spark.operators.timeseries import ohlc_bars

    return ohlc_bars(load_table(spark, sf_dir, "events")).select(
        F.col("key").alias("event_type"),
        "bucket_ts",
        "n_ticks",
        "open",
        "high",
        "low",
        "close",
        "vsum",
    )


_OHLC_ORACLE = """
WITH base AS (
    SELECT event_type AS key,
           to_timestamp(CAST(floor(epoch(ts) / 900) AS BIGINT) * 900)
               AT TIME ZONE 'UTC' AS bucket_ts,
           ts, event_id, value AS v
    FROM events
),
marked AS (
    SELECT key, bucket_ts, v,
           row_number() OVER (PARTITION BY key, bucket_ts
                              ORDER BY ts ASC, event_id ASC) AS ra,
           row_number() OVER (PARTITION BY key, bucket_ts
                              ORDER BY ts DESC, event_id DESC) AS rd
    FROM base
)
SELECT key AS event_type, bucket_ts,
       CAST(count(*) AS BIGINT) AS n_ticks,
       max(CASE WHEN ra = 1 THEN v END) AS open,
       max(v) AS high,
       min(v) AS low,
       max(CASE WHEN rd = 1 THEN v END) AS close,
       CAST(sum(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS vsum
FROM marked
GROUP BY key, bucket_ts
"""


def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing EWMA (alpha=1/2, 8-reading frame) per event_type
    (operators/timeseries.py::ewma_trailing) — bit-exact across
    engines via literal power-of-two weights and a strict
    left-to-right fold, no rounding anywhere."""
    from demo_flink_spark.operators.timeseries import ewma_trailing

    return ewma_trailing(load_table(spark, sf_dir, "events"))


_POW2_SQL = "[" + ", ".join(f"{float(1 << k)!r}" for k in range(8)) + "]"

_EWMA_ORACLE = f"""
WITH frames AS (
    SELECT event_type, ts, event_id, value,
           list(CAST(value AS DOUBLE)) OVER (
               PARTITION BY event_type ORDER BY ts, event_id
               ROWS BETWEEN 7 PRECEDING AND CURRENT ROW) AS vals
    FROM events
)
SELECT event_type, ts, event_id, value,
       CAST(len(vals) AS INTEGER) AS n_win,
       list_reduce(list_transform(range(1, len(vals) + 1),
           i -> vals[i] / ({_POW2_SQL})[len(vals) - i + 1]),
           (a, b) -> a + b)
       /
       list_reduce(list_transform(range(1, len(vals) + 1),
           i -> 1.0 / ({_POW2_SQL})[len(vals) - i + 1]),
           (a, b) -> a + b) AS ewma
FROM frames
"""


def q_linear_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type least-squares trend (operators/timeseries.py::
    linear_trend): integer sufficient statistics, bit-exact slope and
    intercept with no rounding step."""
    from demo_flink_spark.operators.timeseries import linear_trend

    return linear_trend(load_table(spark, sf_dir, "events"))


_TREND_ORACLE = """
WITH base AS (
    SELECT event_type AS key,
           CAST(epoch_us(ts) - min(epoch_us(ts)) OVER (
               PARTITION BY event_type) AS HUGEINT) AS x,
           CAST(round(value * 100) AS HUGEINT) AS y
    FROM events
),
agg AS (
    SELECT key, CAST(count(*) AS HUGEINT) AS n,
           sum(x) AS sx, sum(y) AS sy,
           sum(x * y) AS sxy, sum(x * x) AS sxx
    FROM base GROUP BY key
),
s AS (
    SELECT key, n, sx, sy,
           CASE WHEN n * sxx - sx * sx <> 0
                THEN CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE)
                ELSE 0.0 END AS slope
    FROM agg
)
SELECT key AS event_type,
       CAST(n AS BIGINT) AS n,
       slope * 36000000.0 AS slope_per_hour,
       (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
        - slope * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))) / 100.0
           AS intercept
FROM s
"""


def q_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation at lags 1-4 per event_type
    (operators/timeseries.py::acf_exact): integer sufficient
    statistics — n·(y−ȳ) = n·y−S termwise, the n² factors cancel in
    the ratio — so only the final division is a double, bit-identical
    cross-engine with no rounding step."""
    from demo_flink_spark.operators.timeseries import acf_exact

    return acf_exact(load_table(spark, sf_dir, "events"), max_lag=4)


_ACF_ORACLE = """
WITH base AS (
    SELECT event_type AS key, ts, event_id AS tb,
           CAST(round(value * 100) AS HUGEINT) AS y
    FROM events WHERE value IS NOT NULL
),
c AS (
    SELECT key, ts, tb,
           CAST(count(*) OVER (PARTITION BY key) AS HUGEINT) * y
             - sum(y) OVER (PARTITION BY key) AS c
    FROM base
),
l AS (
    SELECT key, c,
           lag(c, 1) OVER w AS c1, lag(c, 2) OVER w AS c2,
           lag(c, 3) OVER w AS c3, lag(c, 4) OVER w AS c4
    FROM c WINDOW w AS (PARTITION BY key ORDER BY ts, tb)
),
a AS (
    SELECT key, CAST(count(*) AS BIGINT) AS n, sum(c * c) AS den,
           sum(c * c1) AS n1, sum(c * c2) AS n2,
           sum(c * c3) AS n3, sum(c * c4) AS n4
    FROM l GROUP BY key
)
SELECT key AS event_type, n, u.lag, CASE WHEN den <> 0
           THEN CAST(u.num AS DOUBLE) / CAST(den AS DOUBLE)
           ELSE 0.0 END AS acf
FROM a, (VALUES (1), (2), (3), (4)) AS lags(lag),
LATERAL (SELECT CASE lags.lag WHEN 1 THEN n1 WHEN 2 THEN n2
                WHEN 3 THEN n3 ELSE n4 END AS num,
                lags.lag AS lag) AS u
"""


def q_seasonal_naive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-naive (lag-24) forecast backtest per event_type
    (operators/timeseries.py::seasonal_naive_eval): MAE / sMAPE / MASE
    as exact integer micros — every division is the (2a+b) div 2b
    half-away form over decimal/HUGEINT sums; no float anywhere."""
    from demo_flink_spark.operators.timeseries import seasonal_naive_eval

    return seasonal_naive_eval(
        load_table(spark, sf_dir, "events"), season=24
    )


_SEASONAL_ORACLE = """
WITH base AS (
    SELECT event_type AS key, ts, event_id AS tb,
           CAST(round(value * 100) AS HUGEINT) AS y
    FROM events WHERE value IS NOT NULL
),
l AS (
    SELECT key, y, lag(y, 24) OVER w AS ym, lag(y, 1) OVER w AS y1
    FROM base WINDOW w AS (PARTITION BY key ORDER BY ts, tb)
),
t AS (
    SELECT key, y, ym, y1,
           CASE WHEN ym IS NULL THEN NULL
                WHEN abs(y) + abs(ym) = 0 THEN CAST(0 AS HUGEINT)
                ELSE (4 * abs(y - ym) * 1000000 + (abs(y) + abs(ym)))
                     // (2 * (abs(y) + abs(ym))) END AS sm
    FROM l
),
a AS (
    SELECT key, CAST(count(ym) AS HUGEINT) AS nm,
           CAST(count(y1) AS HUGEINT) AS n1,
           sum(abs(y - ym)) AS sem,
           sum(abs(y - y1)) AS se1,
           sum(sm) AS ssm
    FROM t GROUP BY key
)
SELECT key AS event_type,
       CAST(nm AS BIGINT) AS n_eval,
       CAST((2 * sem * 10000 + nm) // (2 * nm) AS BIGINT) AS mae_micros,
       CAST((2 * ssm + nm) // (2 * nm) AS BIGINT) AS smape_micros,
       CAST(CASE WHEN se1 <> 0 THEN
            (2 * sem * n1 * 1000000 + se1 * nm) // (2 * se1 * nm)
            END AS BIGINT) AS mase_micros
FROM a WHERE nm > 0
"""


def q_stl_residual_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seasonal-aware anomaly summary: MAD/Hampel statistics over the
    STL RESIDUAL series — the composition that plain z-scoring can't
    match (it flags every daily peak; detrending + deseasonalizing
    first means only genuine departures from the key's own rhythm
    count as outliers). Both stages are the existing exact operators
    (`stl_decompose` → `mad_outliers`), integers end to end."""
    dec = ts.stl_decompose(load_table(spark, sf_dir, "events"))
    return ts.mad_outliers(
        dec,
        key_col="key",
        value_col="residual_micros",
        tiebreak_col="window_start",
        k=3.0,
    )


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type winsorization of `value` at the exact [p1, p99]
    rank-selected elements (operators/timeseries.py::winsorize):
    float-free fence contract, clip + audit flag."""
    return ts.winsorize(
        load_table(spark, sf_dir, "events"), "event_type", "value", "event_id"
    )


def q_cross_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson cross-correlation of click vs error hourly counts,
    zero-filled on the union grid
    (operators/timeseries.py::cross_correlation): exact decimal
    sufficient statistics, one final double correlation."""
    return ts.cross_correlation(
        load_table(spark, sf_dir, "events"), "click", "error"
    )


def q_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STL-lite decomposition of per-event_type hourly counts into
    trend (±12h centered MA on a RANGE frame) + hour-of-day seasonal
    + residual, all in exact integer micros
    (operators/timeseries.py::stl_decompose)."""
    return ts.stl_decompose(load_table(spark, sf_dir, "events"))


SPECS = [
    QuerySpec("ts_acf", q_acf, oracle=_ACF_ORACLE),
    QuerySpec(
        "ts_seasonal_naive_eval", q_seasonal_naive, oracle=_SEASONAL_ORACLE
    ),
    QuerySpec(
        "ts_cusum_drift",
        q_cusum,
        # decimal-exact prefix sum and running min; scale-6 integer
        # output contract — no double anywhere
        oracle="""
        WITH p AS (
            SELECT event_type AS key, ts, event_id AS tb,
                   SUM(CAST(value AS DECIMAL(38,6)) - 105.0)
                       OVER w AS pfx
            FROM events WHERE value IS NOT NULL
            WINDOW w AS (
                PARTITION BY event_type ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        ),
        s AS (
            SELECT key, ts,
                   pfx - least(CAST(0 AS DECIMAL(38,6)),
                               min(pfx) OVER w2) AS cus
            FROM p
            WINDOW w2 AS (
                PARTITION BY key ORDER BY ts, tb
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
            )
        )
        SELECT key AS event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(count(*) FILTER (WHERE cus > 500.0) AS BIGINT)
                   AS n_alarms,
               CAST(max(cus) * 1000000 AS BIGINT) AS max_cusum_micros,
               min(ts) FILTER (WHERE cus > 500.0) AS first_alarm_ts
        FROM s GROUP BY key
        """,
    ),
    QuerySpec(
        "anomaly_mad_hampel",
        q_mad_outliers,
        # both medians are rank-selected ELEMENTS ((n+1)//2 under the
        # (value, event_id) total order) — bit-copied doubles, so the
        # hash needs no float tolerance anywhere
        oracle="""
        WITH ranked AS (
            SELECT event_type AS key, value AS v, event_id AS tb,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL
        ),
        med AS (SELECT key, v AS med, n FROM ranked WHERE rn = (n + 1) // 2),
        dev AS (
            SELECT r.key, r.v, r.tb, abs(r.v - m.med) AS absdev
            FROM ranked r JOIN med m ON r.key = m.key
        ),
        dr AS (
            SELECT key, absdev,
                   row_number() OVER (
                       PARTITION BY key ORDER BY absdev, tb
                   ) AS rn,
                   count(*) OVER (PARTITION BY key) AS n
            FROM dev
        ),
        mad AS (SELECT key, absdev AS mad FROM dr WHERE rn = (n + 1) // 2)
        SELECT d.key AS event_type, CAST(m.n AS BIGINT) AS n, m.med, md.mad,
               CAST(count(*) FILTER (WHERE d.absdev > 3.0 * md.mad)
                    AS BIGINT) AS n_outliers
        FROM dev d
        JOIN med m ON d.key = m.key
        JOIN mad md ON d.key = md.key
        GROUP BY d.key, m.n, m.med, md.mad
        """,
    ),
    QuerySpec("ohlc_bars_15m", q_ohlc_bars, oracle=_OHLC_ORACLE),
    QuerySpec("ts_ewma_trailing", q_ewma, oracle=_EWMA_ORACLE),
    QuerySpec("ts_linear_trend", q_linear_trend, oracle=_TREND_ORACLE),
    QuerySpec(
        "ts_gapfill_locf",
        q_gapfill_locf,
        oracle="""
        WITH vals AS (
          SELECT event_type AS key, date_trunc('hour', ts) AS bucket_ts,
                 max(value) AS v
          FROM events WHERE value > 180 GROUP BY 1, 2
        ), spans AS (
          SELECT key, min(bucket_ts) AS lo, max(bucket_ts) AS hi
          FROM vals GROUP BY 1
        ), grid AS (
          SELECT key, unnest(generate_series(lo, hi, INTERVAL 1 HOUR))
                   AS bucket_ts
          FROM spans
        )
        SELECT g.key AS event_type, g.bucket_ts,
               last_value(v.v IGNORE NULLS) OVER (
                 PARTITION BY g.key ORDER BY g.bucket_ts
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
               ) AS value_filled,
               v.v IS NULL AS is_gap
        FROM grid g LEFT JOIN vals v
          ON g.key = v.key AND g.bucket_ts = v.bucket_ts
        """,
    ),
    QuerySpec(
        "ts_anomaly_zscore",
        q_zscore_anomalies,
        oracle="""
        WITH w AS (
          SELECT event_type, ts, event_id, value,
                 count(value) OVER win AS n_win,
                 CAST(sum(CAST(value AS DECIMAL(38,6))) OVER win
                      AS DOUBLE) AS s1,
                 CAST(sum(CAST(value * value AS DECIMAL(38,6))) OVER win
                      AS DOUBLE) AS s2
          FROM events
          WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                         ROWS BETWEEN 99 PRECEDING AND CURRENT ROW)
        )
        SELECT event_type, ts, event_id, value,
               (value - s1 / n_win)
                 / sqrt((s2 - s1 * s1 / n_win) / (n_win - 1)) AS z
        FROM w
        WHERE n_win >= 8
          AND abs((value - s1 / n_win)
                  / sqrt((s2 - s1 * s1 / n_win) / (n_win - 1))) > 2.5
        """,
    ),
    QuerySpec(
        "anomaly_stl_residual",
        q_stl_residual_anomaly,
        # the stl CTE chain verbatim, then the MAD rank-median SQL
        # over the residual column — all-integer medians/fences
        oracle="""
        WITH hourly AS (
            SELECT event_type AS key,
                   date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT key, window_start, cnt,
                   CAST(epoch(window_start) AS BIGINT) AS epoch_s,
                   CAST((CAST(epoch(window_start) AS BIGINT) // 3600) % 24 AS INTEGER) AS phase
            FROM hourly
        ),
        tr AS (
            SELECT key, window_start, cnt, phase,
                   CAST(SUM(cnt) OVER fr AS BIGINT) AS w_sum,
                   CAST(COUNT(*) OVER fr AS BIGINT) AS w_n
            FROM w
            WINDOW fr AS (PARTITION BY key ORDER BY epoch_s
                          RANGE BETWEEN 43200 PRECEDING
                                    AND 43200 FOLLOWING)
        ),
        det AS (
            SELECT key, window_start, phase,
                   cnt * 1000000
                     - (w_sum * 2000000 + w_n) // (2 * w_n) AS detr_micros
            FROM tr
        ),
        seas AS (
            SELECT key, window_start, detr_micros,
                   CAST(SUM(detr_micros) OVER pw AS BIGINT) AS p_sum,
                   CAST(COUNT(*) OVER pw AS BIGINT) AS p_n
            FROM det
            WINDOW pw AS (PARTITION BY key, phase)
        ),
        stl AS (
            SELECT key, window_start,
                   detr_micros
                     - (CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)
                       * ((abs(p_sum) * 2 + p_n) // (2 * p_n)) AS v
            FROM seas
        ),
        ranked AS (
            SELECT key, v, window_start AS tb,
                   row_number() OVER (
                       PARTITION BY key ORDER BY v, window_start
                   ) AS rn,
                   count(*) OVER (PARTITION BY key) AS n
            FROM stl
        ),
        med AS (SELECT key, v AS med, n FROM ranked
                WHERE rn = (n + 1) // 2),
        dev AS (
            SELECT r.key, r.v, r.tb, abs(r.v - m.med) AS absdev
            FROM ranked r JOIN med m ON r.key = m.key
        ),
        dr AS (
            SELECT key, absdev,
                   row_number() OVER (
                       PARTITION BY key ORDER BY absdev, tb
                   ) AS rn,
                   count(*) OVER (PARTITION BY key) AS n
            FROM dev
        ),
        mad AS (SELECT key, absdev AS mad FROM dr WHERE rn = (n + 1) // 2)
        SELECT d.key, CAST(m.n AS BIGINT) AS n, m.med, md.mad,
               CAST(count(*) FILTER (WHERE d.absdev > 3.0 * md.mad)
                    AS BIGINT) AS n_outliers
        FROM dev d
        JOIN med m ON d.key = m.key
        JOIN mad md ON d.key = md.key
        GROUP BY d.key, m.n, m.med, md.mad
        """,
    ),
    QuerySpec(
        "feature_winsorize_events",
        q_winsorize,
        oracle="""
        WITH r AS (
            SELECT event_type, event_id, value,
                   row_number() OVER (
                       PARTITION BY event_type ORDER BY value, event_id
                   ) AS rn,
                   count(*) OVER (PARTITION BY event_type) AS n
            FROM events WHERE value IS NOT NULL
        ),
        f AS (
            SELECT event_type,
                   max(CASE WHEN rn = ((n - 1) * 1) // 100 + 1
                            THEN value END) AS fence_lo,
                   max(CASE WHEN rn = ((n - 1) * 99) // 100 + 1
                            THEN value END) AS fence_hi
            FROM r GROUP BY event_type
        )
        SELECT e.event_type, e.event_id, e.value,
               CASE WHEN e.value IS NULL THEN NULL
                    ELSE greatest(least(e.value, f.fence_hi), f.fence_lo)
               END AS value_winsorized,
               CASE WHEN e.value IS NULL THEN false
                    ELSE e.value < f.fence_lo OR e.value > f.fence_hi
               END AS was_clipped
        FROM events e LEFT JOIN f USING (event_type)
        """,
    ),
    QuerySpec(
        "ts_cross_correlation",
        q_cross_correlation,
        oracle="""
        WITH b AS (
            SELECT date_trunc('hour', ts) AS bucket, event_type AS k,
                   CAST(count(*) AS BIGINT) AS c
            FROM events WHERE event_type IN ('click', 'error')
            GROUP BY 1, 2
        ),
        al AS (
            SELECT CAST(coalesce(a.c, 0) AS HUGEINT) AS x,
                   CAST(coalesce(e.c, 0) AS HUGEINT) AS y
            FROM (SELECT bucket, c FROM b WHERE k = 'click') a
            FULL OUTER JOIN (SELECT bucket, c FROM b WHERE k = 'error') e
            USING (bucket)
        ),
        agg AS (
            SELECT CAST(count(*) AS HUGEINT) AS n,
                   sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
                   sum(x * x) AS sxx, sum(y * y) AS syy
            FROM al
        )
        SELECT 'click' AS type_a, 'error' AS type_b,
               CAST(n AS BIGINT) AS n_buckets,
               CAST(n * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS r
        FROM agg
        """,
    ),
    QuerySpec(
        "ts_stl_decompose",
        q_stl_decompose,
        # same ±12h RANGE-frame MA + per-(key, hour-of-day) phase mean,
        # every mean as round-half-away integer division in micros —
        # all-integer output, hash-exact by construction
        oracle="""
        WITH hourly AS (
            SELECT event_type AS key,
                   date_trunc('hour', ts) AS window_start,
                   CAST(count(*) AS BIGINT) AS cnt
            FROM events GROUP BY 1, 2
        ),
        w AS (
            SELECT key, window_start, cnt,
                   CAST(epoch(window_start) AS BIGINT) AS epoch_s,
                   CAST((CAST(epoch(window_start) AS BIGINT) // 3600) % 24 AS INTEGER) AS phase
            FROM hourly
        ),
        tr AS (
            SELECT key, window_start, cnt, phase,
                   CAST(SUM(cnt) OVER fr AS BIGINT) AS w_sum,
                   CAST(COUNT(*) OVER fr AS BIGINT) AS w_n
            FROM w
            WINDOW fr AS (PARTITION BY key ORDER BY epoch_s
                          RANGE BETWEEN 43200 PRECEDING
                                    AND 43200 FOLLOWING)
        ),
        det AS (
            SELECT key, window_start, cnt, phase,
                   (w_sum * 2000000 + w_n) // (2 * w_n) AS trend_micros,
                   cnt * 1000000
                     - (w_sum * 2000000 + w_n) // (2 * w_n) AS detr_micros
            FROM tr
        ),
        seas AS (
            SELECT key, window_start, cnt, trend_micros, detr_micros,
                   CAST(SUM(detr_micros) OVER pw AS BIGINT) AS p_sum,
                   CAST(COUNT(*) OVER pw AS BIGINT) AS p_n
            FROM det
            WINDOW pw AS (PARTITION BY key, phase)
        )
        SELECT key, window_start, cnt, trend_micros,
               (CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)
                 * ((abs(p_sum) * 2 + p_n) // (2 * p_n)) AS seasonal_micros,
               detr_micros
                 - (CASE WHEN p_sum < 0 THEN -1 ELSE 1 END)
                   * ((abs(p_sum) * 2 + p_n) // (2 * p_n)) AS residual_micros
        FROM seas
        """,
    ),
]
