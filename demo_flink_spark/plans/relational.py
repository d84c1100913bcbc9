"""Declared queries: relational core (SURVEY §7.2).

Filters/projections + every scalar-function family (§2.9 ext),
aggregations incl. distinct/cube/rollup (§2.4 ext), all join types
(§2.3 ext), sorts/limits/top-k, set ops (§2.7 ext), analytic window
functions (§2.8 ext) over the TPC-H-ish star schema.

Float discipline for oracle hash-matching: every double aggregate goes
through the decimal-exact helpers in `operators.relational` and is
rounded to 6dp on BOTH sides — see `dsum` docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from demo_flink_spark.functions.time import epoch_ms
from demo_flink_spark.operators.relational import (
    davg,
    dstddev_samp,
    dsum,
    softln_ratio,
    softln_ratio_sql,
    top_k_per_group,
)
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table

# SQL twins of the deterministic aggregate helpers.
_DSUM = "CAST(SUM(CAST({e} AS DECIMAL(38,6))) AS DOUBLE)"
_DAVG = f"({_DSUM} / COUNT({{e}}))"

# softln twin for ln(l_extendedprice + 1): ln(x) = -softln(1/x) with
# 1/x = 100 / (100·price + 100), an integer ratio in (0, 1]
# round() before the integer cast: the price is a DOUBLE, so p*100+100
# sits 1e-9 off an integer — Spark's cast("long") truncates while
# DuckDB's CAST AS BIGINT rounds; explicit round() on both sides lands
# on the same integer.
_SOFTLN_P1 = softln_ratio_sql(
    "100", "(CAST(round(l_extendedprice * 100 + 100, 0) AS BIGINT))"
)


def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary over lineitem.

    Single scan → single hash aggregate; the filter and the 6-column
    projection push into the parquet scan (verified via
    .explain: PushedFilters + ReadSchema). Map-side partial agg
    shrinks the shuffle to |groups| rows per partition — at 100 TB the
    exchange carries ~8 rows per task.
    """
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2024-09-01"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            # no final round-on-double: dsum/davg are engine-exact by
            # construction (decimal sum -> nearest-even double cast,
            # one IEEE division for avg) — a trailing round(x, 6) would
            # REINTRODUCE cross-engine drift, because Spark rounds the
            # exact binary expansion while DuckDB float-multiplies
            # (the r3 rollup_time_hour_day driver hash-fail class)
            dsum(F.col("l_quantity")).alias("sum_qty"),
            dsum(F.col("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            dsum(charge).alias("sum_charge"),
            davg(F.col("l_quantity")).alias("avg_qty"),
            davg(F.col("l_extendedprice")).alias("avg_price"),
            davg(F.col("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join, revenue agg, top-10.

    customer is tiny relative to orders/lineitem → broadcast hint;
    orders⨝lineitem is the one real shuffle (both sides hashed on
    orderkey). Top-10 via sort+limit — Spark's TakeOrderedAndProject
    keeps only 10 rows per partition, no global sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: EXISTS as a left-semi join, then count.

    Semi join sends only the join key of lineitem through the shuffle
    (Catalyst prunes to l_orderkey) and stops probing at first match.
    """
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity") > F.lit(45.0)
    )
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-way star join with broadcast dimensions.

    region/nation/customer/supplier are dimension-sized → all
    broadcast; the only shuffle join is orders⨝lineitem. This is the
    canonical 100 TB star-join shape: fact tables shuffled once,
    dims shipped to every executor.
    """
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(supp, li.l_suppkey == supp.s_suppkey)
        .join(
            cust,
            (orders.o_custkey == cust.c_custkey)
            & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(dsum(revenue).alias("revenue"))
    )


def q_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join: every customer, order count (0 for orderless)."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


def q_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left anti join: customers with no orders at all."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    ).select("c_custkey", "c_name", "c_mktsegment")


def q_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left semi join: customers with at least one open ('O') order."""
    cust = load_table(spark, sf_dir, "customer")
    open_orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        open_orders, cust.c_custkey == open_orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_mktsegment")


def q_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two per-nation aggregates (customers vs
    suppliers) — nations appearing on either side survive."""
    cust_per_nation = (
        load_table(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .agg(F.count(F.lit(1)).alias("n_cust"))
    )
    supp_per_nation = (
        load_table(spark, sf_dir, "supplier")
        .groupBy("s_nationkey")
        .agg(F.count(F.lit(1)).alias("n_supp"))
    )
    joined = cust_per_nation.join(
        supp_per_nation,
        cust_per_nation.c_nationkey == supp_per_nation.s_nationkey,
        "full_outer",
    )
    return joined.select(
        F.coalesce("c_nationkey", "s_nationkey").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )


def q_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi join + theta residual: lineitems whose quantity exceeds the
    part's size. The equi key keeps it a hash join (theta as a post-
    probe filter), never a cartesian."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    return (
        li.join(
            part,
            (li.l_partkey == part.p_partkey)
            & (li.l_quantity > part.p_size.cast("double")),
        )
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_li"),
            dsum(F.col("l_quantity")).alias("sum_qty"),
        )
    )


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per customer (SURVEY §2.7 top-k)."""
    orders = load_table(spark, sf_dir, "orders")
    return top_k_per_group(
        orders,
        ["o_custkey"],
        [F.desc("o_totalprice"), F.asc("o_orderkey")],
        k=3,
    ).select("o_custkey", "o_orderkey", "o_totalprice", "rk")


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct aggregates per group (count distinct, exact)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.countDistinct("l_suppkey").alias("n_supp"),
        F.countDistinct("l_partkey").alias("n_part"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def q_profile_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass column profile of lineitem (operators/relational.py::
    profile_table): one aggregation job computes null/ndv/min/max for
    every profiled column simultaneously — the scan-once ANALYZE shape,
    not a per-column loop."""
    from demo_flink_spark.operators.relational import profile_table

    li = load_table(spark, sf_dir, "lineitem")
    return profile_table(
        li,
        ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate",
         "l_extendedprice"],
    )


def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HLL++) exercised next to the exact ndv,
    surfaced as exact count + pinned-error assertion so the result is
    value-hash-checkable (the raw estimate is engine-specific)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Hash-checkable form (r4, VERDICT item 5): the HLL++ estimate is
    # engine-specific, so the declared columns are the exact ndv plus
    # a pinned-error assertion (default rsd = 5% ⇒ 10% is a 2σ bound);
    # the oracle emits the exact count and literal TRUE.
    return (
        li.groupBy("l_linestatus")
        .agg(
            F.approx_count_distinct("l_partkey").alias("_approx"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
        .select(
            "l_linestatus",
            "exact_parts",
            (
                F.abs(F.col("_approx") - F.col("exact_parts"))
                <= 0.1 * F.col("exact_parts")
            ).alias("approx_within_10pct"),
        )
    )


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: min/max/avg/stddev/median per group."""
    li = load_table(spark, sf_dir, "lineitem")
    p = F.col("l_extendedprice")
    return li.groupBy("l_linestatus").agg(
        F.min(p).cast("double").alias("min_price"),
        F.max(p).cast("double").alias("max_price"),
        davg(p).alias("avg_price"),
        dstddev_samp(p).alias("stddev_price"),
        F.expr("percentile(l_extendedprice, 0.5)").alias("median_price"),
    )


def q_agg_collect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """collect_list / collect_set surfaced as sorted joined strings
    (array columns hash differently across engines; strings don't)."""
    nation = load_table(spark, sf_dir, "nation")
    return nation.groupBy("n_regionkey").agg(
        F.concat_ws(",", F.sort_array(F.collect_list("n_name"))).alias("nations"),
        F.size(F.collect_set("n_name")).cast("long").alias("n_distinct"),
    )


def q_cube_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (status, priority): all 4 grouping combinations."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("o_totalprice")).alias("total"),
        )
    )


def q_rollup_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (year, month): hierarchical revenue subtotals."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.withColumn("o_year", F.year("o_orderdate").cast("long"))
        .withColumn("o_month", F.month("o_orderdate").cast("long"))
        .rollup("o_year", "o_month")
        .agg(dsum(F.col("o_totalprice")).alias("total"))
    )


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via Spark SQL (no DataFrame-API equivalent)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION / INTERSECT / EXCEPT over customer-nation projections,
    tagged by which set op produced each row."""
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    u = building.union(auto).distinct().withColumn("op", F.lit("union"))
    i = building.intersect(auto).withColumn("op", F.lit("intersect"))
    e = building.exceptAll(auto).distinct().withColumn("op", F.lit("except"))
    return u.unionByName(i).unionByName(e)


def q_setops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiset (ALL) variants: UNION ALL / INTERSECT ALL / EXCEPT ALL
    preserve duplicate multiplicity — semantics the DISTINCT forms in
    `setops` erase. Counted per (op, key) so the multiplicities
    themselves are what the oracle hashes."""
    cust = load_table(spark, sf_dir, "customer")
    building = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_nationkey")
    auto = cust.filter(F.col("c_mktsegment") == "AUTOMOBILE").select("c_nationkey")
    u = building.unionAll(auto).withColumn("op", F.lit("union_all"))
    i = building.intersectAll(auto).withColumn("op", F.lit("intersect_all"))
    e = building.exceptAll(auto).withColumn("op", F.lit("except_all"))
    return (
        u.unionByName(i)
        .unionByName(e)
        .groupBy("op", "c_nationkey")
        .agg(F.count(F.lit(1)).alias("multiplicity"))
    )


def q_scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling family (SURVEY §2.9 ext): null-safe equality
    (<=>), coalesce, nullif, nvl2 — the semantics every CDC/merge
    pipeline depends on. All pure projections; the lead() introduces
    real nulls at partition ends."""
    from pyspark.sql.window import Window

    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    nxt = F.lead("o_orderstatus").over(w)
    return orders.select(
        "o_orderkey",
        F.col("o_orderstatus").eqNullSafe(nxt).alias("same_as_next"),
        F.coalesce(nxt, F.lit("END")).alias("next_or_end"),
        F.nullif(F.col("o_orderstatus"), F.lit("O")).alias("null_if_open"),
        F.nvl2(nxt, F.lit("has_next"), F.lit("last")).alias("position_tag"),
    )


def q_scalar_datetime_ext(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Extended date/time family (SURVEY §2.9 ext): month arithmetic
    (with end-of-month clamping), month boundaries, ISO weeks, and
    formatting — complements `scalar_datetime`'s extraction family."""
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    return orders.select(
        "o_orderkey",
        # cast back to timestamp: DATE arrives as datetime.date from
        # Spark but datetime64 from DuckDB — the hash canon differs
        F.add_months(d, 3).cast("timestamp").alias("plus_3mo"),
        F.last_day(d).cast("timestamp").alias("month_end"),
        F.dayofyear(d).cast("long").alias("doy"),
        F.date_format(d, "yyyy-MM").alias("ym"),
        F.quarter(d).cast("long").alias("qtr"),
        F.weekofyear(d).cast("long").alias("wk"),
    )


def q_window_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic window functions (SURVEY §2.8 ext): running sum, lag,
    lead, rank, dense_rank, ntile over each customer's order history.

    Deterministic frame: ordered by (o_orderdate, o_orderkey) — unique
    within customer. One shuffle on o_custkey; all functions share the
    same window so Spark evaluates them in a single Window operator.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.sum(F.col("o_totalprice").cast("decimal(38,6)"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("double")
        .alias("running_total"),
        F.lag("o_totalprice", 1).over(w).cast("double").alias("prev_price"),
        F.lead("o_totalprice", 1).over(w).cast("double").alias("next_price"),
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("quartile"),
    )


def q_window_range_trailing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 10-minute range frame per user over events — the batch
    form of the fraud detector's time-pruned list (SURVEY §2.6 ST1's
    oracle shape). RANGE BETWEEN 600000 PRECEDING on epoch millis.
    """
    ev = load_table(spark, sf_dir, "events")
    ts_ms = epoch_ms("ts").alias("ts_ms")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(-600000, Window.currentRow)
    )
    return (
        ev.select("user_id", "event_id", ts_ms, "value")
        .withColumn("n_in_10min", F.count(F.lit(1)).over(w))
        .select("user_id", "event_id", "n_in_10min")
    )


def q_scalar_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function family (SURVEY §2.9 ext)."""
    cust = load_table(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("upper_name"),
        F.substring("c_name", 1, 8).alias("prefix8"),
        F.lpad("c_mktsegment", 12, "_").alias("padded_seg"),
        F.instr("c_name", "#").cast("long").alias("hash_pos"),
        F.col("c_name").like("%1%").alias("has_one"),
        F.col("c_name").rlike("[02468]$").alias("even_end"),
        F.concat_ws("/", "c_mktsegment", "c_name").alias("seg_name"),
        F.length("c_name").cast("long").alias("name_len"),
    )


def q_scalar_datetime(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function family (SURVEY §2.9 ext)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        F.dayofweek("o_orderdate").cast("long").alias("dow"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.date_add(F.col("o_orderdate").cast("date"), 30)
        .cast("timestamp")
        .alias("due_date"),
        F.datediff(
            F.lit("2024-12-31").cast("date"), F.col("o_orderdate").cast("date")
        )
        .cast("long")
        .alias("days_to_eoy"),
        F.unix_timestamp("o_orderdate").alias("epoch_s"),
    )


def q_scalar_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function family (SURVEY §2.9 ext). Every ending is an
    exact or correctly-rounded IEEE tree, so no protective round(x, 6)
    is needed (or wanted — see q1's note): the square is an exact
    decimal multiply (pow(x, 2.0) is libm-specific), ln goes through
    the engine-portable softln series (operators/relational.py), and
    sqrt is IEEE-correctly-rounded on identical double inputs."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") == 1)
    p = F.col("l_extendedprice")
    return li.select(
        "l_orderkey",
        F.round(p, 0).alias("price_round"),
        F.abs(p - 1000.0).alias("abs_diff"),
        F.ceil(p).alias("price_ceil"),
        F.floor(p).alias("price_floor"),
        (F.col("l_quantity") * F.col("l_quantity")).cast("double").alias("qty_sq"),
        (-softln_ratio(F.lit(100), F.round(p * 100 + 100, 0).cast("long"))).alias("ln_price"),
        F.sqrt(p).alias("sqrt_price"),
    )


def q_scalar_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON function family over events.props (SURVEY §2.9: the CDC
    job's JSON surface — parse, extract, reconstruct)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_value"),
        F.to_json(
            F.struct(F.col("event_type").alias("t"), F.col("user_id").alias("u"))
        ).alias("reconstructed"),
    )


def q_scalar_array_map(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + map function family (SURVEY §2.9 ext): construction,
    size, membership, sort, slice, keys/values/element access."""
    ev = load_table(spark, sf_dir, "events")
    arr = F.array(F.col("event_type"), F.lit("x"), F.col("event_type"))
    m = F.from_json("props", "map<string,string>")
    return ev.select(
        "event_id",
        F.size(arr).cast("long").alias("arr_size"),
        F.array_contains(arr, "click").alias("has_click"),
        F.array_join(F.sort_array(F.array_distinct(arr)), "|").alias("sorted_arr"),
        F.array_join(F.slice(arr, 1, 2), "|").alias("first_two"),
        F.array_join(F.map_keys(m), "|").alias("prop_keys"),
        F.array_join(F.map_values(m), "|").alias("prop_values"),
        F.element_at(m, "k").cast("long").alias("k_elem"),
    )


def q_distinct_dropdup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """distinct + dropDuplicates (SURVEY §2.7 ext): distinct projection
    and keep-one-row-per-key dedup (earliest event per user+type)."""
    ev = load_table(spark, sf_dir, "events")
    first_per = (
        ev.select("user_id", "event_type", "event_id")
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("user_id", "event_type").orderBy("event_id")
            ),
        )
        .filter(F.col("rk") == 1)
        .drop("rk")
    )
    return first_per


def q_stream_static_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stream-static enrichment join, batch twin (SURVEY §2.3 ext).

    The streaming form joins a stream against a broadcast dimension —
    identical plan shape here: events (fact) ⨝ broadcast(customer dim)
    on user_id→custkey. Verified oracle-side; the streaming wiring is
    the same `join` on a readStream DataFrame.
    """
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer")
    return (
        ev.join(cust, ev.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            dsum(F.col("value")).alias("sum_value"),
        )
    )


def q_percentile_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx percentile (t-digest-style sketch) next to the exact
    percentile, surfaced as exact median + pinned-error assertion so
    the result is value-hash-checkable (sketches differ per engine)."""
    li = load_table(spark, sf_dir, "lineitem")
    # Hash-checkable form (r4, VERDICT item 5): the t-digest estimate
    # is engine-specific, so the declared columns are the exact median
    # plus a pinned-error assertion (default accuracy 10000 ⇒ rank
    # error 1e-4; 1% value slack is generous for this distribution);
    # the oracle emits quantile_cont and literal TRUE.
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.percentile_approx("l_extendedprice", 0.5).alias("_approx"),
            F.expr("percentile(l_extendedprice, 0.5)").alias("exact_median"),
        )
        .select(
            "l_returnflag",
            "exact_median",
            (
                F.abs(F.col("_approx") - F.col("exact_median"))
                <= 0.01 * F.col("exact_median")
            ).alias("approx_within_1pct"),
        )
    )


def q_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-style window functions (SURVEY §2.8 ext):
    percent_rank, cume_dist, nth_value, first/last_value with an
    explicit full-partition frame.

    Same single-Window-operator discipline as `window_analytics`: all
    functions share one (partition, order) spec, so the plan carries
    exactly one sort+window pass after the o_custkey shuffle.
    """
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.first_value("o_totalprice").over(w_full).cast("double").alias("first_price"),
        F.last_value("o_totalprice").over(w_full).cast("double").alias("last_price"),
        F.nth_value("o_totalprice", 2).over(w_full).cast("double").alias(
            "second_price"
        ),
    )


def q_percentile_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (p50/p90/p99) per event type — the
    audit-grade twin of `percentile_approx`, oracle-checkable because
    both Spark `percentile` and DuckDB `quantile_cont` sort the group
    and interpolate linearly at p·(n−1).

    Exact percentile materializes each group's values — at 100 TB use
    the sketch-first-then-residual path (IMPLEMENTED:
    `operators/scale.py::sketch_residual_quantile`, declared as
    `quantile_sketch_residual` with the full-sort oracle); this query
    exists to BOUND the sketch's error on samples and for
    final-report numbers where exactness is required.
    """
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count(F.lit(1)).alias("n"),
    )


_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
        SELECT CAST(min(o_orderdate) AS DATE) AS lo,
               CAST(max(o_orderdate) AS DATE) AS hi
        FROM {orders}
    ),
    -- LOG-DEPTH doubling recursion: every level doubles each row into
    -- (d, step*2) and (d + step days, step*2), so a D-day spine needs
    -- ceil(log2 D) levels, not D. In Spark each recursion level is a
    -- distributed step with fixed overhead, so the textbook +1-day
    -- recursion costs O(days) JOBS (measured: 2405 levels = 378 s at
    -- sf0.01) while this shape is ~12 levels; the same rewrite is how
    -- any linear recursion should be ported to a distributed engine.
    spine(d, step) {max_level}AS (
        SELECT lo, 1 FROM bounds
        UNION ALL
        SELECT CAST(d + m * step * INTERVAL '1' DAY AS DATE), step * 2
        FROM spine
        CROSS JOIN (SELECT 0 AS m UNION ALL SELECT 1) mm
        CROSS JOIN bounds
        WHERE d + m * step * INTERVAL '1' DAY <= hi
          AND step <= {datediff} + 1
    ),
    days AS (SELECT DISTINCT d FROM spine)
    SELECT CAST(s.d AS TIMESTAMP) AS day,
           CAST(count(o.o_orderkey) AS BIGINT) AS n_orders
    FROM days s
    LEFT JOIN {orders} o ON CAST(o.o_orderdate AS DATE) = s.d
    GROUP BY s.d
"""

def q_recursive_date_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL-standard recursive CTE (Spark ≥ 4.0): the calendar-spine
    reporting idiom — generate every day between the first and last
    order date recursively, LEFT JOIN daily order counts, zero-fill
    the gap days (`count(col)` of an all-NULL group is 0).

    This is the §2.3/§2.7 SQL-surface completeness row for
    `WITH RECURSIVE`: the same statement runs on both engines (the
    only divergence is Spark's MAX RECURSION LEVEL clause — DuckDB
    has none). (For pure spine GENERATION Spark's `sequence()` is
    the cheaper plan — `gapfill_locf` uses it; this query exists
    because users port recursive SQL as-is.) Recursion depth is
    LOG-depth via the doubling spine (see the SQL comment above):
    ceil(log2 D) ≈ 12 levels for the ~2.4k-day span, well inside
    Spark's default 100-level cap; each level doubles the frame.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_rsp")
    # Spark's recursion cap (100 levels) is comfortably above the
    # ~12 doubling levels the spine needs. DuckDB has no such clause.
    return spark.sql(
        _RECURSIVE_SPINE_SQL.format(
            orders="orders_rsp",
            max_level="MAX RECURSION LEVEL 100 ",
            datediff="date_diff(DAY, lo, hi)",
        )
    )


def q_quantile_disc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discrete (type-1) quantiles per market segment: the EXACT
    ELEMENT at rank ⌊p·(n−1)⌋+1 under the (o_totalprice, o_orderkey)
    total order, for p ∈ {0.5, 0.9, 0.99}.

    The element-selection complement of `percentile_exact`
    (interpolated type-7): no arithmetic touches the value — output
    doubles are bit-copied inputs, ranks are pure integer products
    ((n−1)·p_pct div 100), so the contract is float-free by
    construction and works unchanged for any orderable type (dates,
    decimals, strings). One keyed window pass + one aggregate; the
    full-sort-per-key window is the audit-grade exact path — at
    100 TB the sketch-first-then-residual twin
    (`quantile_sketch_residual`, same oracle, same answer) replaces
    the full sort with an O(εn)-band rank-select.
    """
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    d = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy("o_totalprice", "o_orderkey")
    r = d.select(
        "c_mktsegment",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("c_mktsegment")).alias("n"),
    )
    pick = lambda pct: F.max(  # noqa: E731
        F.when(
            F.expr(f"rn = ((n - 1) * {pct}) div 100 + 1"), F.col("o_totalprice")
        )
    )
    return r.groupBy("c_mktsegment").agg(
        F.max("n").cast("long").alias("n"),
        pick(50).alias("p50"),
        pick(90).alias("p90"),
        pick(99).alias("p99"),
    )


def q_quantile_sketch_residual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME exact type-1 quantile elements as
    `quantile_disc_by_segment`, computed by the 100 TB path those
    operators document: sketch-first (percentile_approx brackets each
    target), residual exact rank-select over only the O(εn) band
    rows, full-sort fallback for any band miss
    (operators/scale.py::sketch_residual_quantile). Shares the
    full-sort query's oracle — hash equality proves the sketch never
    changes the answer."""
    from demo_flink_spark.operators.scale import sketch_residual_quantile

    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    d = orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
    return sketch_residual_quantile(
        d, "c_mktsegment", "o_totalprice", "o_orderkey"
    )


def q_sql_cte_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SQL surface (SURVEY §2.3/§2.4 ext): CTE + scalar subquery.

    Catalyst rewrites the scalar subquery into a one-row broadcast —
    no per-row re-execution.
    """
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq")
    return spark.sql(
        """
        WITH rich AS (
            SELECT * FROM customer_sq
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_sq)
        )
        SELECT c_nationkey, count(*) AS n_rich,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_bal
        FROM rich GROUP BY c_nationkey
        """
    )


def q_sql_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery (rewritten to a left-semi join by Catalyst)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_sq")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_sq2")
    return spark.sql(
        """
        SELECT o_orderstatus, count(*) AS n
        FROM orders_sq
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer_sq2 WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
        """
    )


def q_sql_lateral_topn(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row ORDER BY + LIMIT — the
    SQL-standard top-n-per-key idiom. Catalyst DECORRELATES it: the
    plan is one orders-side Window (rank ≤ 3) + a broadcast hash join
    back to customers — no per-customer re-execution, no nested loop
    (plan-audited). The tiebreak (o_totalprice DESC, o_orderkey) is a
    total order, so the same 3 rows survive on any engine."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer_lat"
    )
    return spark.sql(
        """
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer_lat c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders_lat
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o
        """
    )


def q_orderby_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key global sort with explicit null placement + limit.

    TakeOrderedAndProject at the physical layer: each partition keeps
    its local top-N, the driver merges — no full global sort at scale.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.orderBy(
            F.desc("o_totalprice"), F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey")
        )
        .limit(25)
        .select("o_orderkey", "o_totalprice", "o_orderstatus")
    )


def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style: pure filter + global agg, the pushdown showcase.

    All three predicates and the 2-column projection reach the parquet
    scan (PushedFilters); the aggregate is a single partial+final pair
    with a 1-row exchange. At 100 TB this is I/O bound by exactly the
    row groups the predicates can't skip — no shuffle, no join.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dsum(F.col("l_extendedprice") * F.col("l_discount")).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: revenue lost to returns, top-20 customers.

    lineitem(R-flag)⨝orders is the one shuffle (the returnflag filter
    pushes into the scan); customer and nation are broadcast. Top-20
    via TakeOrderedAndProject — no global sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dsum(revenue).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


def q18_large_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18-style: customers with any order above a quantity
    threshold (HAVING subquery as a semi-join).

    The inner aggregate shuffles lineitem once on orderkey; the
    surviving keys (rare) broadcast back against orders. Same shape
    TPC-H kit plans choose at scale.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum(F.col("l_quantity")).alias("sum_qty"))
        .filter(F.col("sum_qty") > 250)
    )
    return (
        orders.join(big, orders.o_orderkey == big.l_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            F.col("o_orderdate"),
            "o_totalprice",
            "sum_qty",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
    )


_EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_pivot_event_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: daily event counts, one column per event type.

    `pivot` with an explicit value list — Catalyst compiles it to a
    single aggregate with one count per (day, type) pair, no second
    pass to discover the pivot domain. Explicit values are mandatory
    at scale: the two-phase form collects the domain to the driver.
    """
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(F.date_trunc("day", "ts").alias("day"))
        .pivot("event_type", _EVENT_TYPES)
        .count()
        .na.fill(0, _EVENT_TYPES)
        .select("day", *[F.col(t).alias(f"n_{t}") for t in _EVENT_TYPES])
    )


def q_unpivot_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (melt): wide per-flag aggregates to long (measure, value)
    rows via `DataFrame.unpivot` — the inverse of the pivot above."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        dsum(F.col("l_extendedprice")).alias("sum_price"),
        dsum(F.col("l_discount")).alias("sum_discount"),
        dsum(F.col("l_tax")).alias("sum_tax"),
    )
    return wide.unpivot(
        ["l_returnflag"],
        ["sum_price", "sum_discount", "sum_tax"],
        "measure",
        "value",
    )


def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlation / covariance / regression slope per group.

    Built from decimal-exact sums (operators.relational.dcorr) so the
    result is partition-order independent — plain `corr()` over
    doubles hashes differently run to run and can never match another
    engine bit-for-bit.
    """
    from demo_flink_spark.operators.relational import dcorr, dcovar_samp

    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    return li.groupBy("l_returnflag").agg(
        dcorr(x, y).alias("corr_qty_price"),
        dcovar_samp(x, y).alias("covar_qty_price"),
        (dcovar_samp(x, y) / (dstddev_samp(x) * dstddev_samp(x))).alias(
            "regr_slope"
        ),
        F.count(F.lit(1)).alias("n"),
    )


def q_salted_join_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant join: events (5 event types — maximal key skew)
    joined to a per-type dimension through `operators.scale.salted_join`,
    proven semantics-preserving by the plain-JOIN oracle.

    The big side salts on row position, the 5-row dim replicates 16×,
    and the join key becomes (event_type, salt) — a hot type's rows
    spread over 16 tasks instead of one. This is the manual fallback
    for when AQE skew-split can't apply (stream-static joins,
    pre-AQE clusters); the oracle proves salt never leaks into
    results.
    """
    from demo_flink_spark.operators.scale import salted_join

    ev = load_table(spark, sf_dir, "events")
    dim = (
        ev.groupBy("event_type")
        .agg(davg(F.col("value")).alias("type_avg"))
    )
    joined = salted_join(ev.select("event_id", "event_type", "value"), dim,
                         "event_type", n_salts=16)
    return joined.select(
        "event_id",
        "event_type",
        (F.col("value") - F.col("type_avg")).alias("value_vs_type_avg"),
    )


def q_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram / binning of order totals.

    Bucketing is a pure projection (no UDF) followed by one hash
    aggregate — the 100 TB shape for any histogram: map-side partials
    reduce the exchange to |buckets| rows per task.
    """
    orders = load_table(spark, sf_dir, "orders")
    bucket = F.least(F.floor(F.col("o_totalprice") / 50000), F.lit(9)).cast("long")
    return (
        orders.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
    )


def q_quantile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile discretization (feature bucketing): assign every order
    to its global totalprice quartile.

    The scale shape is two passes, NOT `ntile` — ntile over an
    unpartitioned window funnels 100 TB through one task. Pass 1 is a
    tiny global aggregate (exact percentiles here; swap in
    approx_percentile at real scale), pass 2 broadcasts the one-row
    boundary frame and bins with a pure projection, so the big table
    is never shuffled at all. Boundary doubles agree bit-for-bit across
    engines because both interpolate with the same two-sided weighted
    form over the same inputs — no protective rounding needed.
    """
    orders = load_table(spark, sf_dir, "orders")
    bounds = orders.agg(
        F.expr("percentile(o_totalprice, 0.25)").alias("q1"),
        F.expr("percentile(o_totalprice, 0.5)").alias("q2"),
        F.expr("percentile(o_totalprice, 0.75)").alias("q3"),
    )
    return orders.crossJoin(F.broadcast(bounds)).select(
        "o_orderkey",
        F.when(F.col("o_totalprice") <= F.col("q1"), 1)
        .when(F.col("o_totalprice") <= F.col("q2"), 2)
        .when(F.col("o_totalprice") <= F.col("q3"), 3)
        .otherwise(4)
        .alias("bin"),
    )


def q_salted_agg_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hot-key-safe aggregation: the salted two-phase groupBy from
    `operators.scale`, proven semantics-preserving by the plain
    GROUP BY oracle.

    events has only 5 event types — the exact degenerate-cardinality
    shape where one reducer per key serializes a 100 TB aggregation.
    Phase-1 partials stay decimal so the two-phase sum is bit-equal to
    the one-phase sum regardless of salt count or partitioning.
    """
    from demo_flink_spark.operators.scale import salted_agg

    ev = load_table(spark, sf_dir, "events")
    out = salted_agg(
        ev,
        ["event_type"],
        {
            "n": F.count(F.lit(1)),
            "sum_value": F.sum(F.col("value").cast("decimal(38,6)")),
            "max_value": F.max("value"),
        },
        n_salts=16,
    )
    return out.select(
        "event_type",
        F.col("n").cast("long").alias("n"),
        F.col("sum_value").cast("double").alias("sum_value"),
        F.col("max_value").alias("max_value"),
    )


SPECS = [
    QuerySpec(
        "q1_pricing_summary",
        q1_pricing_summary,
        oracle=f"""
        SELECT l_returnflag, l_linestatus,
               {_DSUM.format(e='l_quantity')} AS sum_qty,
               {_DSUM.format(e='l_extendedprice')} AS sum_base_price,
               {_DSUM.format(e='l_extendedprice * (1 - l_discount)')} AS sum_disc_price,
               {_DSUM.format(e='l_extendedprice * (1 - l_discount) * (1 + l_tax)')} AS sum_charge,
               {_DAVG.format(e='l_quantity')} AS avg_qty,
               {_DAVG.format(e='l_extendedprice')} AS avg_price,
               {_DAVG.format(e='l_discount')} AS avg_disc,
               count(*) AS count_order
        FROM lineitem
        WHERE l_shipdate <= TIMESTAMP '2024-09-01'
        GROUP BY l_returnflag, l_linestatus
        """,
    ),
    QuerySpec(
        "q3_shipping_priority",
        q3_shipping_priority,
        oracle=f"""
        SELECT l_orderkey, o_orderdate, o_orderpriority,
               {_DSUM.format(e='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer JOIN orders ON c_custkey = o_custkey
                      JOIN lineitem ON l_orderkey = o_orderkey
        WHERE c_mktsegment = 'BUILDING'
        GROUP BY l_orderkey, o_orderdate, o_orderpriority
        ORDER BY revenue DESC, l_orderkey ASC
        LIMIT 10
        """,
    ),
    QuerySpec(
        "q4_order_priority",
        q4_order_priority,
        oracle="""
        SELECT o_orderpriority, count(*) AS order_count
        FROM orders
        WHERE EXISTS (
            SELECT 1 FROM lineitem
            WHERE l_orderkey = o_orderkey AND l_quantity > 45.0
        )
        GROUP BY o_orderpriority
        """,
    ),
    QuerySpec(
        "q5_local_supplier_volume",
        q5_local_supplier_volume,
        oracle=f"""
        SELECT n_name,
               {_DSUM.format(e='l_extendedprice * (1 - l_discount)')} AS revenue
        FROM customer, orders, lineitem, supplier, nation, region
        WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
          AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
          AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
          AND r_name = 'ASIA'
        GROUP BY n_name
        """,
    ),
    QuerySpec(
        "join_left_outer",
        q_join_left_outer,
        oracle="""
        SELECT c_custkey, c_name, count(o_orderkey) AS n_orders
        FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey, c_name
        """,
    ),
    QuerySpec(
        "join_anti",
        q_join_anti,
        oracle="""
        SELECT c_custkey, c_name, c_mktsegment
        FROM customer
        WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        """,
    ),
    QuerySpec(
        "join_semi",
        q_join_semi,
        oracle="""
        SELECT c_custkey, c_mktsegment
        FROM customer
        WHERE EXISTS (SELECT 1 FROM orders
                      WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        """,
    ),
    QuerySpec(
        "join_full_outer",
        q_join_full_outer,
        oracle="""
        WITH c AS (SELECT c_nationkey, count(*) AS n_cust
                   FROM customer GROUP BY c_nationkey),
             s AS (SELECT s_nationkey, count(*) AS n_supp
                   FROM supplier GROUP BY s_nationkey)
        SELECT coalesce(c_nationkey, s_nationkey) AS nationkey,
               coalesce(n_cust, 0) AS n_cust,
               coalesce(n_supp, 0) AS n_supp
        FROM c FULL OUTER JOIN s ON c_nationkey = s_nationkey
        """,
    ),
    QuerySpec(
        "join_theta",
        q_join_theta,
        oracle=f"""
        SELECT p_brand, count(*) AS n_li,
               {_DSUM.format(e='l_quantity')} AS sum_qty
        FROM lineitem JOIN part
          ON l_partkey = p_partkey AND l_quantity > CAST(p_size AS DOUBLE)
        GROUP BY p_brand
        """,
    ),
    QuerySpec(
        "topk_per_group",
        q_topk_per_group,
        oracle="""
        SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
            SELECT o_custkey, o_orderkey, o_totalprice,
                   row_number() OVER (PARTITION BY o_custkey
                                      ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
            FROM orders
        ) WHERE rk <= 3
        """,
    ),
    QuerySpec(
        "agg_distinct",
        q_agg_distinct,
        oracle="""
        SELECT l_returnflag,
               count(DISTINCT l_suppkey) AS n_supp,
               count(DISTINCT l_partkey) AS n_part,
               count(*) AS n_rows
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    QuerySpec(
        "profile_lineitem",
        q_profile_lineitem,
        oracle="""
        SELECT 'l_orderkey' AS column, count(*) AS n_rows,
               count(*) - count(l_orderkey) AS n_null,
               count(DISTINCT l_orderkey) AS n_distinct,
               CAST(min(l_orderkey) AS VARCHAR) AS min_value,
               CAST(max(l_orderkey) AS VARCHAR) AS max_value
        FROM lineitem
        UNION ALL
        SELECT 'l_quantity' AS column, count(*) AS n_rows,
               count(*) - count(l_quantity) AS n_null,
               count(DISTINCT l_quantity) AS n_distinct,
               CAST(min(l_quantity) AS VARCHAR) AS min_value,
               CAST(max(l_quantity) AS VARCHAR) AS max_value
        FROM lineitem
        UNION ALL
        SELECT 'l_returnflag' AS column, count(*) AS n_rows,
               count(*) - count(l_returnflag) AS n_null,
               count(DISTINCT l_returnflag) AS n_distinct,
               CAST(min(l_returnflag) AS VARCHAR) AS min_value,
               CAST(max(l_returnflag) AS VARCHAR) AS max_value
        FROM lineitem
        UNION ALL
        SELECT 'l_shipdate' AS column, count(*) AS n_rows,
               count(*) - count(l_shipdate) AS n_null,
               count(DISTINCT l_shipdate) AS n_distinct,
               CAST(min(l_shipdate) AS VARCHAR) AS min_value,
               CAST(max(l_shipdate) AS VARCHAR) AS max_value
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice' AS column, count(*) AS n_rows,
               count(*) - count(l_extendedprice) AS n_null,
               count(DISTINCT l_extendedprice) AS n_distinct,
               CAST(min(l_extendedprice) AS VARCHAR) AS min_value,
               CAST(max(l_extendedprice) AS VARCHAR) AS max_value
        FROM lineitem
        """,
    ),
    QuerySpec(
        "agg_approx_distinct",
        q_agg_approx_distinct,
        oracle="""
        SELECT l_linestatus,
               count(DISTINCT l_partkey) AS exact_parts,
               TRUE AS approx_within_10pct
        FROM lineitem GROUP BY l_linestatus
        """,
    ),
    QuerySpec(
        "agg_stats",
        q_agg_stats,
        # stddev twin of the integer-moment dstddev_samp
        # (operators/relational.py): exact hugeint cancellation, one
        # scale-0 cast to double, identical final IEEE tree
        oracle=f"""
        WITH s AS (
            SELECT l_linestatus,
                   count(l_extendedprice) AS n,
                   SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sx,
                   SUM(CAST(round(l_extendedprice * 100, 0) AS BIGINT)
                       * CAST(round(l_extendedprice * 100, 0) AS BIGINT)) AS sxx,
                   CAST(min(l_extendedprice) AS DOUBLE) AS min_price,
                   CAST(max(l_extendedprice) AS DOUBLE) AS max_price,
                   {_DAVG.format(e='l_extendedprice')} AS avg_price,
                   quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5) AS median_price
            FROM lineitem GROUP BY l_linestatus
        )
        SELECT l_linestatus, min_price, max_price, avg_price,
               sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                    / CAST(n * (n - 1) AS DOUBLE)) / 100.0 AS stddev_price,
               median_price
        FROM s
        """,
    ),
    QuerySpec(
        "agg_collect",
        q_agg_collect,
        oracle="""
        SELECT n_regionkey,
               array_to_string(list_sort(list(n_name)), ',') AS nations,
               len(list_distinct(list(n_name))) AS n_distinct
        FROM nation GROUP BY n_regionkey
        """,
    ),
    QuerySpec(
        "cube_orders",
        q_cube_orders,
        oracle=f"""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n,
               {_DSUM.format(e='o_totalprice')} AS total
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
    ),
    QuerySpec(
        "rollup_dates",
        q_rollup_dates,
        oracle=f"""
        SELECT CAST(year(o_orderdate) AS BIGINT) AS o_year,
               CAST(month(o_orderdate) AS BIGINT) AS o_month,
               {_DSUM.format(e='o_totalprice')} AS total
        FROM orders
        GROUP BY ROLLUP (o_year, o_month)
        """,
    ),
    QuerySpec(
        "grouping_sets",
        q_grouping_sets,
        oracle="""
        SELECT o_orderstatus, o_orderpriority, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """,
    ),
    QuerySpec(
        "setops",
        q_setops,
        oracle="""
        WITH b AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'),
             a AS (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')
        SELECT c_nationkey, 'union' AS op FROM (SELECT DISTINCT c_nationkey FROM (SELECT * FROM b UNION ALL SELECT * FROM a))
        UNION ALL
        SELECT c_nationkey, 'intersect' AS op FROM (SELECT * FROM b INTERSECT SELECT * FROM a)
        UNION ALL
        SELECT c_nationkey, 'except' AS op FROM (SELECT DISTINCT c_nationkey FROM (SELECT * FROM b EXCEPT ALL SELECT * FROM a))
        """,
    ),
    QuerySpec(
        "window_analytics",
        q_window_analytics,
        oracle="""
        SELECT o_custkey, o_orderkey,
               CAST(sum(CAST(o_totalprice AS DECIMAL(38,6))) OVER w_cum AS DOUBLE) AS running_total,
               CAST(lag(o_totalprice, 1) OVER w AS DOUBLE) AS prev_price,
               CAST(lead(o_totalprice, 1) OVER w AS DOUBLE) AS next_price,
               rank() OVER w AS rnk,
               dense_rank() OVER w AS drnk,
               ntile(4) OVER w AS quartile
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               w_cum AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        """,
    ),
    QuerySpec(
        "window_range_trailing",
        q_window_range_trailing,
        oracle="""
        SELECT user_id, event_id,
               count(*) OVER (PARTITION BY user_id ORDER BY epoch_ms(ts)
                              RANGE BETWEEN 600000 PRECEDING AND CURRENT ROW) AS n_in_10min
        FROM events
        """,
    ),
    QuerySpec(
        "scalar_string",
        q_scalar_string,
        oracle="""
        SELECT c_custkey,
               upper(c_name) AS upper_name,
               substring(c_name, 1, 8) AS prefix8,
               lpad(c_mktsegment, 12, '_') AS padded_seg,
               instr(c_name, '#') AS hash_pos,
               c_name LIKE '%1%' AS has_one,
               regexp_matches(c_name, '[02468]$') AS even_end,
               concat_ws('/', c_mktsegment, c_name) AS seg_name,
               length(c_name) AS name_len
        FROM customer
        """,
    ),
    QuerySpec(
        "scalar_datetime",
        q_scalar_datetime,
        oracle="""
        SELECT o_orderkey,
               CAST(year(o_orderdate) AS BIGINT) AS yr,
               CAST(month(o_orderdate) AS BIGINT) AS mo,
               CAST(dayofweek(o_orderdate) + 1 AS BIGINT) AS dow,
               date_trunc('month', o_orderdate) AS month_start,
               CAST(CAST(o_orderdate AS DATE) + 30 AS TIMESTAMP) AS due_date,
               CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '2024-12-31') AS BIGINT) AS days_to_eoy,
               CAST(floor(epoch(o_orderdate)) AS BIGINT) AS epoch_s
        FROM orders
        """,
    ),
    QuerySpec(
        "scalar_math",
        q_scalar_math,
        oracle=f"""
        SELECT l_orderkey,
               round(l_extendedprice, 0) AS price_round,
               abs(l_extendedprice - 1000.0) AS abs_diff,
               CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
               CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
               CAST(l_quantity * l_quantity AS DOUBLE) AS qty_sq,
               -{_SOFTLN_P1} AS ln_price,
               sqrt(CAST(l_extendedprice AS DOUBLE)) AS sqrt_price
        FROM lineitem WHERE l_linenumber = 1
        """,
    ),
    QuerySpec(
        "scalar_json",
        q_scalar_json,
        oracle="""
        SELECT event_id,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value,
               CAST(to_json(struct_pack(t := event_type, u := user_id))
                    AS VARCHAR) AS reconstructed
        FROM events
        """,
    ),
    QuerySpec(
        "scalar_array_map",
        q_scalar_array_map,
        oracle="""
        SELECT event_id,
               CAST(3 AS BIGINT) AS arr_size,
               event_type = 'click' AS has_click,
               array_to_string(list_sort(list_distinct([event_type, 'x', event_type])), '|')
                   AS sorted_arr,
               array_to_string([event_type, 'x'], '|') AS first_two,
               'k' AS prop_keys,
               json_extract_string(props, '$.k') AS prop_values,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_elem
        FROM events
        """,
    ),
    QuerySpec(
        "distinct_dropdup",
        q_distinct_dropdup,
        oracle="""
        SELECT user_id, event_type, event_id FROM (
            SELECT user_id, event_type, event_id,
                   row_number() OVER (PARTITION BY user_id, event_type
                                      ORDER BY event_id) AS rk
            FROM events
        ) WHERE rk = 1
        """,
    ),
    QuerySpec(
        "stream_static_join",
        q_stream_static_join,
        oracle=f"""
        SELECT c_mktsegment, event_type, count(*) AS n,
               {_DSUM.format(e='value')} AS sum_value
        FROM events JOIN customer ON user_id = c_custkey
        GROUP BY c_mktsegment, event_type
        """,
    ),
    QuerySpec(
        "percentile_approx",
        q_percentile_approx,
        oracle="""
        SELECT l_returnflag,
               quantile_cont(CAST(l_extendedprice AS DOUBLE), 0.5)
                   AS exact_median,
               TRUE AS approx_within_1pct
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    QuerySpec(
        "setops_all",
        q_setops_all,
        oracle="""
        WITH building AS (
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING'
        ), auto AS (
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
        ), tagged AS (
            SELECT 'union_all' AS op, c_nationkey
            FROM (SELECT * FROM building UNION ALL SELECT * FROM auto)
            UNION ALL
            SELECT 'intersect_all', c_nationkey
            FROM (SELECT * FROM building INTERSECT ALL SELECT * FROM auto)
            UNION ALL
            SELECT 'except_all', c_nationkey
            FROM (SELECT * FROM building EXCEPT ALL SELECT * FROM auto)
        )
        SELECT op, c_nationkey, count(*) AS multiplicity
        FROM tagged GROUP BY op, c_nationkey
        """,
    ),
    QuerySpec(
        "scalar_null_semantics",
        q_scalar_null_semantics,
        oracle="""
        WITH n AS (
            SELECT o_orderkey, o_orderstatus,
                   lead(o_orderstatus) OVER (
                       PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                   ) AS nxt
            FROM orders
        )
        SELECT o_orderkey,
               o_orderstatus IS NOT DISTINCT FROM nxt AS same_as_next,
               coalesce(nxt, 'END') AS next_or_end,
               nullif(o_orderstatus, 'O') AS null_if_open,
               CASE WHEN nxt IS NOT NULL THEN 'has_next' ELSE 'last' END
                   AS position_tag
        FROM n
        """,
    ),
    QuerySpec(
        "scalar_datetime_ext",
        q_scalar_datetime_ext,
        oracle="""
        SELECT o_orderkey,
               CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE)
                   AS plus_3mo,
               last_day(CAST(o_orderdate AS DATE)) AS month_end,
               CAST(dayofyear(o_orderdate) AS BIGINT) AS doy,
               strftime(o_orderdate, '%Y-%m') AS ym,
               CAST(quarter(o_orderdate) AS BIGINT) AS qtr,
               CAST(weekofyear(o_orderdate) AS BIGINT) AS wk
        FROM orders
        """,
    ),
    QuerySpec(
        "window_distribution",
        q_window_distribution,
        oracle="""
        SELECT o_custkey, o_orderkey,
               percent_rank() OVER w AS pct_rank,
               cume_dist() OVER w AS cume,
               CAST(first_value(o_totalprice) OVER wf AS DOUBLE) AS first_price,
               CAST(last_value(o_totalprice) OVER wf AS DOUBLE) AS last_price,
               CAST(nth_value(o_totalprice, 2) OVER wf AS DOUBLE) AS second_price
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
               wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND UNBOUNDED FOLLOWING)
        """,
    ),
    QuerySpec(
        "sql_recursive_date_spine",
        q_recursive_date_spine,
        # the SAME recursive statement, verbatim, on DuckDB
        oracle=_RECURSIVE_SPINE_SQL.format(
            orders="orders", max_level="", datediff="date_diff('day', lo, hi)"
        ),
    ),
    QuerySpec(
        "quantile_disc_by_segment",
        q_quantile_disc,
        # rank-selected elements: bit-copied doubles, integer ranks —
        # no float arithmetic in the contract
        oracle="""
        WITH r AS (
            SELECT c_mktsegment, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment,
               CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = ((n - 1) * 50) // 100 + 1
                        THEN o_totalprice END) AS p50,
               max(CASE WHEN rn = ((n - 1) * 90) // 100 + 1
                        THEN o_totalprice END) AS p90,
               max(CASE WHEN rn = ((n - 1) * 99) // 100 + 1
                        THEN o_totalprice END) AS p99
        FROM r GROUP BY c_mktsegment
        """,
    ),
    QuerySpec(
        # the sketch-first-then-residual 100 TB path, proven exact by
        # sharing the full-sort query's oracle verbatim
        "quantile_sketch_residual",
        q_quantile_sketch_residual,
        oracle="""
        WITH r AS (
            SELECT c_mktsegment, o_totalprice,
                   row_number() OVER (
                       PARTITION BY c_mktsegment
                       ORDER BY o_totalprice, o_orderkey
                   ) AS rn,
                   count(*) OVER (PARTITION BY c_mktsegment) AS n
            FROM orders JOIN customer ON o_custkey = c_custkey
        )
        SELECT c_mktsegment,
               CAST(max(n) AS BIGINT) AS n,
               max(CASE WHEN rn = ((n - 1) * 50) // 100 + 1
                        THEN o_totalprice END) AS p50,
               max(CASE WHEN rn = ((n - 1) * 90) // 100 + 1
                        THEN o_totalprice END) AS p90,
               max(CASE WHEN rn = ((n - 1) * 99) // 100 + 1
                        THEN o_totalprice END) AS p99
        FROM r GROUP BY c_mktsegment
        """,
    ),
    QuerySpec(
        "percentile_exact",
        q_percentile_exact,
        oracle="""
        SELECT event_type,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.9) AS p90,
               quantile_cont(value, 0.99) AS p99,
               count(*) AS n
        FROM events
        GROUP BY event_type
        """,
    ),
    QuerySpec(
        "sql_cte_scalar_subquery",
        q_sql_cte_scalar_subquery,
        oracle="""
        WITH rich AS (
            SELECT * FROM customer
            WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
        )
        SELECT c_nationkey, count(*) AS n_rich,
               CAST(sum(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_bal
        FROM rich GROUP BY c_nationkey
        """,
    ),
    QuerySpec(
        "sql_in_subquery",
        q_sql_in_subquery,
        oracle="""
        SELECT o_orderstatus, count(*) AS n
        FROM orders
        WHERE o_custkey IN (
            SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
        )
        GROUP BY o_orderstatus
        """,
    ),
    QuerySpec(
        "sql_lateral_topn",
        q_sql_lateral_topn,
        oracle="""
        SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
        FROM customer c JOIN LATERAL (
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_custkey = c.c_custkey
            ORDER BY o_totalprice DESC, o_orderkey LIMIT 3
        ) o ON true
        """,
    ),
    QuerySpec(
        "orderby_limit",
        q_orderby_limit,
        oracle="""
        SELECT o_orderkey, o_totalprice, o_orderstatus
        FROM orders
        ORDER BY o_totalprice DESC, o_orderdate ASC NULLS LAST, o_orderkey ASC
        LIMIT 25
        """,
    ),
    QuerySpec(
        "q6_forecast_revenue",
        q6_forecast_revenue,
        oracle=f"""
        SELECT {_DSUM.format(e='l_extendedprice * l_discount')} AS revenue,
               count(*) AS n_items
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01'
          AND l_shipdate < TIMESTAMP '1997-01-01'
          AND l_discount BETWEEN 0.05 AND 0.07
          AND l_quantity < 24
        """,
    ),
    QuerySpec(
        "q10_returned_items",
        q10_returned_items,
        oracle=f"""
        SELECT c_custkey, c_name, n_name,
               {_DSUM.format(e='l_extendedprice * (1 - l_discount)')}
                   AS revenue
        FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        WHERE l_returnflag = 'R'
          AND o_orderdate >= TIMESTAMP '1996-01-01'
          AND o_orderdate < TIMESTAMP '1997-01-01'
        GROUP BY c_custkey, c_name, n_name
        ORDER BY revenue DESC, c_custkey ASC
        LIMIT 20
        """,
    ),
    QuerySpec(
        "q18_large_volume",
        q18_large_volume,
        oracle=f"""
        WITH big AS (
            SELECT l_orderkey,
                   {_DSUM.format(e='l_quantity')} AS sum_qty
            FROM lineitem
            GROUP BY l_orderkey
            HAVING {_DSUM.format(e='l_quantity')} > 250
        )
        SELECT c_custkey, c_name, o_orderkey, o_orderdate, o_totalprice, sum_qty
        FROM orders
        JOIN big ON o_orderkey = big.l_orderkey
        JOIN customer ON o_custkey = c_custkey
        ORDER BY o_totalprice DESC, o_orderkey ASC
        LIMIT 100
        """,
    ),
    QuerySpec(
        "pivot_event_daily",
        q_pivot_event_daily,
        oracle="""
        SELECT date_trunc('day', ts) AS day,
               count(*) FILTER (event_type = 'click') AS n_click,
               count(*) FILTER (event_type = 'error') AS n_error,
               count(*) FILTER (event_type = 'purchase') AS n_purchase,
               count(*) FILTER (event_type = 'signup') AS n_signup,
               count(*) FILTER (event_type = 'view') AS n_view
        FROM events
        GROUP BY day
        """,
    ),
    QuerySpec(
        "unpivot_measures",
        q_unpivot_measures,
        oracle=f"""
        WITH wide AS (
            SELECT l_returnflag,
                   {_DSUM.format(e='l_extendedprice')} AS sum_price,
                   {_DSUM.format(e='l_discount')} AS sum_discount,
                   {_DSUM.format(e='l_tax')} AS sum_tax
            FROM lineitem GROUP BY l_returnflag
        )
        SELECT l_returnflag, 'sum_price' AS measure, sum_price AS value FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_discount', sum_discount FROM wide
        UNION ALL
        SELECT l_returnflag, 'sum_tax', sum_tax FROM wide
        """,
    ),
    QuerySpec(
        "agg_corr_covar",
        q_agg_corr,
        # SQL twin of the integer-moment dcorr/dcovar_samp
        # (operators/relational.py): quantize to cents, cancel in exact
        # hugeint arithmetic, cast scale-0 to double (bit-identical in
        # both engines), same final IEEE tree.
        oracle="""
        WITH q AS (
            SELECT l_returnflag,
                   CAST(round(l_quantity * 100, 0) AS BIGINT) AS xq,
                   CAST(round(l_extendedprice * 100, 0) AS BIGINT) AS xp
            FROM lineitem
        ),
        s AS (
            SELECT l_returnflag,
                   count(*) AS n,
                   SUM(xq) AS sx, SUM(xp) AS sy,
                   SUM(xq * xp) AS sxy,
                   SUM(xq * xq) AS sxx,
                   SUM(xp * xp) AS syy
            FROM q GROUP BY l_returnflag
        )
        SELECT l_returnflag,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                          * CAST(n * syy - sy * sy AS DOUBLE))
                   AS corr_qty_price,
               CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE) / 10000.0
                   AS covar_qty_price,
               (CAST(n * sxy - sx * sy AS DOUBLE)
                   / CAST(n * (n - 1) AS DOUBLE) / 10000.0)
                   / ((sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                            / CAST(n * (n - 1) AS DOUBLE)) / 100.0)
                      * (sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                              / CAST(n * (n - 1) AS DOUBLE)) / 100.0))
                   AS regr_slope,
               n
        FROM s
        """,
    ),
    QuerySpec(
        "salted_agg_events",
        q_salted_agg_events,
        oracle="""
        SELECT event_type,
               count(*) AS n,
               CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                   AS sum_value,
               max(value) AS max_value
        FROM events
        GROUP BY event_type
        """,
    ),
    QuerySpec(
        "salted_join_events",
        q_salted_join_events,
        oracle=f"""
        WITH dim AS (
            SELECT event_type,
                   {_DAVG.format(e='value')} AS type_avg
            FROM events GROUP BY event_type
        )
        SELECT event_id, e.event_type,
               value - type_avg AS value_vs_type_avg
        FROM events e JOIN dim USING (event_type)
        """,
    ),
    QuerySpec(
        "histogram_totalprice",
        q_histogram_totalprice,
        oracle="""
        SELECT CAST(least(floor(o_totalprice / 50000), 9) AS BIGINT) AS bucket,
               count(*) AS n,
               CAST(min(o_totalprice) AS DOUBLE) AS lo,
               CAST(max(o_totalprice) AS DOUBLE) AS hi
        FROM orders
        GROUP BY bucket
        """,
    ),
    QuerySpec(
        "quantile_binning_price",
        q_quantile_binning,
        # quantile_cont interpolates at p·(n−1) with the same two-sided
        # weighted form as Spark's percentile — lower·(1−frac) +
        # upper·(frac) over the same double inputs — so the raw double
        # boundaries agree bit-for-bit and need no protective rounding.
        oracle="""
        WITH b AS (
            SELECT quantile_cont(CAST(o_totalprice AS DOUBLE), 0.25) AS q1,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.50) AS q2,
                   quantile_cont(CAST(o_totalprice AS DOUBLE), 0.75) AS q3
            FROM orders
        )
        SELECT o_orderkey,
               CASE WHEN o_totalprice <= q1 THEN 1
                    WHEN o_totalprice <= q2 THEN 2
                    WHEN o_totalprice <= q3 THEN 3
                    ELSE 4 END AS bin
        FROM orders, b
        """,
    ),
]
