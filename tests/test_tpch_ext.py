"""Invariant tests for the extended TPC-H family (plans/tpch_ext.py).

The value-level gate is the DuckDB oracle (tools/oracle_check.py);
these tests pin cheap structural invariants at sf0.001 so a semantics
regression fails fast in pytest without the oracle round-trip.
"""

from __future__ import annotations

from tests.conftest import SF_DIR


def test_q13_distribution_accounts_for_every_customer(spark):
    from demo_flink_spark.plans.tpch_ext import q13_customer_distribution
    from demo_flink_spark.sources import load_table

    dist = q13_customer_distribution(spark, SF_DIR).collect()
    n_cust = load_table(spark, SF_DIR, "customer").count()
    # every customer lands in exactly one (c_count, custdist) bucket
    assert sum(r.custdist for r in dist) == n_cust
    # left-outer semantics: no bucket is negative / counts sane
    assert all(r.c_count >= 0 and r.custdist > 0 for r in dist)


def test_q14_promo_share_is_a_percentage(spark):
    from demo_flink_spark.plans.tpch_ext import q14_promo_effect

    row = q14_promo_effect(spark, SF_DIR).collect()[0]
    assert 0.0 <= row.promo_revenue_pct <= 100.0
    assert row.n_items > 0


def test_q16_anti_join_excludes_negative_balance_suppliers(spark):
    from pyspark.sql import functions as F

    from demo_flink_spark.plans.tpch_ext import q16_supplier_count
    from demo_flink_spark.sources import load_table

    out = q16_supplier_count(spark, SF_DIR)
    # supplier_cnt can never exceed the number of good suppliers
    n_good = (
        load_table(spark, SF_DIR, "supplier")
        .filter(F.col("s_acctbal") >= 0)
        .count()
    )
    assert out.agg(F.max("supplier_cnt")).collect()[0][0] <= n_good


def test_q17_small_quantity_subset(spark):
    from demo_flink_spark.plans.tpch_ext import q17_small_quantity

    row = q17_small_quantity(spark, SF_DIR).collect()[0]
    # threshold is 0.2*avg -> strictly fewer small rows than total
    assert row.n_small >= 0
    assert row.avg_yearly is None or row.avg_yearly >= 0.0


def test_q22_customers_have_no_urgent_orders(spark):
    from pyspark.sql import functions as F

    from demo_flink_spark.plans.tpch_ext import q22_global_sales_opportunity
    from demo_flink_spark.sources import load_table

    out = q22_global_sales_opportunity(spark, SF_DIR)
    total = out.agg(F.sum("numcust")).collect()[0][0] or 0
    # cross-check the anti-join against a direct NOT IN count
    cust = load_table(spark, SF_DIR, "customer").filter(
        F.col("c_nationkey").isin(1, 3, 5, 7, 9, 11, 13)
    )
    urgent = load_table(spark, SF_DIR, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0)
        .agg(F.avg("c_acctbal"))
        .collect()[0][0]
    )
    expect = (
        cust.filter(F.col("c_acctbal") > avg_bal)
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .count()
    )
    assert total == expect


def test_profile_table_single_pass_and_values(spark):
    from pyspark.sql import functions as F

    from demo_flink_spark.operators.relational import profile_table

    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 1.5), (2, None, 2.5)],
        "id long, s string, v double",
    )
    prof = {r.column: r for r in profile_table(df).collect()}
    assert prof["id"].n_rows == 3 and prof["id"].n_null == 0
    assert prof["id"].n_distinct == 2
    assert prof["s"].n_null == 1 and prof["s"].min_value == "a"
    assert prof["v"].n_null == 1 and prof["v"].max_value == "2.5"
