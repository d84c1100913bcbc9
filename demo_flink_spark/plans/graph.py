"""Declared queries: iterative graph analytics (north-star extension).

Iterative double-precision fixpoints are not SQL-expressible and their
per-dst float sums are partition-order-dependent, so the PageRank query
is rows-only for the driver; its numeric correctness is pinned by a
NumPy power-iteration twin in `tests/test_graph.py`.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.operators.graph import pagerank
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected customer↔part co-purchase graph:
    which parts (and customers) sit at the center of the purchase
    network. Symmetrized bipartite edges mean every node has
    out-edges, so no dangling-mass leak and total rank stays 1."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    # long node ids (even=customer, odd=part) keep the iteration's
    # shuffle keys 8 bytes; decoded to readable form only at the end
    cp = (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .select(
            (F.col("o_custkey") * 2).alias("cust"),
            (F.col("l_partkey") * 2 + 1).alias("part"),
        )
        .distinct()
    )
    edges = cp.select(F.col("cust").alias("src"), F.col("part").alias("dst")).union(
        cp.select(F.col("part").alias("src"), F.col("cust").alias("dst"))
    )
    r = pagerank(edges, damping=0.85, n_iter=6)
    return r.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        (F.col("node") / 2).cast("long").alias("key"),
        "rank",
    )


SPECS = [
    QuerySpec("graph_pagerank_copurchase", q_pagerank_copurchase, oracle=None),
]
