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


def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the part co-order graph (parts are adjacent
    when some order contains both). Pure-integer output, so unlike
    PageRank this iterative-graph-family query IS oracle-checkable —
    the DuckDB twin is the textbook a<b<c three-way self-join, while
    the Spark side runs the degree-ordered orientation that survives
    skew at scale (operators/graph.py::triangle_count)."""
    from demo_flink_spark.operators.graph import triangle_count

    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    l2 = li.select(
        F.col("l_orderkey").alias("o2"), F.col("l_partkey").alias("p2")
    )
    edges = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.p2))
        .select(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
    )
    return triangle_count(edges)


SPECS = [
    QuerySpec("graph_pagerank_copurchase", q_pagerank_copurchase, oracle=None),
    QuerySpec(
        "graph_triangle_count",
        q_triangle_count,
        oracle="""
        WITH e AS (
            SELECT DISTINCT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
        ),
        nodes AS (
            SELECT a AS node FROM e UNION SELECT b FROM e
        ),
        tri AS (
            SELECT count(*) AS n_triangles
            FROM e e1
            JOIN e e2 ON e2.a = e1.b
            JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
        )
        SELECT (SELECT count(*) FROM nodes) AS n_nodes,
               (SELECT count(*) FROM e) AS n_edges,
               n_triangles
        FROM tri
        """,
    ),
]
