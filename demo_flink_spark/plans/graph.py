"""Declared queries: iterative graph analytics (north-star extension).

PageRank is iterative, but with the fixed iteration count unrolled
into CTE stages and the per-dst contribution sums accumulated in
decimal (exact, order-independent — `operators/graph.py::pagerank`)
the whole fixpoint is deterministic double arithmetic that DuckDB
reproduces bit-for-bit, so even this query carries a value-hash
oracle. A NumPy power-iteration twin additionally pins the numerics
in `tests/test_graph.py`.
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
    # frequency floor >= 2 co-orders: real co-purchase graphs are
    # thresholded exactly like this to kill one-off noise edges —
    # without it the synthetic graph is near-complete (~n^3/6 wedges,
    # a benchmark artifact, not a workload)
    edges = (
        li.join(l2, (li.l_orderkey == l2.o2) & (li.l_partkey < l2.p2))
        .groupBy(F.col("l_partkey").alias("src"), F.col("p2").alias("dst"))
        .agg(F.count(F.lit(1)).alias("n_co"))
        .filter(F.col("n_co") >= 2)
        .select("src", "dst")
    )
    return triangle_count(edges)


SPECS = [
    QuerySpec(
        "graph_pagerank_copurchase",
        q_pagerank_copurchase,
        # 6 power iterations unrolled; Q52 fixed-point contribution
        # sums (floor(c*2^52) summed as longs) make the doubles
        # bit-identical across engines
        oracle="""
        WITH cp AS (
            SELECT DISTINCT o_custkey * 2 AS cust, l_partkey * 2 + 1 AS part
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS (
            SELECT cust AS src, part AS dst FROM cp
            UNION ALL
            SELECT part AS src, cust AS dst FROM cp
        ),
        deg AS (SELECT src, count(*) AS deg FROM e GROUP BY src),
        wd AS (
            SELECT e.src, e.dst, CAST(1.0 AS DOUBLE) / deg.deg AS inv_deg
            FROM e JOIN deg ON e.src = deg.src
        ),
        nodes AS (
            SELECT DISTINCT node FROM (
                SELECT src AS node FROM e UNION ALL SELECT dst FROM e
            )
        ),
        nn AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes),
        r1 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r0 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        ),
        r2 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r1 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        ),
        r3 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r2 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        ),
        r4 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r3 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        ),
        r5 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r4 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        ),
        r6 AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - CAST(0.85 AS DOUBLE)) / (SELECT n FROM nn)
                   + CAST(0.85 AS DOUBLE) * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r5 r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        )
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
                   AS node_type,
               node // 2 AS key, rank
        FROM r6
        """,
    ),
    QuerySpec(
        "graph_triangle_count",
        q_triangle_count,
        oracle="""
        WITH e AS (
            SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
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
