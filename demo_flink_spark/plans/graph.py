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

from demo_flink_spark.operators.graph import (
    adamic_adar_topk,
    bfs_hops,
    label_propagation,
    pagerank,
)
from demo_flink_spark.operators.relational import softln_ratio_sql
from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_pagerank_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the undirected customer↔part co-purchase graph:
    which parts (and customers) sit at the center of the purchase
    network. Symmetrized bipartite edges mean every node has
    out-edges, so no dangling-mass leak and total rank stays 1.
    Long node ids (even=customer, odd=part) keep the iteration's
    shuffle keys 8 bytes; decoded to readable form only at the end."""
    edges = _bipartite_edges(spark, sf_dir)
    # early_exit off: with damping 0.85 exact Q52 convergence needs
    # ~220 rounds (operator docstring), so a 6-round run can never
    # take the exit — the boundary signature job would be pure
    # overhead. Output is identical either way: the exit fires only
    # at a proven exact fixed point, where all later rounds are
    # bit-identical no-ops.
    r = pagerank(edges, damping=0.85, n_iter=6, early_exit=False)
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
    skew at scale (operators/graph.py::triangle_count).

    The frequency floor >= 2 co-orders (in `_copurchase_edges`):
    real co-purchase graphs are thresholded exactly like this to
    kill one-off noise edges — without it the synthetic graph is
    near-complete (~n^3/6 wedges, a benchmark artifact, not a
    workload)."""
    from demo_flink_spark.operators.graph import triangle_count

    return triangle_count(_copurchase_edges(spark, sf_dir))


def pagerank_oracle_sql(
    edge_cte: str,
    final_select: str,
    n_iter: int = 6,
    damping: float = 0.85,
) -> str:
    """Generate the unrolled Q52 fixed-point PageRank oracle.

    `edge_cte` must be a `WITH ...` chain whose last CTE is named `e`
    with columns (src, dst); `final_select` reads the converged vector
    from `r{n_iter}` (node, rank). Each unrolled round mirrors
    operators/graph.py::pagerank bit-for-bit: per-edge contributions
    floor(rank·inv_deg·2^52) summed as BIGINTs, divided back — so the
    doubles are identical across engines and any consumer query
    (copurchase centrality, TextRank keywords) carries a value-hash
    oracle. Extracted from the hand-written r1 copurchase oracle,
    which now calls this generator (the driver's hash match is the
    proof the generator reproduces it)."""
    d = f"CAST({damping} AS DOUBLE)"
    rounds = []
    for r in range(1, n_iter + 1):
        rounds.append(
            f""",
        r{r} AS (
            SELECT v.node,
                   (CAST(1.0 AS DOUBLE) - {d}) / (SELECT n FROM nn)
                   + {d} * coalesce(c.contrib, CAST(0.0 AS DOUBLE)) AS rank
            FROM nodes v LEFT JOIN (
                SELECT wd.dst,
                       CAST(SUM(CAST(floor(r.rank * wd.inv_deg
                                * 4503599627370496.0) AS BIGINT))
                            AS DOUBLE) / 4503599627370496.0 AS contrib
                FROM wd JOIN r{r - 1} r ON wd.src = r.node
                GROUP BY wd.dst
            ) c ON v.node = c.dst
        )"""
        )
    return (
        edge_cte
        + """,
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
        r0 AS (SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS rank FROM nodes)"""
        + "".join(rounds)
        + "\n"
        + final_select
    )


_COPURCHASE_EDGE_CTE = """
        WITH cp AS (
            SELECT DISTINCT o_custkey * 2 AS cust, l_partkey * 2 + 1 AS part
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS (
            SELECT cust AS src, part AS dst FROM cp
            UNION ALL
            SELECT part AS src, cust AS dst FROM cp
        )"""


def _session_cached(spark: SparkSession, sf_dir: str, kind: str, build):
    """Session-scoped persisted graph builds.

    Five declared queries analyze the part co-order graph and three
    more the cust↔part bipartite graph; each graph's construction (a
    lineitem self-join / orders join + distinct) costs more than some
    of the analytics on top of it. Memoized per (applicationId,
    sf_dir, kind) via the shared bounded-LRU session memo — see
    plans/memo.py for the full contract (at 100 TB these graphs are
    materialized tables maintained once, not rebuilt per query; the
    shake gate clears the memos between partitionings so reuse never
    hides a layout-dependent build)."""
    from demo_flink_spark.plans.memo import session_memo

    return session_memo(
        "graph", (spark.sparkContext.applicationId, sf_dir, kind), build
    )


def _copurchase_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Part co-order edges with the >= 2 co-order noise floor — the
    shared graph for triangle census / link prediction."""

    def build() -> DataFrame:
        # Pair generation via per-order item lists instead of the
        # lineitem⨝lineitem self-join (r14 pass): one exchange of
        # lineitem (the groupBy) + a narrow in-row pair expansion,
        # versus the join's exchange PLUS its per-partition sort and
        # the join itself. Orders are small (≤ ~7 items in this
        # schema; bounded in any real order system), so the expanded
        # per-row pair count is tiny and the old quadratic-per-order
        # cost moves into a cheap array transform. Multiplicity
        # semantics are preserved EXACTLY: sort_array + collect_list
        # keeps duplicate (order, part) rows, and the value-strict
        # `y > x` guard reproduces the self-join's `l_partkey < p2`
        # (duplicate parts pair with every later distinct part, never
        # with themselves) — pinned by a sym-diff-0 A/B at sf0.1
        # (3853 edges both shapes; 2.1 s → 1.6 s build) and by the
        # unchanged DuckDB oracles of all five consumer queries.
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        lists = (
            li.groupBy("l_orderkey")
            .agg(F.sort_array(F.collect_list("l_partkey")).alias("ps"))
            .filter(F.size("ps") >= 2)
        )
        pairs = lists.select(
            F.explode(
                F.expr(
                    "flatten(transform(ps, (x, i) ->"
                    " filter(transform(slice(ps, i + 2, size(ps) - i - 1),"
                    " y -> IF(y > x, struct(x AS src, y AS dst), NULL)),"
                    " p -> p IS NOT NULL)))"
                )
            ).alias("p")
        ).select("p.src", "p.dst")
        return (
            pairs.groupBy("src", "dst")
            .agg(F.count(F.lit(1)).alias("n_co"))
            .filter(F.col("n_co") >= 2)
            .select("src", "dst")
        )

    return _session_cached(spark, sf_dir, "co_order", build)


def _bipartite_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetrized customer↔part co-purchase edge list (long node
    ids: even=customer, odd=part) — the shared graph for pagerank /
    BFS / label propagation."""

    def build() -> DataFrame:
        li = load_table(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_partkey"
        )
        o = load_table(spark, sf_dir, "orders").select(
            "o_orderkey", "o_custkey"
        )
        cp = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .select(
                (F.col("o_custkey") * 2).alias("cust"),
                (F.col("l_partkey") * 2 + 1).alias("part"),
            )
            .distinct()
        )
        return cp.select(
            F.col("cust").alias("src"), F.col("part").alias("dst")
        ).union(
            cp.select(F.col("part").alias("src"), F.col("cust").alias("dst"))
        )

    return _session_cached(spark, sf_dir, "bipartite", build)


def q_degree_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree-distribution summary + Hill/MLE power-law exponent of
    the part co-order graph (operators/graph.py::degree_powerlaw) —
    the is-this-graph-heavy-tailed diagnostic run before choosing a
    join skew strategy."""
    from demo_flink_spark.operators.graph import degree_powerlaw

    return degree_powerlaw(_copurchase_edges(spark, sf_dir), d_min=2)


def q_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Newman degree assortativity of the part co-order graph
    (operators/graph.py::degree_assortativity): exact-integer
    sufficient statistics, one final double correlation."""
    from demo_flink_spark.operators.graph import degree_assortativity

    return degree_assortativity(_copurchase_edges(spark, sf_dir))


def q_adamic_adar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-100 predicted new links in the part co-order graph by
    Adamic-Adar score ("parts likely to be co-ordered next") —
    operators/graph.py::adamic_adar_topk over the same thresholded
    edge list as the triangle census."""
    return adamic_adar_topk(_copurchase_edges(spark, sf_dir), k=100)


def q_bfs_hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-source BFS over the customer↔part co-purchase bipartite
    graph: hop distance from the 5 highest-order-count customers to
    every node within 4 hops (market-reach / influence-radius
    analysis). operators/graph.py::bfs_hops frontier iteration; the
    oracle is the recursive-CTE min-hop form."""
    edges = _bipartite_edges(spark, sf_dir)
    seeds = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .orderBy(F.col("n_orders").desc(), F.col("o_custkey"))
        .limit(5)
        .select((F.col("o_custkey") * 2).alias("node"))
    )
    r = bfs_hops(edges, seeds, max_hops=4)
    return r.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        "hops",
    )


def q_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Community detection on the customer↔part co-purchase graph by
    deterministic synchronous label propagation (3 rounds) —
    operators/graph.py::label_propagation. Same encoded bipartite
    edge list as pagerank; communities are "shopping neighborhoods"
    (customers plus the parts that tie them together)."""
    edges = _bipartite_edges(spark, sf_dir)
    # early_exit off: 3 fixed rounds on a churning bipartite graph
    # never reach a fixed point, so the signature jobs would be pure
    # overhead here; the exit path is pinned by the operator's tests
    labs = label_propagation(edges, n_rounds=3, early_exit=False)
    return labs.select(
        F.when(F.col("node") % 2 == 0, F.lit("customer"))
        .otherwise(F.lit("part"))
        .alias("node_type"),
        F.expr("node div 2").alias("key"),
        F.col("community").cast("long").alias("community"),
    )


def _lpa_oracle(n_rounds: int) -> str:
    """Unroll `n_rounds` synchronous LPA rounds in DuckDB SQL — the
    same determinization (self-vote, plurality, min-label tie-break)
    as the engine, so per-node labels hash-match exactly. The
    recursive/unrolled form is oracle-scale-only, like pagerank's."""
    parts = [
        """
        WITH cp AS (
            SELECT DISTINCT o_custkey * 2 AS cust, l_partkey * 2 + 1 AS part
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS (
            SELECT cust AS src, part AS dst FROM cp
            UNION ALL
            SELECT part AS src, cust AS dst FROM cp
        ),
        l0 AS (
            SELECT node, node AS lab FROM (
                SELECT DISTINCT src AS node FROM e
                UNION
                SELECT DISTINCT dst AS node FROM e
            )
        )"""
    ]
    prev = "l0"
    for r in range(1, n_rounds + 1):
        parts.append(
            f""",
        v{r} AS (
            SELECT e.src AS node, l.lab
            FROM e JOIN {prev} l ON e.dst = l.node
            UNION ALL
            SELECT node, lab FROM {prev}
        ),
        c{r} AS (
            SELECT node, lab, count(*) AS c FROM v{r} GROUP BY node, lab
        ),
        l{r} AS (
            SELECT node, lab FROM (
                SELECT node, lab,
                       row_number() OVER (
                           PARTITION BY node ORDER BY c DESC, lab ASC
                       ) AS rn
                FROM c{r}
            ) WHERE rn = 1
        )"""
        )
        prev = f"l{r}"
    parts.append(
        f"""
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
                   AS node_type,
               node // 2 AS key,
               CAST(lab AS BIGINT) AS community
        FROM {prev}"""
    )
    return "".join(parts)


SPECS = [
    QuerySpec(
        "graph_pagerank_copurchase",
        q_pagerank_copurchase,
        # 6 power iterations unrolled via pagerank_oracle_sql; Q52
        # fixed-point contribution sums (floor(c*2^52) summed as
        # longs) make the doubles bit-identical across engines
        oracle=pagerank_oracle_sql(
            _COPURCHASE_EDGE_CTE,
            """
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
                   AS node_type,
               node // 2 AS key, rank
        FROM r6
            """,
            n_iter=6,
            damping=0.85,
        ),
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
    QuerySpec(
        "graph_adamic_adar",
        q_adamic_adar,
        # 1/ln(deg) via the portable softln series (-softln(1, deg) ==
        # ln deg), rounded half-up at 6dp, summed as exact decimal —
        # identical expression tree on both engines
        oracle=f"""
        WITH e AS (
            SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        deg AS (SELECT a AS z, CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY a),
        w AS (
            SELECT z,
                   CAST(round(-1.0 / ({softln_ratio_sql("1", "deg")}), 6)
                        AS DECIMAL(38,6)) AS w
            FROM deg WHERE deg >= 2
        ),
        adj AS (SELECT b AS z, a AS x FROM und),
        cand AS (
            SELECT n1.x AS x, n2.x AS y, SUM(w.w) AS s
            FROM adj n1
            JOIN adj n2 ON n1.z = n2.z AND n1.x < n2.x
            JOIN w ON w.z = n1.z
            GROUP BY 1, 2
        )
        SELECT x, y, CAST(s * 1000000 AS BIGINT) AS score_micros
        FROM cand
        WHERE NOT EXISTS (
            SELECT 1 FROM und u WHERE u.a = cand.x AND u.b = cand.y
        )
        ORDER BY score_micros DESC, x, y
        LIMIT 100
        """,
    ),
    QuerySpec(
        "graph_bfs_hops",
        q_bfs_hops,
        # recursive-UNION walk enumeration + min(hop): affordable at
        # oracle scale; the engine side uses frontier iteration (each
        # node expanded once) — see operators/graph.py::bfs_hops
        oracle="""
        WITH RECURSIVE cp AS (
            SELECT DISTINCT o_custkey * 2 AS cust, l_partkey * 2 + 1 AS part
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        ),
        e AS (
            SELECT cust AS src, part AS dst FROM cp
            UNION ALL
            SELECT part AS src, cust AS dst FROM cp
        ),
        seeds AS (
            SELECT o_custkey * 2 AS node
            FROM orders GROUP BY o_custkey
            ORDER BY count(*) DESC, o_custkey LIMIT 5
        ),
        walk(node, hop) AS (
            SELECT node, 0 FROM seeds
            UNION
            SELECT e.dst, w.hop + 1
            FROM walk w JOIN e ON w.node = e.src
            WHERE w.hop < 4
        )
        SELECT CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'part' END
                   AS node_type,
               node // 2 AS key,
               CAST(min(hop) AS INTEGER) AS hops
        FROM walk GROUP BY 1, 2
        """,
    ),
    QuerySpec(
        "graph_degree_powerlaw",
        q_degree_powerlaw,
        oracle=f"""
        WITH e AS (
            SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY a),
        tail AS (
            SELECT deg,
                   CAST(CAST(round(-1.0 * ({softln_ratio_sql("2", "deg")}), 6)
                             AS DECIMAL(38,6)) * 1000000 AS BIGINT) AS lnm
            FROM deg WHERE deg >= 2
        ),
        agg AS (
            SELECT CAST(count(*) AS BIGINT) AS n_tail,
                   CAST(sum(deg) AS BIGINT) AS sdeg,
                   CAST(max(deg) AS BIGINT) AS max_degree,
                   CAST(sum(lnm) AS BIGINT) AS sln
            FROM tail
        ),
        nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg)
        SELECT n_nodes, n_tail, max_degree,
               (sdeg * 2000000 + n_tail) // (2 * n_tail)
                   AS mean_tail_degree_micros,
               1.0 + CAST(n_tail AS DOUBLE)
                   / (CAST(sln AS DOUBLE) / 1000000.0) AS alpha
        FROM agg CROSS JOIN nn
        """,
    ),
    QuerySpec(
        "graph_assortativity",
        q_assortativity,
        oracle="""
        WITH e AS (
            SELECT l1.l_partkey AS a, l2.l_partkey AS b
            FROM lineitem l1 JOIN lineitem l2
              ON l1.l_orderkey = l2.l_orderkey
             AND l1.l_partkey < l2.l_partkey
            GROUP BY 1, 2 HAVING count(*) >= 2
        ),
        und AS (SELECT a, b FROM e UNION SELECT b, a FROM e),
        deg AS (SELECT a, CAST(count(*) AS BIGINT) AS deg
                FROM und GROUP BY a),
        pairs AS (
            SELECT CAST(dx.deg AS HUGEINT) AS x,
                   CAST(dy.deg AS HUGEINT) AS y
            FROM und
            JOIN deg dx ON und.a = dx.a
            JOIN deg dy ON und.b = dy.a
        ),
        agg AS (
            SELECT CAST(count(*) AS HUGEINT) AS m,
                   sum(x) AS sx, sum(y) AS sy,
                   sum(x * y) AS sxy, sum(x * x) AS sxx,
                   sum(y * y) AS syy
            FROM pairs
        )
        SELECT CAST(m AS BIGINT) AS n_edge_ends,
               CAST(m * sxy - sx * sy AS DOUBLE)
                 / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
                    * sqrt(CAST(m * syy - sy * sy AS DOUBLE)))
                   AS assortativity
        FROM agg
        """,
    ),
    QuerySpec(
        "graph_label_propagation",
        q_label_propagation,
        oracle=_lpa_oracle(3),
    ),
]
