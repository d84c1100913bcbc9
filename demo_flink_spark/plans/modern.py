"""Declared queries: Spark-4-era API surface — VariantType
semi-structured access, a Python UDTF, and mergeable sketch
aggregates.

- **variant**: `parse_json` → binary-encoded VariantType → typed
  `variant_get` extraction. Same answers as `get_json_object`
  (`scalar_json`), but the variant is parsed ONCE and then navigated
  as binary — at 100 TB the repeated-JSON-string-parse cost that
  `TradeChangeDetectionJob.java:61,83,95` pays per access disappears.
- **UDTF**: `RunLengthTokens` (functions/udtfs.py) — the
  FlatMapFunction-parity 1→N surface, demonstrated on logic that is a
  single stateful sweep in Python but a shuffle + two window passes in
  SQL (the oracle runs that gaps-and-islands rewrite).
- **sketches**: HLL distinct-count sketches built per group and merged
  with `hll_union_agg` — the re-aggregatable distinct-count shape that
  rollup stores need (exact distinct cannot be merged; sketches can).
  Sketch binaries/estimates are engine-specific, so the declared
  outputs are exact values + pinned-error/structural assertions
  (hash-checkable); estimate accuracy and merge = direct are pinned in
  tests/test_sketches.py. Count-min is the frequency twin with the
  same merge property.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from demo_flink_spark.plans.spec import QuerySpec
from demo_flink_spark.sources import load_table


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed field extraction through VariantType: parse each event's
    props JSON once into a variant, pull `k` as a long, aggregate per
    event_type. The decimal-exact sum keeps the hash portable."""
    from demo_flink_spark.operators.relational import dsum

    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            dsum(F.col("k")).cast("long").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


def q_udtf_token_rle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Run-length encoding of consecutive repeated tokens per document
    via a Python UDTF lateral join."""
    from demo_flink_spark.functions.udtfs import RunLengthTokens

    spark.udtf.register("rle_tokens", RunLengthTokens)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView(
        "_docs_for_rle"
    )
    return spark.sql(
        """
        SELECT d.doc_id, f.token, f.run_len, f.start_idx
        FROM _docs_for_rle d, LATERAL rle_tokens(d.text) f
        """
    )


def q_sketch_hll_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users per event_type via HLL sketches, plus an
    '_all_' row whose sketch is the UNION of the per-type sketches —
    the mergeable-rollup property exact distinct counts lack.

    Hash-checkable output (r4, VERDICT item 5): the raw estimate is
    engine-specific, so the declared columns are the EXACT distinct
    count plus a pinned-error assertion that the sketch estimate lands
    within 5% of it (default lgConfigK=12 ⇒ rsd ≈ 1.6%, so 5% is a
    ≥3σ bound). The oracle emits the same exact counts and literal
    TRUE — a drifting sketch fails the hash, a healthy one matches.
    """
    ev = load_table(spark, sf_dir, "events")
    per_type = ev.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sk")
    )
    merged = per_type.agg(
        F.lit("_all_").alias("event_type"), F.hll_union_agg("sk").alias("sk")
    )
    approx = per_type.unionByName(merged).select(
        "event_type",
        F.hll_sketch_estimate("sk").cast("long").alias("approx_users"),
    )
    exact = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    ).unionByName(
        ev.agg(
            F.lit("_all_").alias("event_type"),
            F.countDistinct("user_id").alias("exact_users"),
        )
    )
    return approx.join(exact, "event_type").select(
        "event_type",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("hll_within_5pct"),
    )


def q_sketch_cms_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch of the event_type frequency stream (fixed
    seed → deterministic binary; counter merges are commutative, so
    the bytes are partition-order independent).

    Hash-checkable output (r4, VERDICT item 5): the sketch binary is
    engine-specific, so the declared columns decode the sketch's
    public serialized layout (version, totalCount, depth, width,
    hashA[depth], table[depth][width] — verified against the JVM
    writer) and emit the structural invariants any correct CMS
    satisfies: depth = ceil(ln(1/δ)/ln 2) = 7, width = ceil(2/ε) =
    2000, totalCount = count(*), and every depth row conserving the
    total. The oracle states those invariants in SQL; estimate
    accuracy stays pinned in tests/test_sketches.py via the JVM
    reader.
    """
    import struct
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")
    sk = ev.agg(
        F.count_min_sketch(
            "event_type", F.lit(0.001), F.lit(0.99), F.lit(42)
        ).alias("cms")
    )

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for buf in pdf["cms"]:
                b = bytes(buf)
                _ver, total, depth, width = struct.unpack_from(">iqii", b, 0)
                off = 20 + 8 * depth  # header + hashA
                table = np.frombuffer(
                    b, dtype=">i8", count=depth * width, offset=off
                ).reshape(depth, width)
                rows.append(
                    (depth, width, total, bool((table.sum(axis=1) == total).all()))
                )
            yield pd.DataFrame(
                rows, columns=["depth", "width", "total_count", "rows_conserved"]
            )

    return sk.mapInPandas(
        decode, "depth int, width int, total_count long, rows_conserved boolean"
    )


def q_pysource_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource end-to-end
    (sources/pysource.py::SyntheticEventsDataSource, the Spark-4
    DataSource API): 2000 generated events read through the registered
    format and aggregated per type. The oracle re-derives every
    md5-generated attribute in SQL, so the CONNECTOR itself — schema,
    partition planning, row generation — is value-hash-checked, not
    just smoke-tested. sf_dir is unused: the source generates its
    input (that is the point)."""
    from demo_flink_spark.sources.pysource import SyntheticEventsDataSource

    spark.dataSource.register(SyntheticEventsDataSource)
    df = (
        spark.read.format("synthetic_events")
        .option("n_rows", 2000)
        .option("numPartitions", 8)
        .load()
    )
    return df.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_events"),
        F.countDistinct("user_id").cast("long").alias("n_users"),
        F.sum(F.col("value").cast("decimal(38,6)"))
        .cast("double")
        .alias("sum_value"),
    )


# DuckDB twin of pysource._row: md5_number_upper is the first 8 md5
# bytes little-endian, so byte k = (x // 256^k) % 256; the Python
# int(hex[a:b], 16) slices decompose into those bytes (the
# fim_transform_psm derivation, extended to nibbles).
_PYSOURCE_ORACLE = """
WITH ids AS (SELECT unnest(range(0, 2000)) AS i),
h AS (
    SELECT i, md5_number_upper('syn:' || CAST(i AS VARCHAR)) AS x FROM ids
),
f AS (
    SELECT i,
           ((x % 256) * 256 + (x // 256) % 256) % 100 AS user_id,
           CAST(((x // 65536) % 256) // 16 AS BIGINT) % 4 AS eidx,
           round((((x // 65536) % 256) % 16 * 4096
                  + ((x // 16777216) % 256) * 16
                  + ((x // 4294967296) % 256) // 16) % 20000 / 100.0,
                 2) AS value
    FROM h
)
SELECT CASE eidx WHEN 0 THEN 'view' WHEN 1 THEN 'click'
                 WHEN 2 THEN 'purchase' ELSE 'error' END AS event_type,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(sum(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS sum_value
FROM f GROUP BY eidx
"""


def q_sql_udf_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 declarative SQL scalar UDF (`CREATE FUNCTION … RETURN
    expr`) — the §2.10 UDF tier ABOVE Python: the body is pure SQL, so
    Catalyst inlines it into the plan (codegen'd, pushdown-eligible,
    zero serialization) where even a pandas UDF would be an opaque
    Arrow exchange. Revenue per return flag through the UDF; the
    oracle inlines the same expression — hash equality proves the UDF
    call compiles away to the expression."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_sqludf"
    )
    spark.sql(
        "CREATE OR REPLACE TEMPORARY FUNCTION line_rev(p DOUBLE, d DOUBLE)"
        " RETURNS DOUBLE RETURN p * (1.0 - d)"
    )
    return spark.sql(
        """
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(line_rev(l_extendedprice, l_discount)
                    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem_sqludf GROUP BY l_returnflag
        """
    )


def q_sql_table_udf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark-4 SQL TABLE function called LATERALLY with a correlated
    argument — the declarative UDTF: split every high-value order's
    total into 3 exact integer-cent installments (remainder cents go
    to the earliest parts, Σ parts == total by construction)."""
    load_table(spark, sf_dir, "orders").createOrReplaceTempView(
        "orders_sqltf"
    )
    spark.sql(
        """
        CREATE OR REPLACE TEMPORARY FUNCTION installments(cents BIGINT)
        RETURNS TABLE(part INT, amount_cents BIGINT) RETURN
        SELECT 1, cents div 3 + CASE WHEN cents % 3 >= 1 THEN 1 ELSE 0 END
        UNION ALL
        SELECT 2, cents div 3 + CASE WHEN cents % 3 >= 2 THEN 1 ELSE 0 END
        UNION ALL
        SELECT 3, cents div 3
        """
    )
    return spark.sql(
        """
        SELECT o.o_orderkey, i.part, i.amount_cents
        FROM orders_sqltf o,
        LATERAL installments(
            CAST(round(o.o_totalprice * 100) AS BIGINT)) i
        WHERE o.o_totalprice > 400000
        """
    )


SPECS = [
    QuerySpec(
        "pysource_event_counts", q_pysource_counts, oracle=_PYSOURCE_ORACLE
    ),
    QuerySpec(
        "sql_udf_revenue",
        q_sql_udf_revenue,
        oracle="""
        SELECT l_returnflag,
               CAST(count(*) AS BIGINT) AS n,
               CAST(sum(CAST(l_extendedprice * (1.0 - l_discount)
                    AS DECIMAL(38,6))) AS DOUBLE) AS revenue
        FROM lineitem GROUP BY l_returnflag
        """,
    ),
    QuerySpec(
        "sql_table_udf_installments",
        q_sql_table_udf,
        # inline the table function body: 3 exact integer-cent parts,
        # remainder to the earliest
        oracle="""
        WITH base AS (
            SELECT o_orderkey,
                   CAST(round(o_totalprice * 100) AS BIGINT) AS cents
            FROM orders WHERE o_totalprice > 400000
        )
        SELECT o_orderkey, CAST(part AS INTEGER) AS part,
               cents // 3 + CASE WHEN cents % 3 >= part THEN 1 ELSE 0 END
                   AS amount_cents
        FROM base, LATERAL unnest([1, 2, 3]) AS u(part)
        """,
    ),
    QuerySpec(
        "variant_props_stats",
        q_variant_extract,
        oracle="""
        SELECT event_type,
               CAST(count(*) AS BIGINT) AS n,
               CAST(CAST(sum(CAST(CAST(props ->> '$.k' AS BIGINT)
                    AS DECIMAL(38,6))) AS DOUBLE) AS BIGINT) AS sum_k,
               min(CAST(props ->> '$.k' AS BIGINT)) AS min_k,
               max(CAST(props ->> '$.k' AS BIGINT)) AS max_k
        FROM events GROUP BY event_type
        """,
    ),
    QuerySpec(
        "udtf_token_rle",
        q_udtf_token_rle,
        # gaps-and-islands rewrite: consecutive equal tokens share
        # (pos - row_number within (doc, token))
        oracle=r"""
        WITH toks AS (
            SELECT doc_id, list_filter(string_split_regex(
                regexp_replace(lower(text), '[^a-z\s]', '', 'g'), '\s+'),
                w -> length(w) > 0) AS t
            FROM documents
        ),
        tok AS (
            SELECT doc_id, t[i + 1] AS token, i AS pos
            FROM toks, unnest(range(0, len(t))) AS u(i)
        ),
        isl AS (
            SELECT doc_id, token, pos,
                   pos - row_number() OVER (
                       PARTITION BY doc_id, token ORDER BY pos) AS grp
            FROM tok
        )
        SELECT doc_id, token,
               CAST(count(*) AS INT) AS run_len,
               CAST(min(pos) AS INT) AS start_idx
        FROM isl GROUP BY doc_id, token, grp
        """,
    ),
    QuerySpec(
        "sketch_hll_users",
        q_sketch_hll_users,
        oracle="""
        SELECT event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS hll_within_5pct
        FROM events GROUP BY event_type
        UNION ALL
        SELECT '_all_' AS event_type,
               count(DISTINCT user_id) AS exact_users,
               TRUE AS hll_within_5pct
        FROM events
        """,
    ),
    QuerySpec(
        "sketch_cms_types",
        q_sketch_cms_types,
        # depth = ceil(ln(1/(1-0.99))/ln 2) = 7, width = ceil(2/0.001)
        oracle="""
        SELECT CAST(7 AS INTEGER) AS depth,
               CAST(2000 AS INTEGER) AS width,
               count(*) AS total_count,
               TRUE AS rows_conserved
        FROM events
        """,
    ),
]
