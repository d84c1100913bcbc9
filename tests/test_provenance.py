"""Record-level file provenance via the `_metadata` hidden column:
per-file attribution over a multi-file table must agree with DuckDB's
`read_parquet(..., filename=true)` ground truth."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

from demo_flink_spark.sources import load_table

SF = "/root/testdata/sf0.001"


def test_metadata_per_file_counts_match_duckdb(spark, tmp_path):
    out = str(tmp_path / "docs_multi")
    load_table(spark, SF, "documents").repartition(4).write.parquet(out)

    got = {
        (r["source_file"], r["n_rows"], r["min_doc"], r["max_doc"])
        for r in (
            spark.read.parquet(out)
            .select(F.col("_metadata.file_name").alias("source_file"), "doc_id")
            .groupBy("source_file")
            .agg(
                F.count(F.lit(1)).alias("n_rows"),
                F.min("doc_id").alias("min_doc"),
                F.max("doc_id").alias("max_doc"),
            )
            .collect()
        )
    }
    want = {
        tuple(r)
        for r in duckdb.connect()
        .execute(
            f"""
            SELECT parse_filename(filename) AS source_file,
                   count(*) AS n_rows, min(doc_id) AS min_doc,
                   max(doc_id) AS max_doc
            FROM read_parquet('{out}/*.parquet', filename=true)
            GROUP BY source_file
            """
        )
        .fetchall()
    }
    assert len(got) == 4  # repartition(4) -> four physical files
    assert got == want


def test_metadata_survives_filter_pushdown(spark):
    """Provenance composes with pruned scans: selecting `_metadata`
    must not block predicate pushdown on regular columns."""
    docs = load_table(spark, SF, "documents").filter(F.col("doc_id") < 10)
    rows = docs.select("doc_id", F.col("_metadata.file_name").alias("f")).collect()
    assert {r["f"] for r in rows} == {"documents.parquet"}
    assert {r["doc_id"] for r in rows} == set(range(10))
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan and "LessThan(doc_id,10)" in plan
