"""Local mimic of the driver's t2 correctness gate.

Runs every declared query at a given sf_dir through Spark AND its
DuckDB oracle, then compares row count, sorted column names, and an
order-insensitive canonical value hash. Run before committing:

    python tools/oracle_check.py [sf_dir] [query ...]

Row-diff escape hatch (for diagnosing a driver-red that the local
gate passes — the r3/r5 `rollup_time_hour_day` class): dump BOTH
engines' sorted canonical rows for one named query and print every
differing line:

    python tools/oracle_check.py --dump <query> [sf_dir]

writes /tmp/oracle_dump_<query>.{spark,duck}.txt (one canonical row
per line, sorted — the exact strings the hash is computed over) so a
cross-harness canonicalization gap is diagnosed from data, not
theory.
"""

from __future__ import annotations

import hashlib
import math
import sys
import time

import duckdb
import pandas as pd


def _CANON(v) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "NULL"
    if isinstance(v, float):
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        # FULL precision (shortest round-trip repr): two doubles
        # differing in the last ulp must hash differently, or the
        # local gate passes what the driver's stricter hash fails
        # (the r3 embedding_covariance / rollup_time_hour_day gap).
        return repr(v)
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_CANON(x) for x in v) + "]"
    try:
        if pd.isna(v):
            return "NULL"
    except (TypeError, ValueError):
        pass
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonical_hash(df: pd.DataFrame) -> str:
    """Order-insensitive hash: sort columns by name, canonicalize each
    value to text, sort rows, sha256."""
    df = df.reindex(sorted(df.columns), axis=1)
    canon = _CANON
    rows = sorted("|".join(canon(v) for v in row) for row in df.itertuples(index=False))
    return hashlib.sha256("\n".join(rows).encode()).hexdigest()


def canonical_rows(df: pd.DataFrame) -> list[str]:
    """The exact sorted canonical-row strings `canonical_hash` hashes
    (refactored to share the same canon rules — a dump that used
    different rules would diagnose nothing)."""
    df = df.reindex(sorted(df.columns), axis=1)
    canon = _CANON
    return sorted(
        "|".join(canon(v) for v in row) for row in df.itertuples(index=False)
    )


# DuckDB result types that canonicalize identically across ALL fetch
# paths (fetchall / pandas / Arrow). Anything outside this set —
# HUGEINT above all (DuckDB's SUM(BIGINT) result) — round-trips
# differently per path: HUGEINT is Python int via fetchall(), float64
# via pandas, decimal128(38,0) via Arrow. That split certified
# `rollup_time_hour_day` green locally while the driver hash-FAILED it
# three rounds running (r03/r05/r06).
_BLESSED_TYPE_PREFIXES = (
    "BIGINT",
    "INTEGER",
    "SMALLINT",
    "TINYINT",
    "DOUBLE",
    "FLOAT",
    "DECIMAL",
    "VARCHAR",
    "DATE",
    "TIMESTAMP",
    "BOOLEAN",
)


def _type_ok(t: str) -> bool:
    t = str(t).upper()
    if t.startswith("HUGEINT") or t.startswith("UHUGEINT"):
        return False
    if t.endswith("[]"):  # list type — check the element type
        return _type_ok(t[:-2])
    return any(t.startswith(p) for p in _BLESSED_TYPE_PREFIXES)


def typelint(sf_dir: str) -> int:
    """Registry-wide oracle result-type lint: bind every oracle SQL in
    DuckDB (no execution) and fail on any output column whose type is
    outside the blessed cross-fetch-path-stable set."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from demo_flink_spark.sources import TABLES

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    bad = 0
    oracles = e.oracle_sql()
    for name, sql in oracles.items():
        try:
            rel = con.sql(sql)  # lazy: binds + plans, does not execute
        except Exception as exc:  # noqa: BLE001
            print(f"TYPELINT FAIL {name}: oracle does not bind: {exc}")
            bad += 1
            continue
        for col, typ in zip(rel.columns, rel.types):
            if not _type_ok(str(typ)):
                print(f"TYPELINT FAIL {name}: column {col!r} has type {typ}")
                bad += 1
    print(f"typelint: {len(oracles)} oracles checked, {bad} violations")
    return 1 if bad else 0


def dump_query(name: str, sf_dir: str) -> int:
    """Run one query on both engines; write sorted canonical rows to
    /tmp/oracle_dump_<name>.{spark,duck}.txt and print differing lines."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark
    from demo_flink_spark.sources import TABLES

    qs, oracles = e.queries(), e.oracle_sql()
    if name not in qs:
        print(f"unknown query {name!r}")
        return 2
    spark = get_spark("oracle_dump")
    sdf = qs[name](spark, sf_dir).toPandas()
    srows = canonical_rows(sdf)
    spath = f"/tmp/oracle_dump_{name}.spark.txt"
    with open(spath, "w") as f:
        f.write("\n".join(srows))
    print(f"spark: {len(srows)} rows -> {spath}")
    if name not in oracles:
        print("no oracle for this query (rows-only) — spark dump written")
        return 0
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    odf = con.execute(oracles[name]).fetchdf()
    orows = canonical_rows(odf)
    opath = f"/tmp/oracle_dump_{name}.duck.txt"
    with open(opath, "w") as f:
        f.write("\n".join(orows))
    print(f"duck : {len(orows)} rows -> {opath}")
    n_diff = 0
    for i, (a, b) in enumerate(zip(srows, orows)):
        if a != b:
            n_diff += 1
            if n_diff <= 25:
                print(f"line {i}:\n  spark: {a}\n  duck : {b}")
    extra = abs(len(srows) - len(orows))
    if extra:
        print(f"(+{extra} unmatched trailing rows on the longer side)")
    print(f"{n_diff + extra} differing lines" if (n_diff or extra) else "IDENTICAL")
    return 1 if (n_diff or extra) else 0


# Queries whose execution is iterative and/or ANSI-arithmetic-heavy:
# the classes where partitioning-dependent behavior (partial-sum
# overflow order, merge order in driver-side convergence loops) can
# make a query pass under one shuffle layout and crash under another.
# graph_pagerank_copurchase did exactly that in driver round 7 while
# every fixed-partitioning local gate passed.
SHAKE_QUERIES = [
    "graph_pagerank_copurchase",
    "graph_bfs_hops",
    "graph_triangle_count",
    "graph_label_propagation",
    "dedup_clusters_ngram",
    "dedup_cluster_keep_longest",
    "dedup_cluster_size_histogram",
    "quantile_sketch_residual",
    # two-phase distributed global rank: per-partition Arrow local
    # ranks + an offset table — the construct is CORRECT only if the
    # result is invariant to the partition layout, which is exactly
    # what shake proves
    "linkage_sorted_neighborhood",
    # systematic every-k-th along a total order: same invariance claim
    "sample_systematic_orders",
    # pagerank over the word co-occurrence graph (string node ids)
    "textrank_keywords",
]
SHAKE_PARTITIONS = (3, 17, 64)


def shake(sf_dir: str, only: set[str] | None = None) -> int:
    """Re-run the iterative/overflow-prone queries under several
    spark.sql.shuffle.partitions settings; every setting must succeed
    AND produce the same canonical value hash. Catches the class of
    order-dependent failures that a single-partitioning local gate is
    structurally blind to."""
    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark

    spark = get_spark("oracle_shake")
    qs = e.queries()
    # fail LOUDLY on selection mistakes: a typo'd CLI name or a
    # SHAKE_QUERIES entry that drifted from a renamed QuerySpec must
    # not silently shrink the gate to "0 ok, 0 failed" green
    missing = [n for n in SHAKE_QUERIES if n not in qs]
    if missing:
        print(f"SHAKE CONFIG ERROR: not in the registry: {missing}")
        return 2
    if only:
        unknown = sorted(only - set(SHAKE_QUERIES))
        if unknown:
            print(
                f"SHAKE CONFIG ERROR: unknown selection {unknown} "
                f"(choose from {sorted(SHAKE_QUERIES)})"
            )
            return 2
    names = [n for n in SHAKE_QUERIES if not only or n in only]
    if not names:
        print("SHAKE CONFIG ERROR: empty query selection")
        return 2
    from demo_flink_spark.plans.memo import clear_session_memos

    saved_parts = spark.conf.get("spark.sql.shuffle.partitions")
    hashes: dict[str, dict[int, str]] = {n: {} for n in names}
    try:
        # settings OUTERMOST, memos cleared once per setting: every
        # memoized BUILD stage (graph/shingle/pair/CC frames) runs
        # under every partitioning — reusing a frame persisted under
        # a previous setting would silently shrink the gate's
        # partitioning-invariance coverage to one layout — while
        # queries within one setting still share builds (the shipped
        # single-session behavior)
        for parts in SHAKE_PARTITIONS:
            spark.conf.set("spark.sql.shuffle.partitions", str(parts))
            clear_session_memos()
            for name in names:
                t0 = time.time()
                try:
                    sdf = qs[name](spark, sf_dir).toPandas()
                except Exception as exc:  # noqa: BLE001
                    print(f"FAIL  {name} @parts={parts}: {exc}")
                    hashes[name][parts] = f"ERROR: {exc}"
                    continue
                hashes[name][parts] = canonical_hash(sdf)
                print(
                    f"  ran {name} @parts={parts}: {len(sdf)} rows "
                    f"[{time.time()-t0:.1f}s]"
                )
    finally:
        # restore whatever the session default actually was, not a
        # hard-coded value the gate would silently rewrite
        spark.conf.set("spark.sql.shuffle.partitions", saved_parts)
        clear_session_memos()
    n_fail = 0
    for name in names:
        vals = set(hashes[name].values())
        if len(vals) != 1 or any(str(v).startswith("ERROR") for v in vals):
            print(f"SHAKE FAIL {name}: {hashes[name]}")
            n_fail += 1
        else:
            print(f"SHAKE OK   {name}: identical across {SHAKE_PARTITIONS}")
    print(f"\nshake: {len(names) - n_fail} ok, {n_fail} failed")
    return 1 if n_fail else 0


def main() -> int:
    if len(sys.argv) > 1 and sys.argv[1] == "--shake":
        return shake(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01",
            set(sys.argv[3:]) or None,
        )
    if len(sys.argv) > 1 and sys.argv[1] == "--typelint":
        return typelint(
            sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
        )
    if len(sys.argv) > 2 and sys.argv[1] == "--dump":
        return dump_query(
            sys.argv[2],
            sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.01",
        )
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from demo_flink_spark.session import get_spark
    from demo_flink_spark.sources import TABLES

    spark = get_spark("oracle_check")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = n_rows_only = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir).toPandas()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: spark error: {exc}")
            n_fail += 1
            continue
        if name not in oracles:
            ok = len(sdf) >= 0
            print(f"rows  {name}: {len(sdf)} rows (rows-only check) [{time.time()-t0:.1f}s]")
            n_rows_only += 1
            continue
        try:
            odf = con.execute(oracles[name]).fetchdf()
        except Exception as exc:  # noqa: BLE001
            print(f"FAIL  {name}: oracle error: {exc}")
            n_fail += 1
            continue
        problems = []
        if len(sdf) != len(odf):
            problems.append(f"rows {len(sdf)} != {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            problems.append(f"cols {sorted(sdf.columns)} != {sorted(odf.columns)}")
        else:
            # dtype KIND parity (int/float/bool/object/datetime): a
            # float column on one side vs decimal-object on the other
            # canonicalizes differently and the driver's schema check
            # may be stricter than names-only
            for c in sdf.columns:
                ks, ko = sdf[c].dtype.kind, odf[c].dtype.kind
                # ints arriving as float64 via NULL-padding are fine
                # for hashing (canon strips .0) — flag only kinds that
                # change canonicalization
                groups = {"i": "num", "u": "num", "f": "num"}
                if groups.get(ks, ks) != groups.get(ko, ko):
                    problems.append(f"dtype kind {c}: {ks} != {ko}")
        if not problems and canonical_hash(sdf) != canonical_hash(odf):
            problems.append("value hash mismatch")
            # show a sample diff to debug
            s = sdf.reindex(sorted(sdf.columns), axis=1).sort_values(list(sorted(sdf.columns))).reset_index(drop=True)
            o = odf.reindex(sorted(odf.columns), axis=1).sort_values(list(sorted(odf.columns))).reset_index(drop=True)
            for i in range(min(len(s), len(o))):
                if not s.iloc[i].equals(o.iloc[i]):
                    problems.append(f"first diff row {i}:\n  spark: {s.iloc[i].to_dict()}\n  duck : {o.iloc[i].to_dict()}")
                    break
        if problems:
            print(f"FAIL  {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS  {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rows_only} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
