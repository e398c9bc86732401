"""Local replica of the driver's correctness gate: run every query on
Spark and its oracle on DuckDB over the same parquet, compare row
count, column names, and order-insensitive values."""

from __future__ import annotations

import math

import duckdb
import pytest

from oracle_cassandra_migrator_spark.queries import ORACLES, QUERIES

import os

SF_DIR = os.environ.get("OCM_TEST_SF_DIR", "/root/testdata/sf0.001")

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def normalize_cell(v):
    # (is_null, value) keeps NULLs sortable against any column type
    if v is None:
        return (True, "")
    if isinstance(v, float):
        if math.isnan(v):
            return (False, "NaN")
        return (False, round(v, 9))
    return (False, v)


def normalize_rows(columns, rows):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return sorted(
        tuple(normalize_cell(r[i]) for i in order) for r in rows
    )


def _run_oracle(name: str):
    """The DuckDB half, self-contained so it can run on a worker
    thread (connection created and consumed entirely inside)."""
    con = duck_connection(SF_DIR)
    oracle = con.sql(ORACLES[name])
    return [d[0] for d in oracle.description], oracle.fetchall()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    from concurrent.futures import ThreadPoolExecutor

    # Overlap the two halves (r12 suite-wall pass): DuckDB runs the
    # oracle on a worker thread while Spark plans+collects on this
    # one, so each test costs max(spark, duck) instead of their sum —
    # the replica file is the suite's biggest block. Comparison
    # semantics are untouched.
    from tests.conftest import catalog_rows

    with ThreadPoolExecutor(max_workers=1) as pool:
        fut = pool.submit(_run_oracle, name) if name in ORACLES else None
        spark_cols, rows = catalog_rows(spark, name, SF_DIR)
        spark_rows = [tuple(r) for r in rows]
        if fut is None:
            # rows-only contract for approximate ops
            assert spark_rows is not None
            return
        duck_cols, duck_rows = fut.result()

    assert sorted(spark_cols) == sorted(duck_cols), (
        f"{name}: column mismatch {spark_cols} vs {duck_cols}")
    assert len(spark_rows) == len(duck_rows), (
        f"{name}: row count {len(spark_rows)} vs {len(duck_rows)}")
    if spark_rows:
        # python-type parity per column (catches date-vs-timestamp and
        # int-vs-float drift a value compare can miss on empty/round data)
        sp_types = {c: type(v) for c, v in zip(spark_cols, spark_rows[0])}
        du_types = {c: type(v) for c, v in zip(duck_cols, duck_rows[0])}
        for c in sp_types:
            a, b = sp_types[c], du_types[c]
            if type(None) in (a, b):
                continue
            assert a == b, f"{name}.{c}: type {a} vs {b}"
    norm_spark = normalize_rows(spark_cols, spark_rows)
    norm_duck = normalize_rows(duck_cols, duck_rows)
    mismatches = [
        (s, d) for s, d in zip(norm_spark, norm_duck) if s != d
    ]
    assert not mismatches, f"{name}: first mismatches {mismatches[:3]}"
