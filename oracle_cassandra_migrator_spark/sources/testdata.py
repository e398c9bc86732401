"""Loader for the driver's parquet tables with nanosecond-timestamp repair.

Spark rejects parquet INT64 TIMESTAMP(NANOS) columns outright
(PARQUET_TYPE_ILLEGAL) — e.g. ``events.ts`` in the testdata. The fix:
read with ``spark.sql.legacy.parquet.nanosAsLong=true`` (column arrives
as bigint nanos) and rebuild a TIMESTAMP_NTZ by adding floor(ns/1000)
microseconds to the NTZ epoch. NTZ keeps every downstream date/time
expression independent of the session timezone, matching how DuckDB
(naive microsecond timestamps, nanos truncated) sees the same file.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NANOS_AS_LONG = "spark.sql.legacy.parquet.nanosAsLong"


@lru_cache(maxsize=256)
def _nano_ts_columns(path: str) -> tuple[str, ...]:
    """Names of timestamp[ns] columns, from the parquet footer only.
    Accepts both a single parquet file (the driver testdata shape) and
    a Spark-written directory (first part file's footer — one writer,
    one schema)."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        if not parts:
            return ()
        path = parts[0]
    schema = pq.ParquetFile(path).schema_arrow
    return tuple(
        field.name
        for field in schema
        if str(field.type).startswith("timestamp[ns")
    )


def read_table(spark: SparkSession, sf_dir: str, name: str,
               fan_out: bool = False,
               fan_out_by: tuple[str, ...] | None = None) -> DataFrame:
    """Read ``<sf_dir>/<name>.parquet``, repairing nano-timestamps.

    ``fan_out=True`` opts the scan into the unsplittable-input guard
    (optimization guide §2.5): when the parquet's row-group count —
    the hard ceiling on scan parallelism, read from the footer we
    already stat, never from ``df.rdd`` (which costs ~50 ms of driver
    planning per call) — is below half the session cores, round-robin
    repartition so the downstream map work (filters, broadcast-join
    probes, partial aggregates, regex) uses the whole machine instead
    of one task. Identity at any real scale (inputs split into >=
    cores row groups). Only pass it for the STREAMED side of a query:
    under a broadcast build the exchange is pure overhead. Round-robin
    keeps the exchange out of the hash/range shuffle budget and is
    retry-safe (sort-before-repartition); callers must be
    order-insensitive (joins, exact sums/counts/min/max, per-row
    projections) — the contract ``with_shingles``'s fan-out has
    relied on since r5.

    ``fan_out_by`` switches the exchange from round-robin to hash
    partitioning on the named columns (pass the table's primary key):
    every keyless ``repartition(n)`` first pays a local sort of its
    input so retried tasks reproduce the same placement
    (sortBeforeRepartition, SPARK-23207) — measured 1.08s vs 0.71s on
    the pricing fan-out at sf0.1 — while a hash on a deterministic
    unique key is retry-safe with no sort (guide §2.5's
    derive-the-synthetic-key-deterministically rule). The key columns
    join the scan's ReadSchema, so only use columns the query would
    tolerate reading."""
    path = f"{sf_dir}/{name}.parquet"
    nano_cols = _nano_ts_columns(path)
    if nano_cols:
        spark.conf.set(NANOS_AS_LONG, "true")
    df = spark.read.parquet(path)
    for col in nano_cols:
        df = df.withColumn(
            col,
            F.expr(
                f"TIMESTAMPADD(MICROSECOND, CAST({col} DIV 1000 AS BIGINT), "
                f"CAST('1970-01-01 00:00:00' AS TIMESTAMP_NTZ))"
            ),
        )
    if fan_out:
        par = spark.sparkContext.defaultParallelism
        if _row_group_count(path) < par // 2:
            if fan_out_by:
                df = df.repartition(par, *[F.col(c) for c in fan_out_by])
            else:
                df = df.repartition(par)
    return df


@lru_cache(maxsize=256)
def _row_group_count(path: str) -> int:
    """Parquet row-group count from the footer (cached, like
    ``_nano_ts_columns``) — the hard ceiling on how many tasks can
    scan the file in parallel, so the honest input to the fan-out
    gate. Directories count the sum over part files."""
    import glob
    import os

    import pyarrow.parquet as pq

    if os.path.isdir(path):
        parts = sorted(glob.glob(os.path.join(path, "*.parquet")))
        return sum(pq.ParquetFile(p).metadata.num_row_groups
                   for p in parts) or 1
    return pq.ParquetFile(path).metadata.num_row_groups or 1


def load_tables(spark: SparkSession, sf_dir: str, *names: str) -> dict[str, DataFrame]:
    return {name: read_table(spark, sf_dir, name) for name in names}
