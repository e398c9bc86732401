"""Bucketed on-disk layout for the shuffle-bound fact-fact joins.

At 100 TB the repeated cost in q21 / top-k-revenue shapes is the
Exchange on the order key: q21 shuffles lineitem three times (join to
orders + the semi and anti self-joins), top-k once, and every future
order-grained query pays it again. Bucketing lineitem and orders BY
the order key amortizes that shuffle into the write: Spark's bucketed
SortMergeJoin reads co-located buckets with NO Exchange on either side
(proved plan-level by tests/test_bucketing.py and
tests/test_bucketed_headliners.py), and bucket-local sort makes the
merge streaming.

This module materializes that layout from any plain-parquet sf dir:

    frames = bucketed_fact_tables(spark, sf_dir, n_buckets=32)
    run_q21(spark, {**plain_dims, **frames})

The write is one full shuffle of each fact table — exactly the
amortization trade: pay the Exchange once at ingest, skip it on every
order-keyed join/aggregate after. ``scripts/bench_bucketed.py``
measures the effect at the ~sf1 probe; SCALE.md records the readings.

Spark bucketing requires a metastore table (path-only parquet carries
no bucket metadata), so tables land in the session's warehouse under
``<name>_b<n_buckets>``; reuse is automatic when the table already
exists (pass ``refresh=True`` after changing the source dir).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# fact table -> bucket/sort key (the order key both headliners join
# on; events bucket by user_id — the partition key of every window/
# sessionize shape, where the bucketed scan satisfies the window's
# ClusteredDistribution and the per-user Exchange disappears)
FACT_KEYS = {"lineitem": "l_orderkey", "orders": "o_orderkey"}
EVENT_KEYS = {"events": "user_id"}


def bucketed_event_table(spark: SparkSession, sf_dir: str,
                         n_buckets: int = 32,
                         refresh: bool = False) -> DataFrame:
    """The user_id-bucketed events table, written from ``sf_dir`` on
    first use. Same amortization trade as the order-key facts: one
    Exchange at ingest buys exchange-free windows/sessionization and
    user-keyed joins after."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    table = bucketed_table_name("events", n_buckets)
    if refresh or not spark.catalog.tableExists(table):
        write_bucketed(spark, read_table(spark, sf_dir, "events"),
                       "events", "user_id", n_buckets)
    return spark.table(table)


def bucketed_table_name(name: str, n_buckets: int) -> str:
    return f"{name}_b{n_buckets}"


def write_bucketed(spark: SparkSession, df: DataFrame, name: str,
                   key: str | list[str], n_buckets: int) -> str:
    """Materialize ``df`` as a bucketed+sorted metastore table. One
    hash Exchange on the key column(s) now; zero on every co-bucketed
    join after."""
    keys = [key] if isinstance(key, str) else list(key)
    table = bucketed_table_name(name, n_buckets)
    # a killed prior run can leave the warehouse directory behind with
    # no catalog entry — saveAsTable then fails LOCATION_ALREADY_EXISTS
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    if warehouse.startswith("file:") or warehouse.startswith("/"):
        import shutil
        from urllib.parse import urlparse

        path = urlparse(warehouse).path or warehouse
        shutil.rmtree(f"{path}/{table.lower()}", ignore_errors=True)
    (df.write.mode("overwrite")
       .bucketBy(n_buckets, keys[0], *keys[1:])
       .sortBy(keys[0], *keys[1:])
       .format("parquet").saveAsTable(table))
    return table


def bucketed_fact_tables(spark: SparkSession, sf_dir: str,
                         n_buckets: int = 32,
                         refresh: bool = False) -> dict[str, DataFrame]:
    """{name: DataFrame} for the order-key-bucketed fact tables,
    writing them from ``sf_dir`` parquet on first use."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    out: dict[str, DataFrame] = {}
    for name, key in FACT_KEYS.items():
        table = bucketed_table_name(name, n_buckets)
        if refresh or not spark.catalog.tableExists(table):
            write_bucketed(spark, read_table(spark, sf_dir, name),
                           name, key, n_buckets)
        out[name] = spark.table(table)
    return out


def drop_bucketed_fact_tables(spark: SparkSession,
                              n_buckets: int = 32) -> None:
    for name in FACT_KEYS:
        spark.sql(
            f"DROP TABLE IF EXISTS {bucketed_table_name(name, n_buckets)}")
