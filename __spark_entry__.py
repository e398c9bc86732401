"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship reference-shaped pipeline at
sf0.001; ``queries()`` / ``oracle_sql()`` expose the full operator
catalog from oracle_cassandra_migrator_spark.queries (one entry per
implemented operator in SURVEY.md §2, plus the §2.12 extensions).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from oracle_cassandra_migrator_spark.queries import ORACLES, QUERIES


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return QUERIES["flagship_payment_pipeline"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted only for
    genuinely approximate ops, e.g. LSH-bucketed ANN)."""
    return dict(ORACLES)
