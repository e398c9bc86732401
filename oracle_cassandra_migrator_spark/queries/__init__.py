"""Query registry: every implemented operator from SURVEY.md §2 gets a
named query (spark, sf_dir) -> DataFrame and, where SQL-expressible, a
DuckDB oracle SQL string. ``__spark_entry__.py`` re-exports these."""

from oracle_cassandra_migrator_spark.queries.registry import QUERIES, ORACLES, query

# Importing the modules populates the registry.
from oracle_cassandra_migrator_spark.queries import relational  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import tpch_suite  # noqa: E402,F401
from oracle_cassandra_migrator_spark.queries import extensions  # noqa: E402,F401

__all__ = ["QUERIES", "ORACLES", "query"]
