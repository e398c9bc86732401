"""oracle_cassandra_migrator_spark — a PySpark-native analytics & pipeline engine.

A from-scratch generalization of the capabilities exercised by the
reference ETL tool ``PavuluriRakesh/oracle-cassandra-migrator``
(``verizon_table_migration_Rakesh_filters.py``): config-driven sources
with predicate filters and partitioned parallel reads, N-way equi-joins,
expression projections, multi-format sinks, idempotent resume,
checkpointed writes, and retry — plus the relational operator surface
(aggregation, windows, sorts, set ops, scalar functions) and
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal column plumbing) designed for 100 TB scale.

Everything is expressed through the DataFrame API so Catalyst handles
predicate pushdown, column pruning, join selection, and AQE re-planning.
"""

from oracle_cassandra_migrator_spark.session import build_session

__all__ = ["build_session"]
__version__ = "0.1.0"
