"""SparkSession construction with config-driven tuning.

Generalizes the reference's ``create_spark_session``
(verizon_table_migration_Rakesh_filters.py:60-80), which hard-codes
Cassandra keepalive/timeout/retry knobs, connector packages, and S3A
credentials. Here every knob is a plain dict passed through to
``SparkSession.builder.config``; scale-relevant defaults (AQE, shuffle
partitions, Arrow) are on by default and overridable.
"""

from __future__ import annotations

from typing import Mapping

from pyspark.sql import SparkSession

# Defaults chosen for large-cluster behavior that also work on local[N]:
# AQE coalesces post-shuffle partitions and handles skew joins at runtime,
# Arrow accelerates any pandas interchange, and broadcast threshold stays
# at Spark's default so small dims broadcast automatically.
DEFAULT_CONF: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.parquet.filterPushdown": "true",
    "spark.sql.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
}


def build_session(
    app_name: str = "oracle-cassandra-migrator-spark",
    master: str | None = None,
    conf: Mapping[str, str] | None = None,
) -> SparkSession:
    """Build (or get) a SparkSession.

    ``conf`` entries override ``DEFAULT_CONF``. ``master`` is only set
    when given, so cluster submit (--master) keeps working untouched.
    """
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
