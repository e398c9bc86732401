"""SparkSession construction with config-driven tuning.

Generalizes the reference's ``create_spark_session``
(verizon_table_migration_Rakesh_filters.py:60-80), which hard-codes
Cassandra keepalive/timeout/retry knobs, connector packages, and S3A
credentials. Here every knob is a plain dict passed through to
``SparkSession.builder.config``; scale-relevant defaults (AQE, shuffle
partitions, Arrow) are on by default and overridable.
"""

from __future__ import annotations

import os
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
    # Broadcast thresholds are SPLIT (r7, from the 30x-probe q21
    # finding): the STATIC threshold trusts CBO *estimates* — a
    # mis-estimated fact side statically planned as BHJ builds a
    # multi-hundred-MB driver hash relation that AQE cannot demote
    # (measured: 20.2 s vs 2.8 s SMJ for q21 at the 30x probe, where
    # the filtered-orders estimate came in under the old 64MB static
    # bar). The ADAPTIVE threshold acts on ACCURATE runtime shuffle
    # sizes and converts SMJ->BHJ with cheap local readers, so it can
    # stay generous. Net: tiny dims still broadcast statically,
    # mid-size sides broadcast only when runtime bytes prove it, and
    # a bad estimate can no longer pick an un-demotable plan.
    "spark.sql.autoBroadcastJoinThreshold": "8MB",
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64MB",
    "spark.sql.shuffle.partitions": "32",
    "spark.ui.enabled": "false",
    "spark.sql.session.timeZone": "UTC",
    # runtime row-level filtering for selective dim->fact joins: a
    # bloom filter built from the filtered dim side prunes fact rows
    # at the scan — at 100 TB this cuts the shuffled fact volume for
    # star joins whose predicate lives on the dimension. Pinned
    # explicitly (it is the Spark 4.x default) so the engine keeps the
    # behavior if a deployment's defaults differ. Do NOT also enable
    # runtimeFilter.semiJoinReduction: the conf was dropped from the
    # 4.x registry but an internal path still reads it, and setting it
    # hangs plain equi-join execution (reproduced 3/3 on 4.1.2).
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
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
    # BEFORE the JVM exists: the vendored google.protobuf (state-v2
    # streaming dependency) must land on PYTHONPATH here, or the
    # JVM-spawned Python workers can never import StateMessage_pb2 —
    # calling ensure_protobuf() later (e.g. from quota/topk builders)
    # is driver-only by then
    from oracle_cassandra_migrator_spark._vendor import (
        ensure_protobuf, protobuf_executor_env)

    ensure_protobuf()
    builder = SparkSession.builder.appName(app_name)
    if master:
        builder = builder.master(master)
    merged = dict(DEFAULT_CONF)
    if conf:
        merged.update(conf)
    # Driver os.environ mutations reach Python workers only in local
    # mode; on standalone/YARN/K8s the executor JVMs are forked by the
    # cluster manager, so the protobuf toggles (and the vendored
    # runtime's PYTHONPATH entry) must travel as spark.executorEnv.*.
    _merge_executor_env(merged, protobuf_executor_env())
    for key, value in merged.items():
        builder = builder.config(key, value)
    return builder.getOrCreate()


def _merge_executor_env(
    merged: dict[str, str], env: Mapping[str, str]
) -> None:
    """Fold plain env-var requirements into ``spark.executorEnv.*``
    conf entries in place. User-supplied values win; PYTHONPATH is
    MERGED (required entries prepended, existing ones preserved)
    rather than replaced, so a caller's own executor PYTHONPATH keeps
    working alongside the vendored runtime."""
    for key, value in env.items():
        conf_key = f"spark.executorEnv.{key}"
        if key == "PYTHONPATH" and merged.get(conf_key):
            existing = merged[conf_key].split(os.pathsep)
            missing = [p for p in value.split(os.pathsep)
                       if p and p not in existing]
            merged[conf_key] = os.pathsep.join(missing + existing)
        else:
            merged.setdefault(conf_key, value)
