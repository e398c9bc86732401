"""Config-driven sinks.

Generalizes the reference's three writers — Parquet staging
``stage_raw_data_to_s3``/``stage_transformed_data_to_s3``
(verizon_table_migration_Rakesh_filters.py:187-223, both
``df.repartition(n).write.mode("overwrite").parquet(path)``) and the
tuned Cassandra appender ``write_to_cassandra`` (py:303-373) — into one
spec:

    {"format": "parquet", "path": "/out/t", "mode": "overwrite",
     "repartition": 10}
    {"format": "org.apache.spark.sql.cassandra", "mode": "append",
     "options": {"table": ..., "keyspace": ...,
                 "spark.cassandra.output.concurrent.writes": "100"},
     "repartition": {"partitions": 24}}

Scale notes:
- ``repartition`` controls output file count / sink parallelism, the
  reference's one manual physical decision (py:196,216,345: fixed 10
  for staging, nodes*8 for Cassandra). Accepted forms:
    int                          -> round-robin repartition(n)
    {"partitions": n, "by": [cols]}  -> hash repartition (co-locates keys,
                                        e.g. Cassandra partition keys so the
                                        connector batches by token range)
    {"range_by": [cols], "partitions": n} -> repartitionByRange (sorted files)
    "coalesce:n"                 -> narrow coalesce, no shuffle
  When omitted, AQE's coalescePartitions sizes output — usually the
  right default at 100 TB, where fixed small counts would bottleneck.
- ``partition_by`` writes hive-style directory partitions, the standard
  layout for pruning at scale (absent in the reference; essential here).
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame

WRITE_PATH_FORMATS = {"parquet", "csv", "json", "orc", "text", "avro"}


def _apply_repartition(df: DataFrame, spec: Any) -> DataFrame:
    if spec is None:
        return df
    if isinstance(spec, int):
        return df.repartition(spec)
    if isinstance(spec, str) and spec.startswith("coalesce:"):
        return df.coalesce(int(spec.split(":", 1)[1]))
    if isinstance(spec, Mapping):
        n = spec.get("partitions")
        if "range_by" in spec:
            cols = [df[c] for c in spec["range_by"]]
            return df.repartitionByRange(n, *cols) if n else df.repartitionByRange(*cols)
        by = spec.get("by")
        if by:
            cols = [df[c] for c in by]
            return df.repartition(n, *cols) if n else df.repartition(*cols)
        if n:
            return df.repartition(n)
        return df
    raise ValueError(f"bad repartition spec: {spec!r}")


def write_sink(df: DataFrame, spec: Mapping[str, Any]) -> None:
    """Write ``df`` per its sink spec dict. Triggers the job."""
    fmt = spec.get("format", "parquet").lower()
    if fmt == "avro":
        from oracle_cassandra_migrator_spark.sources.readers import (
            _require_avro,
        )

        _require_avro(df.sparkSession)
    from oracle_cassandra_migrator_spark.sources.readers import (
        PYTHON_DS_FORMATS,
    )

    if fmt in PYTHON_DS_FORMATS:
        from oracle_cassandra_migrator_spark.sources.pydatasource import (
            register_python_sources,
        )

        register_python_sources(df.sparkSession)
    zorder = spec.get("zorder_by")
    if zorder:
        # z-clustered layout for multi-column row-group pruning;
        # supersedes `repartition` (both decide output partitioning)
        from oracle_cassandra_migrator_spark.operators.layout import (
            zorder_frame,
        )

        df = zorder_frame(df, list(zorder["cols"]),
                          int(zorder.get("n_files", 8)),
                          int(zorder.get("bits", 8)))
    else:
        df = _apply_repartition(df, spec.get("repartition"))

    writer = df.write.format(fmt).mode(spec.get("mode", "overwrite"))
    if spec.get("options"):
        writer = writer.options(**{k: str(v) for k, v in spec["options"].items()})
    if spec.get("partition_by"):
        writer = writer.partitionBy(*spec["partition_by"])

    bucket = spec.get("bucket_by")
    if bucket:
        # bucketed layout amortizes ONE shuffle across every future
        # join/agg on the bucket key (see tests/test_bucketing.py);
        # bucketing requires a table-catalog write
        writer = writer.bucketBy(int(bucket["n"]), *bucket["cols"])
        if bucket.get("sort_by"):
            writer = writer.sortBy(*bucket["sort_by"])
        writer.saveAsTable(spec["table"])
        return

    if fmt in WRITE_PATH_FORMATS:
        writer.save(spec["path"])
    elif spec.get("path"):
        writer.save(spec["path"])
    else:
        writer.save()


def write_file_idempotent(df: DataFrame, base: str,
                          spec: Mapping[str, Any]) -> None:
    """Crash-safe file-format write of one unit of work (one staged
    file, one micro-batch) into ``spec['path']``.

    A plain append duplicates the unit's rows if the caller crashes
    after the write but before recording its completion marker. Instead:
    write to ``<sink>/_tmp/<base>/`` (overwrite), then rename the part
    files to deterministic names ``<base>-<i>.<ext>`` in the sink dir —
    replaying the same unit always lands on the same targets, so a
    rerun overwrites in place instead of appending.

    All filesystem work goes through the Hadoop FileSystem API resolved
    from the sink URI, so the same code serves file:/, hdfs:/ and
    object stores (s3a:/, gs:/, abfs:/) — on object stores rename is
    copy+delete, which is still safe here because targets are
    deterministic and stale targets are cleared first. The reference
    hard-codes the boto3 flavor of this dance
    (verizon_table_migration_Rakesh_filters.py:237-276,330-331)."""
    fmt = spec.get("format", "parquet").lower()
    sink_path = spec["path"].rstrip("/")
    tmp_dir = f"{sink_path}/_tmp/{base}"
    write_sink(df, {**spec, "path": tmp_dir, "mode": "overwrite"})

    spark = df.sparkSession
    hpath = spark._jvm.org.apache.hadoop.fs.Path
    sink_p = hpath(sink_path)
    fs = sink_p.getFileSystem(spark._jsc.hadoopConfiguration())
    fs.mkdirs(sink_p)
    # a rerun may produce a different part count — clear this unit's
    # previous targets so no stale file survives
    for status in fs.globStatus(hpath(sink_p, f"{base}-*")) or []:
        fs.delete(status.getPath(), False)
    produced = sorted(
        (s.getPath() for s in fs.globStatus(hpath(tmp_dir + "/part-*")) or []),
        key=lambda p: p.getName())
    idx = 0
    for src in produced:
        name = src.getName()
        if name.endswith(".crc"):
            continue
        ext = "." + name.rsplit(".", 1)[1] if "." in name else f".{fmt}"
        target = hpath(sink_p, f"{base}-{idx}{ext}")
        fs.delete(target, False)  # rename is not an overwrite on HDFS
        fs.rename(src, target)
        idx += 1
    fs.delete(hpath(sink_path + "/_tmp"), True)
