"""Config-driven streaming sources — the readStream twin of
sources.readers.read_source (SURVEY.md §2.1 S7 extension surface; the
reference is strictly batch, verizon_table_migration_Rakesh_filters.py
has no streaming path).

    {"format": "parquet", "path": "/in/events", "schema": "...",
     "options": {"maxFilesPerTrigger": "1"}}
    {"format": "rate", "options": {"rowsPerSecond": "100"}}
    {"format": "kafka", "options": {"kafka.bootstrap.servers": "h:9092",
     "subscribe": "events", "startingOffsets": "earliest"}}

Scale notes:
- File streams need an explicit ``schema`` (Spark refuses to infer on
  a stream); declare it in the spec or pass a batch-sampled schema.
- Kafka needs the external spark-sql-kafka package, exactly like avro
  needs spark-avro; the spec maps 1:1 onto the connector's options so
  nothing engine-side changes when it is present. ``value_schema``
  optionally parses the Kafka value as JSON into typed columns —
  the standard first step of every Kafka ingest.
- ``filter``/``select``/``watermark`` apply the same lazy pushdown
  semantics as the batch reader: Catalyst prunes and filters at the
  stream scan, and the watermark bounds state for downstream windows
  and joins.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STREAM_PATH_FORMATS = {"parquet", "csv", "json", "orc", "text"}


def read_stream_source(spark: SparkSession,
                       spec: Mapping[str, Any]) -> DataFrame:
    """Open one streaming source per its spec dict; returns a lazy
    streaming DataFrame."""
    fmt = spec.get("format", "parquet").lower()
    from oracle_cassandra_migrator_spark.sources.readers import (
        PYTHON_DS_FORMATS)

    if fmt in PYTHON_DS_FORMATS:
        from oracle_cassandra_migrator_spark.sources.pydatasource import (
            register_python_sources)

        register_python_sources(spark)
    reader = spark.readStream.format(fmt)
    if spec.get("schema"):
        reader = reader.schema(spec["schema"])
    elif fmt in STREAM_PATH_FORMATS:
        raise ValueError(
            f"streaming file source {fmt!r} requires an explicit 'schema' "
            "in the spec: Spark does not infer schemas on streams")
    options = dict(spec.get("options") or {})
    if options:
        reader = reader.options(**{k: str(v) for k, v in options.items()})

    if fmt in STREAM_PATH_FORMATS:
        df = reader.load(spec["path"])
    else:
        df = reader.load()

    if fmt == "kafka" and spec.get("value_schema"):
        # standard Kafka ingest shape: JSON value -> typed columns,
        # keeping key/topic/partition/offset/timestamp metadata
        df = df.select(
            F.col("key").cast("string").alias("kafka_key"),
            F.from_json(F.col("value").cast("string"),
                        spec["value_schema"]).alias("v"),
            "topic", "partition", "offset", "timestamp",
        ).select("kafka_key", "v.*", "topic", "partition", "offset",
                 "timestamp")

    if spec.get("filter"):
        df = df.where(spec["filter"])
    if spec.get("select"):
        df = df.selectExpr(*spec["select"])
    if spec.get("watermark"):
        wm = spec["watermark"]
        df = df.withWatermark(wm["column"], wm["delay"])
    return df
