"""CLI entry point — the engine-level analog of the reference's
``main()`` (verizon_table_migration_Rakesh_filters.py:424-448):
``python -m oracle_cassandra_migrator_spark <config.json>`` parses the
config, builds the session, and runs every table pipeline sequentially
with resume semantics.

Config shape::

    {
      "app_name": "...",
      "master": "local[*]",              # omit under spark-submit
      "spark_conf": {"spark.sql.shuffle.partitions": "200", ...},
      "staging_dir": "/staging",
      "tables": [ <pipeline spec>, ... ],  # see pipeline.Pipeline
      "streams": [ <stream spec>, ... ]    # see streaming.pipeline
    }

``tables`` run first (sequential, resumable), then every ``streams``
entry starts with availableNow semantics and is awaited — the
config-driven path for "bulk load, then drain the stream once".
"""

from __future__ import annotations

import argparse
import json
import logging
import sys

from oracle_cassandra_migrator_spark.pipeline import run_pipelines
from oracle_cassandra_migrator_spark.session import build_session


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="oracle_cassandra_migrator_spark",
        description="Run config-driven, resumable Spark pipelines.")
    parser.add_argument("config", help="path to the pipeline config JSON")
    parser.add_argument(
        "--from-reference", action="store_true",
        help="treat the config as the REFERENCE tool's own JSON shape "
             "(oracle/s3/cassandra blocks + tables[]) and translate it "
             "to an engine spec before running")
    parser.add_argument(
        "--override-file",
        help="with --from-reference: JSON of connection-fact overrides "
             "(jdbc options, sink spec, staging_dir, master, "
             "spark_conf) for environments without Oracle/Cassandra")
    parser.add_argument(
        "--translate-only", action="store_true",
        help="with --from-reference: print the translated engine "
             "config as JSON and exit without running")
    parser.add_argument("--log-level", default="INFO")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=args.log_level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    with open(args.config) as fh:
        config = json.load(fh)

    if args.from_reference:
        from oracle_cassandra_migrator_spark.reference_config import (
            translate_reference_config)

        overrides = None
        if args.override_file:
            with open(args.override_file) as fh:
                overrides = json.load(fh)
        config = translate_reference_config(config, overrides)
        if args.translate_only:
            print(json.dumps(config, indent=2))
            return 0

    spark = build_session(
        app_name=config.get("app_name", "ocm-spark"),
        master=config.get("master"),
        conf=config.get("spark_conf"),
    )
    stream_results = []
    try:
        results = run_pipelines(spark, config) if config.get("tables") \
            else []
        for stream_spec in config.get("streams", []):
            from oracle_cassandra_migrator_spark.streaming.pipeline import (
                run_stream_pipeline)

            q = run_stream_pipeline(spark, stream_spec)
            q.awaitTermination()
            stream_results.append({
                "stream": stream_spec.get("name", q.name or q.id),
                "sink_path": stream_spec["sink"].get("path"),
            })
    finally:
        spark.stop()

    for res in results:
        print(json.dumps({
            "table": res.name,
            "duration_sec": round(res.duration_sec, 2),
            "phases_run": res.phases_run,
            "files_written": res.files_written,
            "files_skipped": res.files_skipped,
            # in-flight Observation metrics from the transform write
            # ({} when the phase was skipped on resume)
            "transform_metrics": res.transform_metrics,
        }))
    for sres in stream_results:
        print(json.dumps(sres))
    return 0


if __name__ == "__main__":
    sys.exit(main())
