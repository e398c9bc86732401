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
      "tables": [ <pipeline spec>, ... ]   # see pipeline.Pipeline
    }
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
    parser.add_argument("--log-level", default="INFO")
    args = parser.parse_args(argv)

    logging.basicConfig(
        level=args.log_level,
        format="%(asctime)s %(levelname)s %(name)s: %(message)s")

    with open(args.config) as fh:
        config = json.load(fh)

    spark = build_session(
        app_name=config.get("app_name", "ocm-spark"),
        master=config.get("master"),
        conf=config.get("spark_conf"),
    )
    try:
        results = run_pipelines(spark, config)
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
    return 0


if __name__ == "__main__":
    sys.exit(main())
