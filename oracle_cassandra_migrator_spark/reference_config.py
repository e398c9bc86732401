"""Verbatim reference-config translator.

Ingests the reference tool's OWN config file
(``verizon_table_migration_Rakesh_filters.json:1-84``: ``oracle`` /
``s3`` / ``cassandra`` connection blocks plus ``tables[]`` entries with
``source_tables``, ``filters``, ``partition_column`` /
``partition_lower_bound`` / ``partition_upper_bound`` /
``num_partitions``, ``fetch_size``, ``retries``,
``transformed_columns``) and emits this engine's pipeline spec — so a
reference user runs their EXISTING config unchanged::

    python -m oracle_cassandra_migrator_spark --from-reference config.json

Faithful mappings (reference file:line):

- JDBC reader (py:100-114): ``jdbc:oracle:thin:@//host:port/database``
  url, oracle.jdbc.driver.OracleDriver, per-table dbtable + fetchsize,
  and the partitioned parallel read with the reference's exact
  defaults (lowerBound "1", upperBound "1000000", numPartitions 4).
- Per-table filters (py:117-121): pushed into the source spec (and
  from there into the scan, which the reference's post-load .where
  also achieved via Catalyst — here it is explicit contract).
- Join chain (py:140-142): the reference HARD-CODES the 4-table
  payment join; the translator emits that exact chain when the entry's
  ``source_tables`` is that 4-table set, a plain single-source select
  otherwise, and for any other multi-table set demands an explicit
  ``joins`` key — the reference script cannot run those configs at
  all (its ``apply_transformation`` would KeyError), so requiring the
  join graph is strictly more capable, never less.
- ``transformed_columns`` (json:59-82): verbatim selectExpr strings.
- Staging (py:187-223): both staging writes repartition(num_partitions,
  default 10) to ``s3a://bucket/<staging_path>/<table>``; here
  ``stage_partitions`` / ``transform_partitions`` with the same
  default, and the table spec's ``staging_raw_dir`` /
  ``staging_transformed_dir`` reproduce the reference's exact prefix
  layout (``<bucket>/<staging_path_raw_data>/<source_table>``,
  ``<bucket>/<staging_path_transformed_data>/<target_table>``) so
  prefix-scoped IAM/lifecycle rules keep applying.
- Cassandra sink (py:303-373): format org.apache.spark.sql.cassandra,
  table/keyspace options, the three output-tuning options verbatim,
  repartition(8 * number of contact hosts), append mode, per-file
  checkpoint markers (the engine's phase 3 reproduces the marker-file
  resume at py:328-335).
- Retry (py:18-33): retries from the table entry (default 3), delay 5,
  backoff 2 — the reference's schedule.
- ``batch_size`` and ``stage_to_s3`` are accepted and ignored: the
  reference script itself never reads them (grep-verified), so
  ignoring them IS parity.

``overrides`` exists because the sandbox has no Oracle listener or
Cassandra ring: it swaps CONNECTION facts (jdbc url/driver/credentials,
sink spec, staging dir) while leaving every SEMANTIC fact (dbtable,
filters, partitioning bounds, projection, retry, repartition counts)
untouched — the e2e test runs the reference's own config against
embedded Derby and a parquet sink through translate -> run -> resume.
"""

from __future__ import annotations

import copy
from typing import Any, Mapping

# The one join graph the reference supports (py:140-142), keyed by its
# exact source set. Emitted as engine join steps; the compiler resolves
# the qualified names through the staged aliases.
_REFERENCE_JOIN_TABLES = frozenset({
    "table_contact", "table_x_credit_card", "x_payment_source",
    "table_address"})
_REFERENCE_JOIN_STEPS = [
    {"op": "join", "left": "table_contact", "right": "table_x_credit_card",
     "on": "table_contact.objid = table_x_credit_card.x_credit_card2contact",
     "as": "j1"},
    {"op": "join", "left": "j1", "right": "x_payment_source",
     "on": "x_payment_source.pymt_src2x_credit_card"
           " = table_x_credit_card.objid",
     "as": "j2"},
    {"op": "join", "left": "j2", "right": "table_address",
     "on": "table_x_credit_card.x_credit_card2address = table_address.objid",
     "as": "j3"},
]

# write_to_cassandra's tuning options, verbatim (py:347-352)
_CASSANDRA_OUTPUT_TUNING = {
    "spark.cassandra.output.concurrent.writes": "100",
    "spark.cassandra.output.batch.grouping.key": "partition",
    "spark.cassandra.output.batch.size.rows": "auto",
}


def _jdbc_source(oracle: Mapping[str, Any], table_cfg: Mapping[str, Any],
                 source_table: str,
                 jdbc_override: Mapping[str, Any] | None) -> dict:
    """One engine source spec for one reference source table."""
    options: dict[str, Any] = {
        "url": (f"jdbc:oracle:thin:@//{oracle.get('host')}:"
                f"{oracle.get('port')}/{oracle.get('database')}"),
        "user": oracle.get("username"),
        "password": oracle.get("password"),
        "driver": "oracle.jdbc.driver.OracleDriver",
        "dbtable": source_table,
    }
    if jdbc_override:
        # connection facts only — dbtable stays the reference's
        options.update({k: v for k, v in jdbc_override.items()
                        if k != "dbtable"})
    src: dict[str, Any] = {
        "format": "jdbc",
        "options": options,
        "alias": source_table,
        "fetch_size": table_cfg.get("fetch_size", 10000),
        # staging fan-out (py:190): repartition(num_partitions or 10)
        "stage_partitions": table_cfg.get("num_partitions", 10),
    }
    pcol = (table_cfg.get("partition_column") or {}).get(source_table)
    if pcol:
        src["partitioning"] = {
            "column": pcol,
            # reference defaults, py:111-114
            "lower_bound": (table_cfg.get("partition_lower_bound") or {})
            .get(source_table, "1"),
            "upper_bound": (table_cfg.get("partition_upper_bound") or {})
            .get(source_table, "1000000"),
            "num_partitions": table_cfg.get("num_partitions", 4),
        }
    filt = (table_cfg.get("filters") or {}).get(source_table)
    if filt:
        src["filter"] = filt
    return src


def _transform_steps(table_cfg: Mapping[str, Any]) -> list[dict]:
    sources = list(table_cfg["source_tables"])
    projection = {"op": "select",
                  "exprs": list(table_cfg["transformed_columns"])}
    if "joins" in table_cfg:
        steps = copy.deepcopy(list(table_cfg["joins"]))
    elif set(sources) == _REFERENCE_JOIN_TABLES:
        steps = copy.deepcopy(_REFERENCE_JOIN_STEPS)
    elif len(sources) == 1:
        steps = []
        projection["input"] = sources[0]
    else:
        raise ValueError(
            "the reference tool only implements the hard-coded "
            f"{sorted(_REFERENCE_JOIN_TABLES)} join "
            "(verizon_table_migration_Rakesh_filters.py:140-142); for "
            f"source_tables={sources} add an explicit 'joins' list to "
            "the table entry")
    if steps:
        projection["input"] = steps[-1]["as"]
    return steps + [projection]


def _cassandra_sink(cassandra: Mapping[str, Any],
                    table_cfg: Mapping[str, Any]) -> dict:
    hosts = str(cassandra.get("host", ""))
    n_nodes = len([h for h in hosts.split(",") if h]) or 1
    options: dict[str, Any] = {
        "table": table_cfg["target_table"],
        "keyspace": cassandra.get("keyspace"),
        "spark.cassandra.connection.host": hosts,
        **_CASSANDRA_OUTPUT_TUNING,
    }
    for src_key, opt_key in (
            ("port", "spark.cassandra.connection.port"),
            ("username", "spark.cassandra.auth.username"),
            ("password", "spark.cassandra.auth.password"),
            ("local_dc", "spark.cassandra.connection.localDC")):
        if cassandra.get(src_key) is not None:
            options[opt_key] = cassandra[src_key]
    return {
        "format": "org.apache.spark.sql.cassandra",
        "mode": "append",
        "options": options,
        # py:306-308: ideal_partitions = nodes * 8
        "repartition": {"partitions": n_nodes * 8},
    }


def translate_reference_config(
        ref: Mapping[str, Any],
        overrides: Mapping[str, Any] | None = None) -> dict:
    """Reference JSON -> engine config dict (see module docstring).

    ``overrides`` (all optional, connection facts only):
      ``jdbc``         dict merged into every source's JDBC options
                       (url/driver/user/password — never dbtable)
      ``sink``         full engine sink spec replacing the Cassandra
                       sink (e.g. a parquet dir in the sandbox)
      ``staging_dir``  replaces the s3a://bucket staging root
      ``master`` / ``spark_conf``  session facts for local runs
    """
    overrides = overrides or {}
    oracle = ref.get("oracle") or {}
    cassandra = ref.get("cassandra") or {}
    s3 = ref.get("s3") or {}

    staging_dir = overrides.get("staging_dir")
    use_ref_prefixes = staging_dir is None
    if staging_dir is None:
        staging_dir = f"s3a://{s3.get('bucket')}"

    tables = []
    for table_cfg in ref.get("tables", []):
        sink = (copy.deepcopy(overrides["sink"]) if "sink" in overrides
                else _cassandra_sink(cassandra, table_cfg))
        table: dict[str, Any] = {
            "name": table_cfg["target_table"],
            "sources": {
                st: _jdbc_source(oracle, table_cfg, st,
                                 overrides.get("jdbc"))
                for st in table_cfg["source_tables"]
            },
            "transform": _transform_steps(table_cfg),
            # py:210-216: transformed staging repartition(num_partitions
            # or 10)
            "transform_partitions": table_cfg.get("num_partitions", 10),
            "sink": sink,
            "retry": {"retries": table_cfg.get("retries", 3),
                      "delay": 5.0, "backoff": 2.0},
        }
        if use_ref_prefixes:
            # the reference's EXACT staging layout (py:189/:210):
            # s3a://bucket/<raw_prefix>/<source_table> and
            # s3a://bucket/<transformed_prefix>/<target_table> — so
            # IAM policies / lifecycle rules / cleanup jobs scoped to
            # the configured prefixes keep applying verbatim. An
            # overridden staging_dir (sandbox runs) uses the engine's
            # default <staging_dir>/<name>/... layout instead.
            raw_prefix = s3.get("staging_path_raw_data",
                                "staging_raw_data")
            tr_prefix = s3.get("staging_path_transformed_data",
                               "staging_transformed_data")
            table["staging_raw_dir"] = f"{staging_dir}/{raw_prefix}"
            table["staging_transformed_dir"] = (
                f"{staging_dir}/{tr_prefix}/"
                f"{table_cfg['target_table']}")
        tables.append(table)

    config: dict[str, Any] = {
        "app_name": "oracle-cassandra-migration",
        "staging_dir": staging_dir,
        "tables": tables,
    }
    if overrides.get("master"):
        config["master"] = overrides["master"]
    if overrides.get("spark_conf"):
        config["spark_conf"] = dict(overrides["spark_conf"])
    return config
