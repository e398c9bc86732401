"""Verbatim reference-config ingestion: the reference tool's OWN
config shape (verizon_table_migration_Rakesh_filters.json) runs
end-to-end through translate -> run -> resume with embedded Derby
standing in for Oracle and a parquet dir for Cassandra, producing the
same staged/transformed/sink phases as the reference's
``migrate_table`` (py:376-421)."""

import glob
import json
import os

import pytest

from oracle_cassandra_migrator_spark.pipeline import run_pipelines
from oracle_cassandra_migrator_spark.reference_config import (
    translate_reference_config,
)
from oracle_cassandra_migrator_spark.sinks.writers import write_sink

DERBY_DRIVER = "org.apache.derby.jdbc.EmbeddedDriver"

# The reference config, field-for-field
# (verizon_table_migration_Rakesh_filters.json:1-84) — placeholder
# connection facts, but every SEMANTIC field (source tables, filters,
# partition spec, projection, retries) is the reference's verbatim.
REF_CONFIG = {
    "oracle": {"host": "dbhost", "port": 1521, "database": "ORCL",
               "username": "scott", "password": "tiger"},
    "cassandra": {"host": "cas1,cas2,cas3", "port": 9042,
                  "keyspace": "billing", "username": "cassandra",
                  "password": "cassandra", "local_dc": "DC1"},
    "s3": {"access_key": "AK", "secret_key": "SK",
           "endpoint": "s3.us-east-1.amazonaws.com", "bucket": "bkt",
           "staging_path_raw_data": "staging_raw_data",
           "staging_path_transformed_data": "staging_transformed_data",
           "checkpointing_path": "checkpointing"},
    "stage_to_s3": True,
    "tables": [{
        "source_tables": ["table_contact", "table_x_credit_card",
                          "x_payment_source", "table_address"],
        "target_table": "customer_payment_information",
        "fetch_size": 10000,
        "batch_size": 5000,
        "retries": 3,
        "num_partitions": 8,
        "partition_column": {
            "table_contact": "objid", "table_x_credit_card": "objid",
            "x_payment_source": "objid", "table_address": "objid"},
        "partition_lower_bound": {
            "table_contact": "100009", "table_x_credit_card": "100009",
            "x_payment_source": "100009", "table_address": "100009"},
        "partition_upper_bound": {
            "table_contact": "999995", "table_x_credit_card": "999995",
            "x_payment_source": "999995", "table_address": "999995"},
        "filters": {
            "table_contact": "x_cust_id >= 100000 AND x_cust_id <= 500000",
            "table_x_credit_card":
                "x_cc_type IN ('American Express', 'Discover',"
                " 'Mastercard')",
            "x_payment_source": "x_status = 'Active'",
            "table_address":
                "state IN ('MI', 'MN', 'MO', 'MP', 'MS', 'MT', 'NC',"
                " 'ND', 'NE', 'NH', 'NJ')"},
        "transformed_columns": [
            "x_payment_source.objid as objid",
            "table_contact.x_cust_id as x_cust_id",
            "x_payment_source.pymt_src2x_credit_card"
            " as pymt_src2x_credit_card",
            "table_x_credit_card.x_credit_card2contact"
            " as x_credit_card2contact",
            "table_x_credit_card.x_credit_card2address"
            " as x_credit_card2address",
            "table_contact.first_name as first_name",
            "table_contact.last_name as last_name",
            "table_x_credit_card.x_customer_cc_number"
            " as x_customer_cc_number",
            "table_x_credit_card.x_customer_cc_expmo"
            " as x_customer_cc_expmo",
            "table_x_credit_card.x_customer_cc_expyr"
            " as x_customer_cc_expyr",
            "table_x_credit_card.x_cc_type as x_cc_type",
            "table_contact.phone as phone",
            "table_contact.e_mail as e_mail",
            "x_payment_source.x_pymt_type as x_pymt_type",
            "x_payment_source.x_pymt_src_name as x_pymt_src_name",
            "x_payment_source.x_sourcesystem as x_sourcesystem",
            "x_payment_source.x_status as x_status",
            "table_address.address as address",
            "table_address.city as city",
            "table_address.state as state",
            "table_address.zipcode as zipcode",
            "table_contact.country as country"],
    }],
}


@pytest.fixture(scope="module")
def payment_derby_url(spark, tmp_path_factory):
    """Embedded Derby loaded with the reference's 4-table payment
    schema, seeded so every filter and every join hop is exercised
    (each table has one row its filter rejects)."""
    db = tmp_path_factory.mktemp("refderby") / "db"
    url = f"jdbc:derby:{db};create=true"
    seeds = {
        "table_contact": (
            "objid INT, x_cust_id INT, first_name STRING,"
            " last_name STRING, phone STRING, e_mail STRING,"
            " country STRING",
            [(100010, 150000, "Ada", "Lovelace", "555-1", "a@x.com", "US"),
             (100011, 600000, "Bob", "High", "555-2", "b@x.com", "US"),
             (100012, 200000, "Carol", "Mid", "555-3", "c@x.com", "CA")]),
        "table_x_credit_card": (
            "objid INT, x_credit_card2contact INT,"
            " x_credit_card2address INT, x_customer_cc_number STRING,"
            " x_customer_cc_expmo INT, x_customer_cc_expyr INT,"
            " x_cc_type STRING",
            [(200010, 100010, 300010, "4111-0001", 1, 2027, "Discover"),
             (200011, 100012, 300012, "4111-0002", 2, 2028, "Visa"),
             (200012, 100012, 300012, "4111-0003", 3, 2029,
              "Mastercard")]),
        "x_payment_source": (
            "objid INT, pymt_src2x_credit_card INT, x_pymt_type STRING,"
            " x_pymt_src_name STRING, x_sourcesystem STRING,"
            " x_status STRING",
            [(400010, 200010, "CARD", "primary", "CRM", "Active"),
             (400011, 200012, "CARD", "backup", "CRM", "Inactive"),
             (400012, 200012, "CARD", "primary", "ERP", "Active")]),
        "table_address": (
            "objid INT, address STRING, city STRING, state STRING,"
            " zipcode STRING",
            [(300010, "1 Main St", "Detroit", "MI", "48201"),
             (300011, "2 Oak Ave", "Austin", "TX", "78701"),
             (300012, "3 Elm Rd", "Fargo", "ND", "58102")]),
    }
    for table, (schema, rows) in seeds.items():
        # Derby maps Spark STRING to CLOB by default, which its SQL
        # layer cannot compare against the pushed-down filter literals
        # (ERROR 42818) — create VARCHAR columns instead
        varchars = ", ".join(
            f"{part.strip().split()[0]} VARCHAR(128)"
            for part in schema.split(",")
            if part.strip().split()[1] == "STRING")
        write_sink(
            spark.createDataFrame(rows, schema),
            {"format": "jdbc", "mode": "overwrite",
             "options": {"url": url, "dbtable": table,
                         "driver": DERBY_DRIVER,
                         "createTableColumnTypes": varchars}})
    return url


def test_translate_maps_every_reference_field():
    cfg = translate_reference_config(REF_CONFIG)
    assert [t["name"] for t in cfg["tables"]] == [
        "customer_payment_information"]
    table = cfg["tables"][0]

    # JDBC source block (py:100-114): url/driver/dbtable/fetchsize +
    # the partitioned parallel read with the config's bounds
    src = table["sources"]["table_contact"]
    assert src["options"]["url"] == "jdbc:oracle:thin:@//dbhost:1521/ORCL"
    assert src["options"]["driver"] == "oracle.jdbc.driver.OracleDriver"
    assert src["options"]["dbtable"] == "table_contact"
    assert src["options"]["user"] == "scott"
    assert src["fetch_size"] == 10000
    assert src["partitioning"] == {
        "column": "objid", "lower_bound": "100009",
        "upper_bound": "999995", "num_partitions": 8}
    assert src["filter"] == "x_cust_id >= 100000 AND x_cust_id <= 500000"
    assert src["stage_partitions"] == 8

    # join chain = the reference's hard-coded graph (py:140-142)
    joins = [s for s in table["transform"] if s["op"] == "join"]
    assert [j["on"] for j in joins] == [
        "table_contact.objid = table_x_credit_card.x_credit_card2contact",
        "x_payment_source.pymt_src2x_credit_card"
        " = table_x_credit_card.objid",
        "table_x_credit_card.x_credit_card2address = table_address.objid"]
    select = table["transform"][-1]
    assert select["op"] == "select"
    assert select["exprs"] == REF_CONFIG["tables"][0]["transformed_columns"]

    # Cassandra sink (py:303-373): tuning options verbatim, nodes*8
    sink = table["sink"]
    assert sink["format"] == "org.apache.spark.sql.cassandra"
    assert sink["mode"] == "append"
    assert sink["options"]["table"] == "customer_payment_information"
    assert sink["options"]["keyspace"] == "billing"
    assert sink["options"][
        "spark.cassandra.output.concurrent.writes"] == "100"
    assert sink["repartition"] == {"partitions": 24}  # 3 hosts * 8

    # staging + retry (py:18-33, 187-223): the reference's EXACT
    # prefix layout, so prefix-scoped IAM/lifecycle rules keep applying
    assert cfg["staging_dir"] == "s3a://bkt"
    assert table["staging_raw_dir"] == "s3a://bkt/staging_raw_data"
    assert table["staging_transformed_dir"] == (
        "s3a://bkt/staging_transformed_data/customer_payment_information")
    assert table["retry"] == {"retries": 3, "delay": 5.0, "backoff": 2.0}
    assert table["transform_partitions"] == 8
    # an overridden staging_dir (sandbox) suppresses the s3 prefixes
    # and falls back to the engine layout under the override
    cfg2 = translate_reference_config(
        REF_CONFIG, {"staging_dir": "/tmp/x"})
    assert "staging_raw_dir" not in cfg2["tables"][0]


def test_translate_rejects_unknown_multi_table_join():
    ref = json.loads(json.dumps(REF_CONFIG))
    ref["tables"][0]["source_tables"] = ["a", "b"]
    with pytest.raises(ValueError, match="joins"):
        translate_reference_config(ref)
    # an explicit joins key unblocks it (strictly more than the
    # reference, which cannot run such a config at all)
    ref["tables"][0]["joins"] = [
        {"op": "join", "left": "a", "right": "b",
         "on": "a.k = b.k", "as": "j1"}]
    cfg = translate_reference_config(ref)
    steps = cfg["tables"][0]["transform"]
    assert steps[0]["on"] == "a.k = b.k"
    assert steps[-1]["input"] == "j1"


def test_translate_single_source_needs_no_join():
    ref = json.loads(json.dumps(REF_CONFIG))
    ref["tables"][0]["source_tables"] = ["table_contact"]
    ref["tables"][0]["transformed_columns"] = ["objid as objid"]
    cfg = translate_reference_config(ref)
    steps = cfg["tables"][0]["transform"]
    assert [s["op"] for s in steps] == ["select"]
    assert steps[0]["input"] == "table_contact"


def _overrides(tmp_path, derby_url):
    return {
        "jdbc": {"url": derby_url, "driver": DERBY_DRIVER,
                 "user": "", "password": ""},
        "sink": {"format": "parquet", "path": str(tmp_path / "sink"),
                 "mode": "overwrite"},
        "staging_dir": str(tmp_path / "staging"),
    }


def test_reference_config_end_to_end_and_resume(
        spark, payment_derby_url, tmp_path):
    """translate -> run -> resume over the reference's own config:
    phase 1 stages all four JDBC sources, phase 2 joins + projects,
    phase 3 checkpoint-appends to the sink; a rerun skips every
    phase (gates A/B + per-file markers, py:328-335, 385-392)."""
    cfg = translate_reference_config(
        REF_CONFIG, _overrides(tmp_path, payment_derby_url))
    results = run_pipelines(spark, cfg)
    assert len(results) == 1
    res = results[0]
    assert {f"stage:{t}" for t in REF_CONFIG["tables"][0]["source_tables"]
            } <= set(res.phases_run)
    assert "transform" in res.phases_run and "sink" in res.phases_run
    assert res.files_written > 0

    # the same staged layout as migrate_table: raw per source +
    # transformed (py:376-421)
    staging = tmp_path / "staging" / "customer_payment_information"
    for t in REF_CONFIG["tables"][0]["source_tables"]:
        assert glob.glob(str(staging / "raw" / t / "*.parquet")), t
    assert glob.glob(str(staging / "transformed" / "*.parquet"))

    # filters + the hard-coded join chain: exactly the two surviving
    # payment sources (Inactive / Visa / TX / high-cust-id rows all
    # filtered), with the projection's aliases
    out = spark.read.parquet(str(tmp_path / "sink"))
    rows = {r["objid"]: r for r in out.collect()}
    assert set(rows) == {400010, 400012}
    assert rows[400010]["x_cc_type"] == "Discover"
    assert rows[400010]["state"] == "MI"
    assert rows[400012]["x_cc_type"] == "Mastercard"
    assert rows[400012]["first_name"] == "Carol"
    assert out.columns[:2] == ["objid", "x_cust_id"]
    assert len(out.columns) == 22

    # resume: a second run must skip phases 1+2 (transformed staging
    # exists) and every sink file (markers) — nothing rewritten
    res2 = run_pipelines(spark, cfg)[0]
    assert not any(p.startswith("stage") or p == "transform"
                   for p in res2.phases_run)
    assert res2.files_written == 0
    assert res2.files_skipped > 0


def test_cli_translate_only_prints_engine_config(tmp_path, capsys):
    from oracle_cassandra_migrator_spark.__main__ import main

    ref_path = tmp_path / "ref.json"
    ref_path.write_text(json.dumps(REF_CONFIG))
    ov_path = tmp_path / "ov.json"
    ov_path.write_text(json.dumps({"staging_dir": "/tmp/x"}))
    rc = main([str(ref_path), "--from-reference",
               "--override-file", str(ov_path), "--translate-only"])
    assert rc == 0
    cfg = json.loads(capsys.readouterr().out)
    assert cfg["staging_dir"] == "/tmp/x"
    assert cfg["tables"][0]["name"] == "customer_payment_information"
    assert os.path.basename(
        cfg["tables"][0]["sources"]["table_address"]["options"]["dbtable"]
    ) == "table_address"
