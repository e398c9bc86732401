"""VARIANT type coverage (Spark 4.0 semi-structured type): parse_json
/ variant_get must agree with the string-path get_json_object the
catalog's json_extract_event_props uses, and try_parse_json must
degrade malformed input to NULL instead of failing the job — the
property that makes VARIANT the scale path for messy event payloads
(parse once, bit-shred into columnar storage, no per-query re-parse).
"""

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.sources.testdata import read_table

from tests.conftest import SF_SMALL


def test_variant_get_matches_get_json_object(spark):
    ev = read_table(spark, SF_SMALL, "events")
    df = ev.select(
        "event_id",
        F.expr("CAST(get_json_object(props, '$.k') AS BIGINT)").alias("s"),
        F.expr("variant_get(parse_json(props), '$.k', 'bigint')").alias("v"),
    )
    assert df.count() > 0
    assert df.where("s IS NOT DISTINCT FROM v").count() == df.count()


def test_variant_typed_extraction_and_schema_of(spark):
    row = spark.sql(
        "SELECT variant_get(parse_json('{\"a\": {\"b\": [1, 2, 3]}}'),"
        "       '$.a.b[2]', 'int') AS x,"
        "       schema_of_variant(parse_json('{\"k\": 87}')) AS sch"
    ).first()
    assert row["x"] == 3
    assert "k" in row["sch"] and "BIGINT" in row["sch"].upper()


def test_try_parse_json_nulls_malformed_rows(spark):
    df = spark.createDataFrame(
        [("ok", '{"k": 1}'), ("bad", "{not json"), ("empty", "")],
        "tag STRING, payload STRING",
    ).select(
        "tag", F.expr("try_parse_json(payload)").alias("v"))
    got = {r["tag"]: r["v"] for r in df.collect()}
    assert got["ok"] is not None
    assert got["bad"] is None
    assert got["empty"] is None
