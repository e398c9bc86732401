"""Bucketed-table co-located join: writing both sides bucketed by the
join key lets Spark plan a SortMergeJoin with NO Exchange — the
standard way to amortize one shuffle across many future joins of
100 TB fact tables."""

import pytest

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # warehouse dir is a static conf, set in conftest's build_session
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    (orders.write.mode("overwrite").bucketBy(8, "o_orderkey")
     .sortBy("o_orderkey").format("parquet").saveAsTable("orders_b"))
    (lineitem.write.mode("overwrite").bucketBy(8, "l_orderkey")
     .sortBy("l_orderkey").format("parquet").saveAsTable("lineitem_b"))
    yield
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    # broadcast would bypass bucketing at this tiny scale — disable it
    # so the plan shows what a 100 TB fact-fact join would do.
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        orders_b = spark.table("orders_b")
        lineitem_b = spark.table("lineitem_b")
        joined = orders_b.join(
            lineitem_b, orders_b.o_orderkey == lineitem_b.l_orderkey)
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, (
            "bucketed join must not shuffle:\n" + plan)
        orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
        lineitem = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        expected = orders.join(
            lineitem, orders.o_orderkey == lineitem.l_orderkey).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_avoids_exchange(spark, bucketed_tables):
    agg = spark.table("lineitem_b").groupBy("l_orderkey").count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan, (
        "groupBy on the bucket key must not shuffle:\n" + plan)
    assert agg.count() == (
        spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
        .select("l_orderkey").distinct().count())


def test_bucketed_write_via_sink_spec(spark):
    """Bucketing is expressible in the declarative sink spec, not just
    the raw API."""
    from oracle_cassandra_migrator_spark.sinks.writers import write_sink

    nation = spark.read.parquet(f"{SF_SMALL}/nation.parquet")
    write_sink(nation, {
        "format": "parquet", "mode": "overwrite",
        "table": "nation_spec_b",
        "bucket_by": {"n": 4, "cols": ["n_nationkey"],
                      "sort_by": ["n_nationkey"]},
    })
    try:
        agg = spark.table("nation_spec_b").groupBy("n_nationkey").count()
        plan = agg._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan
        assert agg.count() == 25
    finally:
        spark.sql("DROP TABLE IF EXISTS nation_spec_b")
