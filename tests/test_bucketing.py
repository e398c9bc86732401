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


def test_layout_spec_drives_bucketed_read(spark):
    """VERDICT r8 item 3: the bucketed layout is config-selectable —
    a source spec with layout.bucketed_by/buckets materializes the
    metastore table once and every read plans against it; the same
    catalog query body (q21) then plans ZERO order-key Exchanges."""
    from oracle_cassandra_migrator_spark.queries.tpch_suite import run_q21
    from oracle_cassandra_migrator_spark.sources.readers import read_source
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    sf = "/root/testdata/sf0.01"  # q21 predicate is empty at sf0.001
    specs = {
        "lineitem": {"format": "parquet",
                     "path": f"{sf}/lineitem.parquet",
                     "alias": "lineitem",
                     "layout": {"bucketed_by": ["l_orderkey"],
                                "buckets": 8, "table": "li_spec",
                                "refresh": True}},
        "orders": {"format": "parquet",
                   "path": f"{sf}/orders.parquet",
                   "alias": "orders",
                   "layout": {"bucketed_by": "o_orderkey",
                              "buckets": 8, "table": "ord_spec",
                              "refresh": True}},
    }
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    # dims broadcast (as at any scale); facts take the SMJ path whose
    # Exchange the layout deletes — see test_bucketed_headliners
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    try:
        frames = {n: read_source(spark, s) for n, s in specs.items()}
        dims = {n: read_table(spark, sf, n)
                for n in ("supplier", "nation")}
        got_df = run_q21(spark, {**dims, **frames})
        plan = got_df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning(l_orderkey" not in plan
        assert "Exchange hashpartitioning(o_orderkey" not in plan
        want = sorted(map(tuple, run_q21(spark, {
            **dims, "lineitem": read_table(spark, sf, "lineitem"),
            "orders": read_table(spark, sf, "orders")}).collect()))
        assert sorted(map(tuple, got_df.collect())) == want
        assert len(want) > 0
        # second read REUSES the materialized table (no refresh)
        again = read_source(spark, {**specs["lineitem"],
                                    "layout": {**specs["lineitem"]["layout"],
                                               "refresh": False}})
        assert again.groupBy("l_orderkey").count().count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS li_spec_b8")
        spark.sql("DROP TABLE IF EXISTS ord_spec_b8")


def test_layout_spec_validation():
    from oracle_cassandra_migrator_spark.sources.readers import (
        _apply_layout)

    with pytest.raises(ValueError, match="bucketed_by"):
        _apply_layout(None, None, {"layout": {"bucketed_by": [],
                                              "buckets": 8}})
    with pytest.raises(ValueError, match="table name"):
        _apply_layout(None, None, {"layout": {"bucketed_by": ["k"],
                                              "buckets": 8}})
