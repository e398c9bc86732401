"""Bucketed layout wired into the two worst scale-probe headliners
(VERDICT r6 item 4): q21 (3.7x at the 10x probe — three l_orderkey
Exchanges) and topk_order_revenue (3.3x — one). Over the bucketed
lineitem/orders tables the same query bodies must (a) return identical
results and (b) plan strictly fewer Exchanges, with NO Exchange
feeding any lineitem-side SortMergeJoin."""

import pytest

# q21's waiting-supplier predicate is empty at sf0.001 — use sf0.01 so
# the result-equality check is non-vacuous
SF_SMALL = "/root/testdata/sf0.01"


@pytest.fixture(scope="module")
def bkt(spark):
    from oracle_cassandra_migrator_spark.sources import bucketed

    frames = bucketed.bucketed_fact_tables(spark, SF_SMALL, n_buckets=8,
                                           refresh=True)
    yield frames
    bucketed.drop_bucketed_fact_tables(spark, n_buckets=8)


def _plan(df):
    return df._jdf.queryExecution().executedPlan().toString()


def _dims_only_broadcast(spark):
    """Threshold between the dims (supplier 5K / nation 3K / customer
    34K) and the facts (orders 281K / lineitem 1M): dims broadcast —
    as they would at ANY scale — while the fact-fact joins take the
    SMJ path whose Exchange the bucketing is supposed to delete.
    Disabling broadcast entirely would instead shuffle lineitem on
    s_suppkey first (the SQL join order), destroying the bucket
    partitioning before any order-key join could use it."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "65536")
    return old


def test_bucketed_q21_same_result_fewer_exchanges(spark, bkt):
    from oracle_cassandra_migrator_spark.queries.tpch_suite import run_q21
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    dims = {n: read_table(spark, SF_SMALL, n)
            for n in ("supplier", "nation")}
    plain = {**dims, "lineitem": read_table(spark, SF_SMALL, "lineitem"),
             "orders": read_table(spark, SF_SMALL, "orders")}

    old = _dims_only_broadcast(spark)
    try:
        want = sorted(map(tuple, run_q21(spark, plain).collect()))
        plan_plain = _plan(run_q21(spark, plain))
        got_df = run_q21(spark, {**dims, **bkt})
        got = sorted(map(tuple, got_df.collect()))
        plan_bkt = _plan(got_df)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert got == want and len(want) > 0
    n_plain = plan_plain.count("Exchange hashpartitioning")
    n_bkt = plan_bkt.count("Exchange hashpartitioning")
    assert n_bkt < n_plain, (n_plain, n_bkt)
    # every l_orderkey-keyed Exchange must be gone: the only hash
    # exchange left is the final s_name aggregation
    assert "Exchange hashpartitioning(l_orderkey" not in plan_bkt
    assert "Exchange hashpartitioning(o_orderkey" not in plan_bkt


def test_bucketed_topk_same_result_no_orderkey_exchange(spark, bkt):
    from oracle_cassandra_migrator_spark.queries.relational import (
        run_topk_order_revenue)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    cust = read_table(spark, SF_SMALL, "customer")
    plain = {"customer": cust,
             "orders": read_table(spark, SF_SMALL, "orders"),
             "lineitem": read_table(spark, SF_SMALL, "lineitem")}

    old = _dims_only_broadcast(spark)
    try:
        want = run_topk_order_revenue(plain).collect()
        got_df = run_topk_order_revenue({"customer": cust, **bkt})
        got = got_df.collect()
        plan_bkt = _plan(got_df)
        plan_plain = _plan(run_topk_order_revenue(plain))
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)

    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    assert len(want) == 10
    # the o_orderkey = l_orderkey join must read co-located buckets
    assert ("Exchange hashpartitioning(l_orderkey" not in plan_bkt)
    assert (plan_bkt.count("Exchange hashpartitioning")
            < plan_plain.count("Exchange hashpartitioning"))


def test_bucketed_events_window_has_no_exchange(spark):
    """Sessionize over the user_id-bucketed events: identical result,
    and the window runs directly on the bucketed scan — per-user sort,
    NO Exchange anywhere in the plan."""
    from oracle_cassandra_migrator_spark.queries.extensions import (
        run_sessionize)
    from oracle_cassandra_migrator_spark.sources import bucketed
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    ev_b = bucketed.bucketed_event_table(spark, SF_SMALL, n_buckets=8,
                                         refresh=True)
    try:
        plain = run_sessionize(read_table(spark, SF_SMALL, "events"))
        want = sorted(map(tuple, plain.collect()))
        got_df = run_sessionize(ev_b)
        got = sorted(map(tuple, got_df.collect()))
        assert got == want and len(want) > 0

        plan_b = _plan(got_df)
        plan_p = _plan(plain)
        assert "Exchange" in plan_p          # plain pays the shuffle
        assert "Exchange" not in plan_b, plan_b
        assert "Sort" in plan_b              # per-user sort remains
    finally:
        spark.sql("DROP TABLE IF EXISTS events_b8")
