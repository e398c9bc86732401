"""Skew-mitigation operators: salted results must be identical to the
unsalted plan, just with a different physical distribution."""

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators.skew import (
    salted_aggregate,
    salted_broadcast_join,
)

from tests.conftest import SF_SMALL


def test_salted_aggregate_matches_direct(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    direct = {
        (r.o_orderstatus, r.n, float(r.total))
        for r in orders.groupBy("o_orderstatus").agg(
            F.expr("CAST(COUNT(*) AS BIGINT) AS n"),
            F.expr("CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)"
                   " AS total"),
        ).collect()
    }
    salted = {
        (r.o_orderstatus, r.n, float(r.total))
        for r in salted_aggregate(
            orders,
            key_cols=["o_orderstatus"],
            partial_aggs=["COUNT(*) AS c",
                          "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s"],
            final_aggs=["CAST(SUM(c) AS BIGINT) AS n",
                        "CAST(SUM(s) AS DOUBLE) AS total"],
            n_salts=16,
        ).collect()
    }
    assert salted == direct


def test_salted_join_matches_plain_join(spark):
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    plain = (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .selectExpr("o_orderkey", "c_custkey")
    )
    salted = salted_broadcast_join(
        orders, customer, "o_custkey", "c_custkey", n_salts=8
    ).selectExpr("o_orderkey", "c_custkey")
    assert salted.count() == plain.count()
    assert {tuple(r) for r in salted.collect()} == \
        {tuple(r) for r in plain.collect()}


def test_salted_join_left_keeps_unmatched(spark):
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    out = salted_broadcast_join(
        customer, orders.where("o_orderstatus = 'P'"),
        "c_custkey", "o_custkey", n_salts=4, how="left",
    )
    assert out.count() >= customer.count()  # left rows preserved (+matches)
    assert out.where("o_orderkey IS NULL").count() > 0
