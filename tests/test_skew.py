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


def test_salted_cap_matches_plain_on_adversarial_skew(spark):
    """One group holds 50% of the corpus: the salted cap must return
    EXACTLY the plain-window result (ranks included) while fanning the
    hot group's first-stage work across (group, salt) tasks."""
    from oracle_cassandra_migrator_spark.operators.curation import (
        cap_per_group,
        cap_per_group_salted,
    )

    rows = spark.range(0, 20000).selectExpr(
        "id",
        "CASE WHEN id % 2 = 0 THEN 'hot' ELSE concat('g', id % 97) END"
        " AS grp",
        "CAST(pmod(xxhash64(id), 1000000) AS BIGINT) AS score",
    )
    order = [F.col("score").desc(), F.col("id")]
    plain = cap_per_group(rows, "grp", order, n=10)
    salted = cap_per_group_salted(
        rows, "grp", order, n=10, n_salts=16, salt_on=["id"])
    assert sorted(tuple(r) for r in salted.collect()) == \
        sorted(tuple(r) for r in plain.collect())

    # hot group's stage-1 window partitions on (grp, __salt): at most
    # n rows per (group, salt) survive to the final per-group window
    plan = salted._jdf.queryExecution().executedPlan().toString()
    import re
    assert re.search(r"hashpartitioning\(grp#\d+, __salt#\d+", plan)
    # AQE prints final + initial sections; count nodes in the first
    final_section = plan.split("== Initial Plan ==")[0]
    assert len(re.findall(r"\bWindow \[", final_section)) == 2


def test_salted_cap_bounds_survivors_per_group(spark):
    """Stage 2 of the salted cap sees <= n * n_salts rows per group no
    matter how large the group is (the scale argument: the only
    unsalted window runs over a bounded input)."""
    from oracle_cassandra_migrator_spark.operators.curation import (
        cap_per_group_salted,
    )

    rows = spark.range(0, 30000).selectExpr(
        "id", "'onegroup' AS grp", "id AS score")
    n, n_salts = 5, 8
    out = cap_per_group_salted(
        rows, "grp", [F.col("score").desc(), F.col("id")],
        n=n, n_salts=n_salts, salt_on=["id"])
    # top-n of the single group, exact
    got = [(r.id, r.keep_rank) for r in out.orderBy("keep_rank").collect()]
    assert got == [(29999 - i, i + 1) for i in range(n)]
    # survivor bound: stage-1 keeps <= n per (group, salt)
    salted = rows.selectExpr(
        "*", f"pmod(xxhash64(id), {n_salts}) AS __salt")
    from pyspark.sql.window import Window
    w1 = Window.partitionBy("grp", "__salt").orderBy(
        F.col("score").desc(), F.col("id"))
    survivors = (
        salted.withColumn("r", F.row_number().over(w1))
        .filter(F.col("r") <= n).groupBy("grp").count().collect()
    )
    assert all(r["count"] <= n * n_salts for r in survivors)


def test_salted_join_left_keeps_unmatched(spark):
    customer = spark.read.parquet(f"{SF_SMALL}/customer.parquet")
    orders = spark.read.parquet(f"{SF_SMALL}/orders.parquet")
    out = salted_broadcast_join(
        customer, orders.where("o_orderstatus = 'P'"),
        "c_custkey", "o_custkey", n_salts=4, how="left",
    )
    assert out.count() >= customer.count()  # left rows preserved (+matches)
    assert out.where("o_orderkey IS NULL").count() > 0
