"""Relational operator coverage (SURVEY.md §2.1–2.8), each query with a
DuckDB oracle.

The flagship reproduces the reference's whole pipeline shape —
per-source predicate filters (verizon_table_migration_Rakesh_filters.py:118-122),
aliased 4-table equi-join chain (py:133-142), ``selectExpr`` aliasing
projection (py:146) — through the declarative pipeline compiler, mapped
onto the TPC-H-ish testdata per FIXTURES.md §B.

Exactness conventions: see queries.registry.query docstring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.plans.compiler import compile_transform
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import load_tables, read_table


def dsum(col: str, alias: str) -> str:
    """Order-independent exact sum of a double column, surfaced as double."""
    return f"CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE) AS {alias}"


def davg(col: str, alias: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({col} AS DECIMAL(18,4))) AS DOUBLE) / COUNT({col}) "
        f"AS DOUBLE) AS {alias}"
    )


# ---------------------------------------------------------------------------
# Flagship: the reference pipeline shape (P1 filters + J1 join chain +
# P2/P3 aliased projection), compiled from a declarative spec.
# ---------------------------------------------------------------------------

FLAGSHIP_FILTERS = {
    "customer": "c_custkey >= 100 AND c_custkey <= 500000 "
                "AND c_mktsegment IN ('AUTOMOBILE', 'BUILDING', 'MACHINERY')",
    "orders": "o_orderpriority IN ('1-URGENT', '2-HIGH')",
    "lineitem": "l_linestatus = 'F'",
    "supplier": "s_nationkey IN (0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11)",
}

FLAGSHIP_PROJECTION = [
    "lineitem.l_orderkey AS order_key",
    "lineitem.l_linenumber AS line_number",
    "customer.c_custkey AS customer_id",
    "customer.c_name AS customer_name",
    "customer.c_mktsegment AS market_segment",
    "customer.c_nationkey AS customer_nation",
    "customer.c_acctbal AS account_balance",
    "orders.o_orderstatus AS order_status",
    "orders.o_totalprice AS order_total",
    "CAST(CAST(orders.o_orderdate AS DATE) AS STRING) AS order_date",
    "orders.o_orderpriority AS order_priority",
    "lineitem.l_partkey AS part_id",
    "lineitem.l_quantity AS quantity",
    "lineitem.l_extendedprice AS extended_price",
    "lineitem.l_discount AS discount",
    "lineitem.l_tax AS tax",
    "lineitem.l_returnflag AS return_flag",
    "CAST(CAST(lineitem.l_shipdate AS DATE) AS STRING) AS ship_date",
    "supplier.s_suppkey AS supplier_id",
    "supplier.s_name AS supplier_name",
]


@query(
    "flagship_payment_pipeline",
    oracle=f"""
    SELECT {', '.join(FLAGSHIP_PROJECTION)}
    FROM customer
    JOIN orders   ON customer.c_custkey = orders.o_custkey
    JOIN lineitem ON orders.o_orderkey = lineitem.l_orderkey
    JOIN supplier ON lineitem.l_suppkey = supplier.s_suppkey
    WHERE ({FLAGSHIP_FILTERS['customer']})
      AND ({FLAGSHIP_FILTERS['orders']})
      AND ({FLAGSHIP_FILTERS['lineitem']})
      AND ({FLAGSHIP_FILTERS['supplier']})
    """,
)
def flagship_payment_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    sources = {
        name: read_table(spark, sf_dir, name).where(flt)
        for name, flt in FLAGSHIP_FILTERS.items()
    }
    transform = [
        {"op": "join", "left": "customer", "right": "orders",
         "on": "customer.c_custkey = orders.o_custkey", "as": "co"},
        {"op": "join", "left": "co", "right": "lineitem",
         "on": "orders.o_orderkey = lineitem.l_orderkey", "as": "col"},
        # supplier is tiny (100 rows at sf0.01) -> explicit broadcast hint,
        # the 100 TB-safe choice when the dim fits in memory.
        {"op": "join", "left": "col", "right": "supplier",
         "on": "lineitem.l_suppkey = supplier.s_suppkey",
         "broadcast": "supplier", "as": "joined"},
        {"op": "select", "input": "joined", "exprs": FLAGSHIP_PROJECTION},
    ]
    return compile_transform(spark, sources, transform)


# ---------------------------------------------------------------------------
# Aggregations (A1-A4)
# ---------------------------------------------------------------------------

@query(
    "agg_global_lineitem",
    oracle=f"""
    SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS n_orders,
           {dsum('l_extendedprice', 'total_price')},
           {davg('l_quantity', 'avg_qty')}
    FROM lineitem
    """,
)
def agg_global_lineitem(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(COUNT(DISTINCT l_orderkey) AS BIGINT)").alias("n_orders"),
        F.expr(dsum("l_extendedprice", "total_price")),
        F.expr(davg("l_quantity", "avg_qty")),
    )


@query(
    "pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           {dsum('l_quantity', 'sum_qty')},
           {dsum('l_extendedprice', 'sum_base_price')},
           {dsum('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
           {davg('l_quantity', 'avg_qty')},
           {davg('l_extendedprice', 'avg_price')},
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark, sf_dir):
    """TPC-H Q1-shaped pricing summary (A2): map-side partial agg +
    final agg, all JVM-side; Catalyst plans partial/final automatically."""
    return (
        read_table(spark, sf_dir, "lineitem", fan_out=True,
                   fan_out_by=("l_orderkey", "l_linenumber"))
        .where("l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.expr(dsum("l_quantity", "sum_qty")),
            F.expr(dsum("l_extendedprice", "sum_base_price")),
            F.expr(dsum("l_extendedprice * (1 - l_discount)", "sum_disc_price")),
            F.expr(davg("l_quantity", "avg_qty")),
            F.expr(davg("l_extendedprice", "avg_price")),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("count_order"),
        )
    )


@query(
    "agg_distinct_per_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_distinct_per_segment(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.expr("CAST(COUNT(DISTINCT c_nationkey) AS BIGINT)").alias("n_nations"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"),
        )
    )


@query(
    "rollup_acctbal_region_nation",
    oracle=f"""
    SELECT COALESCE(r_name, 'ALL') AS region_name,
           COALESCE(n_name, 'ALL') AS nation_name,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           {dsum('c_acctbal', 'total_acctbal')}
    FROM (
      SELECT r.r_name, n.n_name, c.c_acctbal
      FROM customer c
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      JOIN region r ON n.n_regionkey = r.r_regionkey
    )
    GROUP BY ROLLUP (r_name, n_name)
    """,
)
def rollup_acctbal_region_nation(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "nation", "region")
    joined = (
        t["customer"]
        .join(F.broadcast(t["nation"]),
              t["customer"].c_nationkey == t["nation"].n_nationkey)
        .join(F.broadcast(t["region"]),
              t["nation"].n_regionkey == t["region"].r_regionkey)
        .select("r_name", "n_name", "c_acctbal")
    )
    return (
        joined.rollup("r_name", "n_name")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"),
            F.expr(dsum("c_acctbal", "total_acctbal")),
        )
        .selectExpr(
            "COALESCE(r_name, 'ALL') AS region_name",
            "COALESCE(n_name, 'ALL') AS nation_name",
            "n_customers",
            "total_acctbal",
        )
    )


@query(
    "cube_orders_status_priority",
    oracle=f"""
    SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def cube_orders_status_priority(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
            F.expr(dsum("o_totalprice", "total_price")),
        )
        .selectExpr(
            "COALESCE(o_orderstatus, 'ALL') AS order_status",
            "COALESCE(o_orderpriority, 'ALL') AS order_priority",
            "n_orders",
            "total_price",
        )
    )


# ---------------------------------------------------------------------------
# Join-type breadth (J1-J5) + as-of (J4 custom)
# ---------------------------------------------------------------------------

@query(
    "join_left_order_counts",
    oracle="""
    SELECT c.c_custkey AS customer_id,
           CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_urgent_orders
    FROM customer c
    LEFT JOIN (SELECT * FROM orders WHERE o_orderpriority = '1-URGENT') o
      ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey
    """,
)
def join_left_order_counts(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where("o_orderpriority = '1-URGENT'")
    return (
        t["customer"].join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left")
        .groupBy(t["customer"].c_custkey.alias("customer_id"))
        .agg(F.expr("CAST(COUNT(o_orderkey) AS BIGINT)").alias("n_urgent_orders"))
    )


@query(
    "join_full_nation_coverage",
    oracle="""
    SELECT COALESCE(c.nk, s.nk) AS nation_key,
           COALESCE(c.n_cust, 0) AS n_customers,
           COALESCE(s.n_supp, 0) AS n_suppliers
    FROM (SELECT c_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_cust
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nk, CAST(COUNT(*) AS BIGINT) AS n_supp
          FROM supplier GROUP BY s_nationkey) s
      ON c.nk = s.nk
    """,
)
def join_full_nation_coverage(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "supplier")
    c = (t["customer"].groupBy(F.col("c_nationkey").alias("nk"))
         .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_cust")).alias("c"))
    s = (t["supplier"].groupBy(F.col("s_nationkey").alias("nk"))
         .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_supp")).alias("s"))
    return (
        c.join(s, F.expr("c.nk = s.nk"), "full")
        .selectExpr(
            "COALESCE(c.nk, s.nk) AS nation_key",
            "COALESCE(n_cust, CAST(0 AS BIGINT)) AS n_customers",
            "COALESCE(n_supp, CAST(0 AS BIGINT)) AS n_suppliers",
        )
    )


@query(
    "join_semi_urgent_customers",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name
    FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
    """,
)
def join_semi_urgent_customers(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    urgent = t["orders"].where("o_orderpriority = '1-URGENT'")
    return (
        t["customer"]
        .join(urgent, t["customer"].c_custkey == urgent.o_custkey, "left_semi")
        .selectExpr("c_custkey AS customer_id", "c_name AS customer_name")
    )


@query(
    "join_anti_customers_without_orders",
    oracle="""
    SELECT c_custkey AS customer_id, c_mktsegment AS market_segment
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti_customers_without_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"]
        .join(t["orders"], t["customer"].c_custkey == t["orders"].o_custkey,
              "left_anti")
        .selectExpr("c_custkey AS customer_id", "c_mktsegment AS market_segment")
    )


@query(
    "join_cross_region_pairs",
    oracle="""
    SELECT a.r_name AS region_a, b.r_name AS region_b
    FROM region a CROSS JOIN region b
    """,
)
def join_cross_region_pairs(spark, sf_dir):
    r = read_table(spark, sf_dir, "region")
    return (
        r.alias("a").crossJoin(r.alias("b"))
        .selectExpr("a.r_name AS region_a", "b.r_name AS region_b")
    )


@query(
    "join_range_price_buckets",
    oracle="""
    SELECT b.bucket AS price_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    JOIN (VALUES ('low', 0.0, 150000.0),
                 ('mid', 150000.0, 350000.0),
                 ('high', 350000.0, 1e12)) AS b(bucket, lo, hi)
      ON o.o_totalprice >= b.lo AND o.o_totalprice < b.hi
    GROUP BY b.bucket
    """,
)
def join_range_price_buckets(spark, sf_dir):
    """Theta/range join (J4): orders against a tiny bucket dim on an
    interval condition. Spark plans BroadcastNestedLoopJoin — correct
    at scale only because the build side is rows-scale-small."""
    orders = read_table(spark, sf_dir, "orders").alias("o")
    buckets = spark.createDataFrame(
        [("low", 0.0, 150000.0), ("mid", 150000.0, 350000.0),
         ("high", 350000.0, 1e12)],
        "bucket STRING, lo DOUBLE, hi DOUBLE",
    ).alias("b")
    return (
        orders.join(F.broadcast(buckets),
                    F.expr("o.o_totalprice >= b.lo AND o.o_totalprice < b.hi"))
        .groupBy(F.col("b.bucket").alias("price_bucket"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"))
    )


@query(
    "asof_join_purchase_click",
    oracle="""
    SELECT p.event_id, p.user_id,
           date_diff('microsecond',
                     (SELECT max(c.ts) FROM events c
                      WHERE c.user_id = p.user_id
                        AND c.event_type = 'click'
                        AND c.ts <= p.ts),
                     p.ts) AS us_since_click
    FROM events p
    WHERE p.event_type = 'purchase'
    """,
)
def asof_join_purchase_click(spark, sf_dir):
    """As-of (backward) join: for each purchase, the latest click by the
    same user at or before it. Implemented the scale-correct way — a
    single union + one window pass partitioned by user (no per-row
    subquery, no cross product): O(n log n) within each user partition.
    """
    events = read_table(spark, sf_dir, "events")
    tagged = events.where("event_type IN ('click', 'purchase')").select(
        "event_id", "user_id", "ts",
        F.expr("CAST(event_type = 'purchase' AS INT)").alias("is_purchase"),
        F.expr("CASE WHEN event_type = 'click' THEN ts END").alias("click_ts"),
    )
    w = (
        Window.partitionBy("user_id")
        # clicks (is_purchase=0) sort before purchases at equal ts,
        # matching the oracle's `c.ts <= p.ts`.
        .orderBy("ts", "is_purchase", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        tagged.withColumn("last_click_ts",
                          F.last("click_ts", ignorenulls=True).over(w))
        .where("is_purchase = 1")
        .selectExpr(
            "event_id", "user_id",
            "TIMESTAMPDIFF(MICROSECOND, last_click_ts, ts) AS us_since_click",
        )
    )


# ---------------------------------------------------------------------------
# Windows (W1)
# ---------------------------------------------------------------------------

@query(
    "window_rank_top_orders",
    oracle="""
    SELECT * FROM (
      SELECT o_custkey AS customer_id, o_orderkey AS order_key,
             o_totalprice AS order_total,
             CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
                  ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rank_in_customer
      FROM orders
    ) WHERE rank_in_customer <= 3
    """,
)
def window_rank_top_orders(spark, sf_dir):
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey"))
    return (
        read_table(spark, sf_dir, "orders")
        .withColumn("rank_in_customer", F.row_number().over(w).cast("int"))
        .where("rank_in_customer <= 3")
        .selectExpr("o_custkey AS customer_id", "o_orderkey AS order_key",
                    "o_totalprice AS order_total", "rank_in_customer")
    )


@query(
    "window_running_total",
    oracle="""
    SELECT o_custkey AS customer_id, o_orderkey AS order_key,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER (
                PARTITION BY o_custkey
                ORDER BY o_orderdate, o_orderkey
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
             AS DOUBLE) AS running_spend
    FROM orders
    """,
)
def window_running_total(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").selectExpr(
        "o_custkey AS customer_id",
        "o_orderkey AS order_key",
        "CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) OVER ("
        " PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)"
        " AS running_spend",
    )


@query(
    "window_lag_event_gap",
    oracle="""
    SELECT event_id, user_id,
           date_diff('microsecond',
                     lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                     ts) AS gap_us
    FROM events
    """,
)
def window_lag_event_gap(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        read_table(spark, sf_dir, "events")
        .withColumn("prev_ts", F.lag("ts").over(w))
        .selectExpr("event_id", "user_id",
                    "TIMESTAMPDIFF(MICROSECOND, prev_ts, ts) AS gap_us")
    )


# ---------------------------------------------------------------------------
# Sort / limit / top-k (O1-O2), set ops (O3)
# ---------------------------------------------------------------------------

@query(
    "topk_order_revenue",
    oracle="""
    SELECT l_orderkey AS order_key,
           CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON o_orderkey = l_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey
    ORDER BY revenue DESC, order_key
    LIMIT 10
    """,
)
def topk_order_revenue(spark, sf_dir):
    """TPC-H Q3-shaped top-k: Spark plans TakeOrderedAndProject, which
    takes per-partition top-k then merges on the driver — no global sort
    shuffle even at 100 TB."""
    return run_topk_order_revenue(
        load_tables(spark, sf_dir, "customer", "orders", "lineitem"))


def run_topk_order_revenue(t):
    """Top-k body over caller-supplied frames — the seam for the
    bucketed layout (orders/lineitem bucketed by order key skip the
    o_orderkey = l_orderkey Exchange, the probe's 3.3x term).

    r12: customer enters as a LEFT SEMI reduction of orders instead of
    an inner join — exact because c_custkey is unique (the aggregate
    never reads customer columns), and it keeps lineitem on the
    STREAMED side: the planner previously size-mis-estimated the
    filtered customer⋈orders result and broadcast the 600k-row pruned
    lineitem instead (a 3-column hash relation rebuilt per run;
    measured 1.09s -> 0.84s at sf0.1). At scale the semi output is
    the filtered orders subset — smaller than either input, never a
    forced broadcast, so AQE stays free to pick the join strategy."""
    orders_f = t["orders"].join(
        t["customer"].where("c_mktsegment = 'BUILDING'"),
        F.expr("c_custkey = o_custkey"), "left_semi")
    return (
        t["lineitem"].join(orders_f, F.expr("o_orderkey = l_orderkey"))
        .groupBy(F.col("l_orderkey").alias("order_key"))
        .agg(F.expr(
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)))"
            " AS DOUBLE)").alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("order_key"))
        .limit(10)
    )


@query(
    "sort_top_customers_by_balance",
    oracle="""
    SELECT c_custkey AS customer_id, c_name AS customer_name,
           c_acctbal AS account_balance
    FROM customer
    ORDER BY c_acctbal DESC, c_custkey
    LIMIT 10
    """,
)
def sort_top_customers_by_balance(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "customer")
        .orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
        .limit(10)
        .selectExpr("c_custkey AS customer_id", "c_name AS customer_name",
                    "c_acctbal AS account_balance")
    )


@query(
    "set_union_priority_buyers",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_priority_buyers(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where("o_orderpriority = '1-URGENT'").selectExpr("o_custkey AS customer_id")
    b = orders.where("o_orderpriority = '2-HIGH'").selectExpr("o_custkey AS customer_id")
    return a.unionByName(b).distinct()


@query(
    "set_intersect_repeat_buyers",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_repeat_buyers(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where("o_orderstatus = 'F'").selectExpr("o_custkey AS customer_id")
    b = orders.where("o_orderstatus = 'O'").selectExpr("o_custkey AS customer_id")
    return a.intersect(b)


@query(
    "set_except_inactive_customers",
    oracle="""
    SELECT c_custkey AS customer_id FROM customer
    EXCEPT
    SELECT o_custkey AS customer_id FROM orders
    """,
)
def set_except_inactive_customers(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    return (
        t["customer"].selectExpr("c_custkey AS customer_id")
        .subtract(t["orders"].selectExpr("o_custkey AS customer_id"))
    )


@query(
    "distinct_segment_nation",
    oracle="SELECT DISTINCT c_mktsegment AS market_segment, c_nationkey AS nation_key FROM customer",
)
def distinct_segment_nation(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "customer")
        .selectExpr("c_mktsegment AS market_segment", "c_nationkey AS nation_key")
        .distinct()
    )


# ---------------------------------------------------------------------------
# Scalar functions & derived expressions (F1, P4)
# ---------------------------------------------------------------------------

@query(
    "scalar_string_functions",
    oracle="""
    SELECT c_custkey AS customer_id,
           upper(c_name) AS name_upper,
           CAST(length(c_name) AS INT) AS name_len,
           substr(c_mktsegment, 1, 3) AS seg3,
           concat(c_name, '/', c_mktsegment) AS name_seg,
           CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num,
           replace(lower(c_mktsegment), 'a', '_') AS seg_replaced,
           trim(lpad(CAST(c_nationkey AS VARCHAR), 4, '0')) AS nation_padded
    FROM customer
    """,
)
def scalar_string_functions(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS customer_id",
        "upper(c_name) AS name_upper",
        "CAST(length(c_name) AS INT) AS name_len",
        "substr(c_mktsegment, 1, 3) AS seg3",
        "concat(c_name, '/', c_mktsegment) AS name_seg",
        "CAST(regexp_extract(c_name, '([0-9]+)', 1) AS BIGINT) AS name_num",
        "replace(lower(c_mktsegment), 'a', '_') AS seg_replaced",
        "trim(lpad(CAST(c_nationkey AS STRING), 4, '0')) AS nation_padded",
    )


@query(
    "scalar_date_functions",
    oracle="""
    SELECT o_orderkey AS order_key,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(month(o_orderdate) AS INT) AS order_month,
           CAST(quarter(o_orderdate) AS INT) AS order_quarter,
           CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR) AS order_month_start,
           CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS due_date,
           CAST(date_diff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
                AS INT) AS days_since_epoch_start
    FROM orders
    """,
)
def scalar_date_functions(spark, sf_dir):
    return read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS order_key",
        "CAST(year(o_orderdate) AS INT) AS order_year",
        "CAST(month(o_orderdate) AS INT) AS order_month",
        "CAST(quarter(o_orderdate) AS INT) AS order_quarter",
        "CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS STRING) AS order_month_start",
        "CAST(date_add(CAST(o_orderdate AS DATE), 30) AS STRING) AS due_date",
        "CAST(datediff(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS INT)"
        " AS days_since_epoch_start",
    )


@query(
    "scalar_math_functions",
    oracle="""
    SELECT l_orderkey AS order_key, l_linenumber AS line_number,
           abs(l_discount - 0.05) AS discount_gap,
           CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor,
           CAST(ceil(l_quantity) AS DOUBLE) AS qty_ceil,
           sqrt(l_extendedprice) AS price_sqrt,
           CAST(l_partkey % 13 AS BIGINT) AS part_mod,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged
    FROM lineitem
    """,
)
def scalar_math_functions(spark, sf_dir):
    return read_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey AS order_key", "l_linenumber AS line_number",
        "abs(l_discount - 0.05) AS discount_gap",
        "CAST(floor(l_extendedprice) AS DOUBLE) AS price_floor",
        "CAST(ceil(l_quantity) AS DOUBLE) AS qty_ceil",
        "sqrt(l_extendedprice) AS price_sqrt",
        "CAST(l_partkey % 13 AS BIGINT) AS part_mod",
        "l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charged",
    )


@query(
    "case_when_price_tiers",
    oracle=f"""
    SELECT CASE WHEN o_totalprice < 100000 THEN 'bronze'
                WHEN o_totalprice < 250000 THEN 'silver'
                WHEN o_totalprice < 400000 THEN 'gold'
                ELSE 'platinum' END AS tier,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum('o_totalprice', 'tier_total')}
    FROM orders
    GROUP BY 1
    """,
)
def case_when_price_tiers(spark, sf_dir):
    tier = (
        "CASE WHEN o_totalprice < 100000 THEN 'bronze' "
        "WHEN o_totalprice < 250000 THEN 'silver' "
        "WHEN o_totalprice < 400000 THEN 'gold' "
        "ELSE 'platinum' END"
    )
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.expr(tier).alias("tier"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
            F.expr(dsum("o_totalprice", "tier_total")),
        )
    )


@query(
    "json_extract_event_props",
    oracle="""
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS sum_k,
           CAST(MIN(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS min_k,
           CAST(MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
             AS max_k
    FROM events
    GROUP BY event_type
    """,
)
def json_extract_event_props(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "events")
        .withColumn("k", F.get_json_object("props", "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr("CAST(SUM(k) AS BIGINT)").alias("sum_k"),
            F.expr("CAST(MIN(k) AS BIGINT)").alias("min_k"),
            F.expr("CAST(MAX(k) AS BIGINT)").alias("max_k"),
        )
    )


# ---------------------------------------------------------------------------
# Coverage widening: grouping sets, exact stats, pivot, collected strings,
# right join, *All set ops, window-function breadth, conditional scalars.
# ---------------------------------------------------------------------------

@query(
    "agg_grouping_sets",
    oracle="""
    SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
           COALESCE(o_orderpriority, 'ALL') AS order_priority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def agg_grouping_sets(spark, sf_dir):
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT COALESCE(o_orderstatus, 'ALL') AS order_status,
               COALESCE(o_orderpriority, 'ALL') AS order_priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """)


@query(
    "agg_stats_per_segment",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           min(c_acctbal) AS min_bal,
           max(c_acctbal) AS max_bal,
           round(median(c_acctbal), 4) AS median_bal,
           round(sqrt(greatest(
               (COUNT(*) * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))
                                    * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                  * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE))
               / (COUNT(*) * (COUNT(*) - 1)), 0.0)), 4) AS stddev_bal
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_stats_per_segment(spark, sf_dir):
    """Exact order-statistics + a manually-decomposed sample stddev:
    the sums are exact decimals so the result is order-independent
    (a naive double stddev would drift with partitioning)."""
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"),
            F.expr("min(c_acctbal)").alias("min_bal"),
            F.expr("max(c_acctbal)").alias("max_bal"),
            F.expr("round(median(c_acctbal), 4)").alias("median_bal"),
            F.expr(
                "round(sqrt(greatest("
                " (COUNT(*) * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))"
                "                    * CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)"
                "  - CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)"
                "    * CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE))"
                " / (COUNT(*) * (COUNT(*) - 1)), 0.0D)), 4)"
            ).alias("stddev_bal"),
        )
    )


@query(
    "agg_approx_count_distinct",
    oracle="""
    SELECT CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
           TRUE AS estimate_ok
    FROM lineitem
    """,
)
def agg_approx_count_distinct(spark, sf_dir):
    """HLL-sketch distinct (A3) as a *checked* bounded-error contract:
    the sketch value differs between engines, so the comparable columns
    are the exact count (verified against DuckDB) and ``estimate_ok`` —
    Spark's HLL estimate within 5% of truth. rsd=0.01 keeps measured
    error under 0.7% at every test SF (rsd is a std-dev, not a bound:
    the default 0.05 misses 5% at sf0.001), so the 5% gate has real
    headroom. If the sketch drifts out of bound the boolean flips and
    the value hash fails."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .agg(
            F.countDistinct("l_orderkey").alias("exact_orders"),
            F.approx_count_distinct("l_orderkey", 0.01).alias("approx_orders"),
        )
        .select(
            F.col("exact_orders").cast("bigint").alias("exact_orders"),
            F.expr("abs(approx_orders - exact_orders)"
                   " <= 0.05 * exact_orders").alias("estimate_ok"),
        )
    )


@query(
    "agg_collect_sorted_nations",
    oracle="""
    SELECT n_regionkey AS region_key,
           string_agg(n_name, ',' ORDER BY n_name) AS nations
    FROM nation
    GROUP BY n_regionkey
    """,
)
def agg_collect_sorted_nations(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "nation")
        .groupBy(F.col("n_regionkey").alias("region_key"))
        .agg(F.expr(
            "array_join(array_sort(collect_list(n_name)), ',')"
        ).alias("nations"))
    )


@query(
    "pivot_status_by_priority",
    oracle="""
    SELECT o_orderpriority AS order_priority,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
           CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def pivot_status_by_priority(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderpriority").alias("order_priority"))
        .pivot("o_orderstatus", ["F", "O", "P"])
        .count()
        .selectExpr(
            "order_priority",
            "CAST(COALESCE(F, 0) AS BIGINT) AS n_f",
            "CAST(COALESCE(O, 0) AS BIGINT) AS n_o",
            "CAST(COALESCE(P, 0) AS BIGINT) AS n_p",
        )
    )


@query(
    "join_right_customer_orders",
    oracle="""
    SELECT o.o_orderkey AS order_key, c.c_custkey AS customer_id,
           c.c_mktsegment AS market_segment
    FROM (SELECT * FROM orders WHERE o_orderstatus = 'P') o
    RIGHT JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def join_right_customer_orders(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders")
    pending = t["orders"].where("o_orderstatus = 'P'")
    return (
        pending.join(t["customer"],
                     pending.o_custkey == t["customer"].c_custkey, "right")
        .selectExpr("o_orderkey AS order_key", "c_custkey AS customer_id",
                    "c_mktsegment AS market_segment")
    )


@query(
    "set_union_all_priorities",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderpriority = '1-URGENT'
    UNION ALL
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderpriority = '2-HIGH'
    """,
)
def set_union_all_priorities(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where("o_orderpriority = '1-URGENT'").selectExpr("o_custkey AS customer_id")
    b = orders.where("o_orderpriority = '2-HIGH'").selectExpr("o_custkey AS customer_id")
    return a.unionAll(b)


@query(
    "set_intersect_all_buyers",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'F'
    INTERSECT ALL
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_intersect_all_buyers(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where("o_orderstatus = 'F'").selectExpr("o_custkey AS customer_id")
    b = orders.where("o_orderstatus = 'O'").selectExpr("o_custkey AS customer_id")
    return a.intersectAll(b)


@query(
    "set_except_all_buyers",
    oracle="""
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'F'
    EXCEPT ALL
    SELECT o_custkey AS customer_id FROM orders WHERE o_orderstatus = 'O'
    """,
)
def set_except_all_buyers(spark, sf_dir):
    orders = read_table(spark, sf_dir, "orders")
    a = orders.where("o_orderstatus = 'F'").selectExpr("o_custkey AS customer_id")
    b = orders.where("o_orderstatus = 'O'").selectExpr("o_custkey AS customer_id")
    return a.exceptAll(b)


@query(
    "window_rank_breadth",
    oracle="""
    SELECT o_orderkey AS order_key,
           CAST(o_custkey % 4096 AS INT) AS cohort,
           CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
           CAST(ntile(4) OVER w AS INT) AS price_quartile,
           round(percent_rank() OVER w, 6) AS price_pct_rank,
           CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_order_key
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey % 4096
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_rank_breadth(spark, sf_dir):
    """Ranking-function breadth coverage (dense_rank / ntile /
    percent_rank / lead in one window), partitioned by a 4096-way
    customer cohort hash so the sort parallelizes at ANY corpus size
    (r8: re-keyed off the 3-value o_orderstatus partition, the one
    catalog plan that serialized at 100x — VERDICT r7 item 5). For a
    TRUE global distribution position at scale, use the two-pass
    quantile operator instead (operators/quantiles.py;
    quantile_bucket_prices — boundaries broadcast, assignment
    map-side, no global sort); full-partition windows belong on
    high-cardinality keys like this cohort or
    window_rank_top_orders's per-customer partitions."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey AS order_key,
               CAST(o_custkey % 4096 AS INT) AS cohort,
               CAST(dense_rank() OVER w AS INT) AS price_dense_rank,
               CAST(ntile(4) OVER w AS INT) AS price_quartile,
               round(percent_rank() OVER w, 6) AS price_pct_rank,
               CAST(lead(o_orderkey) OVER w AS BIGINT) AS next_order_key
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey % 4096
                     ORDER BY o_totalprice, o_orderkey)
    """)


@query(
    "scalar_conditional_functions",
    oracle="""
    SELECT c_custkey AS customer_id,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           greatest(c_acctbal, 0.0) AS bal_floor0,
           least(c_acctbal, 5000.0) AS bal_cap5k,
           CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS bal_status,
           CAST(c_acctbal >= 0 AS BOOLEAN) AS is_positive
    FROM customer
    """,
)
def scalar_conditional_functions(spark, sf_dir):
    return read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS customer_id",
        "coalesce(nullif(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other",
        "greatest(c_acctbal, 0.0D) AS bal_floor0",
        "least(c_acctbal, 5000.0D) AS bal_cap5k",
        "CASE WHEN c_acctbal < 0 THEN 'overdrawn' ELSE 'ok' END AS bal_status",
        "CAST(c_acctbal >= 0 AS BOOLEAN) AS is_positive",
    )


# ---------------------------------------------------------------------------
# TPC-H-adapted analytics (classic multi-join/agg shapes on the testdata
# schema; lineitem lacks shipmode/commitdate so Q12-style predicates are
# adapted to available columns)
# ---------------------------------------------------------------------------

@query(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
    SELECT n.n_name AS nation_name,
           {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
                   AND c.c_nationkey = s.s_nationkey
    JOIN nation n   ON s.s_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    WHERE r.r_name IN ('ASIA', 'EUROPE')
      AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o.o_orderdate <  TIMESTAMP '1999-01-01 00:00:00'
    GROUP BY n.n_name
    """,
)
def tpch_q5_local_supplier_volume(spark, sf_dir):
    """TPC-H Q5 shape: 6-table join where customer and supplier must
    share a nation — the join-order stress test. Catalyst reorders;
    nation/region broadcast."""
    t = load_tables(spark, sf_dir,
                    "customer", "orders", "lineitem", "supplier",
                    "nation", "region")
    return (
        t["customer"].alias("c")
        .join(t["orders"].alias("o"), F.expr("c.c_custkey = o.o_custkey"))
        .join(t["lineitem"].alias("l"), F.expr("o.o_orderkey = l.l_orderkey"))
        .join(t["supplier"].alias("s"),
              F.expr("l.l_suppkey = s.s_suppkey AND c.c_nationkey = s.s_nationkey"))
        .join(F.broadcast(t["nation"].alias("n")),
              F.expr("s.s_nationkey = n.n_nationkey"))
        .join(F.broadcast(t["region"].alias("r")),
              F.expr("n.n_regionkey = r.r_regionkey"))
        .where("r.r_name IN ('ASIA', 'EUROPE')"
               " AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
               " AND o.o_orderdate < TIMESTAMP '1999-01-01 00:00:00'")
        .groupBy(F.expr("n.n_name").alias("nation_name"))
        .agg(F.expr(dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")))
    )


@query(
    "tpch_q6_forecast_revenue",
    oracle=f"""
    SELECT {dsum('l_extendedprice * l_discount', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 25
    """,
)
def tpch_q6_forecast_revenue(spark, sf_dir):
    """TPC-H Q6 shape: pure scan-filter-aggregate; every predicate must
    reach the parquet scan (PushedFilters)."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .where("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
               " AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'"
               " AND l_discount BETWEEN 0.03 AND 0.07 AND l_quantity < 25")
        .agg(
            F.expr(dsum("l_extendedprice * l_discount", "revenue")),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_lines"),
        )
    )


@query(
    "tpch_q10_returned_items",
    oracle=f"""
    SELECT c.c_custkey AS customer_id, c.c_name AS customer_name,
           n.n_name AS nation_name,
           {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY revenue DESC, customer_id
    LIMIT 20
    """,
)
def tpch_q10_returned_items(spark, sf_dir):
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem", "nation")
    return (
        t["customer"].alias("c")
        .join(t["orders"].alias("o"), F.expr("c.c_custkey = o.o_custkey"))
        .join(t["lineitem"].alias("l"),
              F.expr("o.o_orderkey = l.l_orderkey"))
        .join(F.broadcast(t["nation"].alias("n")),
              F.expr("c.c_nationkey = n.n_nationkey"))
        .where("l.l_returnflag = 'R'")
        .groupBy(
            F.expr("c.c_custkey").alias("customer_id"),
            F.expr("c.c_name").alias("customer_name"),
            F.expr("n.n_name").alias("nation_name"),
        )
        .agg(F.expr(dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")))
        .orderBy(F.col("revenue").desc(), F.col("customer_id"))
        .limit(20)
    )


@query(
    "tpch_q14_promo_revenue_share",
    oracle="""
    SELECT CAST(
             100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'
                 THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))
                 ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
             / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                 AS DECIMAL(18,4))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-07-01 00:00:00'
    """,
)
def tpch_q14_promo_revenue_share(spark, sf_dir):
    t = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"].alias("l")
        .where("l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'"
               " AND l_shipdate < TIMESTAMP '1997-07-01 00:00:00'")
        .join(F.broadcast(t["part"].alias("p")),
              F.expr("l.l_partkey = p.p_partkey"))
        .agg(F.expr(
            "CAST(100.0 * CAST(SUM(CASE WHEN p.p_type = 'ECONOMY'"
            " THEN CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(18,4))"
            " ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
            " / CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)"
            " AS DECIMAL(18,4))) AS DOUBLE) AS DOUBLE)"
        ).alias("promo_revenue_pct"))
    )


@query(
    "tpch_q18_large_orders",
    oracle=f"""
    SELECT c.c_custkey AS customer_id, o.o_orderkey AS order_key,
           {dsum('l.l_quantity', 'total_qty')}
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY c.c_custkey, o.o_orderkey
    HAVING SUM(CAST(l.l_quantity AS DECIMAL(18,4))) > 250
    """,
)
def tpch_q18_large_orders(spark, sf_dir):
    """TPC-H Q18 shape: group-having over the fact table (HAVING =
    post-aggregation filter, Catalyst folds it into the agg)."""
    t = load_tables(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        t["customer"].alias("c")
        .join(t["orders"].alias("o"), F.expr("c.c_custkey = o.o_custkey"))
        .join(t["lineitem"].alias("l"), F.expr("o.o_orderkey = l.l_orderkey"))
        .groupBy(
            F.expr("c.c_custkey").alias("customer_id"),
            F.expr("o.o_orderkey").alias("order_key"),
        )
        .agg(F.expr(dsum("l.l_quantity", "total_qty")))
        .where("total_qty > 250")
    )


@query(
    "agg_boolean_functions",
    oracle="""
    SELECT c_mktsegment,
           CAST(count_if(c_acctbal < 0) AS BIGINT) AS n_overdrawn,
           bool_and(c_acctbal > -1000.0) AS all_above_neg1k,
           bool_or(c_acctbal > 9000.0) AS any_above_9k,
           CAST(max(CASE WHEN c_acctbal < 0 THEN c_custkey END) AS BIGINT)
             AS max_overdrawn_key
    FROM customer
    GROUP BY c_mktsegment
    """,
)
def agg_boolean_functions(spark, sf_dir):
    return (
        read_table(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.expr("CAST(count_if(c_acctbal < 0) AS BIGINT)").alias("n_overdrawn"),
            F.expr("bool_and(c_acctbal > -1000.0D)").alias("all_above_neg1k"),
            F.expr("bool_or(c_acctbal > 9000.0D)").alias("any_above_9k"),
            F.expr("CAST(max(CASE WHEN c_acctbal < 0 THEN c_custkey END) AS BIGINT)")
            .alias("max_overdrawn_key"),
        )
    )


@query(
    "tpch_q7_volume_shipping",
    oracle=f"""
    SELECT supp_nation, cust_nation, l_year,
           {dsum('volume', 'revenue')}
    FROM (
      SELECT n1.n_name AS supp_nation,
             n2.n_name AS cust_nation,
             CAST(year(l.l_shipdate) AS INT) AS l_year,
             l.l_extendedprice * (1 - l.l_discount) AS volume
      FROM supplier s
      JOIN lineitem l ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
)
def tpch_q7_volume_shipping(spark, sf_dir):
    """TPC-H Q7 shape: the same dimension (nation) joined in two roles
    with a symmetric pair predicate — exercises alias handling and
    OR-connected join-derived filters."""
    t = load_tables(spark, sf_dir,
                    "supplier", "lineitem", "orders", "customer", "nation")
    n1 = t["nation"].alias("n1")
    n2 = t["nation"].alias("n2")
    return (
        t["supplier"].alias("s")
        .join(t["lineitem"].alias("l"), F.expr("s.s_suppkey = l.l_suppkey"))
        .join(t["orders"].alias("o"), F.expr("o.o_orderkey = l.l_orderkey"))
        .join(t["customer"].alias("c"), F.expr("c.c_custkey = o.o_custkey"))
        .join(F.broadcast(n1), F.expr("s.s_nationkey = n1.n_nationkey"))
        .join(F.broadcast(n2), F.expr("c.c_nationkey = n2.n_nationkey"))
        .where("(n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')"
               " OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')")
        .groupBy(
            F.expr("n1.n_name").alias("supp_nation"),
            F.expr("n2.n_name").alias("cust_nation"),
            F.expr("CAST(year(l.l_shipdate) AS INT)").alias("l_year"),
        )
        .agg(F.expr(dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")))
    )


@query(
    "tpch_q19_disjunctive_predicates",
    oracle=f"""
    SELECT {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')},
           CAST(COUNT(*) AS BIGINT) AS n_lines
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity >= 1 AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30
           AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_type = 'ECONOMY' AND p.p_size BETWEEN 5 AND 25
           AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
)
def tpch_q19_disjunctive_predicates(spark, sf_dir):
    """TPC-H Q19 shape: OR-of-AND predicate blocks spanning both join
    sides — Catalyst pushes the common sub-predicates to each scan and
    evaluates the residual disjunction post-join."""
    t = load_tables(spark, sf_dir, "lineitem", "part")
    return (
        t["lineitem"].alias("l")
        .join(F.broadcast(t["part"].alias("p")),
              F.expr("p.p_partkey = l.l_partkey"))
        .where("(p.p_brand = 'Brand#1' AND p.p_size BETWEEN 1 AND 15"
               " AND l.l_quantity >= 1 AND l.l_quantity <= 30)"
               " OR (p.p_brand = 'Brand#2' AND p.p_size BETWEEN 10 AND 30"
               " AND l.l_quantity >= 10 AND l.l_quantity <= 40)"
               " OR (p.p_type = 'ECONOMY' AND p.p_size BETWEEN 5 AND 25"
               " AND l.l_quantity >= 20 AND l.l_quantity <= 50)")
        .agg(
            F.expr(dsum("l.l_extendedprice * (1 - l.l_discount)", "revenue")),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# Subquery family: correlated EXISTS, NOT IN (null-aware anti),
# scalar subquery, correlated scalar subquery (Catalyst decorrelation)
# ---------------------------------------------------------------------------

@query(
    "subquery_exists_late_ship",
    oracle="""
    SELECT o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY o_orderpriority
    """,
)
def subquery_exists_late_ship(spark, sf_dir):
    """TPC-H Q4 shape: correlated EXISTS -> Catalyst rewrites to a
    left-semi join on the correlation key."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    return spark.sql("""
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders o
        WHERE EXISTS (SELECT 1 FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        GROUP BY o_orderpriority
    """)


@query(
    "subquery_not_in_pending",
    oracle="""
    SELECT c_mktsegment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer
    WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                            WHERE o_orderstatus = 'P')
    GROUP BY c_mktsegment
    """,
)
def subquery_not_in_pending(spark, sf_dir):
    """NOT IN subquery -> null-aware anti join (distinct from plain
    left_anti: one NULL in the subquery empties the result)."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView("customer")
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT c_mktsegment,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM customer
        WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                WHERE o_orderstatus = 'P')
        GROUP BY c_mktsegment
    """)


_AVG_PRICE = ("(SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))"
              " AS DOUBLE) / COUNT(*) AS DOUBLE) FROM orders)")


@query(
    "subquery_scalar_above_global_avg",
    oracle=f"""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_above_avg
    FROM orders
    WHERE o_totalprice > {_AVG_PRICE}
    GROUP BY o_orderstatus
    """,
)
def subquery_scalar_above_global_avg(spark, sf_dir):
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(f"""
        SELECT o_orderstatus,
               CAST(COUNT(*) AS BIGINT) AS n_above_avg
        FROM orders
        WHERE o_totalprice > {_AVG_PRICE}
        GROUP BY o_orderstatus
    """)


@query(
    "subquery_correlated_above_own_avg",
    oracle="""
    SELECT o1.o_custkey AS customer_id,
           CAST(COUNT(*) AS BIGINT) AS n_above_own_avg
    FROM orders o1
    WHERE o1.o_totalprice >
          (SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
                  AS DOUBLE) / COUNT(*) AS DOUBLE)
           FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
    GROUP BY o1.o_custkey
    """,
)
def subquery_correlated_above_own_avg(spark, sf_dir):
    """Correlated scalar subquery -> Catalyst decorrelates into an
    aggregate joined back on the correlation key (one shuffle, not a
    per-row subquery)."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o1.o_custkey AS customer_id,
               CAST(COUNT(*) AS BIGINT) AS n_above_own_avg
        FROM orders o1
        WHERE o1.o_totalprice >
              (SELECT CAST(CAST(SUM(CAST(o2.o_totalprice AS DECIMAL(18,4)))
                      AS DOUBLE) / COUNT(*) AS DOUBLE)
               FROM orders o2 WHERE o2.o_custkey = o1.o_custkey)
        GROUP BY o1.o_custkey
    """)


@query(
    "tpch_q13_customer_distribution",
    oracle="""
    SELECT n_orders,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM (
      SELECT c.c_custkey,
             CAST(COUNT(o.o_orderkey) AS BIGINT) AS n_orders
      FROM customer c
      LEFT JOIN orders o ON c.c_custkey = o.o_custkey
                        AND o.o_orderpriority <> '5-LOW'
      GROUP BY c.c_custkey
    ) dist
    GROUP BY n_orders
    """,
)
def tpch_q13_customer_distribution(spark, sf_dir):
    """TPC-H Q13 shape: two-level aggregation — per-customer order
    counts (left join keeps zero-order customers), then a histogram of
    those counts. Second agg shuffles only (count, 1) pairs."""
    t = load_tables(spark, sf_dir, "customer", "orders")
    filtered = t["orders"].where("o_orderpriority <> '5-LOW'")
    per_customer = (
        t["customer"].join(
            filtered, t["customer"].c_custkey == filtered.o_custkey, "left")
        .groupBy(t["customer"].c_custkey)
        .agg(F.expr("CAST(COUNT(o_orderkey) AS BIGINT)").alias("n_orders"))
    )
    return per_customer.groupBy("n_orders").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"))


@query(
    "tpch_q15_top_supplier",
    oracle="""
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                 AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
      GROUP BY l_suppkey)
    SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name,
           r.total_revenue
    FROM supplier s
    JOIN revenue r ON s.s_suppkey = r.supplier_no
    WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
)
def tpch_q15_top_supplier(spark, sf_dir):
    """TPC-H Q15 shape: CTE reused twice (revenue + its max) — Spark
    evaluates the scalar-subquery max and filters; exact decimal sums
    make the max comparison deterministic."""
    read_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem")
    read_table(spark, sf_dir, "supplier").createOrReplaceTempView("supplier")
    return spark.sql("""
        WITH revenue AS (
          SELECT l_suppkey AS supplier_no,
                 CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
          FROM lineitem
          WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
            AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
          GROUP BY l_suppkey)
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name,
               r.total_revenue
        FROM supplier s
        JOIN revenue r ON s.s_suppkey = r.supplier_no
        WHERE r.total_revenue = (SELECT max(total_revenue) FROM revenue)
    """)


@query(
    "agg_approx_percentiles",
    oracle="""
    SELECT o_orderstatus AS order_status,
           round(quantile_cont(o_totalprice::DOUBLE, 0.25), 4) AS p25,
           round(quantile_cont(o_totalprice::DOUBLE, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice::DOUBLE, 0.75), 4) AS p75,
           TRUE AS estimate_ok
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def agg_approx_percentiles(spark, sf_dir):
    """Quantile sketch as a *checked* bounded-error contract. The exact
    interpolated quartiles are verified value-for-value against
    DuckDB's quantile_cont; ``estimate_ok`` asserts each
    approx_percentile(accuracy=1000) output lands within a ±5% *rank*
    window of truth (the sketch's guarantee is rank error <= 1/accuracy,
    so 5% is generous headroom — flipping to false fails the hash)."""
    probes = "array(0.25D, 0.5D, 0.75D)"
    lo = "array(0.20D, 0.45D, 0.70D)"
    hi = "array(0.30D, 0.55D, 0.80D)"
    val = "CAST(o_totalprice AS DOUBLE)"
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy("o_orderstatus")
        .agg(
            F.expr(f"percentile({val}, {probes})").alias("ex"),
            F.expr(f"percentile({val}, {lo})").alias("lo"),
            F.expr(f"percentile({val}, {hi})").alias("hi"),
            F.expr(f"approx_percentile({val}, {probes}, 1000)").alias("ap"),
        )
        .select(
            F.col("o_orderstatus").alias("order_status"),
            F.expr("round(ex[0], 4)").alias("p25"),
            F.expr("round(ex[1], 4)").alias("p50"),
            F.expr("round(ex[2], 4)").alias("p75"),
            F.expr(
                "ap[0] BETWEEN lo[0] AND hi[0]"
                " AND ap[1] BETWEEN lo[1] AND hi[1]"
                " AND ap[2] BETWEEN lo[2] AND hi[2]"
            ).alias("estimate_ok"),
        )
    )

@query(
    "window_value_functions",
    oracle="""
    SELECT o_orderkey AS order_key,
           CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest_key,
           CAST(last_value(o_orderkey) OVER w AS BIGINT) AS priciest_key,
           CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_key,
           round(cume_dist() OVER
             (PARTITION BY o_orderstatus
              ORDER BY o_totalprice, o_orderkey), 6) AS price_cume_dist
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus
                 ORDER BY o_totalprice, o_orderkey
                 ROWS BETWEEN UNBOUNDED PRECEDING
                          AND UNBOUNDED FOLLOWING)
    """,
)
def window_value_functions(spark, sf_dir):
    """Value-picking window functions (first/last/nth) over an explicit
    full-partition frame plus cume_dist — completes W1 breadth next to
    the ranking/frame/lag coverage."""
    read_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql("""
        SELECT o_orderkey AS order_key,
               CAST(first_value(o_orderkey) OVER w AS BIGINT) AS cheapest_key,
               CAST(last_value(o_orderkey) OVER w AS BIGINT) AS priciest_key,
               CAST(nth_value(o_orderkey, 2) OVER w AS BIGINT) AS second_key,
               round(cume_dist() OVER
                 (PARTITION BY o_orderstatus
                  ORDER BY o_totalprice, o_orderkey), 6) AS price_cume_dist
        FROM orders
        WINDOW w AS (PARTITION BY o_orderstatus
                     ORDER BY o_totalprice, o_orderkey
                     ROWS BETWEEN UNBOUNDED PRECEDING
                              AND UNBOUNDED FOLLOWING)
    """)


@query(
    "window_ntile_quartiles",
    oracle="""
    WITH n AS (SELECT c_nationkey,
                      CAST(COUNT(*) AS BIGINT) AS n_customers,
                      CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE)
                        AS total_bal
               FROM customer GROUP BY c_nationkey)
    SELECT c_nationkey AS nation_key, n_customers,
           round(total_bal, 4) AS total_bal,
           CAST(ntile(4) OVER
             (ORDER BY total_bal DESC, c_nationkey) AS BIGINT)
             AS balance_quartile,
           round(percent_rank() OVER
             (ORDER BY total_bal DESC, c_nationkey), 6) AS balance_prank
    FROM n
    """,
)
def window_ntile_quartiles(spark, sf_dir):
    """ntile + percent_rank over a PRE-AGGREGATED input — the W1
    distribution functions completed with the aggregate-before-window
    discipline: customers collapse to one row per nation in a
    map-side-combined shuffle, and the unpartitioned ordered window
    (unavoidable for a global quartile) runs over |nations| rows, not
    the corpus."""
    read_table(spark, sf_dir, "customer").createOrReplaceTempView(
        "customer")
    return spark.sql("""
        WITH n AS (SELECT c_nationkey,
                          CAST(COUNT(*) AS BIGINT) AS n_customers,
                          CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4)))
                               AS DOUBLE) AS total_bal
                   FROM customer GROUP BY c_nationkey)
        SELECT c_nationkey AS nation_key, n_customers,
               round(total_bal, 4) AS total_bal,
               CAST(ntile(4) OVER
                 (ORDER BY total_bal DESC, c_nationkey) AS BIGINT)
                 AS balance_quartile,
               round(percent_rank() OVER
                 (ORDER BY total_bal DESC, c_nationkey), 6)
                 AS balance_prank
        FROM n
    """)


@query(
    "agg_price_histogram",
    oracle="""
    SELECT CAST(floor(o_totalprice / 25000.0) AS BIGINT) AS price_bin,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE),
                 4) AS bin_revenue
    FROM orders
    GROUP BY 1
    """,
)
def agg_price_histogram(spark, sf_dir):
    """Fixed-width histogram binning (bin = floor(x / width)) — the
    dashboard/distribution primitive. Pure map-side bin derivation + a
    |bins|-row shuffle with partial aggregation; exact-decimal revenue
    per bin. At any scale the shuffle carries one row per bin per
    partition."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.expr("CAST(floor(o_totalprice / 25000.0) AS BIGINT)")
                 .alias("price_bin"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
            F.expr("round(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4)))"
                   " AS DOUBLE), 4)").alias("bin_revenue"),
        )
    )


@query(
    "scalar_bitwise_functions",
    oracle="""
    SELECT o_orderkey AS order_key,
           CAST(o_orderkey & 255 AS BIGINT) AS low_byte,
           CAST(o_orderkey | 4096 AS BIGINT) AS with_flag,
           CAST(xor(o_orderkey, o_custkey) AS BIGINT) AS key_xor,
           CAST(o_orderkey << 2 AS BIGINT) AS shifted_left,
           CAST(o_orderkey >> 3 AS BIGINT) AS shifted_right,
           CAST(bit_count(o_orderkey) AS BIGINT) AS key_popcount
    FROM orders
    WHERE o_orderkey <= 1000
    """,
)
def scalar_bitwise_functions(spark, sf_dir):
    """Bitwise scalar family (F1 breadth): and/or/xor/shifts/popcount —
    the primitives behind bitmap flags, hash mixing, and the SimHash /
    pigeonhole operators elsewhere in the catalog. Map-only with the
    key filter pushed into the scan."""
    return read_table(spark, sf_dir, "orders").where(
        "o_orderkey <= 1000").selectExpr(
        "o_orderkey AS order_key",
        "CAST(o_orderkey & 255 AS BIGINT) AS low_byte",
        "CAST(o_orderkey | 4096 AS BIGINT) AS with_flag",
        "CAST(o_orderkey ^ o_custkey AS BIGINT) AS key_xor",
        "CAST(shiftleft(o_orderkey, 2) AS BIGINT) AS shifted_left",
        "CAST(shiftright(o_orderkey, 3) AS BIGINT) AS shifted_right",
        "CAST(bit_count(o_orderkey) AS BIGINT) AS key_popcount",
    )


@query(
    "events_user_lifecycle",
    oracle="""
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(count(DISTINCT CAST(date_trunc('day', ts) AS DATE))
                AS BIGINT) AS active_days,
           CAST(date_diff('day',
                          CAST(date_trunc('day', min(ts)) AS DATE),
                          CAST(date_trunc('day', max(ts)) AS DATE))
                AS BIGINT) AS lifespan_days,
           CAST(count(*) FILTER (WHERE event_type = 'purchase')
                AS BIGINT) AS n_purchases
    FROM events
    GROUP BY user_id
    """,
)
def events_user_lifecycle(spark, sf_dir):
    """Per-user lifecycle rollup: volume, distinct active days,
    first-to-last lifespan, purchase count — the standard activation
    table feeding retention/LTV work. ONE shuffle on the
    high-cardinality user_id (no skew), count-distinct expanded by
    Catalyst into the same keyed aggregation, conditional counts via
    FILTER. Day-level integers only (no raw timestamps cross the
    result, per the dtype-parity convention)."""
    events = read_table(spark, sf_dir, "events")
    return (
        events.groupBy("user_id")
        .agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_events"),
            F.expr("CAST(count(DISTINCT CAST(date_trunc('DAY', ts) AS DATE))"
                   " AS BIGINT)").alias("active_days"),
            F.expr("CAST(datediff(CAST(date_trunc('DAY', max(ts)) AS DATE),"
                   " CAST(date_trunc('DAY', min(ts)) AS DATE)) AS BIGINT)")
            .alias("lifespan_days"),
            F.expr("CAST(count(*) FILTER (WHERE event_type = 'purchase')"
                   " AS BIGINT)").alias("n_purchases"),
        )
    )


# Exact integerization of the 2-decimal doubles (floor(x*100 + 0.5) —
# the repo-standard half-up both engines implement with floor); corr
# is scale-invariant so the x100 factors cancel. Products stay within
# BIGINT (<= ~5e10/row); the sums accumulate as DECIMAL(38,0) so no
# row count can overflow them.
_CORR_XI = "CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)"
_CORR_YI = "CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)"


def _corr_sql() -> str:
    n = "COUNT(*)"
    d38 = "DECIMAL(38,0)"
    sx = f"CAST(SUM(CAST({_CORR_XI} AS {d38})) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({_CORR_YI} AS {d38})) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({_CORR_XI} * {_CORR_XI} AS {d38})) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({_CORR_YI} * {_CORR_YI} AS {d38})) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({_CORR_XI} * {_CORR_YI} AS {d38})) AS DOUBLE)"
    return (
        f"round(({n} * {sxy} - {sx} * {sy})"
        f" / (sqrt({n} * {sxx} - {sx} * {sx})"
        f" * sqrt({n} * {syy} - {sy} * {sy})), 6)"
    )


@query(
    "agg_corr_quantity_price",
    oracle=f"""
    SELECT l_linestatus AS line_status,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {_corr_sql()} AS corr_qty_price
    FROM lineitem
    GROUP BY l_linestatus
    """,
)
def agg_corr_quantity_price(spark, sf_dir):
    """Pearson correlation decomposed into exact integer moments
    (n, Σx, Σy, Σx², Σy², Σxy over micro-integerized values) instead
    of the builtin corr(): the builtin accumulates doubles in
    partition order, so its last bits drift with partitioning and can
    never hash-match a serial oracle; the integer moments are exact
    and order-free (DECIMAL(38,0) accumulators — unoverflowable at any
    row count), the final double arithmetic is identical on both
    engines, and the aggregation is still one map-side-combined
    shuffle of 6 numbers per group."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_linestatus").alias("line_status"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
            F.expr(_corr_sql()).alias("corr_qty_price"),
        )
    )


def _regr_sql() -> dict:
    """Least-squares y~x stats from the same exact integer moments as
    _corr_sql (order-free DECIMAL(38,0) sums; final double arithmetic
    identical on both engines). Slope/intercept are in ORIGINAL units:
    both variables are micro-integerized by the same factor (100), so
    the factor cancels in the slope and divides out of the intercept."""
    n = "COUNT(*)"
    d38 = "DECIMAL(38,0)"
    sx = f"CAST(SUM(CAST({_CORR_XI} AS {d38})) AS DOUBLE)"
    sy = f"CAST(SUM(CAST({_CORR_YI} AS {d38})) AS DOUBLE)"
    sxx = f"CAST(SUM(CAST({_CORR_XI} * {_CORR_XI} AS {d38})) AS DOUBLE)"
    syy = f"CAST(SUM(CAST({_CORR_YI} * {_CORR_YI} AS {d38})) AS DOUBLE)"
    sxy = f"CAST(SUM(CAST({_CORR_XI} * {_CORR_YI} AS {d38})) AS DOUBLE)"
    slope = f"(({n} * {sxy} - {sx} * {sy}) / ({n} * {sxx} - {sx} * {sx}))"
    intercept = f"(({sy} - {slope} * {sx}) / {n} / 100.0)"
    r2 = (f"(({n} * {sxy} - {sx} * {sy}) * ({n} * {sxy} - {sx} * {sy})"
          f" / (({n} * {sxx} - {sx} * {sx}) * ({n} * {syy} - {sy} * {sy})))")
    return {
        "slope": f"round({slope}, 6)",
        "intercept": f"round({intercept}, 6)",
        "r2": f"round({r2}, 6)",
    }


_REGR = _regr_sql()


@query(
    "agg_regression_stats",
    oracle=f"""
    SELECT l_returnflag AS return_flag,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {_REGR["slope"]} AS slope_price_per_qty,
           {_REGR["intercept"]} AS intercept_price,
           {_REGR["r2"]} AS r_squared
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def agg_regression_stats(spark, sf_dir):
    """Per-group simple linear regression (extendedprice ~ quantity):
    slope, intercept, R² — the regr_slope/regr_intercept/regr_r2
    family, decomposed into the same exact integer moments as
    agg_corr_quantity_price so the result is order-free and
    hash-matchable (builtin regr_* accumulate doubles in partition
    order). One map-side-combined shuffle of 6 numbers per group at
    any scale."""
    return (
        read_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_returnflag").alias("return_flag"))
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
            F.expr(_REGR["slope"]).alias("slope_price_per_qty"),
            F.expr(_REGR["intercept"]).alias("intercept_price"),
            F.expr(_REGR["r2"]).alias("r_squared"),
        )
    )


@query(
    "unpivot_part_metrics",
    oracle="""
    SELECT p_partkey AS part_id, 'retail_price' AS metric,
           p_retailprice AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'size', CAST(p_size AS DOUBLE) FROM part
    """,
)
def unpivot_part_metrics(spark, sf_dir):
    """Wide-to-long unpivot via the stack() table-generating expression
    (Spark's UNPIVOT kernel); the oracle states the same relation as a
    UNION ALL. Map-only: no shuffle at any scale."""
    return read_table(spark, sf_dir, "part").selectExpr(
        "p_partkey AS part_id",
        "stack(2, 'retail_price', p_retailprice,"
        " 'size', CAST(p_size AS DOUBLE)) AS (metric, value)",
    )

@query(
    "scalar_struct_map_functions",
    oracle="""
    SELECT c_custkey AS customer_id,
           struct_pack(seg := c_mktsegment, bal := c_acctbal).seg
             AS seg_from_struct,
           map_extract(map(['seg', 'name'], [c_mktsegment, c_name]),
                       'name')[1] AS name_from_map,
           CAST(cardinality(map(['seg', 'name'], [c_mktsegment, c_name]))
                AS BIGINT) AS map_size,
           array_to_string(map_keys(map(['seg', 'name'],
                                        [c_mktsegment, c_name])), ',')
             AS keys_csv
    FROM customer
    """,
)
def scalar_struct_map_functions(spark, sf_dir):
    """Complex-type construction and field access (named_struct / map /
    element_at / map_keys), surfaced back as scalars so the value hash
    is engine-portable. All JVM built-ins — codegen-friendly."""
    return read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey AS customer_id",
        "named_struct('seg', c_mktsegment, 'bal', c_acctbal).seg"
        " AS seg_from_struct",
        "element_at(map('seg', c_mktsegment, 'name', c_name), 'name')"
        " AS name_from_map",
        "CAST(size(map('seg', c_mktsegment, 'name', c_name)) AS BIGINT)"
        " AS map_size",
        "array_join(map_keys(map('seg', c_mktsegment, 'name', c_name)), ',')"
        " AS keys_csv",
    )
