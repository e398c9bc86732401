"""Remaining TPC-H-adapted shapes (Q2, Q8, Q9, Q11, Q12, Q16, Q17, Q20,
Q21, Q22), completing the 22-query suite alongside the shapes already in
``queries.relational`` (Q1/Q3/Q4/Q5/Q6/Q7/Q10/Q13/Q14/Q15/Q18/Q19).

The testdata star schema (TESTDATA.md) has no ``partsupp`` and lineitem
carries no shipmode/commitdate/receiptdate, so the shapes are adapted:
- part↔supplier association = DISTINCT (l_partkey, l_suppkey) pairs
  from lineitem (the Q2/Q16/Q20 partsupp stand-in);
- "late" = l_shipdate > o_orderdate + fixed interval (Q12/Q21);
- customer country code = c_nationkey (Q22).
Each adaptation preserves the plan shape the original exercises
(correlated min, share-of-total ratio, HAVING vs scalar subquery,
multi-EXISTS, null-aware NOT IN, anti-join + scalar avg), which is what
the engine/optimizer coverage is for.

Exactness conventions per queries.registry.query: decimal-cast sums,
INT-cast year(), identical aliases both sides.  Where the query is a
correlated-subquery shape we run the SAME SQL text on Spark and DuckDB
(one source of truth); API-expressible shapes use the DataFrame API so
the catalog also exercises that surface.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.queries.relational import dsum
from oracle_cassandra_migrator_spark.sources.testdata import load_tables, read_table


def _views(spark, sf_dir, *names):
    for n in names:
        read_table(spark, sf_dir, n).createOrReplaceTempView(n)


# ---------------------------------------------------------------------------
# Q2: min-cost supplier — correlated MIN over a reused join (CTE twice).
# partsupp stand-in: distinct (l_partkey, l_suppkey) pairs.
# ---------------------------------------------------------------------------

_Q2_SQL = """
    WITH link AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
    eligible AS (
      SELECT p.p_partkey, p.p_name, s.s_suppkey, s.s_name, s.s_acctbal,
             n.n_name
      FROM part p
      JOIN link  ON p.p_partkey = link.l_partkey
      JOIN supplier s ON s.s_suppkey = link.l_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      JOIN region r   ON n.n_regionkey = r.r_regionkey
      WHERE p.p_size = 15 AND p.p_type = 'STANDARD' AND r.r_name = 'EUROPE')
    SELECT e.p_partkey AS part_id, e.p_name AS part_name,
           e.s_suppkey AS supplier_id, e.s_name AS supplier_name,
           e.s_acctbal AS supplier_acctbal, e.n_name AS supplier_nation
    FROM eligible e
    WHERE e.s_acctbal = (SELECT min(e2.s_acctbal) FROM eligible e2
                         WHERE e2.p_partkey = e.p_partkey)
"""


@query("tpch_q2_min_cost_supplier", oracle=_Q2_SQL)
def tpch_q2_min_cost_supplier(spark, sf_dir):
    """TPC-H Q2 shape: a five-way join reused twice via CTE with a
    correlated MIN subquery — Catalyst decorrelates to an aggregate
    joined back on p_partkey. s_acctbal is compared raw (no arithmetic)
    so double equality is engine-portable."""
    _views(spark, sf_dir, "lineitem", "part", "supplier", "nation", "region")
    return spark.sql(_Q2_SQL)


# ---------------------------------------------------------------------------
# Q8: national market share — ratio of conditional to total volume by year.
# ---------------------------------------------------------------------------

@query(
    "tpch_q8_market_share",
    oracle="""
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'
                    THEN vol_dec ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
              / CAST(SUM(vol_dec) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o.o_orderdate) AS INT) AS o_year,
             CAST(l.l_extendedprice * (1 - l.l_discount)
                  AS DECIMAL(18,4)) AS vol_dec,
             n1.n_name AS supp_nation
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
      JOIN region r   ON n2.n_regionkey = r.r_regionkey
      JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
      WHERE r.r_name = 'ASIA' AND p.p_type = 'PROMO'
        AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) all_nations
    GROUP BY o_year
    """,
)
def tpch_q8_market_share(spark, sf_dir):
    """TPC-H Q8 shape: 8-relation join (nation in two roles) feeding a
    conditional-share ratio.  Both sums accumulate exactly in decimal;
    the final division is the same IEEE op on both engines.  nation and
    region are broadcast — at 100 TB only lineitem/orders are big."""
    t = load_tables(spark, sf_dir, "part", "lineitem", "supplier", "orders",
                    "customer", "nation", "region")
    joined = (
        t["part"].alias("p")
        .join(t["lineitem"].alias("l"), F.expr("p.p_partkey = l.l_partkey"))
        .join(t["supplier"].alias("s"), F.expr("s.s_suppkey = l.l_suppkey"))
        .join(t["orders"].alias("o"), F.expr("o.o_orderkey = l.l_orderkey"))
        .join(t["customer"].alias("c"), F.expr("o.o_custkey = c.c_custkey"))
        .join(F.broadcast(t["nation"].alias("n2")),
              F.expr("c.c_nationkey = n2.n_nationkey"))
        .join(F.broadcast(t["region"].alias("r")),
              F.expr("n2.n_regionkey = r.r_regionkey"))
        .join(F.broadcast(t["nation"].alias("n1")),
              F.expr("s.s_nationkey = n1.n_nationkey"))
        .where("r.r_name = 'ASIA' AND p.p_type = 'PROMO'"
               " AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'"
               " AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'")
        .select(
            F.expr("CAST(year(o.o_orderdate) AS INT)").alias("o_year"),
            F.expr("CAST(l.l_extendedprice * (1 - l.l_discount)"
                   " AS DECIMAL(18,4))").alias("vol_dec"),
            F.expr("n1.n_name").alias("supp_nation"),
        )
    )
    return joined.groupBy("o_year").agg(
        F.expr(
            "CAST(CAST(SUM(CASE WHEN supp_nation = 'NATION_2'"
            " THEN vol_dec ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)"
            " / CAST(SUM(vol_dec) AS DOUBLE) AS DOUBLE)"
        ).alias("mkt_share"))


# ---------------------------------------------------------------------------
# Q9: product-type profit by nation and year.  No ps_supplycost, so cost
# is proxied by p_retailprice * l_quantity — same expression shape.
# ---------------------------------------------------------------------------

@query(
    "tpch_q9_product_profit",
    oracle=f"""
    SELECT nation, o_year, {dsum('amount', 'sum_profit')}
    FROM (
      SELECT n.n_name AS nation,
             CAST(year(o.o_orderdate) AS INT) AS o_year,
             l.l_extendedprice * (1 - l.l_discount)
               - p.p_retailprice * l.l_quantity * 0.01 AS amount
      FROM part p
      JOIN lineitem l ON p.p_partkey = l.l_partkey
      JOIN supplier s ON s.s_suppkey = l.l_suppkey
      JOIN orders o   ON o.o_orderkey = l.l_orderkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE p.p_name LIKE '%widget%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def tpch_q9_product_profit(spark, sf_dir):
    """TPC-H Q9 shape: LIKE-filtered part scan driving a 5-way join and
    a two-key rollup of a mixed +/- expression.  The per-row double
    expression is identical on both engines; only the SUM goes through
    decimal."""
    t = load_tables(spark, sf_dir, "part", "lineitem", "supplier", "orders",
                    "nation")
    return (
        t["part"].alias("p").where("p_name LIKE '%widget%'")
        .join(t["lineitem"].alias("l"), F.expr("p.p_partkey = l.l_partkey"))
        .join(t["supplier"].alias("s"), F.expr("s.s_suppkey = l.l_suppkey"))
        .join(t["orders"].alias("o"), F.expr("o.o_orderkey = l.l_orderkey"))
        .join(F.broadcast(t["nation"].alias("n")),
              F.expr("s.s_nationkey = n.n_nationkey"))
        .groupBy(
            F.expr("n.n_name").alias("nation"),
            F.expr("CAST(year(o.o_orderdate) AS INT)").alias("o_year"),
        )
        .agg(F.expr(dsum(
            "l.l_extendedprice * (1 - l.l_discount)"
            " - p.p_retailprice * l.l_quantity * 0.01", "sum_profit")))
    )


# ---------------------------------------------------------------------------
# Q11: important values — HAVING against a scalar fraction of the total.
# ---------------------------------------------------------------------------

_Q11_SQL = """
    WITH v AS (
      SELECT l.l_partkey,
             SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS val
      FROM lineitem l
      JOIN supplier s ON l.l_suppkey = s.s_suppkey
      JOIN nation n   ON s.s_nationkey = n.n_nationkey
      WHERE n.n_name = 'NATION_3'
      GROUP BY l.l_partkey)
    SELECT l_partkey AS part_id, CAST(val AS DOUBLE) AS part_value
    FROM v
    WHERE CAST(val AS DOUBLE) >
          (SELECT CAST(SUM(val) AS DOUBLE) * 0.001 FROM v)
"""


@query("tpch_q11_important_values", oracle=_Q11_SQL)
def tpch_q11_important_values(spark, sf_dir):
    """TPC-H Q11 shape: grouped totals filtered against a scalar
    fraction of their own grand total (CTE used twice).  Both the group
    sums and the grand total are exact decimals, compared as doubles
    after identical casts."""
    _views(spark, sf_dir, "lineitem", "supplier", "nation")
    return spark.sql(_Q11_SQL)


# ---------------------------------------------------------------------------
# Q12: shipment-priority counts.  No shipmode/receiptdate: class =
# l_returnflag, "late" = shipped >90 days after order date.
# ---------------------------------------------------------------------------

@query(
    "tpch_q12_priority_shipment",
    oracle="""
    SELECT l.l_returnflag AS ship_class,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    WHERE l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY
      AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l.l_returnflag
    """,
)
def tpch_q12_priority_shipment(spark, sf_dir):
    """TPC-H Q12 shape: join-derived predicate (ship vs order date) plus
    complementary conditional counts.  The date filter is pushed to the
    lineitem scan; the cross-table inequality is a post-join residual."""
    t = load_tables(spark, sf_dir, "orders", "lineitem")
    return (
        t["orders"].alias("o")
        .join(t["lineitem"].alias("l"),
              F.expr("o.o_orderkey = l.l_orderkey"))
        .where("l.l_shipdate > o.o_orderdate + INTERVAL 90 DAY"
               " AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'"
               " AND l.l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'")
        .groupBy(F.expr("l.l_returnflag").alias("ship_class"))
        .agg(
            F.expr("CAST(SUM(CASE WHEN o.o_orderpriority IN"
                   " ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("high_line_count"),
            F.expr("CAST(SUM(CASE WHEN o.o_orderpriority IN"
                   " ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)")
            .alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# Q16: supplier breadth per part group, excluding flagged suppliers.
# ---------------------------------------------------------------------------

@query(
    "tpch_q16_supplier_breadth",
    oracle="""
    SELECT p.p_brand, p.p_type, p.p_size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM part p
    JOIN lineitem l ON p.p_partkey = l.l_partkey
    WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                              WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def tpch_q16_supplier_breadth(spark, sf_dir):
    """TPC-H Q16 shape: negated predicates + NOT IN exclusion subquery
    (null-aware anti join; s_suppkey is never null here so it plans as a
    broadcast anti) feeding COUNT(DISTINCT) per 3-key group."""
    _views(spark, sf_dir, "part", "lineitem", "supplier")
    return spark.sql("""
        SELECT p.p_brand, p.p_type, p.p_size,
               CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
        FROM part p
        JOIN lineitem l ON p.p_partkey = l.l_partkey
        WHERE p.p_brand <> 'Brand#5' AND p.p_type <> 'PROMO'
          AND p.p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
          AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                                  WHERE s_acctbal < 0)
        GROUP BY p.p_brand, p.p_type, p.p_size
    """)


# ---------------------------------------------------------------------------
# Q17: small-quantity revenue — correlated avg per part.
# ---------------------------------------------------------------------------

_Q17_SQL = """
    SELECT CAST(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4)))
                AS DOUBLE) / 7.0 AS DOUBLE) AS avg_yearly
    FROM lineitem l
    JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand = 'Brand#3' AND p.p_type = 'MEDIUM'
      AND l.l_quantity <
          (SELECT 0.2 * (CAST(SUM(CAST(l2.l_quantity AS DECIMAL(18,4)))
                         AS DOUBLE) / COUNT(*))
           FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey)
"""


@query("tpch_q17_small_quantity_revenue", oracle=_Q17_SQL)
def tpch_q17_small_quantity_revenue(spark, sf_dir):
    """TPC-H Q17 shape: correlated per-part average threshold.  Catalyst
    decorrelates the scalar subquery into an aggregate over lineitem
    joined back on l_partkey — one extra shuffle, not a per-row scan.
    The inner avg is a decimal-exact sum/count so the threshold is
    bit-identical across engines."""
    _views(spark, sf_dir, "lineitem", "part")
    return spark.sql(_Q17_SQL)


# ---------------------------------------------------------------------------
# Q20: suppliers shipping excess volume of selected parts.
# ---------------------------------------------------------------------------

@query(
    "tpch_q20_excess_shippers",
    oracle="""
    SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name
    FROM supplier s
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE n.n_name = 'NATION_1'
      AND s.s_suppkey IN (
        SELECT l.l_suppkey
        FROM lineitem l
        WHERE l.l_partkey IN (SELECT p_partkey FROM part
                              WHERE p_name LIKE 'large%')
          AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
          AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        GROUP BY l.l_suppkey
        HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
                    AS DOUBLE) > 400.0)
    """,
)
def tpch_q20_excess_shippers(spark, sf_dir):
    """TPC-H Q20 shape: nested IN subqueries (part filter inside a
    grouped-HAVING supplier filter) -> two stacked semi joins.  The
    quantity threshold sums in decimal so HAVING is engine-portable."""
    _views(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    return spark.sql("""
        SELECT s.s_suppkey AS supplier_id, s.s_name AS supplier_name
        FROM supplier s
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        WHERE n.n_name = 'NATION_1'
          AND s.s_suppkey IN (
            SELECT l.l_suppkey
            FROM lineitem l
            WHERE l.l_partkey IN (SELECT p_partkey FROM part
                                  WHERE p_name LIKE 'large%')
              AND l.l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
              AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
            GROUP BY l.l_suppkey
            HAVING CAST(SUM(CAST(l.l_quantity AS DECIMAL(18,4)))
                        AS DOUBLE) > 400.0)
    """)


# ---------------------------------------------------------------------------
# Q21: suppliers who kept multi-supplier orders waiting.
# "late" = shipped > 60 days after the order date.
# ---------------------------------------------------------------------------

_Q21_SQL = """
    SELECT s.s_name AS supplier_name,
           CAST(COUNT(*) AS BIGINT) AS numwait
    FROM supplier s
    JOIN lineitem l1 ON s.s_suppkey = l1.l_suppkey
    JOIN orders o    ON o.o_orderkey = l1.l_orderkey
    JOIN nation n    ON s.s_nationkey = n.n_nationkey
    WHERE o.o_orderstatus = 'F' AND n.n_name = 'NATION_2'
      AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_shipdate >
                            o.o_orderdate + INTERVAL 60 DAY)
    GROUP BY s.s_name
"""


def run_q21(spark, tables):
    """Q21 over caller-supplied frames (``{name: DataFrame}``): the
    seam that lets the SAME plan run against plain parquet or the
    bucketed layout (``sources/bucketed.py``).

    r12 restructure (optimization guide §2.4/§3.3): the literal
    EXISTS / NOT EXISTS translation scanned lineitem THREE times and
    built two lineitem-wide broadcasts (the l2 semi and l3 anti
    builds) — at sf0.1 that was 3 single-row-group scans plus two
    600k-row hash relations per run; at real scale it is three full
    passes over the biggest table. Both correlated subqueries only
    ask per-order questions, so one pass computes them with window
    aggregates over l_orderkey:

      EXISTS other-supplier        <=>  n_supp_in_order >= 2
      NOT EXISTS other-late-supp   <=>  n_late_supp = 1
                                        (given this row is late, the
                                        row's supplier IS the one)

    (collect_set sizes, bounded by suppliers-per-order). Lineitem is
    scanned ONCE and shuffled ONCE (the l_orderkey window — which the
    bucketed layout satisfies without an exchange), replacing the two
    broadcast builds. Output proven identical against the unchanged
    _Q21_SQL oracle at sf0.001/sf0.01, and pinned row-identical to
    the SQL form across both layouts by the bucketing pytests."""
    li, o = tables["lineitem"], tables["orders"]
    s, n = tables["supplier"], tables["nation"]
    lo = (
        li.select("l_orderkey", "l_suppkey", "l_shipdate")
        .join(o.where("o_orderstatus = 'F'")
               .select("o_orderkey", "o_orderdate"),
              F.expr("o_orderkey = l_orderkey"))
        .withColumn("late", F.expr(
            "l_shipdate > o_orderdate + INTERVAL 60 DAY")))
    w = Window.partitionBy("l_orderkey")
    stats = lo.select(
        "l_suppkey", "late",
        F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
        F.size(F.collect_set(
            F.expr("CASE WHEN late THEN l_suppkey END")).over(w))
        .alias("n_late"))
    qual = stats.where("late AND n_supp >= 2 AND n_late = 1")
    # no static broadcast hint on nation (the r7 let-AQE-decide rule):
    # a 25-row dimension broadcasts by size estimate at any SF, so the
    # hint bought nothing and cost hint-policy consistency. An r13 A/B
    # also re-tested the aggregate+join alternative to this window
    # form (groupBy(l_orderkey) counts joined back): interleaved mins
    # 0.83s (window) vs 1.00s (agg+join) at sf0.1 — the join-back pays
    # a second lineitem⋈orders pass, the window sorts once. Kept.
    return (
        qual.join(s, F.expr("s_suppkey = l_suppkey"))
        .join(n.where("n_name = 'NATION_2'"),
              F.expr("s_nationkey = n_nationkey"))
        .groupBy(F.col("s_name").alias("supplier_name"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("numwait")))


@query("tpch_q21_waiting_suppliers", oracle=_Q21_SQL)
def tpch_q21_waiting_suppliers(spark, sf_dir):
    """TPC-H Q21 shape: EXISTS + NOT EXISTS both correlated to the same
    outer row (the NOT EXISTS also references the joined orders row) ->
    a left-semi and a left-anti join stacked on l_orderkey."""
    return run_q21(spark, {
        n: read_table(spark, sf_dir, n)
        for n in ("supplier", "lineitem", "orders", "nation")})


# ---------------------------------------------------------------------------
# Q22: dormant well-funded customers.  Country code = c_nationkey;
# every testdata customer has orders, so "dormant" = no order since
# 2000-01-01 (keeps the correlated NOT EXISTS anti join non-vacuous).
# ---------------------------------------------------------------------------

_Q22_SQL = """
    SELECT cntrycode,
           CAST(COUNT(*) AS BIGINT) AS numcust,
           CAST(SUM(CAST(acctbal AS DECIMAL(18,4))) AS DOUBLE) AS totacctbal
    FROM (
      SELECT CAST(c.c_nationkey AS INT) AS cntrycode,
             c.c_acctbal AS acctbal
      FROM customer c
      WHERE c.c_nationkey IN (1, 3, 5, 7, 9, 11, 13)
        AND c.c_acctbal >
            (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(18,4)))
                    AS DOUBLE) / COUNT(*)
             FROM customer c2
             WHERE c2.c_acctbal > 0.0
               AND c2.c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
        AND NOT EXISTS (SELECT 1 FROM orders o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_orderdate >=
                              TIMESTAMP '2000-01-01 00:00:00')
    ) custsale
    GROUP BY cntrycode
"""


@query("tpch_q22_dormant_customers", oracle=_Q22_SQL)
def tpch_q22_dormant_customers(spark, sf_dir):
    """TPC-H Q22 shape: uncorrelated scalar-avg threshold + NOT EXISTS
    anti join against orders, then a one-key rollup.  The avg is a
    decimal-exact sum/count; acctbal sums go through decimal."""
    _views(spark, sf_dir, "customer", "orders")
    return spark.sql(_Q22_SQL)


# ---------------------------------------------------------------------------
# Q3: shipping priority — the last missing TPC-H shape (Q1 is
# pricing_summary; Q4's correlated-EXISTS shape is
# subquery_exists_late_ship). Adapted to this schema: no
# o_shippriority column, so the order's priority rides in the group;
# the cutoff date sits mid-range of the synthetic 1995-2001 span.
# ---------------------------------------------------------------------------

_Q3_SQL = """
    SELECT l.l_orderkey,
           CAST(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                         AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
           CAST(CAST(o.o_orderdate AS DATE) AS STRING) AS order_date,
           o.o_orderpriority
    FROM customer c
    JOIN orders o ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1998-03-15'
      AND l.l_shipdate > TIMESTAMP '1998-03-15'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, l.l_orderkey
    LIMIT 10
"""


@query(
    "tpch_q3_shipping_priority",
    oracle=_Q3_SQL.replace("AS STRING", "AS VARCHAR"),
)
def tpch_q3_shipping_priority(spark, sf_dir):
    """TPC-H Q3 shape: segment-filtered customer ⋈ orders ⋈ lineitem
    with opposite-side date predicates (ordered before the cutoff,
    shipped after it — the unshipped-revenue backlog), per-order
    revenue aggregation, top-10 by revenue.

    Plan: both date/segment filters push into their scans; the
    aggregation is map-side-partial on l_orderkey; the top-10 is
    TakeOrderedAndProject (per-partition top-k, no global sort).
    Revenue is a decimal-exact sum surfaced as DOUBLE, so the DESC
    ordering is deterministic; l_orderkey is the total-order tiebreak.
    One SQL text drives both engines (STRING/VARCHAR cast aside)."""
    _views(spark, sf_dir, "customer", "orders", "lineitem")
    return spark.sql(_Q3_SQL)
