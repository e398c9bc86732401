"""Round-6 catalog additions: the IVF+PQ recall audit, event-sequence
Markov transitions, null-safe-equality join coverage, word-level PMI
co-occurrence, and degree-oriented triangle counting.

Reference parity: the reference pipeline (oracle_to_cassandra_migration.py)
establishes the query surface this catalog generalizes; these five close
the remaining analytics families (retrieval-quality audit, sequence
mining, null-semantics joins, corpus co-occurrence statistics, and a
second graph kernel beside PageRank/connected-components).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.queries.registry import ORACLES, query
from oracle_cassandra_migrator_spark.queries import extensions as _ext
from oracle_cassandra_migrator_spark.sources.testdata import read_table


# ---------------------------------------------------------------------------
# sim_ann_ivfpq_recall — completes the ANN recall-audit family
# ---------------------------------------------------------------------------


def _ivfpq_recall_oracle() -> str:
    bf = ORACLES["sim_topk_bruteforce"]
    iv = _ext._ivfpq_oracle()
    return f"""
    WITH bf AS (SELECT vec_id FROM ({bf})),
    iv AS (SELECT vec_id FROM ({iv}))
    SELECT CAST(count(*) AS BIGINT) AS n_hits, 10 AS k,
           CAST(floor(count(*) * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm
    FROM bf JOIN iv USING (vec_id)
    """


@query("sim_ann_ivfpq_recall", oracle=_ivfpq_recall_oracle())
def sim_ann_ivfpq_recall(spark, sf_dir):
    """Recall@10 of the composite IVF+PQ retriever against the exact
    brute-force top-10 — the final row of the ANN quality story (LSH,
    IVF single/multi-probe, and PQ audits already exist). The coarse
    probe step caps recall at whatever mass the top-n_probe cells hold,
    so this number is the one a 100 TB operator actually tunes n_probe
    against. One <= 10-row join per arm; the oracle replays all five
    training loops end-to-end via the shared CTE helpers."""
    bf = _ext.sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    iv = _ext.sim_ann_ivfpq_topk(spark, sf_dir).select("vec_id")
    return bf.join(iv, "vec_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_hits")
    ).selectExpr(
        "n_hits", "10 AS k",
        "CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm")


# ---------------------------------------------------------------------------
# events_type_transition_matrix — first-order Markov transitions
# ---------------------------------------------------------------------------


@query(
    "events_type_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (SELECT event_type AS prev_type, next_type,
                 CAST(count(*) AS BIGINT) AS n_transitions
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
    SELECT prev_type, next_type, n_transitions,
           CAST(floor(n_transitions * 1e6
                      / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                             AS DOUBLE) + 0.5) AS BIGINT) AS prob_ppm
    FROM c
    """,
)
def events_type_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) — the sequence-mining
    primitive behind next-action prediction and journey analysis.

    Scale shape: ONE user-keyed shuffle for the ordered lead() (rows
    stay row-shaped, per-user partitions are small), then the corpus
    collapses to |type|^2 transition counts via map-side partial
    aggregation; the per-row probability normalization is a window
    OVER the tiny aggregate (aggregate-before-window, same gate shape
    as events_rolling_weekly_counts) — never over raw events.
    Probabilities are integer ppm (floor + 0.5) so the driver hash is
    exact. Tie order inside a user is (ts, event_id) — a total order,
    so lead() is deterministic in both engines."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type"))
    c = (
        seq.where("next_type IS NOT NULL")
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    total = F.sum("n_transitions").over(wp).cast("double")
    return c.select(
        "prev_type", "next_type", "n_transitions",
        F.floor(F.col("n_transitions") * F.lit(1e6) / total + F.lit(0.5))
        .cast("bigint").alias("prob_ppm"))


# ---------------------------------------------------------------------------
# join_null_safe_eq — <=> as a hash-joinable equi key
# ---------------------------------------------------------------------------


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_key
               FROM orders),
    d AS (SELECT DISTINCT status_key FROM a)
    SELECT d.status_key, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN a.status_key = d.status_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq
    FROM a JOIN d ON a.status_key IS NOT DISTINCT FROM d.status_key
    GROUP BY d.status_key
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (Spark ``<=>`` == ANSI IS NOT DISTINCT
    FROM): the missing null-semantics quadrant of the join family —
    plain ``=`` silently drops NULL keys, ``<=>`` matches NULL to NULL.
    The load-bearing property for scale: Spark plans ``<=>`` as a HASH
    join key (coalesced-key equi join), NOT a nested loop — a fact-to-
    dimension join on a nullable key stays O(n) (plan-gated: the plan
    is a BroadcastHashJoin with no BroadcastNestedLoopJoin).

    The n_plain_eq column makes the semantic difference visible in the
    data: it is 0 for the NULL group (plain equality never matches
    NULL) and equals n_orders for every non-NULL group."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.selectExpr(
        "o_orderkey", "nullif(o_orderstatus, 'O') AS status_key"
    ).alias("fact")
    d = a.select("status_key").distinct().alias("dim")
    return (
        a.join(F.broadcast(d), F.expr("fact.status_key <=> dim.status_key"))
        .groupBy(F.expr("dim.status_key").alias("status_key"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.expr("CAST(SUM(CASE WHEN fact.status_key = dim.status_key"
                   " THEN 1 ELSE 0 END) AS BIGINT)").alias("n_plain_eq"),
        )
    )


# ---------------------------------------------------------------------------
# text_word_pmi — adjacent-word pointwise mutual information
# ---------------------------------------------------------------------------


def _bigram_pairs_expr() -> str:
    """All adjacent word pairs per document (positions, not distinct —
    PMI wants occurrence counts), with the word array bound ONCE via
    the lambda trick (see operators/text.py:shingles_once_expr: a plain
    column gets re-inlined by CollapseProject)."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    w = fast_words_expr("text")
    return (
        f"element_at(transform(array({w}), w -> "
        "CASE WHEN size(w) >= 2 THEN "
        "transform(sequence(1, size(w) - 1), i -> "
        "named_struct('w1', element_at(w, i), 'w2', element_at(w, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
        "END), 1)"
    )


def _word_pmi_oracle(min_pair: int = 5, k: int = 20) -> str:
    ws = _ext.FAST_WORDS_SQL
    return f"""
    WITH d AS (SELECT {ws} AS ws FROM documents),
    w AS (SELECT unnest(ws) AS w FROM d),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY w),
    tw AS (SELECT CAST(count(*) AS DOUBLE) AS tw FROM w),
    bg AS (SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
           FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
    pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM bg GROUP BY w1, w2),
    tp AS (SELECT CAST(count(*) AS DOUBLE) AS tp FROM bg)
    SELECT p.w1, p.w2, p.n_pair,
           round(log2((CAST(p.n_pair AS DOUBLE) / tp.tp)
                      / ((CAST(u1.n AS DOUBLE) / tw.tw)
                         * (CAST(u2.n AS DOUBLE) / tw.tw))), 6) AS pmi
    FROM pc p JOIN uni u1 ON p.w1 = u1.w JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN tw CROSS JOIN tp
    WHERE p.n_pair >= {min_pair}
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT {k}
    """


@query("text_word_pmi", oracle=_word_pmi_oracle())
def text_word_pmi(spark, sf_dir):
    """Adjacent-word pointwise mutual information (Church & Hanks
    1990): pmi(w1,w2) = log2(p(w1,w2) / (p(w1)p(w2))) over bigram
    positions — the collocation/phrase-discovery statistic used to
    mine multi-word expressions before tokenizer training. Min-count
    filter (n_pair >= 5) applies the standard sparse-PMI correction;
    top-20 by rounded pmi with a (w1,w2) total-order tiebreak.

    Scale shape: one per-row split + explode into row-shaped tokens /
    pairs, two map-side-partial groupBys (vocab- and bigram-keyed),
    corpus totals as ONE-ROW broadcast joins (the bounded-literal
    pattern), and the unigram table re-enters via broadcast — a vocab
    table is O(distinct words), which fits executor memory at any
    corpus size long before the pair table does. Final ranking is
    TakeOrderedAndProject over the min-count survivors."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.expr(fast_words_expr("text"))).alias("w"))
    words = words.persist()
    uni = words.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    tw = words.agg(F.count("*").cast("double").alias("tw"))
    pairs = docs.select(
        F.explode(F.expr(_bigram_pairs_expr())).alias("p")
    ).select("p.w1", "p.w2")
    pairs = pairs.persist()
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .where("n_pair >= 5")
    )
    tp = pairs.agg(F.count("*").cast("double").alias("tp"))
    u1 = uni.selectExpr("w AS w1", "n AS n1")
    u2 = uni.selectExpr("w AS w2", "n AS n2")
    return (
        pc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tw))
        .crossJoin(F.broadcast(tp))
        .selectExpr(
            "w1", "w2", "n_pair",
            "round(log2((CAST(n_pair AS DOUBLE) / tp)"
            " / ((CAST(n1 AS DOUBLE) / tw) * (CAST(n2 AS DOUBLE) / tw))), 6)"
            " AS pmi")
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — degree-oriented triangle counting
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = f"""
    WITH e0 AS ({_ext._PAGERANK_EDGES_SQL}),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e0 WHERE src <> dst),
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS n FROM und
                  UNION ALL SELECT b AS n FROM und) t
            GROUP BY n),
    rk AS (SELECT n, CAST(row_number() OVER (ORDER BY d, n) AS BIGINT) AS r
           FROM deg),
    ore AS (SELECT CASE WHEN ra.r < rb.r THEN u.a ELSE u.b END AS u,
                   CASE WHEN ra.r < rb.r THEN u.b ELSE u.a END AS v,
                   CASE WHEN ra.r < rb.r THEN rb.r ELSE ra.r END AS rv
            FROM und u
            JOIN rk ra ON u.a = ra.n
            JOIN rk rb ON u.b = rb.n),
    tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM ore e1
            JOIN ore e2 ON e1.u = e2.u AND e1.rv < e2.rv
            JOIN ore e3 ON e3.u = e1.v AND e3.v = e2.v),
    pn AS (SELECT x AS node FROM tri
           UNION ALL SELECT y FROM tri
           UNION ALL SELECT z FROM tri),
    cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM pn GROUP BY node)
    SELECT n.n_name AS node,
           CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM nation n LEFT JOIN cnt c ON n.n_name = c.node
"""


@query("graph_triangle_count", oracle=_TRIANGLE_SQL)
def graph_triangle_count(spark, sf_dir):
    """Per-node triangle counts over the nation trade graph (edges =
    nation pairs that traded, from the PageRank edge view) — the
    clustering-coefficient kernel, second graph operator beside
    PageRank and connected components.

    Algorithm: degree-ORIENTED counting (the MapReduce-era standard,
    Suri & Vassilvitskii 2011): rank nodes by (degree, name), orient
    every undirected edge low->high, wedge-join out-edges at their
    common low endpoint, and close each wedge with one more equi-join.
    Orientation bounds per-node out-degree by O(sqrt(|E|)) on any
    graph, so the wedge stage — the only superlinear step — is
    sum-of-C(outdeg,2) minimized; every join is an equi-join on a node
    key and each triangle is produced exactly once (its minimum-rank
    vertex owns it). The node ranking is |V|-sized (a global sort over
    nodes, not edges; node tables are dwarfed by edge tables on any
    real graph). The final LEFT JOIN back to the node list surfaces
    zero-triangle nodes explicitly.

    Plan shape: the oriented edge list is built ONCE and persisted —
    as pure SQL the triangle CTEs re-inline the 6-way edge build at
    every reference (Spark does not materialize CTEs; measured 113
    exchanges vs ~15 here). deg and the per-triangle node explode use
    explode(array(..)) instead of self-UNION so each input is scanned
    once. The oracle runs the same algorithm as one DuckDB SQL text
    (DuckDB does materialize CTEs)."""
    from oracle_cassandra_migrator_spark.operators.graph import (
        triangle_counts)

    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    und = (
        spark.sql(_ext._PAGERANK_EDGES_SQL)
        .where("src <> dst")
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
    )
    nation = read_table(spark, sf_dir, "nation").selectExpr("n_name AS node")
    return triangle_counts(und, nation)
