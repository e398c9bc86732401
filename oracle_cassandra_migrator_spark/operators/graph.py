"""Graph analytics over edge tables: fixed-iteration PageRank.

Complements ``operators.dedup.connected_components`` (hash-to-min label
propagation): PageRank is the other workhorse iterative graph op a
curation pipeline reaches for (domain authority for crawl
prioritization, source weighting for mixture design).

Scale shape per iteration: ONE shuffle of the edge table keyed by
``dst`` (map-side partial sums), plus a broadcast-sized rank table
joined to the edges on ``src``. The rank state is |nodes| rows — tiny
relative to edges — so at 100 TB the per-iteration cost is a single
edge-table aggregation, exactly like the connected-components rounds.
Fixed iteration count keeps the whole computation SQL-replayable
(unrolled CTEs) for the exact-value oracle.

Exactness: edge fractions and per-round rank updates are rounded to
12 decimals, per-edge contributions to 14 before the exact
DECIMAL(30,16) sum (order-independent), so ranks are bit-reproducible
across engines and partitionings.

The unrolled logical plan repeats the edge-aggregation subtree once
per iteration; those subtrees are identical, so ReuseExchange / AQE
stage reuse computes the edge shuffle once at runtime (the static
plan string still prints each occurrence — the shuffle-budget
lockfile pins that multiplicity, not the runtime cost). For many
more iterations than 3, checkpoint the rank state per round like
``dedup.connected_components`` does.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    nodes: DataFrame,
    iters: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Weighted PageRank for ``iters`` rounds.

    ``edges``: (src, dst, w) with positive weights; ``nodes``: (node).
    r_{t+1}(v) = (1-d)/N + d * sum_{u->v} r_t(u) * w(u,v)/out(u).

    Simplified treatment of dangling nodes (no out-edges): their mass
    is not redistributed, as in the common "toy" formulation — fine
    for ranking, documented so the oracle can replay it exactly. Rank
    updates are rounded to 12 decimals each round; contributions are
    exact-decimal summed, so the result is deterministic under any
    partitioning.
    """
    n_nodes = nodes.count()
    base = (1.0 - damping) / n_nodes
    # out-degree table and per-round rank sums are |nodes|-row relations
    # — broadcast them so every join against the edge table (the only
    # big relation here) stays shuffle-free on the edge side.
    out = edges.groupBy("src").agg(
        F.expr("CAST(SUM(w) AS DOUBLE) AS out_w"))
    frac = (
        edges.join(F.broadcast(out), "src")
        .selectExpr("src", "dst",
                    "round(CAST(w AS DOUBLE) / out_w, 12) AS frac")
    )
    ranks = nodes.selectExpr(
        "node", f"round(CAST(1.0 AS DOUBLE) / {n_nodes}, 12) AS rank")
    for _ in range(iters):
        contrib = (
            frac.join(F.broadcast(ranks), frac["src"] == ranks["node"])
            .selectExpr("dst", "round(rank * frac, 14) AS c")
        )
        sums = contrib.groupBy("dst").agg(F.expr(
            "CAST(SUM(CAST(c AS DECIMAL(30,16))) AS DOUBLE) AS s"))
        ranks = (
            nodes.join(F.broadcast(sums), nodes["node"] == sums["dst"], "left")
            .selectExpr(
                "node",
                f"round(CAST({base!r} AS DOUBLE) + CAST({damping!r} AS"
                f" DOUBLE) * coalesce(s, CAST(0.0 AS DOUBLE)), 12) AS rank")
        )
    return ranks


def pagerank_oracle_sql(
    edges_sql: str,
    nodes_sql: str,
    iters: int = 3,
    damping: float = 0.85,
    n_nodes_literal: int | None = None,
) -> str:
    """DuckDB replay of :func:`pagerank` as unrolled CTEs.

    ``edges_sql`` must select (src, dst, w); ``nodes_sql`` (node).
    ``n_nodes_literal`` fixes N when known at build time (the oracle
    string is static SQL, so N must be a literal; pass the known node
    count of the input relation)."""
    if n_nodes_literal is None:
        raise ValueError("pagerank_oracle_sql needs the node count as a "
                         "literal (static SQL cannot count at build time)")
    n = n_nodes_literal
    base = (1.0 - damping) / n
    parts = [
        f"edges AS ({edges_sql})",
        f"nodes AS ({nodes_sql})",
        ("out_w AS (SELECT src, CAST(SUM(w) AS DOUBLE) AS out_w"
         " FROM edges GROUP BY src)"),
        ("frac AS (SELECT e.src, e.dst,"
         " round(CAST(e.w AS DOUBLE) / o.out_w, 12) AS frac"
         " FROM edges e JOIN out_w o ON e.src = o.src)"),
        (f"r0 AS (SELECT node, round(CAST(1.0 AS DOUBLE) / {n}, 12)"
         f" AS rank FROM nodes)"),
    ]
    for i in range(iters):
        parts.append(
            f"c{i + 1} AS (SELECT f.dst,"
            f" round(r.rank * f.frac, 14) AS c"
            f" FROM frac f JOIN r{i} r ON f.src = r.node)")
        parts.append(
            f"s{i + 1} AS (SELECT dst,"
            f" CAST(SUM(CAST(c AS DECIMAL(30,16))) AS DOUBLE) AS s"
            f" FROM c{i + 1} GROUP BY dst)")
        parts.append(
            f"r{i + 1} AS (SELECT n.node,"
            f" round(CAST({base!r} AS DOUBLE) + CAST({damping!r} AS DOUBLE)"
            f" * coalesce(s.s, CAST(0.0 AS DOUBLE)), 12) AS rank"
            f" FROM nodes n LEFT JOIN s{i + 1} s ON n.node = s.dst)")
    joined = ",\n    ".join(parts)
    return f"WITH {joined}\n    SELECT node, rank FROM r{iters}"


def triangle_counts(und: DataFrame, nodes: DataFrame) -> DataFrame:
    """Per-node triangle counts by degree-oriented wedge counting
    (Suri & Vassilvitskii 2011). ``und`` is an undirected edge list
    with columns (a, b), canonicalized a < b, no self-loops, no
    duplicates; ``nodes`` has column (node) and supplies zero-count
    rows. Returns (node, n_triangles BIGINT).

    Each undirected edge is oriented from the lower to the higher
    endpoint under the total order (degree, node); wedges are pairs of
    out-edges at a common low endpoint, closed by one more equi-join.
    Every triangle is counted exactly once (owned by its minimum-rank
    vertex) and per-node out-degree is bounded by O(sqrt(|E|)), which
    bounds the wedge-join output. The oriented edge list is persisted:
    it feeds three join legs, and recomputation would re-run the
    upstream edge build each time (see graph_triangle_count's measured
    113-exchange inline-SQL plan)."""
    und = und.persist()
    deg = (
        und.select(F.explode(F.array("a", "b")).alias("n"))
        .groupBy("n").agg(F.count("*").cast("bigint").alias("d"))
    )
    from pyspark.sql.window import Window

    rk = deg.select(
        "n",
        F.row_number().over(Window.orderBy("d", "n"))
        .cast("bigint").alias("r"))
    ra = rk.selectExpr("n AS an", "r AS ar")
    rb = rk.selectExpr("n AS bn", "r AS br")
    ore = (
        und.join(F.broadcast(ra), F.col("a") == F.col("an"))
        .join(F.broadcast(rb), F.col("b") == F.col("bn"))
        .selectExpr(
            "CASE WHEN ar < br THEN a ELSE b END AS u",
            "CASE WHEN ar < br THEN b ELSE a END AS v",
            "CASE WHEN ar < br THEN br ELSE ar END AS rv")
        .persist()
    )
    e1 = ore.selectExpr("u AS u1", "v AS v1", "rv AS rv1")
    e2 = ore.selectExpr("u AS u2", "v AS v2", "rv AS rv2")
    e3 = ore.selectExpr("u AS u3", "v AS v3")
    tri = (
        e1.join(e2, (F.col("u1") == F.col("u2"))
                & (F.col("rv1") < F.col("rv2")))
        .join(e3, (F.col("v1") == F.col("u3"))
              & (F.col("v2") == F.col("v3")))
        .selectExpr("u1 AS x", "v1 AS y", "v2 AS z")
    )
    cnt = (
        tri.select(F.explode(F.array("x", "y", "z")).alias("node"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("n_triangles"))
    )
    return (
        nodes.join(cnt, "node", "left")
        .selectExpr(
            "node",
            "CAST(coalesce(n_triangles, 0) AS BIGINT) AS n_triangles")
    )
