"""Round-6 second batch: sketch-based join-cardinality estimation,
directional containment dedup, cross-source contamination matrix,
session-level engagement metrics, robust (winsorized) aggregation,
smoothed target encoding, zone-map prunability reporting, and
week-over-week trend deltas.

Reference parity: the reference pipeline (oracle_to_cassandra_migration.py)
fixes the relational surface these generalize; the families here are the
analytics a 100 TB training-data / events corpus needs on top of it —
each one keeps the catalog's exactness conventions (decimal-exact sums,
integer-ppm ratios, md5-derived hashing shared bit-for-bit with the
DuckDB oracle).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table
from oracle_cassandra_migrator_spark.operators.sketches import (
    CMS_DEPTH, cms_sketch, cms_slot_sql, md5_mod_spark, md5_mod_sql)


# ---------------------------------------------------------------------------
# sketch_cms_join_size — join-cardinality estimation by CMS inner product
# ---------------------------------------------------------------------------


def _cms_join_size_oracle() -> str:
    sa = "\n      UNION ALL ".join(
        f"SELECT {d} AS depth, {cms_slot_sql(d, 'k')} AS slot,"
        f" CAST(SUM(cnt) AS BIGINT) AS c FROM a GROUP BY 2"
        for d in range(CMS_DEPTH))
    sb = "\n      UNION ALL ".join(
        f"SELECT {d} AS depth, {cms_slot_sql(d, 'k')} AS slot,"
        f" CAST(SUM(cnt) AS BIGINT) AS c FROM b GROUP BY 2"
        for d in range(CMS_DEPTH))
    return f"""
    WITH a AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
               FROM lineitem WHERE l_orderkey % 2 = 0 GROUP BY 1),
    b AS (SELECT l_partkey AS k, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM lineitem WHERE l_orderkey % 2 = 1 GROUP BY 1),
    ex AS (SELECT CAST(COALESCE(SUM(a.cnt * b.cnt), 0) AS BIGINT)
                    AS exact_pairs
           FROM a JOIN b USING (k)),
    sa AS ({sa}),
    sb AS ({sb}),
    j AS (SELECT sa.depth, CAST(SUM(sa.c * sb.c) AS BIGINT) AS est
          FROM sa JOIN sb ON sa.depth = sb.depth AND sa.slot = sb.slot
          GROUP BY 1),
    pe AS (SELECT d.depth, COALESCE(j.est, CAST(0 AS BIGINT)) AS est
           FROM (SELECT UNNEST(generate_series(0, {CMS_DEPTH - 1})) AS depth) d
           LEFT JOIN j ON j.depth = d.depth),
    mn AS (SELECT CAST(MIN(est) AS BIGINT) AS est_pairs FROM pe)
    SELECT ex.exact_pairs, mn.est_pairs,
           CAST(floor((mn.est_pairs - ex.exact_pairs) * 1e6
                      / ex.exact_pairs + 0.5) AS BIGINT) AS overestimate_ppm,
           mn.est_pairs >= ex.exact_pairs AS est_ge_exact
    FROM ex, mn
    """


@query("sketch_cms_join_size", oracle=_cms_join_size_oracle())
def sketch_cms_join_size(spark, sf_dir):
    """Join-size estimation via Count-Min inner product (the AMS/CMS
    result of Alon-Matias-Szegedy / Cormode-Muthukrishnan): the
    cardinality of A ⋈ B on a key equals Σ_k f_A(k)·f_B(k), and the
    minimum over CMS depths of the slot-wise sketch inner product
    upper-bounds it — the optimizer-statistics primitive that prices a
    shuffle join BEFORE running it. At 100 TB each side's sketch is a
    fixed ≤ depth×width aggregate built with map-side partials
    (mergeable across partitions/days), the inner product is a
    ≤ 3072-row join of two tiny tables, and the exact arm here exists
    only to audit the estimate; est ≥ exact holds by construction
    (hash collisions can only ADD mass), asserted in the output.

    The workload splits lineitem by order-key parity and estimates the
    part-key self-join size — a genuinely collision-prone regime
    (~|parts| keys into width 1024), so the overestimate is nonzero
    and the ppm column shows the sketch's real accuracy."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    a = (li.where("l_orderkey % 2 = 0").groupBy("l_partkey")
         .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")))
    b = (li.where("l_orderkey % 2 = 1").groupBy("l_partkey")
         .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")))
    exact = (
        a.select("l_partkey", F.col("cnt").alias("cnt_a"))
        .join(b.select("l_partkey", F.col("cnt").alias("cnt_b")),
              "l_partkey")
        .agg(F.expr("CAST(COALESCE(SUM(cnt_a * cnt_b), 0) AS BIGINT)")
             .alias("exact_pairs")))
    ska = cms_sketch(a, "l_partkey", "cnt")
    skb = cms_sketch(b, "l_partkey", "cnt").withColumnRenamed(
        "cms_count", "cms_b")
    per_depth = (
        ska.join(skb, ["depth", "slot"])
        .groupBy("depth")
        .agg(F.expr("CAST(SUM(cms_count * cms_b) AS BIGINT)").alias("est")))
    depths = spark.range(CMS_DEPTH).select(
        F.col("id").cast("int").alias("depth"))
    est = (depths.join(per_depth, "depth", "left")
           .agg(F.expr("CAST(MIN(COALESCE(est, CAST(0 AS BIGINT)))"
                       " AS BIGINT)").alias("est_pairs")))
    return exact.crossJoin(F.broadcast(est)).selectExpr(
        "exact_pairs", "est_pairs",
        "CAST(floor((est_pairs - exact_pairs) * 1e6 / exact_pairs + 0.5)"
        " AS BIGINT) AS overestimate_ppm",
        "est_pairs >= exact_pairs AS est_ge_exact")


# ---------------------------------------------------------------------------
# dedup_containment_pairs — directional sub-document detection
# ---------------------------------------------------------------------------


_CONTAINMENT_T = 0.6


def _containment_oracle(threshold: float = _CONTAINMENT_T) -> str:
    from oracle_cassandra_migrator_spark.queries.extensions import (
        _SHINGLE_CTE)

    return f"""
    WITH {_SHINGLE_CTE},
    und AS MATERIALIZED (
      SELECT x.doc_id AS doc_a, y.doc_id AS doc_b,
             CAST(len(list_intersect(x.shingles, y.shingles)) AS BIGINT)
               AS n_common,
             CAST(len(x.shingles) AS BIGINT) AS n_a,
             CAST(len(y.shingles) AS BIGINT) AS n_b
      FROM sh x JOIN sh y ON x.doc_id < y.doc_id
      WHERE len(list_intersect(x.shingles, y.shingles)) > 0),
    directed AS (
      SELECT doc_a AS doc_inner, doc_b AS doc_outer, n_common, n_a AS n_inner
      FROM und
      UNION ALL
      SELECT doc_b, doc_a, n_common, n_b FROM und)
    SELECT doc_inner, doc_outer,
           round(CAST(n_common AS DOUBLE) / n_inner, 6) AS containment
    FROM directed
    WHERE CAST(n_common AS DOUBLE) / n_inner >= {threshold}
    """


@query("dedup_containment_pairs", oracle=_containment_oracle())
def dedup_containment_pairs(spark, sf_dir):
    """Directional shingle containment C(inner→outer) =
    |S_in ∩ S_out| / |S_in| ≥ 0.6 — the sub-document relation Jaccard
    structurally misses (a quoted excerpt inside a longer article has
    J ≈ |A|/|B| but containment ≈ 1 from the excerpt side). Curation
    drops the contained fragment, keeps the superset.

    Same inverted-index plan as dedup_ngram_jaccard (shingle explode →
    equi self-join → pair aggregation; nothing quadratic, no arrays in
    shuffles); the direction fan-out is a 2-element explode of the
    already pair-sized aggregate. The oracle is the small-scale
    list_intersect all-pairs replay, candidate-complete because a pair
    with containment ≥ t > 0 must share ≥ 1 shingle and therefore
    appears in the inverted index."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        containment_pairs)

    docs = read_table(spark, sf_dir, "documents")
    return containment_pairs(
        docs, "text", "doc_id", n=3, threshold=_CONTAINMENT_T)


# ---------------------------------------------------------------------------
# contamination_source_matrix — cross-source duplicated-span matrix
# ---------------------------------------------------------------------------


def _source_matrix_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.extensions import (
        FAST_WORDS_SQL)

    return f"""
    WITH w AS (SELECT source, {FAST_WORDS_SQL} AS words FROM documents),
    seg AS (SELECT DISTINCT source,
                   md5(array_to_string(words[(i-1)*10 + 1 : i*10], ' ')) AS seg
            FROM w, UNNEST(generate_series(1,
                   CAST(floor(len(words) / 10) AS BIGINT))) AS t(i)),
    tot AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_segs
            FROM seg GROUP BY 1),
    shared AS (
      SELECT x.source AS source_a, y.source AS source_b,
             CAST(COUNT(*) AS BIGINT) AS n_shared
      FROM seg x JOIN seg y ON x.seg = y.seg AND x.source < y.source
      GROUP BY 1, 2)
    SELECT s.source_a, s.source_b, s.n_shared,
           ta.n_segs AS n_segs_a, tb.n_segs AS n_segs_b,
           CAST(floor(s.n_shared * 1e6 / least(ta.n_segs, tb.n_segs) + 0.5)
                AS BIGINT) AS overlap_ppm
    FROM shared s
    JOIN tot ta ON ta.source = s.source_a
    JOIN tot tb ON tb.source = s.source_b
    """


@query("contamination_source_matrix", oracle=_source_matrix_oracle())
def contamination_source_matrix(spark, sf_dir):
    """Pairwise cross-source contamination matrix over 10-word span
    fingerprints: for every source pair, how many distinct spans both
    crawls contain — the dataset-level dual of per-document
    contamination_ngram_overlap, answering "which of my corpus slices
    are copying each other" before mixture weights are chosen.

    Scale shape: one per-row segmentation (the dedup_duplicate_segments
    expression), one distinct on (source, span-hash), one equi
    self-join on the 32-char hash. The candidate fan-out per span is
    bounded by |sources|² (a span appears in ≤ |sources| distinct
    rows after the distinct), so the join is linear in distinct spans
    — the quadratic melt of document-level self-joins cannot occur
    here by construction. Per-source totals are a |sources|-row
    broadcast joined back onto the ≤ |sources|²-row matrix."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    segs = (
        "element_at(transform(array(" + fast_words_expr("text") + "), w -> "
        "CASE WHEN size(w) >= 10 THEN "
        "array_distinct(transform(sequence(1, CAST(floor(size(w) / 10) AS INT)), "
        "i -> md5(concat_ws(' ', slice(w, (i - 1) * 10 + 1, 10))))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END), 1)"
    )
    docs = read_table(spark, sf_dir, "documents")
    # Materialize the distinct (source, span) table ONCE via a seg-hash
    # repartition whose shuffle files all three consumers (both join
    # sides + the totals rollup) re-read through ReuseExchange — the
    # same convention as the MinHash shingle table (operators/dedup.py):
    # without it the segmentation+distinct subtree executes 4x.
    seg = (docs.select("source", F.explode(F.expr(segs)).alias("seg"))
           .distinct().repartition("seg"))
    tot = seg.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_segs"))
    x = seg.select(F.col("source").alias("source_a"), "seg")
    y = seg.select(F.col("source").alias("source_b"), "seg")
    shared = (
        x.join(y, "seg")
        .where("source_a < source_b")
        .groupBy("source_a", "source_b")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_shared")))
    ta = F.broadcast(tot.select(F.col("source").alias("source_a"),
                                F.col("n_segs").alias("n_segs_a")))
    tb = F.broadcast(tot.select(F.col("source").alias("source_b"),
                                F.col("n_segs").alias("n_segs_b")))
    return (shared.join(ta, "source_a").join(tb, "source_b")
            .selectExpr(
                "source_a", "source_b", "n_shared", "n_segs_a", "n_segs_b",
                "CAST(floor(n_shared * 1e6 / least(n_segs_a, n_segs_b) + 0.5)"
                " AS BIGINT) AS overlap_ppm"))


# ---------------------------------------------------------------------------
# events_session_stats — daily session-level engagement report
# ---------------------------------------------------------------------------


@query(
    "events_session_stats",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) IS NULL
                   OR date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_num
      FROM g),
    sess AS (
      SELECT user_id, session_num,
             CAST(count(*) AS BIGINT) AS n_events,
             date_diff('microsecond', min(ts), max(ts)) AS duration_us,
             CAST(CAST(date_trunc('day', min(ts)) AS DATE) AS VARCHAR)
               AS session_day
      FROM s GROUP BY user_id, session_num)
    SELECT session_day,
           CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_bounce,
           CAST(floor(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) * 1e6
                      / count(*) + 0.5) AS BIGINT) AS bounce_ppm,
           CAST(SUM(duration_us) AS BIGINT) AS total_duration_us
    FROM sess GROUP BY session_day
    """,
)
def events_session_stats(spark, sf_dir):
    """Session-level engagement metrics rolled up by day: session
    count, bounce share (single-event sessions), and total engaged
    time — the product-analytics report sitting ON TOP of the
    gaps-and-islands sessionization that events_sessionize verifies in
    isolation. A session belongs to the day it starts.

    Scale shape: ONE user-keyed shuffle for the lag/prefix-sum windows
    (the same exchange serves both), a (user, session) aggregation that
    inherits that partitioning (no second exchange for the session
    rollup), then the corpus collapses to ≤ |days| rows. Durations are
    exact integer microseconds; bounce share is integer ppm."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sess = (
        read_table(spark, sf_dir, "events")
        .withColumn("gap_us",
                    F.expr("TIMESTAMPDIFF(MICROSECOND, lag(ts) OVER "
                           "(PARTITION BY user_id ORDER BY ts, event_id), ts)"))
        .withColumn("new_session",
                    F.expr("CASE WHEN gap_us IS NULL OR gap_us > 1800000000 "
                           "THEN 1 ELSE 0 END"))
        .withColumn("session_num",
                    F.sum("new_session").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_num")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr("TIMESTAMPDIFF(MICROSECOND, MIN(ts), MAX(ts))")
            .alias("duration_us"),
            F.expr("CAST(CAST(date_trunc('day', MIN(ts)) AS DATE) AS STRING)")
            .alias("session_day"),
        )
    )
    return sess.groupBy("session_day").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_sessions"),
        F.expr("CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_bounce"),
        F.expr("CAST(floor(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)"
               " * 1e6 / COUNT(*) + 0.5) AS BIGINT)").alias("bounce_ppm"),
        F.expr("CAST(SUM(duration_us) AS BIGINT)").alias("total_duration_us"),
    )


# ---------------------------------------------------------------------------
# agg_winsorized_mean_price — robust mean via quantile clamping
# ---------------------------------------------------------------------------


@query(
    "agg_winsorized_mean_price",
    oracle="""
    WITH b AS (SELECT l_returnflag,
                      quantile_disc(l_extendedprice, 0.05) AS lo,
                      quantile_disc(l_extendedprice, 0.95) AS hi
               FROM lineitem GROUP BY 1)
    SELECT l.l_returnflag, b.lo, b.hi,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(CAST(SUM(CAST(least(greatest(l.l_extendedprice, b.lo), b.hi)
                              AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*)
                AS DOUBLE) AS win_mean
    FROM lineitem l JOIN b USING (l_returnflag)
    GROUP BY 1, 2, 3
    """,
)
def agg_winsorized_mean_price(spark, sf_dir):
    """Winsorized mean (clamp to the per-group [p05, p95] before
    averaging) — the robust-statistics counterpart of the trimmed-mean
    UDAF (udaf_trimmed_mean_price), expressed entirely in built-ins:
    winsorization keeps every row (clamped) where trimming drops them,
    so it composes with decimal-exact sums and needs no Python.

    Two-pass shape identical to the quantile_bucket family: pass 1
    collapses each group to two exact order statistics
    (percentile_disc == DuckDB quantile_disc, bit-identical); pass 2
    broadcast-joins the |groups|-row boundary table back and
    aggregates with map-side partials. No global sort, no window over
    raw rows — survives any corpus scale with |groups| bounded."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_extendedprice")
    b = li.groupBy("l_returnflag").agg(
        F.expr("percentile_disc(0.05) WITHIN GROUP"
               " (ORDER BY l_extendedprice)").alias("lo"),
        F.expr("percentile_disc(0.95) WITHIN GROUP"
               " (ORDER BY l_extendedprice)").alias("hi"))
    return (
        li.join(F.broadcast(b), "l_returnflag")
        .groupBy("l_returnflag", "lo", "hi")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
            F.expr(
                "CAST(CAST(SUM(CAST(least(greatest(l_extendedprice, lo), hi)"
                " AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS DOUBLE)")
            .alias("win_mean"),
        )
    )


# ---------------------------------------------------------------------------
# encode_target_mean_smoothed — smoothed target encoding (ML prep)
# ---------------------------------------------------------------------------


@query(
    "encode_target_mean_smoothed",
    oracle="""
    WITH g AS (SELECT o_orderpriority,
                      CAST(COUNT(*) AS BIGINT) AS n_orders,
                      SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s
               FROM orders GROUP BY 1)
    SELECT o_orderpriority, n_orders,
           CAST(floor(CAST(s AS DOUBLE) / n_orders * 1e6 + 0.5) AS BIGINT)
             AS raw_mean_micro,
           CAST(floor((CAST(s AS DOUBLE) + 10 *
                       (CAST(SUM(s) OVER () AS DOUBLE)
                        / SUM(n_orders) OVER ()))
                      / (n_orders + 10) * 1e6 + 0.5) AS BIGINT)
             AS enc_micro
    FROM g
    """,
)
def encode_target_mean_smoothed(spark, sf_dir):
    """Smoothed target (mean) encoding of a categorical feature — the
    leakage-averse ML-prep transform: enc(c) = (Σ_c y + m·ȳ) / (n_c + m)
    with prior weight m=10, shrinking rare categories toward the global
    mean. Emitted per category so the ≤ |categories|-row encoding table
    broadcast-joins onto any downstream training pipeline.

    One aggregation collapses the corpus to |categories| rows with
    exact decimal sums; the global mean comes from a window OVER that
    tiny aggregate (aggregate-before-window), so no second pass over
    the data and no driver collect. Encodings are integer micro-units
    computed from identical exact inputs on both engines."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice")
    g = o.groupBy("o_orderpriority").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,4)))").alias("s"))
    w = Window.partitionBy()
    return g.select(
        "o_orderpriority", "n_orders",
        F.expr("CAST(floor(CAST(s AS DOUBLE) / n_orders * 1e6 + 0.5)"
               " AS BIGINT)").alias("raw_mean_micro"),
        F.floor(
            (F.expr("CAST(s AS DOUBLE)")
             + F.lit(10) * (F.sum("s").over(w).cast("double")
                            / F.sum("n_orders").over(w)))
            / (F.col("n_orders") + F.lit(10)) * F.lit(1e6) + F.lit(0.5))
        .cast("bigint").alias("enc_micro"))


# ---------------------------------------------------------------------------
# layout_minmax_pruning_stats — zone-map prunability report
# ---------------------------------------------------------------------------


_PRUNE_CUTOFF = "1997-06-01"
_N_HASH_BUCKETS = 64


@query(
    "layout_minmax_pruning_stats",
    oracle=f"""
    WITH rows_tagged AS (
      SELECT 'hash64' AS layout,
             {md5_mod_sql('CAST(l_orderkey AS VARCHAR)', _N_HASH_BUCKETS)}
               AS bucket,
             l_shipdate
      FROM lineitem
      UNION ALL
      SELECT 'bymonth', CAST(year(l_shipdate) * 12 + month(l_shipdate)
                             AS BIGINT), l_shipdate
      FROM lineitem),
    z AS (SELECT layout, bucket, max(l_shipdate) AS max_ship
          FROM rows_tagged GROUP BY 1, 2)
    SELECT layout,
           CAST(COUNT(*) AS BIGINT) AS n_buckets,
           CAST(SUM(CASE WHEN max_ship < TIMESTAMP '{_PRUNE_CUTOFF}'
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_prunable,
           CAST(floor((COUNT(*) - SUM(CASE WHEN max_ship
                         < TIMESTAMP '{_PRUNE_CUTOFF}' THEN 1 ELSE 0 END))
                      * 1e6 / COUNT(*) + 0.5) AS BIGINT) AS scan_ppm
    FROM z GROUP BY layout
    """,
)
def layout_minmax_pruning_stats(spark, sf_dir):
    """Zone-map (min/max data-skipping) prunability audit: simulate
    two physical layouts of lineitem — hash-bucketed by order key vs
    range-clustered by ship month — and report what fraction of
    buckets a `l_shipdate >= cutoff` scan could skip from footer
    statistics alone. The clustered layout prunes every closed month;
    the hash layout prunes nothing (every bucket spans the full date
    range) — THE quantified argument for sort-before-write at 100 TB,
    the same physics layout_zorder_values exercises for 2-D keys.

    One union of two scans, one (layout, bucket) max aggregation with
    map-side partials, then a ≤ |buckets|-row rollup. Nothing is
    collected; bucket stats are exactly what parquet footers would
    hold, so the report matches what Spark's scan pruning would do."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate")
    h = li.select(
        F.lit("hash64").alias("layout"),
        F.expr(md5_mod_spark("CAST(l_orderkey AS STRING)",
                             _N_HASH_BUCKETS)).alias("bucket"),
        "l_shipdate")
    m = li.select(
        F.lit("bymonth").alias("layout"),
        F.expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) AS BIGINT)")
        .alias("bucket"),
        "l_shipdate")
    z = (h.unionAll(m)
         .groupBy("layout", "bucket")
         .agg(F.max("l_shipdate").alias("max_ship")))
    return z.groupBy("layout").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_buckets"),
        F.expr(f"CAST(SUM(CASE WHEN max_ship < TIMESTAMP '{_PRUNE_CUTOFF}'"
               f" THEN 1 ELSE 0 END) AS BIGINT)").alias("n_prunable"),
        F.expr(f"CAST(floor((COUNT(*) - SUM(CASE WHEN max_ship <"
               f" TIMESTAMP '{_PRUNE_CUTOFF}' THEN 1 ELSE 0 END))"
               f" * 1e6 / COUNT(*) + 0.5) AS BIGINT)").alias("scan_ppm"))


# ---------------------------------------------------------------------------
# events_wow_delta — week-over-week trend deltas
# ---------------------------------------------------------------------------


@query(
    "events_wow_delta",
    oracle="""
    WITH wk AS (
      SELECT CAST(CAST(date_trunc('week', ts) AS DATE) AS VARCHAR)
               AS week_start,
             CAST(count(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1)
    SELECT week_start, n_events,
           n_events - lag(n_events) OVER (ORDER BY week_start) AS wow_delta,
           CAST(floor((n_events - lag(n_events) OVER (ORDER BY week_start))
                      * 1e6
                      / lag(n_events) OVER (ORDER BY week_start) + 0.5)
                AS BIGINT) AS wow_ppm
    FROM wk
    """,
)
def events_wow_delta(spark, sf_dir):
    """Week-over-week traffic deltas: tumbling ISO weeks, then each
    week's absolute and relative (integer-ppm) change against the
    previous week; the first week's deltas are NULL by definition.

    Aggregate-before-window: the corpus collapses to ≤ |weeks| rows
    via map-side partial counts, and only THAT aggregate flows through
    the unpartitioned ordered window — the single-reducer stage sees
    dozens of rows at any corpus scale, the same gate shape as
    events_anomaly_zscore."""
    ev = read_table(spark, sf_dir, "events")
    wk = (ev.groupBy(
        F.expr("CAST(CAST(date_trunc('week', ts) AS DATE) AS STRING)")
        .alias("week_start"))
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events")))
    w = Window.orderBy("week_start")
    prev = F.lag("n_events").over(w)
    return wk.select(
        "week_start", "n_events",
        (F.col("n_events") - prev).alias("wow_delta"),
        F.floor((F.col("n_events") - prev) * F.lit(1e6) / prev + F.lit(0.5))
        .cast("bigint").alias("wow_ppm"))


# ---------------------------------------------------------------------------
# orders_rfm_segments — quantile-bucketed RFM segmentation, no global sort
# ---------------------------------------------------------------------------


@query(
    "orders_rfm_segments",
    oracle="""
    WITH cust AS (
      SELECT o_custkey,
             CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE) AS last_order,
             CAST(COUNT(*) AS BIGINT) AS f,
             SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS m
      FROM orders GROUP BY 1),
    r AS (SELECT o_custkey,
                 CAST(date_diff('day', last_order,
                      MAX(last_order) OVER ()) AS BIGINT) AS r_days,
                 f, m
          FROM cust),
    b AS (SELECT quantile_disc(r_days, 0.25) AS r1, quantile_disc(r_days, 0.5) AS r2,
                 quantile_disc(r_days, 0.75) AS r3,
                 quantile_disc(f, 0.25) AS f1, quantile_disc(f, 0.5) AS f2,
                 quantile_disc(f, 0.75) AS f3,
                 quantile_disc(m, 0.25) AS m1, quantile_disc(m, 0.5) AS m2,
                 quantile_disc(m, 0.75) AS m3
          FROM r),
    seg AS (
      SELECT CAST(1 + CASE WHEN r_days > b.r1 THEN 1 ELSE 0 END
                    + CASE WHEN r_days > b.r2 THEN 1 ELSE 0 END
                    + CASE WHEN r_days > b.r3 THEN 1 ELSE 0 END AS INT)
               AS r_bucket,
             CAST(1 + CASE WHEN f > b.f1 THEN 1 ELSE 0 END
                    + CASE WHEN f > b.f2 THEN 1 ELSE 0 END
                    + CASE WHEN f > b.f3 THEN 1 ELSE 0 END AS INT) AS f_bucket,
             CAST(1 + CASE WHEN m > b.m1 THEN 1 ELSE 0 END
                    + CASE WHEN m > b.m2 THEN 1 ELSE 0 END
                    + CASE WHEN m > b.m3 THEN 1 ELSE 0 END AS INT) AS m_bucket
      FROM r, b)
    SELECT r_bucket, f_bucket, m_bucket,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM seg GROUP BY 1, 2, 3
    """,
)
def orders_rfm_segments(spark, sf_dir):
    """RFM (recency / frequency / monetary) customer segmentation —
    the classic lifecycle-marketing cube — with every dimension
    quartile-bucketed by the catalog's two-pass quantile recipe
    instead of `ntile() OVER (ORDER BY ...)`: one aggregation
    collapses orders to |customers| rows (exact decimal monetary
    sums), the corpus max-date and the nine quartile boundaries are
    1-row aggregates OVER/cross-joined back (broadcast at any scale;
    approx_percentile is the documented 100 TB drop-in), and bucket
    assignment is a pure map-side CASE — no global sort anywhere.
    Ties fall in the LOWER bucket (strict >), the assign_buckets
    convention, so segmentation is a pure function of the values.
    Quartile fractions 0.25/0.5/0.75 are exactly-representable
    doubles — no cross-engine literal-parsing knife edge."""
    o = read_table(spark, sf_dir, "orders").select(
        "o_custkey", "o_orderdate", "o_totalprice")
    cust = o.groupBy("o_custkey").agg(
        F.expr("CAST(MAX(CAST(o_orderdate AS DATE)) AS DATE)")
        .alias("last_order"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("f"),
        F.expr("SUM(CAST(o_totalprice AS DECIMAL(18,4)))").alias("m"))
    r = cust.select(
        "o_custkey",
        F.expr("CAST(datediff(MAX(last_order) OVER (), last_order)"
               " AS BIGINT)").alias("r_days"),
        "f", "m")
    aggs = []
    for col, pre in (("r_days", "r"), ("f", "f"), ("m", "m")):
        for i, p in enumerate((0.25, 0.5, 0.75), start=1):
            aggs.append(F.expr(
                f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})")
                .alias(f"{pre}{i}"))
    b = r.agg(*aggs)
    seg = r.crossJoin(F.broadcast(b)).selectExpr(
        "CAST(1 + CASE WHEN r_days > r1 THEN 1 ELSE 0 END"
        " + CASE WHEN r_days > r2 THEN 1 ELSE 0 END"
        " + CASE WHEN r_days > r3 THEN 1 ELSE 0 END AS INT) AS r_bucket",
        "CAST(1 + CASE WHEN f > f1 THEN 1 ELSE 0 END"
        " + CASE WHEN f > f2 THEN 1 ELSE 0 END"
        " + CASE WHEN f > f3 THEN 1 ELSE 0 END AS INT) AS f_bucket",
        "CAST(1 + CASE WHEN m > m1 THEN 1 ELSE 0 END"
        " + CASE WHEN m > m2 THEN 1 ELSE 0 END"
        " + CASE WHEN m > m3 THEN 1 ELSE 0 END AS INT) AS m_bucket")
    return seg.groupBy("r_bucket", "f_bucket", "m_bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_customers"))


# ---------------------------------------------------------------------------
# stats_bootstrap_ci_revenue — one-pass Poisson bootstrap confidence interval
# ---------------------------------------------------------------------------


_BOOT_B = 32
# Poisson(1) CDF in integer micro-units (floor(P(X<=k) * 1e6)): the
# inverse-CDF ladder below maps a uniform md5 integer in [0, 1e6) to a
# deterministic Poisson(1) replicate weight — identical integers on
# both engines, no floating-point sampling anywhere.
_POIS_CDF_MICRO = (367879, 735758, 919698, 981011, 996340,
                   999405, 999916, 999989, 999998)


def _pois_w_sql(u: str) -> str:
    ladder = " ".join(
        f"WHEN {u} < {t} THEN {k}"
        for k, t in enumerate(_POIS_CDF_MICRO))
    return f"CASE {ladder} ELSE {len(_POIS_CDF_MICRO)} END"


def _pois_w_spark(u_expr: str) -> str:
    """Bind the md5-derived uniform ONCE via the transform/element_at
    let-binding idiom (operators/text.py) before walking the CASE
    ladder: inlining ``u_expr`` into all 9 branches would re-evaluate
    the hash up to 9x per exploded row — Spark does not extract common
    subexpressions out of conditionally-evaluated branches."""
    return (f"element_at(transform(array({u_expr}), "
            f"u -> {_pois_w_sql('u')}), 1)")


def _pois_w_duck(u_expr: str) -> str:
    """DuckDB twin of the bound-once ladder."""
    return f"(list_transform([{u_expr}], u -> {_pois_w_sql('u')}))[1]"


def _bootstrap_oracle() -> str:
    u = md5_mod_sql("l_orderkey || ':' || l_linenumber || ':' || b",
                    1_000_000)
    return f"""
    WITH reps AS (
      SELECT b, {_pois_w_duck(f'({u})')} AS w,
             CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4)) AS rev
      FROM lineitem,
           UNNEST(generate_series(0, {_BOOT_B - 1})) AS t(b)),
    means AS (
      SELECT b,
             CAST(floor(CAST(SUM(w * rev) AS DOUBLE) / SUM(w) * 1e6 + 0.5)
                  AS BIGINT) AS mean_micro
      FROM reps GROUP BY b),
    ci AS (SELECT quantile_disc(mean_micro, 0.05) AS ci_lo_micro,
                  quantile_disc(mean_micro, 0.95) AS ci_hi_micro,
                  CAST(COUNT(*) AS BIGINT) AS n_replicates
           FROM means),
    pt AS (SELECT CAST(floor(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)
                    AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)
                    AS BIGINT) AS point_mean_micro
           FROM lineitem)
    SELECT pt.point_mean_micro, ci.n_replicates,
           ci.ci_lo_micro, ci.ci_hi_micro,
           pt.point_mean_micro BETWEEN ci.ci_lo_micro AND ci.ci_hi_micro
             AS ci_contains_point
    FROM pt, ci
    """


@query("stats_bootstrap_ci_revenue", oracle=_bootstrap_oracle())
def stats_bootstrap_ci_revenue(spark, sf_dir):
    """Poisson bootstrap (Chamandy et al., the streaming-scale
    resampling scheme): each row contributes an independent
    Poisson(1)-weighted copy to each of B=32 replicates, so replicate
    means come out of ONE corpus pass — classic resampling would need
    B shuffled copies of the data. The uniform driving each weight is
    an md5 integer of (row id, replicate id), so the whole experiment
    is deterministic and the oracle replays it bit-for-bit; the CI is
    the [p05, p95] order-statistic envelope of the 32 replicate means.

    Scale shape: the 32x row fan-out is a pipelined explode feeding a
    map-side-combined aggregation — every task emits at most 32
    partial rows regardless of input size, and the final exchange
    moves 32 groups. The CI and point-estimate arms are 1-row
    aggregates glued by broadcast crossJoins."""
    u = md5_mod_spark(
        "concat(l_orderkey, ':', l_linenumber, ':', b)", 1_000_000)
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount")
    reps = li.select(
        F.explode(F.expr(f"sequence(0, {_BOOT_B - 1})")).alias("b"),
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"
    ).select(
        "b", F.expr(_pois_w_spark(f"({u})")).alias("w"),
        F.expr("CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(18,4))")
        .alias("rev"))
    means = reps.groupBy("b").agg(
        F.expr("CAST(floor(CAST(SUM(w * rev) AS DOUBLE) / SUM(w) * 1e6"
               " + 0.5) AS BIGINT)").alias("mean_micro"))
    ci = means.agg(
        F.expr("CAST(percentile_disc(0.05) WITHIN GROUP"
               " (ORDER BY mean_micro) AS BIGINT)").alias("ci_lo_micro"),
        F.expr("CAST(percentile_disc(0.95) WITHIN GROUP"
               " (ORDER BY mean_micro) AS BIGINT)").alias("ci_hi_micro"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_replicates"))
    pt = li.agg(
        F.expr("CAST(floor(CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
               " AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) * 1e6 + 0.5)"
               " AS BIGINT)").alias("point_mean_micro"))
    return pt.crossJoin(F.broadcast(ci)).selectExpr(
        "point_mean_micro", "n_replicates", "ci_lo_micro", "ci_hi_micro",
        "point_mean_micro BETWEEN ci_lo_micro AND ci_hi_micro"
        " AS ci_contains_point")


# ---------------------------------------------------------------------------
# events_user_gini — inequality / concentration of per-user activity
# ---------------------------------------------------------------------------


@query(
    "events_user_gini",
    oracle="""
    WITH c AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n
               FROM events GROUP BY 1),
    rk AS (SELECT n,
                  CAST(row_number() OVER (ORDER BY n, user_id) AS BIGINT)
                    AS i
           FROM c)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n) AS BIGINT) AS total_events,
           CAST(floor((2 * SUM(i * n) - (COUNT(*) + 1) * SUM(n)) * 1e6
                      / (COUNT(*) * SUM(n)) + 0.5) AS BIGINT) AS gini_ppm
    FROM rk
    """,
)
def events_user_gini(spark, sf_dir):
    """Gini coefficient of per-user event counts — the concentration
    metric behind "is our traffic a few whales or a broad base", and
    for training corpora "is one contributor dominating the data".
    Computed from the rank identity G = (2·Σ i·x_i − (n+1)·Σx) /
    (n·Σx) over ascending-sorted counts: every term is an exact
    integer, so the ppm output is deterministic on both engines.

    Scale shape: the corpus collapses to a |users|-row aggregate
    FIRST; only that aggregate flows through the ordered ranking
    window (aggregate-before-window). At billions of users the exact
    rank needs a sort of the aggregate — the documented approximation
    is binning counts through the two-pass quantile recipe and
    computing the Gini over the bin histogram."""
    ev = read_table(spark, sf_dir, "events").select("user_id")
    c = ev.groupBy("user_id").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    w = Window.orderBy("n", "user_id")
    rk = c.select("n", F.row_number().over(w).cast("bigint").alias("i"))
    return rk.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_users"),
        F.expr("CAST(SUM(n) AS BIGINT)").alias("total_events"),
        F.expr("CAST(floor((2 * SUM(i * n) - (COUNT(*) + 1) * SUM(n))"
               " * 1e6 / (COUNT(*) * SUM(n)) + 0.5) AS BIGINT)")
        .alias("gini_ppm"))


# ---------------------------------------------------------------------------
# parts_pareto_coverage — 80/20 revenue-concentration report
# ---------------------------------------------------------------------------


@query(
    "parts_pareto_coverage",
    oracle="""
    WITH p AS (SELECT l_partkey,
                      SUM(CAST(l_extendedprice * (1 - l_discount)
                          AS DECIMAL(18,4))) AS rev
               FROM lineitem GROUP BY 1),
    rs AS (SELECT rev,
                  SUM(rev) OVER (ORDER BY rev DESC, l_partkey
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                    AS run,
                  SUM(rev) OVER () AS total
           FROM p)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
           CAST(SUM(CASE WHEN 5 * run < 4 * total THEN 1 ELSE 0 END) + 1
                AS BIGINT) AS n_parts_p80,
           CAST(floor((SUM(CASE WHEN 5 * run < 4 * total THEN 1 ELSE 0 END)
                       + 1) * 1e6 / COUNT(*) + 0.5) AS BIGINT)
             AS parts_share_ppm
    FROM rs
    """,
)
def parts_pareto_coverage(spark, sf_dir):
    """Pareto (80/20) concentration: the smallest number of parts —
    taken in descending revenue order — whose cumulative revenue
    reaches 80% of the total, and the share of the catalog they
    represent. The inventory-curation dual of cap_docs_per_source:
    how head-heavy is the distribution before you cap it.

    The 80% crossing is found without any floating-point division:
    `5·running < 4·total` compares exact decimals (both sides integer
    multiples of cents), so the crossover index is knife-edge-free.
    Scale shape: corpus → |parts| aggregate first, then ordered
    prefix-sum windows over that aggregate only
    (aggregate-before-window); the ordering key carries a total-order
    tiebreak (revenue DESC, partkey)."""
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_extendedprice", "l_discount")
    p = li.groupBy("l_partkey").agg(
        F.expr("SUM(CAST(l_extendedprice * (1 - l_discount)"
               " AS DECIMAL(18,4)))").alias("rev"))
    wrun = (Window.orderBy(F.col("rev").desc(), F.col("l_partkey"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wall = Window.partitionBy()
    rs = p.select(
        "rev",
        F.sum("rev").over(wrun).alias("run"),
        F.sum("rev").over(wall).alias("total"))
    return rs.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_parts"),
        F.expr("CAST(SUM(CASE WHEN 5 * run < 4 * total THEN 1 ELSE 0 END)"
               " + 1 AS BIGINT)").alias("n_parts_p80"),
        F.expr("CAST(floor((SUM(CASE WHEN 5 * run < 4 * total THEN 1"
               " ELSE 0 END) + 1) * 1e6 / COUNT(*) + 0.5) AS BIGINT)")
        .alias("parts_share_ppm"))


# ---------------------------------------------------------------------------
# events_funnel_latency — time-to-convert distribution (view -> purchase)
# ---------------------------------------------------------------------------


@query(
    "events_funnel_latency",
    oracle="""
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS fv,
             MIN(CASE WHEN event_type = 'purchase' THEN ts END) AS fp
      FROM events GROUP BY 1),
    d AS (SELECT date_diff('microsecond', fv, fp) AS delta_us
          FROM u WHERE fv IS NOT NULL AND fp IS NOT NULL AND fp > fv)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
           quantile_disc(delta_us, 0.5) AS p50_us,
           quantile_disc(delta_us, 0.9) AS p90_us
    FROM d
    """,
)
def events_funnel_latency(spark, sf_dir):
    """Funnel time-to-convert: per user, microseconds from first
    'view' to first 'purchase' (converted = both present, purchase
    after the first view), reported as exact p50/p90 order statistics
    — the latency distribution product teams tune onboarding against,
    and the step-gap complement of events_funnel_counts' step totals.

    One conditional-min aggregation collapses the corpus to |users|
    rows (map-side partials; no window over raw events), then the
    percentiles run over that aggregate. Durations are exact integer
    microseconds; percentile_disc picks real elements, so both
    engines emit identical BIGINTs."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "event_type", "ts")
    u = ev.groupBy("user_id").agg(
        F.expr("MIN(CASE WHEN event_type = 'view' THEN ts END)")
        .alias("fv"),
        F.expr("MIN(CASE WHEN event_type = 'purchase' THEN ts END)")
        .alias("fp"))
    d = (u.where("fv IS NOT NULL AND fp IS NOT NULL AND fp > fv")
         .select(F.expr("TIMESTAMPDIFF(MICROSECOND, fv, fp)")
                 .alias("delta_us")))
    return d.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_converted"),
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP"
               " (ORDER BY delta_us) AS BIGINT)").alias("p50_us"),
        F.expr("CAST(percentile_disc(0.9) WITHIN GROUP"
               " (ORDER BY delta_us) AS BIGINT)").alias("p90_us"))


# ---------------------------------------------------------------------------
# text_bpe_encode_stats — apply the trained merges: tokenizer compression
# ---------------------------------------------------------------------------


def _bpe_encode_oracle(k: int = 5) -> str:
    from oracle_cassandra_migrator_spark.queries.round6 import _bpe_ctes

    return f"""
    WITH {_bpe_ctes(k)}
    SELECT CAST(COUNT(*) AS BIGINT) AS n_distinct_words,
           CAST(SUM(cnt) AS BIGINT) AS n_words,
           CAST(SUM(cnt * length(word)) AS BIGINT) AS n_chars,
           CAST(SUM(cnt * len(toks)) AS BIGINT) AS n_tokens,
           CAST(floor(SUM(cnt * len(toks)) * 1e6
                      / SUM(cnt * length(word)) + 0.5) AS BIGINT)
             AS compression_ppm
    FROM v{k}
    """


@query("text_bpe_encode_stats", oracle=_bpe_encode_oracle())
def text_bpe_encode_stats(spark, sf_dir):
    """BPE tokenizer APPLICATION — the other half of
    text_bpe_merge_rules' training story: encode the corpus with the
    5 trained merges and report the tokenization profile (vocab size,
    word instances, char tokens before merging, tokens after, and
    compression ppm) — the number a tokenizer-budget decision is made
    on. Encoding is free beyond training because the merged token
    lists already live on the vocab table (operators/text.py:
    bpe_encode_stats); encoding NEW text with frozen rules is the
    same chained per-row fold, zero shuffle. The oracle extends the
    unrolled train-loop CTEs one step: aggregate the final vocab."""
    from oracle_cassandra_migrator_spark.operators.text import (
        bpe_encode_stats)

    docs = read_table(spark, sf_dir, "documents")
    return bpe_encode_stats(spark, docs, "text", k=5)


# ---------------------------------------------------------------------------
# graph_bfs_distances — recursive-CTE shortest paths (Spark 4 WITH RECURSIVE)
# ---------------------------------------------------------------------------


_BFS_EDGES_SQL = """SELECT cn.n_name AS src, sn.n_name AS dst
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name"""

_BFS_SQL = f"""
    WITH RECURSIVE d AS ({_BFS_EDGES_SQL}),
    e AS (
      SELECT src, dst FROM d WHERE src <> dst
      UNION
      SELECT dst, src FROM d WHERE src <> dst),
    walks AS (
      SELECT 'NATION_0' AS node, 0 AS dist
      UNION ALL
      SELECT e.dst, w.dist + 1
      FROM walks w JOIN e ON e.src = w.node
      WHERE w.dist < 3)
    SELECT node, CAST(MIN(dist) AS BIGINT) AS dist
    FROM walks GROUP BY node
"""


@query("graph_bfs_distances", oracle=_BFS_SQL)
def graph_bfs_distances(spark, sf_dir):
    """Single-source shortest paths (BFS) over the nation co-supply
    graph via WITH RECURSIVE — Spark 4's recursive-CTE surface,
    sharing ONE SQL text with DuckDB. Completes the graph-kernel
    family (components / PageRank / triangles / shortest paths) and
    proves the declarative alternative to the iterative-DataFrame
    loop connected_components uses.

    Exactness without visited-set state: the recursive member
    enumerates WALKS bounded at depth 3 and MIN(dist) collapses them
    to true BFS distances — correct because every node here sits
    within the bound (asserted non-vacuously in pytest: the distance
    distribution spans 0/1/2), and denser corpora at larger SF only
    SHRINK distances, so the bound holds at every scale factor. The
    bound also caps the blow-up: walk count <= Σ deg^k for k <= 3 over
    a |nations|-node graph — thousands of rows, not corpus-scale. At a
    genuinely large-diameter graph the iterative frontier loop with
    per-round checkpointing (operators/graph.py) is the scale path;
    this query is the SQL-surface coverage of the recursion feature
    itself."""
    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_BFS_SQL)
