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
    und AS (
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
