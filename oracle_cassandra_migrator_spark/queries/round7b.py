"""Round-7b additions: data-quality statistics (Benford, MAD
outliers, calibration, l-diversity), time-series diagnostics (CUSUM
changepoint, day-of-week seasonality, Kaplan-Meier retention),
multi-objective frontier (skyline), rank statistics (Spearman on
bounded domains), marketing attribution, a Zipf fit over the vocab,
and incremental aggregate maintenance (CDC delta applied to a
materialized rollup — the don't-recompute answer at 100 TB).

No reference counterpart (the 450-line reference has no analytics);
extends SURVEY.md §2.12. Exactness follows the catalog conventions
(registry.py docstring): integer/decimal accumulation wherever a sum
crosses partitions, micro/ppm renderings only at the end, and any
transcendental (ln) is quantized per-term to integer micro BEFORE
summation — the DSIR/bigram convention.
"""

from __future__ import annotations

import math

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators import incremental
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# ---------------------------------------------------------------------------
# eval_calibration_doclen — reliability table for a probability score
# ---------------------------------------------------------------------------


@query(
    "eval_calibration_doclen",
    oracle="""
    WITH scored AS (
      SELECT (n_chars % 1000) AS k,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
      FROM documents),
    b AS (
      SELECT k // 100 AS bucket,
             CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(pos) AS BIGINT) AS n_pos,
             SUM(CAST(k * 1000000 AS DECIMAL(38,0))) AS s_nano
      FROM scored GROUP BY 1)
    SELECT CAST(bucket AS INT) AS bucket, n, n_pos,
           CAST(floor(CAST(s_nano AS DOUBLE) / (n * 1000.0) + 0.5)
                AS BIGINT) AS mean_score_ppm,
           CAST(floor(CAST(n_pos AS DOUBLE) * 1000000.0 / n + 0.5)
                AS BIGINT) AS pos_rate_ppm,
           abs(CAST(floor(CAST(s_nano AS DOUBLE) / (n * 1000.0) + 0.5)
                AS BIGINT)
             - CAST(floor(CAST(n_pos AS DOUBLE) * 1000000.0 / n + 0.5)
                AS BIGINT)) AS gap_ppm
    FROM b
    """,
)
def eval_calibration_doclen(spark, sf_dir):
    """Equal-width reliability table for a [0,1) score (here a
    deterministic doc-length pseudo-probability) against a binary
    label: per-bin count, mean predicted score, observed positive
    rate, and the |confidence - accuracy| gap — the table ECE/MCE are
    read from. One aggregation over a 10-value bucket key (map-side
    partials); the score is a 3-decimal rational, so the per-bin mean
    accumulates as EXACT integer nano units (no float before the final
    ppm rendering). The dict-shaped quantile-binned sibling is
    operators/evaluation.py:calibration_binned."""
    docs = read_table(spark, sf_dir, "documents")
    scored = docs.selectExpr(
        "(n_chars % 1000) AS k",
        "CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos")
    b = scored.groupBy(F.expr("k DIV 100").cast("int").alias("bucket")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("n_pos"),
        F.expr("SUM(CAST(k * 1000000 AS DECIMAL(38,0)))").alias("s_nano"))
    mean_ppm = ("CAST(floor(CAST(s_nano AS DOUBLE) / (n * 1000.0) + 0.5)"
                " AS BIGINT)")
    rate_ppm = ("CAST(floor(CAST(n_pos AS DOUBLE) * 1000000.0 / n + 0.5)"
                " AS BIGINT)")
    return b.selectExpr(
        "bucket", "n", "n_pos",
        f"{mean_ppm} AS mean_score_ppm",
        f"{rate_ppm} AS pos_rate_ppm",
        f"abs({mean_ppm} - {rate_ppm}) AS gap_ppm")


# ---------------------------------------------------------------------------
# stats_benford_price_audit — first-significant-digit law
# ---------------------------------------------------------------------------

# log10(1 + 1/d) in ppm, precomputed once so BOTH engines consume the
# same integer literals (no cross-engine log10 knife edge).
_BENFORD_PPM = {
    d: math.floor(math.log10(1.0 + 1.0 / d) * 1e6 + 0.5)
    for d in range(1, 10)
}
_BENFORD_CASE = ("CASE first_digit " + " ".join(
    f"WHEN {d} THEN {p}" for d, p in _BENFORD_PPM.items()) + " END")


@query(
    "stats_benford_price_audit",
    oracle=f"""
    WITH d AS (
      SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS first_digit
      FROM orders),
    c AS (SELECT first_digit, CAST(COUNT(*) AS BIGINT) AS n
          FROM d GROUP BY 1),
    t AS (SELECT first_digit, n, SUM(n) OVER () AS total FROM c)
    SELECT first_digit, n,
           CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / total + 0.5)
                AS BIGINT) AS obs_ppm,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm,
           abs(CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / total + 0.5)
                AS BIGINT) - CAST({_BENFORD_CASE} AS BIGINT)) AS dev_ppm
    FROM t
    """,
)
def stats_benford_price_audit(spark, sf_dir):
    """Benford's-law audit of the leading significant digit of order
    totals — the classic fabricated-data / unit-mixup screen for a
    monetary column. One aggregation collapses the corpus to <= 9
    digit rows (map-side partials); the expected frequencies are
    shared integer-ppm literals, so the deviation column is exact.
    At any scale the window stage sees 9 rows."""
    o = read_table(spark, sf_dir, "orders")
    d = o.selectExpr(
        "CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)"
        " AS STRING), 1, 1) AS INT) AS first_digit")
    c = d.groupBy("first_digit").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    obs = ("CAST(floor(CAST(n AS DOUBLE) * 1000000.0 / total + 0.5)"
           " AS BIGINT)")
    return (
        c.withColumn("total", F.expr("SUM(n) OVER ()"))
        .selectExpr(
            "first_digit", "n",
            f"{obs} AS obs_ppm",
            f"CAST({_BENFORD_CASE} AS BIGINT) AS benford_ppm",
            f"abs({obs} - CAST({_BENFORD_CASE} AS BIGINT)) AS dev_ppm"))


# ---------------------------------------------------------------------------
# stats_mad_outliers_doclen — robust (median/MAD) outlier screen
# ---------------------------------------------------------------------------


@query(
    "stats_mad_outliers_doclen",
    oracle="""
    WITH med AS (
      SELECT lang, CAST(quantile_disc(n_chars, 0.5) AS BIGINT) AS med
      FROM documents GROUP BY 1),
    dev AS (
      SELECT d.lang, m.med, abs(d.n_chars - m.med) AS dev
      FROM documents d JOIN med m USING (lang)),
    mad AS (
      SELECT lang, CAST(quantile_disc(dev, 0.5) AS BIGINT) AS mad
      FROM dev GROUP BY 1)
    SELECT v.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MAX(v.med) AS med, MAX(a.mad) AS mad,
           CAST(SUM(CASE WHEN v.dev * 10000 > 51891 * a.mad
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
           CASE WHEN MAX(a.mad) > 0 THEN
             CAST(floor(CAST(MAX(v.dev) AS DOUBLE) * 10000000000.0
                        / (14826.0 * MAX(a.mad)) + 0.5) AS BIGINT)
           END AS max_z_ppm
    FROM dev v JOIN mad a USING (lang)
    GROUP BY v.lang
    """,
)
def stats_mad_outliers_doclen(spark, sf_dir):
    """Robust per-language outlier screen on document length: median
    and MAD (median absolute deviation) per group, then the count of
    docs whose robust z-score |x - med| / (1.4826 * MAD) exceeds 3.5
    (the Iglewicz-Hoaglin cutoff). The outlier PREDICATE is pure
    integer arithmetic (dev * 10^4 > 51891 * mad, since 3.5 * 1.4826 =
    5.1891) — no float enters the decision; only the reported max z is
    a ppm rendering. When MAD = 0 (constant group) every deviating doc
    is an outlier by convention and max_z is NULL.

    Three corpus passes (median -> deviations/MAD -> screen), each a
    lang-keyed aggregate with map-side partials; the two quantile
    tables are <=|langs| rows and broadcast back — the two-pass exact
    quantile recipe, with approx_percentile the documented 100 TB
    drop-in (quantiles.py)."""
    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    med = docs.groupBy("lang").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)"
               " AS BIGINT)").alias("med"))
    dev = docs.join(F.broadcast(med), "lang").selectExpr(
        "lang", "med", "abs(n_chars - med) AS dev")
    mad = dev.groupBy("lang").agg(
        F.expr("CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)"
               " AS BIGINT)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "lang")
        .groupBy("lang")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
            F.expr("MAX(med)").alias("med"),
            F.expr("MAX(mad)").alias("mad"),
            F.expr("CAST(SUM(CASE WHEN dev * 10000 > 51891 * mad"
                   " THEN 1 ELSE 0 END) AS BIGINT)").alias("n_outliers"),
            F.expr("CASE WHEN MAX(mad) > 0 THEN"
                   " CAST(floor(CAST(MAX(dev) AS DOUBLE) * 10000000000.0"
                   " / (14826.0 * MAX(mad)) + 0.5) AS BIGINT) END")
            .alias("max_z_ppm")))


# ---------------------------------------------------------------------------
# events_cusum_changepoint — integer-exact CUSUM over daily volume
# ---------------------------------------------------------------------------


@query(
    "events_cusum_changepoint",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY 1),
    c AS (
      SELECT day, n_events,
             SUM(n_events) OVER (ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_n,
             ROW_NUMBER() OVER (ORDER BY day) AS rn,
             COUNT(*) OVER () AS n_days,
             SUM(n_events) OVER () AS total
      FROM daily),
    s AS (SELECT day, n_events,
                 CAST(n_days * cum_n - rn * total AS BIGINT)
                   AS cusum_scaled
          FROM c)
    SELECT day, n_events, cusum_scaled,
           abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER ()
             AS is_changepoint
    FROM s
    """,
)
def events_cusum_changepoint(spark, sf_dir):
    """CUSUM changepoint scan over daily event volume: the cumulative
    deviation from the overall daily mean, S_i = Σ_{j<=i}(n_j - μ),
    whose |max| marks the most likely level shift (Page's CUSUM /
    binary-segmentation statistic). Computed SCALED BY n_days —
    S_i * n_days = n_days * cumsum - i * total — so the whole
    statistic is exact BIGINT arithmetic, no division anywhere.
    Aggregate-before-window: the corpus collapses to <=|days| rows
    via map-side partial counts and only that aggregate crosses the
    unpartitioned windows (the events_wow_delta gate shape)."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("day")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"))
    c = daily.selectExpr(
        "day", "n_events",
        "SUM(n_events) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_n",
        "ROW_NUMBER() OVER (ORDER BY day) AS rn",
        "COUNT(*) OVER () AS n_days",
        "SUM(n_events) OVER () AS total")
    s = c.selectExpr(
        "day", "n_events",
        "CAST(n_days * cum_n - rn * total AS BIGINT) AS cusum_scaled")
    return s.selectExpr(
        "day", "n_events", "cusum_scaled",
        "abs(cusum_scaled) = MAX(abs(cusum_scaled)) OVER ()"
        " AS is_changepoint")


# ---------------------------------------------------------------------------
# parts_skyline_frontier — 2-D skyline (Pareto-optimal set)
# ---------------------------------------------------------------------------


@query(
    "parts_skyline_frontier",
    oracle="""
    WITH pp AS (
      SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT)
               AS price_cents,
             CAST(p_size AS INT) AS size
      FROM part),
    pairs AS (SELECT price_cents, size,
                     CAST(COUNT(*) AS BIGINT) AS n_parts
              FROM pp GROUP BY 1, 2)
    SELECT price_cents, size, n_parts
    FROM pairs p
    WHERE NOT EXISTS (
      SELECT 1 FROM pairs q
      WHERE q.price_cents <= p.price_cents AND q.size >= p.size
        AND (q.price_cents < p.price_cents OR q.size > p.size))
    """,
)
def parts_skyline_frontier(spark, sf_dir):
    """Skyline / Pareto frontier over (minimize price, maximize size):
    the set of parts no other part dominates — the multi-objective
    shortlist primitive. The engine's plan is the sort-scan algorithm:
    collapse to distinct (price, size) pairs with counts (one keyed
    aggregate), keep only each price's max size (same-price rows are
    dominated by it), then one ordered window marks rows whose size
    beats the running max over all strictly-cheaper prices. The
    window stage sees |distinct prices| rows, not the corpus; at
    100 TB a coarse price-bucket pre-prune (per-bucket max size
    filters whole buckets, the zone-map argument) bounds that too.
    The oracle is the O(n²) NOT-EXISTS dominance definition — a
    genuinely independent formulation of the same set."""
    p = read_table(spark, sf_dir, "part").selectExpr(
        "CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT) AS price_cents",
        "CAST(p_size AS INT) AS size")
    pairs = p.groupBy("price_cents", "size").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_parts"))
    per_price = Window.partitionBy("price_cents")
    best = (pairs
            .withColumn("msize", F.max("size").over(per_price))
            .filter(F.col("size") == F.col("msize")))
    prev = (Window.orderBy("price_cents")
            .rowsBetween(Window.unboundedPreceding, -1))
    cand = best.withColumn("prev_max", F.max("size").over(prev))
    return (cand
            .filter(F.col("prev_max").isNull()
                    | (F.col("size") > F.col("prev_max")))
            .select("price_cents", "size", "n_parts"))


# ---------------------------------------------------------------------------
# corr_spearman_qty_discount — tied-rank Spearman on bounded domains
# ---------------------------------------------------------------------------


def _rank_map_from_counts(counts, col):
    """Distinct-value tied-rank map from a (col, cnt) frame:
    rank_half = 2*cnt_less + cnt + 1 (twice the average rank — an
    INTEGER, so the whole rank transform is exact; Pearson on ranks
    is scale-invariant)."""
    w = Window.orderBy(col).rowsBetween(Window.unboundedPreceding, -1)
    return counts.select(
        col,
        (F.lit(2) * F.coalesce(F.sum("cnt").over(w), F.lit(0))
         + F.col("cnt") + F.lit(1)).alias(f"{col}_rank2"))


def _rank_map(df, col):
    """Tied-rank map from raw rows (aggregates first)."""
    return _rank_map_from_counts(
        df.groupBy(col).agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")), col)


@query(
    "corr_spearman_qty_discount",
    oracle="""
    WITH li AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc
      FROM lineitem),
    qr AS (SELECT q, 2 * COALESCE(SUM(cnt) OVER (ORDER BY q
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS q_rank2
           FROM (SELECT q, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM li GROUP BY 1)),
    dr AS (SELECT disc, 2 * COALESCE(SUM(cnt) OVER (ORDER BY disc
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              + cnt + 1 AS disc_rank2
           FROM (SELECT disc, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM li GROUP BY 1)),
    rk AS (SELECT q_rank2 AS x, disc_rank2 AS y
           FROM li JOIN qr USING (q) JOIN dr USING (disc)),
    s AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
                 SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(x AS DECIMAL(38,0))
                     * CAST(y AS DECIMAL(38,0))) AS sxy,
                 SUM(CAST(x AS DECIMAL(38,0))
                     * CAST(x AS DECIMAL(38,0))) AS sxx,
                 SUM(CAST(y AS DECIMAL(38,0))
                     * CAST(y AS DECIMAL(38,0))) AS syy
          FROM rk)
    SELECT CAST(n AS BIGINT) AS n_rows,
           CAST(floor(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                    * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                       - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
             * 1000000.0 + 0.5) AS BIGINT) AS rho_ppm
    FROM s
    """,
)
def corr_spearman_qty_discount(spark, sf_dir):
    """Spearman rank correlation between quantity and discount —
    the monotone-association screen Pearson misses. Tied ranks come
    from the distinct-value cumulative-count maps (50- and 11-row
    domains -> windows over dozens of rows), DOUBLED so they stay
    integers; all five moment sums accumulate as DECIMAL(38,0) —
    exact under any partitioning at any row count — and only the
    final rho divides in floating point. The same shape serves any
    bounded/bucketed pair; unbounded domains first bucket through the
    two-pass quantile recipe.

    The moment sums run over the persisted <=550-cell JOINT histogram
    weighted by cell counts — one corpus aggregate, then cell-level
    arithmetic only (the kendall design). The first draft joined the
    rank maps back onto every fact row and paid a per-row 128-bit
    DECIMAL multiply: 16x wall at the 100x probe, vs scan-bound for
    this shape. The oracle deliberately keeps the row-level
    formulation, so the two engines agree through genuinely different
    computations."""
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc")
    # persist: three consumers (both rank marginals + the moment pass)
    joint = li.groupBy("q", "disc").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt")).persist()
    qr = _rank_map_from_counts(
        joint.groupBy("q").agg(
            F.expr("CAST(SUM(cnt) AS BIGINT)").alias("cnt")),
        "q").withColumnRenamed("q_rank2", "x")
    dr = _rank_map_from_counts(
        joint.groupBy("disc").agg(
            F.expr("CAST(SUM(cnt) AS BIGINT)").alias("cnt")),
        "disc").withColumnRenamed("disc_rank2", "y")
    rk = (joint.join(F.broadcast(qr), "q")
          .join(F.broadcast(dr), "disc")
          .select("cnt", "x", "y"))
    s = rk.agg(
        F.expr("CAST(SUM(cnt) AS DECIMAL(38,0))").alias("n"),
        F.expr("SUM(cnt * CAST(x AS DECIMAL(38,0)))").alias("sx"),
        F.expr("SUM(cnt * CAST(y AS DECIMAL(38,0)))").alias("sy"),
        F.expr("SUM(cnt * CAST(x AS DECIMAL(38,0))"
               " * CAST(y AS DECIMAL(38,0)))").alias("sxy"),
        F.expr("SUM(cnt * CAST(x AS DECIMAL(38,0))"
               " * CAST(x AS DECIMAL(38,0)))").alias("sxx"),
        F.expr("SUM(cnt * CAST(y AS DECIMAL(38,0))"
               " * CAST(y AS DECIMAL(38,0)))").alias("syy"))
    return s.selectExpr(
        "CAST(n AS BIGINT) AS n_rows",
        "CAST(floor((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)"
        " - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))"
        " * 1000000.0 + 0.5) AS BIGINT) AS rho_ppm")


# ---------------------------------------------------------------------------
# privacy_l_diversity_audit — l-diversity complement to k-anonymity
# ---------------------------------------------------------------------------


@query(
    "privacy_l_diversity_audit",
    oracle="""
    SELECT lang, source,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT n_chars // 100) AS BIGINT) AS l_distinct,
           COUNT(DISTINCT n_chars // 100) < 3 AS is_weak
    FROM documents
    GROUP BY 1, 2
    """,
)
def privacy_l_diversity_audit(spark, sf_dir):
    """l-diversity audit (Machanavajjhala et al.): for each
    quasi-identifier group (lang, source), the number of DISTINCT
    sensitive values (bucketed doc length) — a k-anonymous group
    where everyone shares one sensitive value still leaks, which is
    exactly what the sibling k-anonymity audit cannot see. One
    grouped aggregate with a distinct inside (two-stage partial
    distinct under AQE); groups with l < 3 are flagged."""
    docs = read_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(COUNT(DISTINCT n_chars DIV 100) AS BIGINT)")
        .alias("l_distinct"),
        F.expr("COUNT(DISTINCT n_chars DIV 100) < 3").alias("is_weak"))


# ---------------------------------------------------------------------------
# attribution_position_events — position-based (U-shaped) attribution
# ---------------------------------------------------------------------------


@query(
    "attribution_position_events",
    oracle="""
    WITH fp AS (
      SELECT user_id, ts AS p_ts, event_id AS p_eid
      FROM (SELECT user_id, ts, event_id,
                   ROW_NUMBER() OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS rn
            FROM events WHERE event_type = 'purchase')
      WHERE rn = 1),
    j AS (
      SELECT e.user_id, e.event_type, e.ts, e.event_id
      FROM events e JOIN fp ON e.user_id = fp.user_id
      WHERE e.ts < fp.p_ts
         OR (e.ts = fp.p_ts AND e.event_id < fp.p_eid)),
    pos AS (
      SELECT event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS rn,
             COUNT(*) OVER (PARTITION BY user_id) AS k
      FROM j),
    credit AS (
      SELECT event_type,
             CASE WHEN k = 1 THEN 1000000
                  WHEN k = 2 THEN 500000
                  WHEN rn = 1 OR rn = k THEN 400000
                  ELSE 200000 // (k - 2) END AS c
      FROM pos)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_touches,
           CAST(SUM(c) AS BIGINT) AS credit_micro
    FROM credit GROUP BY 1
    """,
)
def attribution_position_events(spark, sf_dir):
    """Position-based (U-shaped, 40/20/40) marketing attribution:
    each converting user's journey — every event strictly before
    their first purchase, ordered by (ts, event_id) — credits 40% to
    the first touch, 40% to the last, and splits 20% across the
    middle touches; 1- and 2-touch journeys degenerate to 100% and
    50/50. Credits are integer micro-shares (floor division for the
    middle split, remainder deliberately dropped) so the per-channel
    totals are exact BIGINT sums. All windows are partitioned by
    user_id — embarrassingly parallel at any scale; the first-purchase
    table joins back user-keyed."""
    ev = read_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type")
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (ev.filter(F.col("event_type") == "purchase")
          .withColumn("rn", F.row_number().over(w_u))
          .filter(F.col("rn") == 1)
          .select("user_id", F.col("ts").alias("p_ts"),
                  F.col("event_id").alias("p_eid")))
    j = (ev.join(fp, "user_id")
         .filter((F.col("ts") < F.col("p_ts"))
                 | ((F.col("ts") == F.col("p_ts"))
                    & (F.col("event_id") < F.col("p_eid")))))
    pos = j.select(
        "event_type",
        F.row_number().over(w_u).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("k"))
    credit = pos.selectExpr(
        "event_type",
        "CASE WHEN k = 1 THEN 1000000"
        " WHEN k = 2 THEN 500000"
        " WHEN rn = 1 OR rn = k THEN 400000"
        " ELSE 200000 DIV (k - 2) END AS c")
    return credit.groupBy("event_type").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_touches"),
        F.expr("CAST(SUM(c) AS BIGINT)").alias("credit_micro"))


# ---------------------------------------------------------------------------
# events_survival_km_curve — Kaplan-Meier retention with censoring
# ---------------------------------------------------------------------------

_KM_TERM = ("CASE WHEN n_deaths < n_risk THEN"
            " CAST(floor(ln((CAST(n_risk AS DOUBLE) - n_deaths)"
            " / CAST(n_risk AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
            " ELSE -1000000000 END")


@query(
    "events_survival_km_curve",
    oracle=f"""
    WITH per_user AS (
      SELECT user_id,
             CAST(MIN(CAST(ts AS DATE)) AS DATE) AS first_d,
             CAST(MAX(CAST(ts AS DATE)) AS DATE) AS last_d,
             MIN(CASE WHEN event_type = 'purchase'
                      THEN CAST(ts AS DATE) END) AS purch_d
      FROM events GROUP BY 1),
    u AS (
      SELECT CASE WHEN purch_d IS NOT NULL
                  THEN date_diff('day', first_d, purch_d)
                  ELSE date_diff('day', first_d, last_d) END AS dur,
             CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS died
      FROM per_user),
    t AS (
      SELECT dur, CAST(COUNT(*) AS BIGINT) AS n_at,
             CAST(SUM(died) AS BIGINT) AS n_deaths
      FROM u GROUP BY 1),
    r AS (
      SELECT dur, n_deaths,
             CAST(SUM(n_at) OVER () - COALESCE(SUM(n_at) OVER (
               ORDER BY dur ROWS BETWEEN UNBOUNDED PRECEDING
               AND 1 PRECEDING), 0) AS BIGINT) AS n_risk
      FROM t),
    d AS (SELECT dur, n_risk, n_deaths, {_KM_TERM} AS term
          FROM r WHERE n_deaths > 0)
    SELECT CAST(dur AS BIGINT) AS dur_days, n_risk, n_deaths,
           CAST(SUM(term) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED
             PRECEDING AND CURRENT ROW) AS BIGINT) AS km_log_micro
    FROM d
    """,
)
def events_survival_km_curve(spark, sf_dir):
    """Kaplan-Meier time-to-conversion curve: the "event" is a user's
    first purchase, measured in days from their first touch; users
    who never purchase are right-censored at their observed lifetime
    (they stay in the risk set through every time they survived —
    exactly the information a naive converted-only average throws
    away). Per death-time t: the risk set n(t), deaths d(t), and the
    cumulative log survival Σ ln(1 - d/n) — each term quantized to
    integer micro BEFORE summation (the DSIR/bigram ln convention) so
    the running sum is engine-exact; a risk set that dies out
    contributes the -1e9 sentinel (S -> 0). Aggregate-before-window
    throughout: events collapse user-keyed, users collapse to
    <=|distinct durations| rows, and only that table crosses the
    ordered windows. Censoring semantics are pinned on a planted
    synthetic frame in tests/test_round7b_semantics.py."""
    ev = read_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.expr("CAST(MIN(CAST(ts AS DATE)) AS DATE)").alias("first_d"),
        F.expr("CAST(MAX(CAST(ts AS DATE)) AS DATE)").alias("last_d"),
        F.expr("MIN(CASE WHEN event_type = 'purchase'"
               " THEN CAST(ts AS DATE) END)").alias("purch_d"))
    u = per_user.selectExpr(
        "CASE WHEN purch_d IS NOT NULL THEN datediff(purch_d, first_d)"
        " ELSE datediff(last_d, first_d) END AS dur",
        "CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS died")
    t = u.groupBy("dur").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_at"),
        F.expr("CAST(SUM(died) AS BIGINT)").alias("n_deaths"))
    r = t.selectExpr(
        "dur", "n_deaths",
        "CAST(SUM(n_at) OVER () - COALESCE(SUM(n_at) OVER (ORDER BY dur"
        " ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)"
        " AS BIGINT) AS n_risk")
    d = r.filter("n_deaths > 0").selectExpr(
        "dur", "n_risk", "n_deaths", f"{_KM_TERM} AS term")
    return d.selectExpr(
        "CAST(dur AS BIGINT) AS dur_days", "n_risk", "n_deaths",
        "CAST(SUM(term) OVER (ORDER BY dur ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS BIGINT) AS km_log_micro")


# ---------------------------------------------------------------------------
# events_seasonality_dow — day-of-week seasonal index
# ---------------------------------------------------------------------------


@query(
    "events_seasonality_dow",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    dd AS (
      SELECT ((date_diff('day', DATE '2024-01-01', day) % 7) + 7) % 7
               AS dow,
             n
      FROM daily),
    per AS (
      SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(n) AS BIGINT) AS n_events
      FROM dd GROUP BY 1),
    t AS (SELECT dow, n_days, n_events,
                 SUM(n_days) OVER () AS days_all,
                 SUM(n_events) OVER () AS total
          FROM per)
    SELECT CAST(dow AS BIGINT) AS dow, n_days, n_events,
           CAST(floor(((CAST(n_events AS DOUBLE) * days_all) * 1000000.0)
                / (CAST(n_days AS DOUBLE) * total) + 0.5) AS BIGINT)
             AS index_ppm
    FROM t
    """,
)
def events_seasonality_dow(spark, sf_dir):
    """Day-of-week seasonal index: each weekday's mean daily volume
    relative to the overall mean, in ppm (1e6 = flat). The weekday is
    integer days-since-a-fixed-Monday mod 7 — engine-neutral, no
    locale/DOW-origin convention to disagree on. Two bounded
    aggregations (days, then 7 weekday rows); the index is a single
    deterministic double expression over exact integer counts."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    per = (daily.selectExpr(
        "((datediff(day, DATE '2024-01-01') % 7) + 7) % 7 AS dow", "n")
        .groupBy("dow")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
             F.expr("CAST(SUM(n) AS BIGINT)").alias("n_events")))
    return (per
            .withColumn("days_all", F.expr("SUM(n_days) OVER ()"))
            .withColumn("total", F.expr("SUM(n_events) OVER ()"))
            .selectExpr(
                "CAST(dow AS BIGINT) AS dow", "n_days", "n_events",
                "CAST(floor(((CAST(n_events AS DOUBLE) * days_all)"
                " * 1000000.0) / (CAST(n_days AS DOUBLE) * total) + 0.5)"
                " AS BIGINT) AS index_ppm"))


# ---------------------------------------------------------------------------
# text_zipf_vocab_fit — Zipf slope of the frequency-rank curve
# ---------------------------------------------------------------------------

_ZIPF_K = 1000


@query(
    "text_zipf_vocab_fit",
    oracle=f"""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(lower(text), '\\s+'),
                                x -> x != '')) AS tok
      FROM documents),
    freq AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
             FROM toks GROUP BY 1),
    top AS (SELECT tok, n FROM freq
            ORDER BY n DESC, tok LIMIT {_ZIPF_K}),
    xy AS (
      SELECT CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)
                   AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x,
             CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5)
                  AS BIGINT) AS y
      FROM top),
    s AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS k,
                 SUM(CAST(x AS DECIMAL(38,0))) AS sx,
                 SUM(CAST(y AS DECIMAL(38,0))) AS sy,
                 SUM(CAST(x AS DECIMAL(38,0))
                     * CAST(y AS DECIMAL(38,0))) AS sxy,
                 SUM(CAST(x AS DECIMAL(38,0))
                     * CAST(x AS DECIMAL(38,0))) AS sxx
          FROM xy)
    SELECT CAST(k AS BIGINT) AS n_top,
           CAST(floor((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
               / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
               * 1000000.0 + 0.5) AS BIGINT) AS slope_ppm,
           CAST(floor((CAST(sy AS DOUBLE) - (CAST(k AS DOUBLE)
                * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sy AS DOUBLE)) / (CAST(k AS DOUBLE)
                * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))
               / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS intercept_micro
    FROM s
    """,
)
def text_zipf_vocab_fit(spark, sf_dir):
    """Zipf's-law fit over the vocabulary: least-squares slope of
    ln(frequency) against ln(rank) for the top-K words — the
    natural-corpus slope is ~ -1, and a corpus of boilerplate or
    template spam shows up as a flagrantly different exponent, which
    makes this a one-row corpus-health probe. Top-K is
    TakeOrderedAndProject (per-task heaps, no corpus sort); ln terms
    are micro-quantized integers before the DECIMAL(38,0) moment
    sums, and only the final slope/intercept divide in floating
    point."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)
    docs = read_table(spark, sf_dir, "documents")
    freq = (docs.select(
        F.explode(F.expr(fast_words_expr("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")))
    top = freq.orderBy(F.col("n").desc(), "tok").limit(_ZIPF_K)
    xy = top.selectExpr(
        "CAST(floor(ln(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok)"
        " AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS x",
        "CAST(floor(ln(CAST(n AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT)"
        " AS y")
    s = xy.agg(
        F.expr("CAST(COUNT(*) AS DECIMAL(38,0))").alias("k"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)))").alias("sx"),
        F.expr("SUM(CAST(y AS DECIMAL(38,0)))").alias("sy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))")
        .alias("sxy"),
        F.expr("SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))")
        .alias("sxx"))
    return s.selectExpr(
        "CAST(k AS BIGINT) AS n_top",
        "CAST(floor((CAST(k AS DOUBLE) * CAST(sxy AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))"
        " / (CAST(k AS DOUBLE) * CAST(sxx AS DOUBLE)"
        " - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"
        " * 1000000.0 + 0.5) AS BIGINT) AS slope_ppm",
        "CAST(floor((CAST(sy AS DOUBLE) - (CAST(k AS DOUBLE)"
        " * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sy AS DOUBLE)) / (CAST(k AS DOUBLE)"
        " * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)"
        " * CAST(sx AS DOUBLE)) * CAST(sx AS DOUBLE))"
        " / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS intercept_micro")


# ---------------------------------------------------------------------------
# incremental_agg_maintenance — CDC delta into a materialized rollup
# ---------------------------------------------------------------------------

_SPLIT = "DATE '1999-01-01'"


@query(
    "incremental_agg_maintenance",
    oracle=f"""
    WITH o AS (
      SELECT o_orderkey AS k, o_orderstatus, o_orderpriority,
             CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS d
      FROM orders),
    final AS (
      SELECT o_orderstatus, o_orderpriority,
             CASE WHEN d < {_SPLIT} AND k % 97 = 0
                  THEN (cents * 11) // 10 ELSE cents END AS cents
      FROM o
      WHERE NOT (d < {_SPLIT} AND k % 89 = 0 AND k % 97 <> 0))
    SELECT o_orderstatus, o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(cents) AS BIGINT) AS sum_cents
    FROM final GROUP BY 1, 2
    """,
)
def incremental_agg_maintenance(spark, sf_dir):
    """Incremental view maintenance: a materialized (count, sum)
    rollup of pre-1999 orders is MAINTAINED — never recomputed —
    under a CDC batch of inserts (post-split orders), updates (keys
    = 0 mod 97 get +10% price, integer cents) and deletes (keys = 0
    mod 89). The engine path is operators/incremental.py: one shuffle
    over the CDC batch to per-group deltas, then a union
    re-aggregate merge into the base aggregate — the base TABLE is
    never re-scanned (and with a bucketed base layout the merge never
    moves the base aggregate either), which is the whole point at
    100 TB. The oracle recomputes the post-CDC state from scratch, so
    the driver hash certifies maintain == recompute."""
    o = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey AS k", "o_orderstatus", "o_orderpriority",
        "CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents",
        "CAST(o_orderdate AS DATE) AS d")
    keys = ["o_orderstatus", "o_orderpriority"]
    base = o.filter(f"d < {_SPLIT}")
    base_agg = base.groupBy(*keys).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_orders"),
        F.expr("SUM(CAST(cents AS DECIMAL(38,0)))").alias("sum_cents"))
    inserts = o.filter(f"d >= {_SPLIT}").selectExpr(
        "'I' AS op", *keys, "cents AS new_cents",
        "CAST(NULL AS BIGINT) AS old_cents")
    updates = base.filter("k % 97 = 0").selectExpr(
        "'U' AS op", *keys, "(cents * 11) DIV 10 AS new_cents",
        "cents AS old_cents")
    deletes = base.filter("k % 89 = 0 AND k % 97 <> 0").selectExpr(
        "'D' AS op", *keys, "CAST(NULL AS BIGINT) AS new_cents",
        "cents AS old_cents")
    cdc = inserts.unionByName(updates).unionByName(deletes)
    deltas = incremental.cdc_to_group_deltas(
        cdc, keys, "new_cents", "old_cents")
    maintained = incremental.maintain_sum_count(
        base_agg, deltas, keys, n_col="n_orders", sum_col="sum_cents")
    return maintained.selectExpr(
        *keys, "n_orders", "CAST(sum_cents AS BIGINT) AS sum_cents")


# ---------------------------------------------------------------------------
# corr_kendall_tau_qty_discount — tau-b from the joint histogram
# ---------------------------------------------------------------------------


@query(
    "corr_kendall_tau_qty_discount",
    oracle="""
    WITH li AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS q,
             CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc
      FROM lineitem),
    joint AS (SELECT q, disc, CAST(COUNT(*) AS BIGINT) AS n
              FROM li GROUP BY 1, 2),
    pairs AS (
      SELECT CAST(SUM(CASE WHEN (a.disc < b.disc) THEN
                   CAST(a.n AS DECIMAL(38,0)) * b.n ELSE 0 END)
                  AS DECIMAL(38,0)) AS c,
             CAST(SUM(CASE WHEN (a.disc > b.disc) THEN
                   CAST(a.n AS DECIMAL(38,0)) * b.n ELSE 0 END)
                  AS DECIMAL(38,0)) AS d
      FROM joint a JOIN joint b ON a.q < b.q),
    marg AS (
      SELECT CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS nn,
             SUM(CAST(n AS DECIMAL(38,0)) * (n - 1) / 2) AS t_joint
      FROM joint),
    tq AS (SELECT SUM(CAST(nq AS DECIMAL(38,0)) * (nq - 1) / 2) AS t_q
           FROM (SELECT SUM(n) AS nq FROM joint GROUP BY q)),
    td AS (SELECT SUM(CAST(nd AS DECIMAL(38,0)) * (nd - 1) / 2) AS t_d
           FROM (SELECT SUM(n) AS nd FROM joint GROUP BY disc))
    SELECT CAST(nn AS BIGINT) AS n_rows,
           CAST(c AS BIGINT) AS n_concordant,
           CAST(d AS BIGINT) AS n_discordant,
           CAST(floor((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))
               / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2
                       - CAST(t_q AS DOUBLE))
                    * (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2
                       - CAST(t_d AS DOUBLE)))
               * 1000000.0 + 0.5) AS BIGINT) AS tau_b_ppm
    FROM pairs, marg, tq, td
    """,
)
def corr_kendall_tau_qty_discount(spark, sf_dir):
    """Kendall tau-b between quantity and discount — the
    concordant/discordant-pair rank statistic, with the tie
    correction both marginals need on discrete data. The naive
    definition is O(n²) pairs; here the corpus first collapses to the
    <=|q-domain|x|disc-domain| JOINT histogram (one aggregate), and
    concordance is counted over CELL pairs weighted by count
    products — bounded work (<=550² cell pairs) at any corpus size,
    exact DECIMAL(38,0) arithmetic until the final tau. The q < q'
    cell join is a broadcast nested loop over the tiny aggregate
    (allowlisted — nothing corpus-sized flows through it)."""
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS q",
        "CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc")
    # persist: four consumers (pairs, total, both tie marginals) read
    # the <=550-row joint histogram — one corpus scan, not four (the
    # minhash shingle-table convention; ReuseExchange does not fire
    # across the differing projections)
    joint = li.groupBy("q", "disc").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")).persist()
    a = joint.selectExpr("q AS qa", "disc AS da", "n AS na")
    b = joint.selectExpr("q AS qb", "disc AS db", "n AS nb")
    pairs = (a.join(F.broadcast(b), F.expr("qa < qb"))
             .agg(
        F.expr("CAST(SUM(CASE WHEN da < db THEN"
               " CAST(na AS DECIMAL(38,0)) * nb ELSE 0 END)"
               " AS DECIMAL(38,0))").alias("c"),
        F.expr("CAST(SUM(CASE WHEN da > db THEN"
               " CAST(na AS DECIMAL(38,0)) * nb ELSE 0 END)"
               " AS DECIMAL(38,0))").alias("d")))
    marg = joint.agg(
        F.expr("CAST(SUM(CAST(n AS DECIMAL(38,0))) AS DECIMAL(38,0))")
        .alias("nn"))
    tq = (joint.groupBy("q").agg(F.expr("SUM(n)").alias("nq"))
          .agg(F.expr("SUM(CAST(nq AS DECIMAL(38,0)) * (nq - 1) / 2)")
               .alias("t_q")))
    td = (joint.groupBy("disc").agg(F.expr("SUM(n)").alias("nd"))
          .agg(F.expr("SUM(CAST(nd AS DECIMAL(38,0)) * (nd - 1) / 2)")
               .alias("t_d")))
    out = (pairs.crossJoin(F.broadcast(marg))
           .crossJoin(F.broadcast(tq)).crossJoin(F.broadcast(td)))
    return out.selectExpr(
        "CAST(nn AS BIGINT) AS n_rows",
        "CAST(c AS BIGINT) AS n_concordant",
        "CAST(d AS BIGINT) AS n_discordant",
        "CAST(floor((CAST(c AS DOUBLE) - CAST(d AS DOUBLE))"
        " / sqrt((CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2"
        " - CAST(t_q AS DOUBLE))"
        " * (CAST(nn AS DOUBLE) * (CAST(nn AS DOUBLE) - 1) / 2"
        " - CAST(t_d AS DOUBLE)))"
        " * 1000000.0 + 0.5) AS BIGINT) AS tau_b_ppm")


# ---------------------------------------------------------------------------
# agg_hodges_lehmann_quantity — pseudo-median from the value histogram
# ---------------------------------------------------------------------------


@query(
    "agg_hodges_lehmann_quantity",
    oracle="""
    WITH li AS (
      SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS v
      FROM lineitem),
    h AS (SELECT v, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY 1),
    walsh AS (
      SELECT a.v + b.v AS w2,
             CASE WHEN a.v < b.v
                  THEN CAST(a.n AS DECIMAL(38,0)) * b.n
                  ELSE CAST(a.n AS DECIMAL(38,0)) * (a.n + 1) / 2
             END AS wt
      FROM h a JOIN h b ON a.v <= b.v),
    g AS (SELECT w2, CAST(SUM(wt) AS DECIMAL(38,0)) AS wt
          FROM walsh GROUP BY 1),
    c AS (SELECT w2, wt,
                 SUM(wt) OVER (ORDER BY w2 ROWS BETWEEN UNBOUNDED
                   PRECEDING AND CURRENT ROW) AS cum,
                 SUM(wt) OVER () AS tot
          FROM g)
    SELECT CAST(MIN(CASE WHEN 2 * cum >= tot + 1 THEN w2 END)
                AS BIGINT) AS hl2,
           CAST(MAX(tot) AS BIGINT) AS n_walsh_pairs
    FROM c
    """,
)
def agg_hodges_lehmann_quantity(spark, sf_dir):
    """Hodges-Lehmann pseudo-median of quantity: the median of all
    Walsh averages (x_i + x_j)/2 for i <= j — the location estimator
    behind the Wilcoxon signed-rank test, robust like the median but
    ~50% more statistically efficient. Naively O(n²) pairs; on a
    bounded domain the corpus collapses to its <=|domain| value
    histogram and Walsh weights are COUNT PRODUCTS over <=|domain|²/2
    cell pairs (same-value cells contribute n(n+1)/2 within-pairs).
    Reported DOUBLED (w2 = v_i + v_j) so everything stays integer;
    the weighted lower median is the standard smallest-value-with-
    2·cum >= W+1 convention. The v <= v' cell join is a broadcast
    nested loop over the tiny histogram (allowlisted)."""
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "CAST(floor(l_quantity + 0.5) AS BIGINT) AS v")
    h = li.groupBy("v").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    a = h.selectExpr("v AS va", "n AS na")
    b = h.selectExpr("v AS vb", "n AS nb")
    walsh = (a.join(F.broadcast(b), F.expr("va <= vb"))
             .selectExpr(
        "va + vb AS w2",
        "CASE WHEN va < vb THEN CAST(na AS DECIMAL(38,0)) * nb"
        " ELSE CAST(na AS DECIMAL(38,0)) * (na + 1) / 2 END AS wt"))
    g = walsh.groupBy("w2").agg(
        F.expr("CAST(SUM(wt) AS DECIMAL(38,0))").alias("wt"))
    c = g.selectExpr(
        "w2", "wt",
        "SUM(wt) OVER (ORDER BY w2 ROWS BETWEEN UNBOUNDED PRECEDING"
        " AND CURRENT ROW) AS cum",
        "SUM(wt) OVER () AS tot")
    return c.selectExpr(
        "CAST(MIN(CASE WHEN 2 * cum >= tot + 1 THEN w2 END) AS BIGINT)"
        " AS hl2",
        "CAST(MAX(tot) AS BIGINT) AS n_walsh_pairs")


# ---------------------------------------------------------------------------
# forecast_mase_seasonal_naive — forecast-quality baseline
# ---------------------------------------------------------------------------


@query(
    "forecast_mase_seasonal_naive",
    oracle="""
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    lagged AS (
      SELECT day, n,
             lag(n, 7) OVER (ORDER BY day) AS n_7,
             lag(n, 1) OVER (ORDER BY day) AS n_1
      FROM daily),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
             CAST(SUM(CASE WHEN n_7 IS NOT NULL
                  THEN abs(n - n_7) END) AS BIGINT) AS ae7,
             CAST(SUM(CASE WHEN n_7 IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS t7,
             CAST(SUM(CASE WHEN n_1 IS NOT NULL
                  THEN abs(n - n_1) END) AS BIGINT) AS ae1,
             CAST(SUM(CASE WHEN n_1 IS NOT NULL THEN 1 ELSE 0 END)
                  AS BIGINT) AS t1
      FROM lagged)
    SELECT n_days, ae7, t7, ae1, t1,
           CASE WHEN ae1 > 0 THEN
             CAST(floor((CAST(ae7 AS DOUBLE) * t1) * 1000000.0
                  / (CAST(t7 AS DOUBLE) * ae1) + 0.5) AS BIGINT)
           END AS mase_ppm
    FROM s
    """,
)
def forecast_mase_seasonal_naive(spark, sf_dir):
    """MASE (mean absolute scaled error) of the seasonal-naive
    forecast n̂_t = n_{t-7} on daily event volume, scaled by the
    one-step naive's in-sample MAE — the standard scale-free
    forecast-quality baseline (Hyndman-Koehler): any model worth
    deploying must beat this number. Absolute errors are exact BIGINT
    sums over the <=|days| daily aggregate; only the final ratio is a
    deterministic double. NULL when the denominator series is flat."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.expr("CAST(CAST(ts AS DATE) AS STRING)").alias("day")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    lagged = daily.selectExpr(
        "day", "n",
        "lag(n, 7) OVER (ORDER BY day) AS n_7",
        "lag(n, 1) OVER (ORDER BY day) AS n_1")
    s = lagged.agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_days"),
        F.expr("CAST(SUM(CASE WHEN n_7 IS NOT NULL THEN abs(n - n_7)"
               " END) AS BIGINT)").alias("ae7"),
        F.expr("CAST(SUM(CASE WHEN n_7 IS NOT NULL THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("t7"),
        F.expr("CAST(SUM(CASE WHEN n_1 IS NOT NULL THEN abs(n - n_1)"
               " END) AS BIGINT)").alias("ae1"),
        F.expr("CAST(SUM(CASE WHEN n_1 IS NOT NULL THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("t1"))
    return s.selectExpr(
        "n_days", "ae7", "t7", "ae1", "t1",
        "CASE WHEN ae1 > 0 THEN"
        " CAST(floor((CAST(ae7 AS DOUBLE) * t1) * 1000000.0"
        " / (CAST(t7 AS DOUBLE) * ae1) + 0.5) AS BIGINT) END AS mase_ppm")


# ---------------------------------------------------------------------------
# events_anomaly_deseasonalized — day vs its weekday mean
# ---------------------------------------------------------------------------


@query(
    "events_anomaly_deseasonalized",
    oracle="""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY 1),
    dd AS (
      SELECT day, n,
             ((date_diff('day', DATE '2024-01-01', day) % 7) + 7) % 7
               AS dow
      FROM daily),
    w AS (
      SELECT CAST(day AS VARCHAR) AS day, n, CAST(dow AS BIGINT) AS dow,
             SUM(n) OVER (PARTITION BY dow) AS n_dow,
             COUNT(*) OVER (PARTITION BY dow) AS days_dow
      FROM dd),
    r AS (
      SELECT day, n, dow,
             CAST(floor((CAST(n AS DOUBLE) * days_dow) * 1000000.0
                  / CAST(n_dow AS DOUBLE) + 0.5) AS BIGINT) AS ratio_ppm
      FROM w)
    SELECT day, n AS n_events, dow, ratio_ppm,
           abs(ratio_ppm - 1000000)
             = MAX(abs(ratio_ppm - 1000000)) OVER () AS is_anomaly
    FROM r
    """,
)
def events_anomaly_deseasonalized(spark, sf_dir):
    """Weekday-deseasonalized volume anomaly: each day's count
    relative to ITS OWN weekday's mean (ratio in ppm, 1e6 = normal),
    flagging the largest deviation — the screen that does not cry
    wolf every weekend the way a raw z-score over daily counts does
    (composes events_seasonality_dow with events_anomaly_zscore's
    flagging shape). All windows run over the <=|days| daily
    aggregate; the ratio is one deterministic double expression over
    exact integer counts."""
    ev = read_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.expr("CAST(ts AS DATE)").alias("day")).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"))
    dd = daily.selectExpr(
        "day", "n",
        "((datediff(day, DATE '2024-01-01') % 7) + 7) % 7 AS dow")
    w = dd.selectExpr(
        "CAST(day AS STRING) AS day", "n", "CAST(dow AS BIGINT) AS dow",
        "SUM(n) OVER (PARTITION BY dow) AS n_dow",
        "COUNT(*) OVER (PARTITION BY dow) AS days_dow")
    r = w.selectExpr(
        "day", "n", "dow",
        "CAST(floor((CAST(n AS DOUBLE) * days_dow) * 1000000.0"
        " / CAST(n_dow AS DOUBLE) + 0.5) AS BIGINT) AS ratio_ppm")
    return r.selectExpr(
        "day", "n AS n_events", "dow", "ratio_ppm",
        "abs(ratio_ppm - 1000000)"
        " = MAX(abs(ratio_ppm - 1000000)) OVER () AS is_anomaly")
