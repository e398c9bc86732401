"""Round-6 third batch: evaluation / statistics operators.

The training-data engine's missing quadrant after dedup, curation and
retrieval: *measuring* classifiers and distributions at corpus scale.
Every query follows the repo-wide exactness conventions (integer /
decimal terms, ppm or micro-unit fixed-point outputs, window-over-
aggregate shapes) so the DuckDB oracle hash-matches bit-for-bit.

No reference counterpart (the 450-line reference has no analytics);
these extend SURVEY.md §2.12 the same way the Gini / Pareto /
bootstrap family did.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table


# ---------------------------------------------------------------------------
# eval_auc_doclen_lang — exact ROC AUC from rank sums (Mann-Whitney U)
# ---------------------------------------------------------------------------


@query(
    "eval_auc_doclen_lang",
    oracle="""
    WITH d AS (SELECT n_chars AS s,
                      CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
               FROM documents),
    g AS (SELECT s, CAST(SUM(pos) AS BIGINT) AS np,
                 CAST(SUM(1 - pos) AS BIGINT) AS nn
          FROM d GROUP BY 1),
    r AS (SELECT np, nn,
                 COALESCE(SUM(nn) OVER (ORDER BY s
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                   0) AS cb
          FROM g)
    SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
           CAST(SUM(nn) AS BIGINT) AS n_neg,
           CAST(floor(CAST(SUM(np * (2 * cb + nn)) AS DOUBLE) * 1e6
                / (2e0 * SUM(np) * SUM(nn)) + 0.5) AS BIGINT) AS auc_ppm
    FROM r
    """,
)
def eval_auc_doclen_lang(spark, sf_dir):
    """Exact ROC AUC of `n_chars` as a classifier for `lang = 'en'` —
    the evaluation primitive behind every quality-classifier gate in a
    curation pipeline ("does this score actually separate keep from
    drop?"). AUC is the Mann-Whitney statistic: P(score_pos > score_neg)
    + 0.5 * P(tie). Ties are handled exactly by grouping per distinct
    score: with cb = negatives strictly below a score and nn = negatives
    tied at it, 2U = sum over scores of np * (2*cb + nn), and
    AUC = U / (n_pos * n_neg). Every term is an exact integer; only the
    final ppm division is floating (well inside 2^53), so the output is
    deterministic on both engines.

    Scale shape: the corpus collapses to a |distinct scores| aggregate
    FIRST; the ordered prefix-sum window runs over that aggregate only
    (aggregate-before-window — the events_user_gini pattern). At
    billions of rows with near-continuous scores the documented
    fallback is quantile-binned scores through the two-pass quantile
    recipe, which bounds the aggregate at |bins| rows.
    """
    d = read_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        F.expr("CASE WHEN lang = 'en' THEN 1 ELSE 0 END").alias("pos"))
    g = d.groupBy("s").agg(
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("np"),
        F.expr("CAST(SUM(1 - pos) AS BIGINT)").alias("nn"))
    w = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, -1)
    r = g.select(
        "np", "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0).cast("bigint"))
        .alias("cb"))
    return r.agg(
        F.expr("CAST(SUM(np) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(nn) AS BIGINT)").alias("n_neg"),
        F.expr("CAST(floor(CAST(SUM(np * (2 * cb + nn)) AS DOUBLE) * 1e6"
               " / (2e0 * SUM(np) * SUM(nn)) + 0.5) AS BIGINT)")
        .alias("auc_ppm"))


# ---------------------------------------------------------------------------
# stats_ks_doclen_drift — exact two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------


@query(
    "stats_ks_doclen_drift",
    oracle="""
    WITH d AS (SELECT n_chars AS s,
                      CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS a
               FROM documents),
    g AS (SELECT s, CAST(SUM(a) AS BIGINT) AS ca,
                 CAST(SUM(1 - a) AS BIGINT) AS cb
          FROM d GROUP BY 1),
    r AS (SELECT
            CAST(SUM(ca) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_a,
            CAST(SUM(cb) OVER (ORDER BY s
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              AS BIGINT) AS cum_b,
            CAST(SUM(ca) OVER () AS BIGINT) AS ta,
            CAST(SUM(cb) OVER () AS BIGINT) AS tb
          FROM g)
    SELECT MAX(ta) AS n_even, MAX(tb) AS n_odd,
           CAST(floor(CAST(MAX(ABS(cum_a * tb - cum_b * ta)) AS DOUBLE)
                * 1e6 / (CAST(MAX(ta) AS DOUBLE) * MAX(tb)) + 0.5)
             AS BIGINT) AS ks_ppm
    FROM r
    """,
)
def stats_ks_doclen_drift(spark, sf_dir):
    """Exact two-sample Kolmogorov-Smirnov statistic between the
    doc-length distributions of the even- and odd-id halves of the
    corpus — the drift test you run between two crawl snapshots before
    mixing them ("did the new crawl's length profile shift?"). The id
    parity split stands in for old-vs-new crawl; `corpus_drift_report`
    covers the categorical columns, this covers a numeric CDF.

    D = max_x |F_a(x) - F_b(x)| is computed without any floating
    division inside the max: the scaled deviation
    |cum_a * n_b - cum_b * n_a| is an exact integer per distinct score,
    and only the final ppm normalization divides. Scale shape: corpus
    -> |distinct scores| aggregate, cumulative windows over the
    aggregate only (aggregate-before-window); the same quantile-binning
    fallback as eval_auc_doclen_lang applies for continuous scores.
    """
    d = read_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END").alias("a"))
    g = d.groupBy("s").agg(
        F.expr("CAST(SUM(a) AS BIGINT)").alias("ca"),
        F.expr("CAST(SUM(1 - a) AS BIGINT)").alias("cb"))
    wc = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    wall = Window.partitionBy()
    r = g.select(
        F.sum("ca").over(wc).cast("bigint").alias("cum_a"),
        F.sum("cb").over(wc).cast("bigint").alias("cum_b"),
        F.sum("ca").over(wall).cast("bigint").alias("ta"),
        F.sum("cb").over(wall).cast("bigint").alias("tb"))
    return r.agg(
        F.max("ta").alias("n_even"),
        F.max("tb").alias("n_odd"),
        F.expr("CAST(floor(CAST(MAX(ABS(cum_a * tb - cum_b * ta))"
               " AS DOUBLE) * 1e6 / (CAST(MAX(ta) AS DOUBLE) * MAX(tb))"
               " + 0.5) AS BIGINT)").alias("ks_ppm"))


# ---------------------------------------------------------------------------
# stats_chi2_lang_source — chi-square independence over the contingency
# ---------------------------------------------------------------------------


@query(
    "stats_chi2_lang_source",
    oracle="""
    WITH o AS (SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS obs
               FROM documents GROUP BY 1, 2),
    e AS (SELECT obs,
                 CAST(SUM(obs) OVER (PARTITION BY lang) AS BIGINT)
                   AS row_tot,
                 CAST(SUM(obs) OVER (PARTITION BY source) AS BIGINT)
                   AS col_tot,
                 CAST(SUM(obs) OVER () AS BIGINT) AS tot
          FROM o),
    t AS (SELECT tot,
                 CAST(floor(CAST(obs AS DOUBLE) * obs * tot
                      / (CAST(row_tot AS DOUBLE) * col_tot) * 1e6 + 0.5)
                   AS BIGINT) AS term_micro
          FROM e)
    SELECT (SELECT CAST(COUNT(DISTINCT lang) AS BIGINT) FROM documents)
             AS n_langs,
           (SELECT CAST(COUNT(DISTINCT source) AS BIGINT) FROM documents)
             AS n_sources,
           CAST(SUM(term_micro) - MAX(tot) * 1000000 AS BIGINT)
             AS chi2_micro
    FROM t
    """,
)
def stats_chi2_lang_source(spark, sf_dir):
    """Chi-square independence statistic over the lang x source
    contingency table — "does language depend on crawl source?", the
    categorical companion to the KS drift test. Uses the identity
    chi2 = sum(obs^2 * tot / (row * col)) - tot so expected counts
    never materialize; each per-cell term is integer-ratio arithmetic
    in IEEE doubles (multiplies/divides only — bit-identical across
    engines, unlike the libm transcendentals the NMI query had to
    quantize) quantized to micro units before the integer sum, so
    accumulation order cannot perturb the output.

    Scale shape: the corpus collapses to the |langs| x |sources| cell
    aggregate first; the row/column/total marginals are windows over
    that tiny aggregate (window-over-aggregate). The distinct-count
    header scans collapse map-side.
    """
    docs = read_table(spark, sf_dir, "documents")
    o = docs.groupBy("lang", "source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("obs"))
    e = o.select(
        "obs",
        F.sum("obs").over(Window.partitionBy("lang")).cast("bigint")
        .alias("row_tot"),
        F.sum("obs").over(Window.partitionBy("source")).cast("bigint")
        .alias("col_tot"),
        F.sum("obs").over(Window.partitionBy()).cast("bigint")
        .alias("tot"))
    t = e.select(
        "tot",
        F.expr("CAST(floor(CAST(obs AS DOUBLE) * obs * tot"
               " / (CAST(row_tot AS DOUBLE) * col_tot) * 1e6 + 0.5)"
               " AS BIGINT)").alias("term_micro"))
    dims = docs.agg(
        F.expr("CAST(COUNT(DISTINCT lang) AS BIGINT)").alias("n_langs"),
        F.expr("CAST(COUNT(DISTINCT source) AS BIGINT)")
        .alias("n_sources"))
    chi = t.agg(
        F.expr("CAST(SUM(term_micro) - MAX(tot) * 1000000 AS BIGINT)")
        .alias("chi2_micro"))
    return dims.crossJoin(chi).select("n_langs", "n_sources", "chi2_micro")


# ---------------------------------------------------------------------------
# assoc_rules_brand_pairs — co-purchase support / confidence / lift
# ---------------------------------------------------------------------------


@query(
    "assoc_rules_brand_pairs",
    oracle="""
    WITH ob AS (SELECT DISTINCT l.l_orderkey AS okey, p.p_brand AS brand
                FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
    n AS (SELECT CAST(COUNT(DISTINCT okey) AS BIGINT) AS n_orders FROM ob),
    bc AS (SELECT brand, CAST(COUNT(*) AS BIGINT) AS cnt
           FROM ob GROUP BY 1),
    pr AS (SELECT a.brand AS brand_a, b.brand AS brand_b,
                  CAST(COUNT(*) AS BIGINT) AS pair_cnt
           FROM ob a JOIN ob b
             ON a.okey = b.okey AND a.brand < b.brand
           GROUP BY 1, 2)
    SELECT pr.brand_a, pr.brand_b, pr.pair_cnt,
           CAST(floor(CAST(pr.pair_cnt AS DOUBLE) * 1e6 / n.n_orders
                + 0.5) AS BIGINT) AS support_ppm,
           CAST(floor(CAST(pr.pair_cnt AS DOUBLE) * 1e6 / ca.cnt + 0.5)
             AS BIGINT) AS confidence_ppm,
           CAST(floor(CAST(pr.pair_cnt AS DOUBLE) * n.n_orders * 1e6
                / (CAST(ca.cnt AS DOUBLE) * cb.cnt) + 0.5) AS BIGINT)
             AS lift_ppm
    FROM pr
    JOIN bc ca ON pr.brand_a = ca.brand
    JOIN bc cb ON pr.brand_b = cb.brand
    CROSS JOIN n
    ORDER BY pr.pair_cnt DESC, pr.brand_a, pr.brand_b
    LIMIT 20
    """,
)
def assoc_rules_brand_pairs(spark, sf_dir):
    """Market-basket association rules over brands co-purchased within
    an order: support, confidence(a -> b) and lift in ppm for the
    top-20 brand pairs. The classic frequent-pair mining shape — and in
    a training-data pipeline, the same operator that surfaces
    co-occurring sources/tags worth stratifying on.

    Scale shape: the basket table is first deduplicated to DISTINCT
    (order, brand) — the self-join is an equi-join on the order key, so
    candidate fan-out per order is bounded by (distinct brands per
    order choose 2), never |corpus|^2 (the lineitem max is 13 distinct
    parts/order). The basket table is persisted ONCE and shared by all
    four consumers (both self-join sides, the brand marginals, the
    order total) — the minhash shingle-table convention; column
    pruning diverges the four subtrees, so ReuseExchange alone would
    recompute the scan+dedup per consumer. Brand marginals are a
    ~25-row broadcast; the corpus total is the standard ONE-ROW
    broadcast crossJoin. Top-20 ships via TakeOrderedAndProject under
    a total-order tiebreak (pair_cnt DESC, brand_a, brand_b).
    """
    li = read_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey")
    pt = read_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    ob = (li.join(F.broadcast(pt), li.l_partkey == pt.p_partkey)
          .select(F.col("l_orderkey").alias("okey"),
                  F.col("p_brand").alias("brand"))
          .distinct()
          .persist())
    n = ob.agg(
        F.expr("CAST(COUNT(DISTINCT okey) AS BIGINT)").alias("n_orders"))
    bc = ob.groupBy("brand").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("cnt"))
    a = ob.select(F.col("okey"), F.col("brand").alias("brand_a"))
    b = ob.select(F.col("okey").alias("okey_b"),
                  F.col("brand").alias("brand_b"))
    pr = (a.join(b, (a.okey == b.okey_b)
                 & (F.col("brand_a") < F.col("brand_b")))
          .groupBy("brand_a", "brand_b")
          .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("pair_cnt")))
    ca = F.broadcast(bc.select(F.col("brand").alias("brand_a"),
                               F.col("cnt").alias("cnt_a")))
    cb = F.broadcast(bc.select(F.col("brand").alias("brand_b"),
                               F.col("cnt").alias("cnt_b")))
    out = (pr.join(ca, "brand_a").join(cb, "brand_b")
           .crossJoin(F.broadcast(n))
           .select(
               "brand_a", "brand_b", "pair_cnt",
               F.expr("CAST(floor(CAST(pair_cnt AS DOUBLE) * 1e6"
                      " / n_orders + 0.5) AS BIGINT)")
               .alias("support_ppm"),
               F.expr("CAST(floor(CAST(pair_cnt AS DOUBLE) * 1e6"
                      " / cnt_a + 0.5) AS BIGINT)")
               .alias("confidence_ppm"),
               F.expr("CAST(floor(CAST(pair_cnt AS DOUBLE) * n_orders"
                      " * 1e6 / (CAST(cnt_a AS DOUBLE) * cnt_b) + 0.5)"
                      " AS BIGINT)").alias("lift_ppm")))
    return out.orderBy(F.col("pair_cnt").desc(), "brand_a", "brand_b") \
        .limit(20)


# ---------------------------------------------------------------------------
# stats_psi_doclen_drift — population stability index over decile bins
# ---------------------------------------------------------------------------


_PSI_TERM = (
    "CAST(floor((CAST(GREATEST(ca, 1) AS DOUBLE) / ta"
    " - CAST(GREATEST(cb, 1) AS DOUBLE) / tb)"
    " * ln((CAST(GREATEST(ca, 1) AS DOUBLE) / ta)"
    " / (CAST(GREATEST(cb, 1) AS DOUBLE) / tb)) * 1e6 + 0.5) AS BIGINT)"
)


@query(
    "stats_psi_doclen_drift",
    oracle=f"""
    WITH d AS (SELECT n_chars AS s,
                      CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS ref
               FROM documents),
    b AS (SELECT quantile_disc(s,
            [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9]) AS bounds
          FROM d WHERE ref = 1),
    a AS (SELECT CAST(1 + len(list_filter(b.bounds, x -> d.s > x))
                   AS INT) AS bucket,
                 d.ref
          FROM d, b),
    g AS (SELECT bucket, CAST(SUM(ref) AS BIGINT) AS ca,
                 CAST(SUM(1 - ref) AS BIGINT) AS cb
          FROM a GROUP BY 1),
    t AS (SELECT ca, cb,
                 CAST(SUM(ca) OVER () AS BIGINT) AS ta,
                 CAST(SUM(cb) OVER () AS BIGINT) AS tb
          FROM g)
    SELECT MAX(ta) AS n_ref, MAX(tb) AS n_cmp,
           CAST(COUNT(*) AS BIGINT) AS n_bins,
           CAST(SUM({_PSI_TERM}) AS BIGINT) AS psi_micro
    FROM t
    """,
)
def stats_psi_doclen_drift(spark, sf_dir):
    """Population stability index of the doc-length distribution,
    even-id half (reference) vs odd-id half (comparison) — the
    standard ML-ops drift score: PSI = sum over bins of
    (p_i - q_i) * ln(p_i / q_i), with bins = the reference half's
    exact deciles via the two-pass quantile recipe
    (operators/quantiles.py: percentile_disc boundaries -> 1-row
    broadcast -> map-side assignment, no global sort). Zero-count
    bins are clamped to one observation (the standard epsilon
    convention) so the log stays finite; per-bin terms are quantized
    at MICRO granularity before the integer sum — the NMI convention
    that absorbs last-ulp libm ln() differences between engines.

    Scale shape: pass 1 aggregates the reference half to one 9-value
    boundary row; pass 2 is a map-side bucket tag; the corpus then
    collapses to a <= 10-row bucket aggregate, and the share/log math
    runs over that aggregate only. KS (stats_ks_doclen_drift) is the
    binless exact companion; PSI is what monitoring dashboards
    actually alert on."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        assign_buckets, quantile_boundaries)

    d = read_table(spark, sf_dir, "documents").select(
        F.col("n_chars").alias("s"),
        F.expr("CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END").alias("ref"))
    bounds = quantile_boundaries(d.filter("ref = 1"), "s", 10)
    a = assign_buckets(d, bounds, "s", out="bucket")
    g = a.groupBy("bucket").agg(
        F.expr("CAST(SUM(ref) AS BIGINT)").alias("ca"),
        F.expr("CAST(SUM(1 - ref) AS BIGINT)").alias("cb"))
    t = g.select(
        "ca", "cb",
        F.sum("ca").over(Window.partitionBy()).cast("bigint").alias("ta"),
        F.sum("cb").over(Window.partitionBy()).cast("bigint").alias("tb"))
    return t.agg(
        F.max("ta").alias("n_ref"),
        F.max("tb").alias("n_cmp"),
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_bins"),
        F.expr(f"CAST(SUM({_PSI_TERM}) AS BIGINT)").alias("psi_micro"))


# ---------------------------------------------------------------------------
# embedding_centroid_drift — per-label centroid cosine across crawl halves
# ---------------------------------------------------------------------------


@query(
    "embedding_centroid_drift",
    oracle="""
    WITH ex AS (SELECT label, vec_id % 2 = 0 AS ev,
                       CAST(t.i AS INT) AS dim_idx,
                       CAST(embedding[t.i] AS DOUBLE) AS x
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS t(i)),
    s AS (SELECT label, dim_idx,
                 CAST(floor(CAST(SUM(CASE WHEN ev THEN
                        CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) * 1e6
                      + 0.5) AS BIGINT) AS ia,
                 CAST(floor(CAST(SUM(CASE WHEN NOT ev THEN
                        CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) * 1e6
                      + 0.5) AS BIGINT) AS ib
          FROM ex GROUP BY 1, 2),
    c AS (SELECT label,
                 SUM(CAST(ia AS HUGEINT) * ib) AS dot,
                 SUM(CAST(ia AS HUGEINT) * ia) AS na2,
                 SUM(CAST(ib AS HUGEINT) * ib) AS nb2
          FROM s GROUP BY 1),
    n AS (SELECT label,
                 CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_even,
                 CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_odd
          FROM embeddings GROUP BY 1)
    SELECT c.label, n.n_even, n.n_odd,
           CAST(floor(CAST(dot AS DOUBLE)
                / (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE)))
                * 1e6 + 0.5) AS BIGINT) AS cos_micro
    FROM c JOIN n ON c.label = n.label
    ORDER BY c.label
    """,
)
def embedding_centroid_drift(spark, sf_dir):
    """Per-label cosine similarity between the centroid of the even
    vec_id half and the centroid of the odd half — embedding drift
    across crawl snapshots ("did this class's representation move?"),
    the vector companion of stats_psi_doclen_drift. Cosine is
    scale-invariant, so centroids never materialize: the cosine of the
    per-half component SUMS equals the cosine of the means.

    Exactness: component sums accumulate as exact decimals, are
    quantized to micro-unit BIGINTs, and the dot/norm reductions run
    in exact DECIMAL(38,0) products (DuckDB's HUGEINT arithmetic is
    exact too) — no double summation whose partition order could
    perturb the hash; the only floating math is the final sqrt/divide
    on two exact integers, which is IEEE-deterministic.

    Scale shape: one posexplode to (label, dim, x) -> map-side partial
    decimal sums -> a |labels| x |dims| aggregate; everything after is
    per-label folds over 64-row groups. The count pass rides the same
    scan (two narrow aggregates, no join of corpus-sized sides)."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        "label",
        F.expr("vec_id % 2 = 0").alias("ev"),
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .alias("pos", "x"),
    ).selectExpr("label", "ev", "CAST(pos + 1 AS INT) AS dim_idx", "x")
    s = ex.groupBy("label", "dim_idx").agg(
        F.expr("CAST(floor(CAST(SUM(CASE WHEN ev THEN"
               " CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) * 1e6 + 0.5)"
               " AS BIGINT)").alias("ia"),
        F.expr("CAST(floor(CAST(SUM(CASE WHEN NOT ev THEN"
               " CAST(x AS DECIMAL(27,6)) END) AS DOUBLE) * 1e6 + 0.5)"
               " AS BIGINT)").alias("ib"))
    c = s.groupBy("label").agg(
        F.expr("SUM(CAST(ia AS DECIMAL(38,0)) * CAST(ib AS DECIMAL(38,0)))")
        .alias("dot"),
        F.expr("SUM(CAST(ia AS DECIMAL(38,0)) * CAST(ia AS DECIMAL(38,0)))")
        .alias("na2"),
        F.expr("SUM(CAST(ib AS DECIMAL(38,0)) * CAST(ib AS DECIMAL(38,0)))")
        .alias("nb2"))
    n = emb.groupBy("label").agg(
        F.expr("CAST(SUM(CASE WHEN vec_id % 2 = 0 THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_even"),
        F.expr("CAST(SUM(CASE WHEN vec_id % 2 = 1 THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_odd"))
    return (c.join(n, "label")
            .select(
                "label", "n_even", "n_odd",
                F.expr("CAST(floor(CAST(dot AS DOUBLE)"
                       " / (sqrt(CAST(na2 AS DOUBLE))"
                       " * sqrt(CAST(nb2 AS DOUBLE))) * 1e6 + 0.5)"
                       " AS BIGINT)").alias("cos_micro"))
            .orderBy("label"))
