"""Evaluation-statistics operators: exact/binned/per-group ROC AUC,
binned Gini bounds, binned calibration (reliability bins + ECE/MCE +
exact Brier), Cohen's kappa annotation agreement.

The catalog query ``eval_auc_doclen_lang`` documents quantile-binned
scores as the 100 TB fallback for near-continuous score columns (the
distinct-score aggregate that the exact rank-sum method windows over is
unbounded there). This module ships that recipe: ``auc_exact`` is the
same Mann-Whitney rank-sum computation as the query, exposed for any
(score, label) pair; ``auc_binned`` coarsens scores to their
``bins``-quantile bucket first — the windowed aggregate is then bounded
at ``bins`` rows at any corpus size — and inherits the exact tie
handling, so it equals the exact AUC computed on the coarsened scores
(a lower-resolution, not an approximate, statistic). Note the
coarsening is by QUANTILE, so even bins >> |distinct scores| need not
be a bijection: a value whose probability mass falls below the 1/bins
grid spacing can share a bucket with its neighbor — the binned AUC
converges to (need not exactly reach) the exact one.

Family-wide reporting convention (shared with operators/quantiles):
every *_binned report's ``n_bins`` is the number of NON-EMPTY buckets
actually observed — the resolution the statistic was really computed
at — never the requested ``bins`` (quantile boundaries merge under
ties, so the two differ exactly when it matters).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators.quantiles import (
    assign_buckets,
    quantile_boundaries,
)


def _auc_of(scored: DataFrame, score_col: str) -> dict:
    """Rank-sum AUC over ``scored(score_col, pos)`` with exact ties:
    2U = sum over distinct scores of np * (2*cum_neg_below + nn)."""
    g = scored.groupBy(score_col).agg(
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("np"),
        F.expr("CAST(SUM(1 - pos) AS BIGINT)").alias("nn"))
    w = Window.orderBy(score_col).rowsBetween(
        Window.unboundedPreceding, -1)
    r = g.select(
        "np", "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0).cast("bigint"))
        .alias("cb"))
    row = r.agg(
        F.expr("CAST(SUM(np) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(nn) AS BIGINT)").alias("n_neg"),
        # the divide must be guarded IN the expression: a degenerate
        # label makes the denominator 0 and ANSI mode would throw
        # before the Python-side check below ever sees the counts
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_scores"),
        F.expr("CASE WHEN SUM(np) = 0 OR SUM(nn) = 0 THEN NULL ELSE"
               " CAST(floor(CAST(SUM(np * (2 * cb + nn)) AS DOUBLE) * 1e6"
               " / (2e0 * SUM(np) * SUM(nn)) + 0.5) AS BIGINT) END")
        .alias("auc_ppm")).collect()[0]
    if not row["n_pos"] or not row["n_neg"]:
        raise ValueError(
            f"auc: degenerate label (n_pos={row['n_pos']}, "
            f"n_neg={row['n_neg']}) — AUC is undefined")
    return {"auc_ppm": row["auc_ppm"], "n_pos": row["n_pos"],
            "n_neg": row["n_neg"], "n_scores": row["n_scores"]}


def auc_exact(df: DataFrame, score: str, label: str) -> dict:
    """Exact ROC AUC of SQL expression ``score`` against boolean SQL
    expression ``label``. Collapses the corpus to a |distinct scores|
    aggregate, then windows over that aggregate only — use
    :func:`auc_binned` when the score is near-continuous at corpus
    scale. Returns ``{"auc_ppm", "n_pos", "n_neg"}``."""
    scored = df.selectExpr(
        f"{score} AS __auc_score",
        f"CASE WHEN {label} THEN 1 ELSE 0 END AS pos")
    res = _auc_of(scored, "__auc_score")
    res.pop("n_scores")
    return res


def auc_binned(
    df: DataFrame, score: str, label: str, bins: int = 256,
    exact: bool = False, accuracy: int = 10000,
) -> dict:
    """Quantile-binned ROC AUC — the scale path: scores coarsen to
    their ``bins``-quantile bucket (two-pass recipe: 1-row boundary
    aggregate, map-side assignment; ``exact=False`` uses the
    ``approx_percentile`` sketch for boundaries), so the rank-sum
    aggregate is bounded at ``bins`` rows at ANY corpus size. Within-
    bucket order is deliberately discarded: the result is the exact
    AUC of the coarsened scores, and the binning error shrinks as
    1/bins (every pair split across different buckets is ranked
    identically to the exact method; only within-bucket pairs coarsen
    to ties). Returns ``{"auc_ppm", "n_pos", "n_neg", "n_bins"}``."""
    scored = df.selectExpr(
        f"{score} AS __auc_score",
        f"CASE WHEN {label} THEN 1 ELSE 0 END AS pos")
    bounds = quantile_boundaries(
        scored, "__auc_score", bins, exact=exact, accuracy=accuracy)
    assigned = assign_buckets(scored, bounds, "__auc_score",
                              out="__auc_bucket")
    res = _auc_of(assigned.select("__auc_bucket", "pos"), "__auc_bucket")
    return {"auc_ppm": res["auc_ppm"], "n_pos": res["n_pos"],
            "n_neg": res["n_neg"], "n_bins": res["n_scores"]}


def gini_binned(
    df: DataFrame, col: str, bins: int = 256,
    exact: bool = False, accuracy: int = 10000,
) -> dict:
    """Quantile-binned Gini concentration bounds — the scale path the
    ``events_user_gini`` catalog query documents (the exact rank
    identity needs a global sort of the aggregate; at billions of keys
    bin first). Values coarsen to their ``bins``-quantile bucket; each
    bucket keeps an exact (count, decimal sum) pair, and the classic
    non-overlapping-groups decomposition G = G_between + sum_i p_i *
    q_i * G_within_i (p = population share, q = value share; groups in
    value order never overlap, so there is no residual term) yields
    PROVABLE bounds: G_between <= G <= G_between + sum_i p_i * q_i
    over non-constant buckets only (within-group Gini is in [0, 1],
    and exactly 0 for a bucket whose min == max — quantile binning of
    discrete data merges ties into such buckets, so they never widen
    the bracket). The bracket width shrinks as 1/bins since
    p_i ~ 1/bins.

    One pass over the corpus after the boundary broadcast; the only
    collect is the <= ``bins``-row histogram. Returns ppm bounds
    ``{"gini_lower_ppm", "gini_upper_ppm", "n", "n_bins"}``.
    Requires non-negative values (Gini is undefined otherwise).
    """
    import math

    v = df.selectExpr(f"{col} AS __g_val")
    bounds = quantile_boundaries(v, "__g_val", bins, exact=exact,
                                 accuracy=accuracy)
    assigned = assign_buckets(v, bounds, "__g_val", out="__g_bucket")
    rows = (assigned.groupBy("__g_bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(CAST(__g_val AS DECIMAL(27,6))) AS DOUBLE)")
        .alias("s"),
        F.expr("MIN(__g_val)").alias("lo"),
        F.expr("MAX(__g_val)").alias("hi"))
        .collect())
    rows.sort(key=lambda r: r["__g_bucket"])
    if any(r["lo"] < 0 for r in rows):
        raise ValueError("gini_binned: negative values — Gini undefined")
    n_total = sum(r["n"] for r in rows)
    s_total = sum(r["s"] for r in rows)
    if not n_total or s_total <= 0:
        raise ValueError(
            f"gini_binned: degenerate input (n={n_total}, "
            f"sum={s_total}) — Gini undefined")
    # G_between over value-ordered groups, each member at its group
    # mean: numerator = 2*sum_i s_i*cumN_before_i + sum_i s_i*n_i - N*S
    cum_before = 0
    num = 0.0
    overlap = 0.0      # sum over NON-constant buckets of p_i * q_i —
    # a bucket whose min == max has within-group Gini exactly 0, so
    # tie-merged buckets (the common case under quantile binning of
    # discrete data) never widen the bracket
    for r in rows:
        num += 2.0 * r["s"] * cum_before + r["s"] * r["n"]
        if r["lo"] != r["hi"]:
            overlap += (r["n"] / n_total) * (r["s"] / s_total)
        cum_before += r["n"]
    g_between = (num - n_total * s_total) / (n_total * s_total)
    return {
        "gini_lower_ppm": math.floor(g_between * 1e6 + 0.5),
        "gini_upper_ppm": math.floor((g_between + overlap) * 1e6 + 0.5),
        "n": n_total, "n_bins": len(rows),
    }


def auc_by_group(
    df: DataFrame, score: str, label: str, group: str,
) -> DataFrame:
    """Per-group exact ROC AUC — one rank-sum computation per value of
    SQL expression ``group``, evaluated for ALL groups in a single
    distributed plan (per-domain / per-language quality-classifier
    evaluation). Same Mann-Whitney tie-exact identity as
    :func:`auc_exact`; the corpus collapses to a (group, distinct
    score) aggregate and the running-negatives window partitions BY
    GROUP over that aggregate only, so no partition sees more than one
    group's distinct scores. Unlike the scalar siblings this returns a
    DataFrame — ``(group_col, auc_ppm, n_pos, n_neg)``, one row per
    group — with no driver-side collect, so it composes with
    downstream plans at any group count. Groups with a degenerate
    label (no positives or no negatives) surface ``auc_ppm = NULL``
    rather than raising: with thousands of groups, partial
    degeneracy is data, not an error (filter or assert downstream)."""
    scored = df.selectExpr(
        f"{group} AS group_col",
        f"{score} AS __auc_score",
        f"CASE WHEN {label} THEN 1 ELSE 0 END AS pos")
    g = scored.groupBy("group_col", "__auc_score").agg(
        F.expr("CAST(SUM(pos) AS BIGINT)").alias("np"),
        F.expr("CAST(SUM(1 - pos) AS BIGINT)").alias("nn"))
    w = (Window.partitionBy("group_col").orderBy("__auc_score")
         .rowsBetween(Window.unboundedPreceding, -1))
    r = g.select(
        "group_col", "np", "nn",
        F.coalesce(F.sum("nn").over(w), F.lit(0).cast("bigint"))
        .alias("cb"))
    return r.groupBy("group_col").agg(
        F.expr("CASE WHEN SUM(np) = 0 OR SUM(nn) = 0 THEN NULL ELSE"
               " CAST(floor(CAST(SUM(np * (2 * cb + nn)) AS DOUBLE) * 1e6"
               " / (2e0 * SUM(np) * SUM(nn)) + 0.5) AS BIGINT) END")
        .alias("auc_ppm"),
        F.expr("CAST(SUM(np) AS BIGINT)").alias("n_pos"),
        F.expr("CAST(SUM(nn) AS BIGINT)").alias("n_neg"))


def cohens_kappa(df: DataFrame, rater_a: str, rater_b: str) -> dict:
    """Cohen's kappa between two label columns (annotation-agreement
    audit for labeling pipelines): kappa = (p_o - p_e) / (1 - p_e)
    with observed agreement p_o and the chance agreement p_e implied
    by the raters' marginals. The corpus collapses to the
    |labels_a| x |labels_b| contingency aggregate (the chi-square
    query's shape) and everything after is exact integer arithmetic
    on that tiny collect: p_o and p_e stay as integer-ratio terms
    (agree/n and sum(row_i * col_i)/n^2), so the only float op is the
    final ppm rendering. NULL labels count as their own category
    (disagreement with everything else, including NULL<->NULL
    agreement) via a sentinel — dropping them silently would overstate
    agreement. Returns ``{"kappa_ppm", "po_ppm", "pe_ppm", "n"}``;
    raises on empty input or a constant pair (kappa undefined when
    p_e = 1: both raters always emit one identical label)."""
    import math

    pairs = df.selectExpr(
        f"coalesce(CAST({rater_a} AS STRING), ' null') AS __ka",
        f"coalesce(CAST({rater_b} AS STRING), ' null') AS __kb")
    cells = pairs.groupBy("__ka", "__kb").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")).collect()
    n = sum(r["n"] for r in cells)
    if not n:
        raise ValueError("cohens_kappa: empty input")
    agree = sum(r["n"] for r in cells if r["__ka"] == r["__kb"])
    row_m: dict = {}
    col_m: dict = {}
    for r in cells:
        row_m[r["__ka"]] = row_m.get(r["__ka"], 0) + r["n"]
        col_m[r["__kb"]] = col_m.get(r["__kb"], 0) + r["n"]
    # integer numerators over common denominator n^2:
    # kappa = (agree*n - sum_i row_i*col_i) / (n^2 - sum_i row_i*col_i)
    chance = sum(cnt * col_m.get(lbl, 0) for lbl, cnt in row_m.items())
    denom = n * n - chance
    if denom == 0:
        raise ValueError(
            "cohens_kappa: both raters constant and identical — "
            "chance agreement is 1, kappa undefined")
    kappa = (agree * n - chance) / denom
    return {
        "kappa_ppm": math.floor(kappa * 1e6 + 0.5),
        "po_ppm": math.floor(agree / n * 1e6 + 0.5),
        "pe_ppm": math.floor(chance / (n * n) * 1e6 + 0.5),
        "n": n,
    }


def calibration_binned(
    df: DataFrame, score: str, label: str, bins: int = 10,
    exact: bool = True, accuracy: int = 10000,
) -> dict:
    """Quantile-binned calibration report for a probability score:
    per-bin (count, mean predicted probability, observed positive
    rate), expected/maximum calibration error over those bins, and the
    binning-free exact Brier score — all from ONE corpus pass after
    the 1-row boundary broadcast (two-pass quantile recipe; the only
    collect is the ``<= bins``-row reliability histogram).

    Quantile (adaptive) bins are deliberate: equal-width bins leave
    most of the grid empty when scores concentrate, while the
    reference-quantile scheme puts ~n/bins rows in every bin at any
    corpus size (the same argument psi_between makes). ECE/MCE are by
    definition functions OF a binning, so unlike the AUC/Gini/KS
    siblings there is no exact statistic to bracket — the report IS
    exact for the chosen bins. Per-row terms are nano-quantized
    integers summed as DECIMAL(38,0) (deterministic under any
    partitioning, no int64 overflow at any row count); only the final
    ppm renderings divide in floating point.

    ``score`` must be a probability in [0, 1] (checked from the same
    aggregate pass — per-bin min/max, no extra job). Returns
    ``{"ece_ppm", "mce_ppm", "brier_ppm", "n", "n_pos", "n_bins",
    "bins": [{"bucket", "n", "mean_score_ppm", "pos_rate_ppm"}, ...]}``
    with ``n_bins`` = number of NON-EMPTY bins (quantile binning of
    discrete scores merges ties, so it can be < ``bins``)."""
    import math

    scored = df.selectExpr(
        f"CAST({score} AS DOUBLE) AS __cal_score",
        f"CASE WHEN {label} THEN 1 ELSE 0 END AS __cal_pos")
    bounds = quantile_boundaries(
        scored, "__cal_score", bins, exact=exact, accuracy=accuracy)
    assigned = assign_buckets(scored, bounds, "__cal_score",
                              out="__cal_bucket")
    rows = (assigned.groupBy("__cal_bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr("CAST(SUM(__cal_pos) AS BIGINT)").alias("n_pos"),
        F.expr("SUM(CAST(floor(__cal_score * 1e9 + 0.5) AS"
               " DECIMAL(38,0)))").alias("s_nano"),
        # the squared error is a PRODUCT, not pow(x, 2): Math.pow is
        # only 1-ulp-accurate, and a last-ulp difference at a nano
        # floor boundary would make the quantized terms
        # engine-dependent; IEEE multiplication is exact(ly rounded)
        # everywhere
        F.expr("SUM(CAST(floor((__cal_score - __cal_pos) *"
               " (__cal_score - __cal_pos) * 1e9 + 0.5) AS"
               " DECIMAL(38,0)))").alias("sq_nano"),
        F.expr("CAST(COUNT(__cal_score) AS BIGINT)").alias("n_nonnull"),
        F.expr("MIN(__cal_score)").alias("lo"),
        F.expr("MAX(__cal_score)").alias("hi"))
        .collect())
    rows.sort(key=lambda r: r["__cal_bucket"])
    if any(r["n"] != r["n_nonnull"] for r in rows):
        raise ValueError(
            "calibration_binned: NULL scores present — filter or "
            "impute before calibrating")
    if any(r["lo"] < 0.0 or r["hi"] > 1.0 for r in rows):
        raise ValueError(
            "calibration_binned: score outside [0, 1] — not a "
            "probability; rescale before calibrating")
    n_total = sum(r["n"] for r in rows)
    if not n_total:
        raise ValueError("calibration_binned: empty input")
    n_pos = sum(r["n_pos"] for r in rows)
    ece = 0.0
    mce = 0.0
    per_bin = []
    for r in rows:
        mean_score = float(r["s_nano"]) / 1e9 / r["n"]
        pos_rate = r["n_pos"] / r["n"]
        gap = abs(pos_rate - mean_score)
        ece += (r["n"] / n_total) * gap
        mce = max(mce, gap)
        per_bin.append({
            "bucket": r["__cal_bucket"], "n": r["n"],
            "mean_score_ppm": math.floor(mean_score * 1e6 + 0.5),
            "pos_rate_ppm": math.floor(pos_rate * 1e6 + 0.5),
        })
    brier = float(sum(r["sq_nano"] for r in rows)) / 1e9 / n_total
    return {
        "ece_ppm": math.floor(ece * 1e6 + 0.5),
        "mce_ppm": math.floor(mce * 1e6 + 0.5),
        "brier_ppm": math.floor(brier * 1e6 + 0.5),
        "n": n_total, "n_pos": n_pos, "n_bins": len(per_bin),
        "bins": per_bin,
    }
