"""Two-pass global quantile bucketing — the scale-safe replacement for
``ntile() OVER (ORDER BY x)``-style global ranking (SCALE.md's promised
recipe; retires the ``window_rank_breadth`` single-reducer caveat).

A global window over 100 TB funnels every row through one ordered
partition. The two-pass shape instead:

  pass 1  boundaries: one aggregation collapses the corpus to a single
          k-1-element array row (``percentile_disc`` exact, or
          ``approx_percentile`` — the production path at scale, a
          fixed-size QuantileSummaries sketch with map-side partials);
  pass 2  assignment: the 1-row boundary array is broadcast and every
          row computes ``1 + #{b in bounds : x > b}`` map-side — zero
          shuffle, no sort, embarrassingly parallel.

Ties: rows equal to a boundary fall in the LOWER bucket (strict ``>``),
so assignment is a pure function of the value — deterministic and
SQL-replayable, unlike ntile's rank-split of ties.

Reference parity: the reference engine has no quantile operator; this
generalizes its bucketed-histogram reporting (reference
oracle_to_cassandra_migrator.py's fixed-width price bands) to
data-driven quantile bands.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def quantile_boundaries(
    df: DataFrame, col: str, k: int, exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Pass 1: the k-1 interior quantile boundaries of ``col`` as ONE
    row holding an array column ``bounds``.

    ``exact=True`` uses ``percentile_disc`` (SQL-standard discrete
    percentile: smallest value with cume_dist >= p — bit-identical to
    DuckDB's ``quantile_disc``, so oracles can replay it). At 100 TB
    use ``exact=False``: ``approx_percentile`` is a bounded-memory
    sketch with partial aggregation, the same two-pass plan otherwise.
    """
    ps = [i / k for i in range(1, k)]
    if exact:
        aggs = [
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})")
            .alias(f"_b{i}")
            for i, p in enumerate(ps)
        ]
        return df.agg(*aggs).select(
            F.array(*[f"_b{i}" for i in range(len(ps))]).alias("bounds"))
    ps_sql = ", ".join(str(p) for p in ps)
    return df.agg(
        F.expr(f"approx_percentile({col}, array({ps_sql}), {accuracy})")
        .alias("bounds"))


def assign_buckets(
    df: DataFrame, bounds: DataFrame, col: str, out: str = "bucket",
) -> DataFrame:
    """Pass 2: broadcast the 1-row ``bounds`` array and tag every row
    with its 1-based bucket — strictly map-side (one broadcast, no
    shuffle, no sort)."""
    return df.crossJoin(F.broadcast(bounds)).withColumn(
        out,
        F.expr(f"CAST(1 + size(filter(bounds, b -> {col} > b)) AS INT)"),
    ).drop("bounds")


def quantile_bucket_profile(
    df: DataFrame, col: str, k: int, exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Boundaries -> per-row assignment -> per-bucket profile
    (count / min / max). The final aggregation shuffles exactly k rows
    per map task (map-side partials on an INT key)."""
    bounds = quantile_boundaries(df, col, k, exact=exact, accuracy=accuracy)
    assigned = assign_buckets(df.select(col), bounds, col)
    return assigned.groupBy("bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
    )


def grouped_quantile_boundaries(
    df: DataFrame, col: str, k: int, by: str, exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Per-group boundaries: one row PER GROUP with the k-1-element
    ``bounds`` array. The result is |groups| x (k-1) values — for
    low-cardinality grouping keys (languages, sources, shards) that is
    broadcast-sized at any corpus scale."""
    ps = [i / k for i in range(1, k)]
    if exact:
        aggs = [
            F.expr(f"percentile_disc({p}) WITHIN GROUP (ORDER BY {col})")
            .alias(f"_b{i}")
            for i, p in enumerate(ps)
        ]
        return df.groupBy(by).agg(*aggs).select(
            by,
            F.array(*[f"_b{i}" for i in range(len(ps))]).alias("bounds"))
    ps_sql = ", ".join(str(p) for p in ps)
    return df.groupBy(by).agg(
        F.expr(f"approx_percentile({col}, array({ps_sql}), {accuracy})")
        .alias("bounds"))


def grouped_bucket_profile(
    df: DataFrame, col: str, k: int, by: str, exact: bool = True,
    accuracy: int = 10000,
) -> DataFrame:
    """Grouped two-pass quantile bucketing: per-group boundaries
    broadcast-join back on the group key (map-side), per-row
    assignment, then a (group, bucket) profile — the within-stratum
    generalization of quantile_bucket_profile, still no sort and no
    global window anywhere.

    NULL group keys: the equi-join back to the boundary table never
    matches NULL = NULL, so rows with a NULL group drop from the
    profile — coalesce the key to a sentinel first if NULL strata must
    be bucketed."""
    bounds = grouped_quantile_boundaries(
        df, col, k, by, exact=exact, accuracy=accuracy)
    assigned = (
        df.select(by, col)
        .join(F.broadcast(bounds), by)
        .withColumn(
            "bucket",
            F.expr(f"CAST(1 + size(filter(bounds, b -> {col} > b)) AS INT)"))
        .drop("bounds"))
    return assigned.groupBy(by, "bucket").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_rows"),
        F.min(col).alias(f"min_{col}"),
        F.max(col).alias(f"max_{col}"),
    )


def winsorize(
    df: DataFrame, col: str, lo: float = 0.05, hi: float = 0.95,
    by: str | None = None, exact: bool = True, accuracy: int = 10000,
    out: str | None = None,
) -> DataFrame:
    """Clamp ``col`` to its [lo, hi] quantile envelope — globally or
    per ``by`` group — writing the clamped value to ``out`` (default:
    replace ``col`` in place). The robust-aggregation building block
    behind agg_winsorized_mean_price, exposed as an operator so
    pipelines can winsorize BEFORE any downstream aggregation.

    Same two-pass shape as the bucketing recipe: pass 1 collapses the
    input to one boundary row per group (``percentile_disc`` exact, or
    the ``approx_percentile`` sketch at scale — ``exact=False``);
    pass 2 broadcast-joins the tiny boundary table back and clamps
    map-side. No sort, no window over raw rows."""
    out = out or col
    if exact:
        lo_agg = F.expr(
            f"percentile_disc({lo}) WITHIN GROUP (ORDER BY {col})")
        hi_agg = F.expr(
            f"percentile_disc({hi}) WITHIN GROUP (ORDER BY {col})")
    else:
        lo_agg = F.expr(f"approx_percentile({col}, {lo}, {accuracy})")
        hi_agg = F.expr(f"approx_percentile({col}, {hi}, {accuracy})")
    clamp = F.expr(f"least(greatest({col}, __wlo), __whi)")
    if by is None:
        bounds = df.agg(lo_agg.alias("__wlo"), hi_agg.alias("__whi"))
        return (df.crossJoin(F.broadcast(bounds))
                .withColumn(out, clamp).drop("__wlo", "__whi"))
    # Null-SAFE equi-join on the group key: a plain equi-join would
    # silently DROP every NULL-group row (NULL = NULL never matches),
    # breaking the operator's row-preserving contract — the same
    # pitfall grouped_bucket_profile documents. <=> still plans as a
    # coalesced-key BroadcastHashJoin (see join_null_safe_eq).
    bounds = df.groupBy(by).agg(
        lo_agg.alias("__wlo"), hi_agg.alias("__whi")).withColumnRenamed(
            by, "__wby")
    return (df.join(F.broadcast(bounds),
                    F.col(by).eqNullSafe(F.col("__wby")))
            .withColumn(out, clamp).drop("__wby", "__wlo", "__whi"))


def _binned_histograms(
    df: DataFrame, ref: DataFrame, col: str, bins: int,
    exact: bool, accuracy: int,
) -> tuple:
    """Shared pass-1/pass-2 machinery for the two-sample comparators
    (:func:`psi_between`, :func:`ks_binned`): reference-quantile
    boundaries -> per-frame bucket histograms. Returns the two
    ``{bucket: count}`` dicts as ``(ref_hist, cmp_hist)``.

    The 1-row boundary aggregate is materialized ONCE: assign_buckets
    embeds its ``bounds`` plan in every consumer, so a lazy handle
    would re-run the full reference quantile pass per histogram
    collect — it re-enters as a LocalTableScan instead (the
    codebook-literal convention, bounded at bins-1 values). ``col``
    may be any SQL expression (aliased once per frame)."""
    from pyspark.sql import Row

    val = "__cmp_val"
    ref_v = ref.selectExpr(f"{col} AS {val}")
    df_v = df.selectExpr(f"{col} AS {val}")
    bounds_vals = quantile_boundaries(
        ref_v, val, bins, exact=exact, accuracy=accuracy
    ).collect()[0]["bounds"]
    bounds = ref.sparkSession.createDataFrame(
        [Row(bounds=list(bounds_vals))])
    counts = []
    for frame in (ref_v, df_v):
        assigned = assign_buckets(frame, bounds, val)
        counts.append({
            r["bucket"]: r["n"]
            for r in assigned.groupBy("bucket").agg(
                F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")).collect()
        })
    return counts[0], counts[1]


def psi_between(
    df: DataFrame, ref: DataFrame, col: str, bins: int = 10,
    exact: bool = True, accuracy: int = 10000,
) -> dict:
    """Population stability index of ``df[col]`` against the reference
    frame's distribution — the drift score behind the
    ``stats_psi_doclen_drift`` catalog query and the ``psi_gate``
    pipeline step, exposed as an operator so any two frames can be
    compared.

    Bins are the reference's ``bins``-quantile boundaries (pass 1:
    ``percentile_disc`` exact, or the ``approx_percentile`` sketch at
    scale); both frames then bucket map-side off the 1-row broadcast
    and collapse to ``<= bins``-row count aggregates — the only
    collects are those tiny histograms. Zero-count buckets clamp to
    one observation; per-bin (p-q)*ln(p/q) terms are quantized at
    micro granularity before summing, so the result equals the catalog
    query bit-for-bit on the same split.

    ``col`` may be any SQL expression, not just a column name (it is
    aliased once per frame and every downstream reference uses the
    alias). Returns ``{"psi_micro", "n_ref", "n_cmp", "n_bins"}``.
    """
    import math

    ca, cb = _binned_histograms(df, ref, col, bins, exact, accuracy)
    n_ref = sum(ca.values())
    n_cmp = sum(cb.values())
    if not n_ref or not n_cmp:
        raise ValueError("psi_between: empty reference or comparison frame")
    buckets = sorted(set(ca) | set(cb))
    psi_micro = 0
    for b in buckets:
        p = max(ca.get(b, 0), 1) / n_ref
        q = max(cb.get(b, 0), 1) / n_cmp
        psi_micro += math.floor((p - q) * math.log(p / q) * 1e6 + 0.5)
    return {"psi_micro": psi_micro, "n_ref": n_ref, "n_cmp": n_cmp,
            "n_bins": len(buckets)}


def ks_binned(
    df: DataFrame, ref: DataFrame, col: str, bins: int = 256,
    exact: bool = False, accuracy: int = 10000,
) -> dict:
    """Quantile-binned two-sample Kolmogorov-Smirnov bounds — the
    scale path the ``stats_ks_doclen_drift`` catalog query documents
    for near-continuous columns (its exact form windows over the
    |distinct values| aggregate). Both frames histogram into the
    reference's ``bins``-quantile buckets; CDF deviations evaluated at
    the bucket edges give a certified bracket on the true statistic:

    - lower: D >= max over edges of |F_a - F_b| (a sup over a subset);
    - upper: inside a bucket the CDF gap can exceed its edge values by
      at most min(mass_a, mass_b) — to rise delta above the edge max
      and come back, BOTH samples must spend delta of their in-bucket
      mass — so D <= max over buckets of (edge max + min(masses)).

    All bound arithmetic is exact integers scaled by n_a * n_b (the
    catalog query's trick); only the final ppm division floats. The
    bracket width shrinks as 1/bins. Returns ``{"ks_lower_ppm",
    "ks_upper_ppm", "n_ref", "n_cmp", "n_bins"}``, with ``n_bins`` =
    NON-EMPTY buckets observed — the family-wide convention shared
    with ``psi_between``/``auc_binned``/``gini_binned``/
    ``calibration_binned`` (requested ``bins`` and observed buckets
    differ exactly when quantile boundaries merge under ties)."""
    import math

    ca, cb = _binned_histograms(df, ref, col, bins, exact, accuracy)
    n_ref = sum(ca.values())
    n_cmp = sum(cb.values())
    if not n_ref or not n_cmp:
        raise ValueError("ks_binned: empty reference or comparison frame")
    buckets = sorted(set(ca) | set(cb))
    cum_a = cum_b = 0
    dev_prev = 0            # scaled |F_a - F_b| at the left edge
    lower_s = 0
    upper_s = 0
    for b in buckets:
        na_b, nb_b = ca.get(b, 0), cb.get(b, 0)
        cum_a += na_b
        cum_b += nb_b
        dev = abs(cum_a * n_cmp - cum_b * n_ref)
        lower_s = max(lower_s, dev)
        mass = min(na_b * n_cmp, nb_b * n_ref)
        upper_s = max(upper_s, max(dev_prev, dev) + mass)
        dev_prev = dev
    denom = float(n_ref) * n_cmp
    return {
        "ks_lower_ppm": math.floor(lower_s * 1e6 / denom + 0.5),
        "ks_upper_ppm": math.floor(upper_s * 1e6 / denom + 0.5),
        "n_ref": n_ref, "n_cmp": n_cmp, "n_bins": len(buckets),
    }
