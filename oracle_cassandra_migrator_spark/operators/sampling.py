"""Deterministic corpus sampling/splitting/packing for training-data
pipelines.

Everything here is hash-deterministic (md5, like the rest of the
engine — NOTES.md exactness conventions) so the same document lands in
the same split/bin on every run, on any cluster size, with no RNG state
to coordinate across executors:

- ``hash_bucket_expr``: md5-derived bucket in [0, n) from the id column.
- ``train_val_test``: project-only split assignment — no shuffle at any
  scale; adding a split column to 100 TB is a map-only job.
- ``pack_token_bins``: greedy-by-offset sequence packing — documents are
  ordered deterministically inside each group and chunked into
  fixed-token-budget bins by running total (bin = floor(start_offset /
  capacity)).  This is the SQL-expressible form of LLM sample packing:
  within a group the packing is sequential by construction (a window
  over the group), so groups (here: lang) are the parallelism unit —
  at 100 TB you pack per (lang, shard) where shard is itself a hash
  bucket, keeping every window partition bounded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def hash_bucket_expr(id_col: str, n_buckets: int) -> str:
    """Deterministic bucket in [0, n_buckets) from md5 of the id.

    15 hex chars < 2^60, so the conv() result is a positive BIGINT and
    pmod == mod on both engines.
    """
    return (f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15),"
            f" 16, 10) AS BIGINT) % {n_buckets}")


def hash_bucket_sql(id_col: str, n_buckets: int) -> str:
    """DuckDB twin of hash_bucket_expr (same md5 → BIGINT idiom)."""
    return (f"('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 15))"
            f"::BIGINT % {n_buckets}")


def cap_by_salted_hash(df: DataFrame, id_col: str, cap: int,
                       salt: str) -> DataFrame:
    """Absolute cap on a (training-)sample DataFrame: keep the ``cap``
    rows with the smallest ``md5(salt || id)``, ties (impossible for
    distinct ids, kept for belt-and-braces determinism) broken by id.

    This is the bottom-k-by-salted-hash reservoir — the same recipe as
    the ``sample_fixed_n_by_hash`` query — COMPOSED with whatever
    ``% modulus`` fraction the caller already applied: the modulus
    filter keeps the TakeOrdered input a cheap corpus-fraction, and
    this cap makes the selected set O(1) in corpus size. When the
    input has <= cap rows the filter is the identity (every row is in
    the bottom-k), so trained artifacts are bit-identical below the
    cap and only a 100TB-scale corpus sees the bound — which is the
    point: training cost must not grow with the corpus (VERDICT r6
    item 3). Plans as TakeOrderedAndProject: per-task bottom-cap
    heaps, one |tasks| x cap driver-side merge, no corpus shuffle."""
    key = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    return (df.orderBy(F.expr(key), F.col(id_col))
            .limit(cap))


def split_case_expr(bucket_expr: str, train_pct: int, val_pct: int) -> str:
    """train/val/test label from a percent bucket (engine-neutral SQL)."""
    return (f"CASE WHEN ({bucket_expr}) < {train_pct} THEN 'train' "
            f"WHEN ({bucket_expr}) < {train_pct + val_pct} THEN 'val' "
            f"ELSE 'test' END")


def train_val_test(df: DataFrame, id_col: str,
                   train_pct: int = 80, val_pct: int = 10) -> DataFrame:
    """Add a deterministic ``split`` column. Pure projection: no
    shuffle, fully pushdown-friendly, stable under re-runs and
    repartitioning (the hash depends only on the id value)."""
    bucket = hash_bucket_expr(id_col, 100)
    return df.withColumn("split", F.expr(split_case_expr(
        bucket, train_pct, val_pct)))


def pack_token_bins(df: DataFrame, id_col: str, token_col: str,
                    group_col: str, capacity: int) -> DataFrame:
    """Assign each row a packing ``bin`` inside its group: rows are
    ordered by (md5(id), id) and a bin is the floor of the running
    token offset over ``capacity``.  One window per group — the group
    is the sequential unit, so callers shard big groups first."""
    order_key = (f"md5(CAST({id_col} AS STRING))")
    return (
        df.withColumn("cum_tokens", F.expr(
            f"SUM({token_col}) OVER (PARTITION BY {group_col} "
            f"ORDER BY {order_key}, {id_col} "
            f"ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
        .withColumn("bin", F.expr(
            f"CAST(floor((cum_tokens - {token_col}) / {capacity}.0)"
            f" AS BIGINT)"))
    )


def sample_stratified(df: DataFrame, id_col: str, stratum_col: str,
                      rates: dict[str, float], default_rate: float = 0.0,
                      denominator: int = 1_000_000) -> DataFrame:
    """Deterministic per-stratum downsampling — the corpus-rebalancing
    primitive (cap the dominant language/source, keep the tail):
    a row survives iff md5-bucket(id) < rate(stratum) * denominator.

    Unlike ``df.sampleBy`` (per-partition RNG: resampling on retry,
    different rows at different parallelism), this is a pure
    projection-filter on the id hash: the same document survives on
    every run at every cluster size, the filter pushes to the scan, and
    the op adds zero shuffle at any scale. Expected (not exact) stratum
    fractions, like sampleBy."""
    bucket = hash_bucket_expr(id_col, denominator)
    whens = " ".join(
        f"WHEN {stratum_col} = '{k}' THEN {int(v * denominator)}"
        for k, v in sorted(rates.items()))
    threshold = f"CASE {whens} ELSE {int(default_rate * denominator)} END"
    return df.where(F.expr(f"({bucket}) < ({threshold})"))


def temperature_thresholds(df: DataFrame, stratum_col: str,
                           denominator: int = 1_000_000) -> DataFrame:
    """Per-stratum (n_docs, threshold_ppm) for temperature (T=2)
    rebalancing: stratum l with share p_l is downsampled at rate
    (p_min/p_l)^(1-alpha) = sqrt(n_min/n_l) — the head flattens, the
    smallest stratum keeps everything. The rate is floored to an
    integer ppm threshold, so downstream membership is an
    integer-vs-integer compare (no knife-edge double drift between
    engines; sqrt is IEEE-exact, unlike pow(x, 0.5)). One tiny
    stratum-keyed aggregation — the shared head of the audit and the
    resample filter; n_min comes from a single-partition window OVER
    THE |strata|-ROW AGGREGATE (aggregate-before-window, the
    corpus_mix_weights shape — no nested-loop glue join in any plan
    that composes this)."""
    from pyspark.sql.window import Window

    counts = df.groupBy(stratum_col).agg(
        F.count("*").cast("bigint").alias("n_docs"))
    w = Window.partitionBy()
    return (
        counts.withColumn("n_min", F.min("n_docs").over(w))
        .withColumn(
            "threshold_ppm",
            F.expr(
                f"CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) "
                f"* {denominator}) AS BIGINT)"))
        .drop("n_min")
    )


def temperature_resample(df: DataFrame, id_col: str, stratum_col: str,
                         denominator: int = 1_000_000) -> DataFrame:
    """The SURVIVING rows of temperature (T=2) rebalancing — the
    filter form the declarative ``sample_temperature`` step chains
    into a curation pipeline (the audit twin below reports counts).
    Broadcast the |strata|-row threshold table onto the corpus and
    keep rows whose md5 bucket clears their stratum's ppm threshold:
    deterministic (same survivors at any parallelism), one broadcast
    join, zero corpus shuffle.

    NULL strata are a REAL stratum (null-safe join — review r11): the
    groupBy already counts them, so an equi-join would let a tiny
    NULL group set n_min while its own rows silently vanish — the
    worst of both (thresholds crushed by a stratum that then keeps
    nothing)."""
    rates = temperature_thresholds(df, stratum_col, denominator)
    return _apply_threshold_filter(df, rates, id_col, stratum_col,
                                   denominator)


def _apply_threshold_filter(df: DataFrame, rates: DataFrame,
                            id_col: str, stratum_col: str,
                            denominator: int) -> DataFrame:
    """Broadcast the per-stratum threshold table onto the corpus
    null-safely and keep rows whose md5 bucket clears their stratum's
    ppm threshold, returning the input's columns."""
    bucket = hash_bucket_expr(id_col, denominator)
    r = rates.select(F.col(stratum_col).alias("__stratum"),
                     "threshold_ppm")
    return (
        df.join(F.broadcast(r),
                df[stratum_col].eqNullSafe(F.col("__stratum")))
        .where(F.expr(f"({bucket}) < threshold_ppm"))
        .select(*df.columns)
    )


def temperature_resample_audit(df: DataFrame, id_col: str,
                               stratum_col: str,
                               denominator: int = 1_000_000) -> DataFrame:
    """Temperature-based corpus rebalancing (T=2, i.e. sampling
    exponent alpha=1/2 as in multilingual-pretraining mixes) — the
    per-stratum audit (n_docs, integer ppm threshold, n_kept) of the
    ``temperature_resample`` filter above.

    Scale: two tiny stratum-keyed aggregations + a broadcast of the
    per-stratum thresholds back onto the corpus; the keep-filter is a
    per-row hash compare that pushes into the scan pass. No corpus
    shuffle beyond the audit counts."""
    rates = temperature_thresholds(df, stratum_col, denominator)
    kept = (
        _apply_threshold_filter(df, rates, id_col, stratum_col,
                                denominator)
        .groupBy(stratum_col)
        .agg(F.count("*").cast("bigint").alias("n_kept"))
    )
    return (
        rates.join(F.broadcast(kept), rates[stratum_col].eqNullSafe(
            kept[stratum_col]), "left")
        .select(
            rates[stratum_col], "n_docs", "threshold_ppm",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"))
    )


def sample_fixed_n(df: DataFrame, id_col: str, k: int,
                   by: str | None = None,
                   salt: str = "sample") -> DataFrame:
    """Exactly min(k, |input|) rows by bottom-k-of-salted-hash —
    global (``by=None``: TakeOrderedAndProject, per-task heaps, no
    corpus shuffle) or per-group (``by``: one windowed rank per group,
    the eval-set builder — min(k, group size) rows per group). Returns
    the surviving rows with the INPUT's columns only, so a curation
    pipeline can chain it like any other filter. Deterministic: same
    survivors on every run at any parallelism (the sort key is
    md5(salt || id), never an RNG)."""
    if by is None:
        return cap_by_salted_hash(df, id_col, k, salt)
    sk = f"md5(concat('{salt}:', CAST({id_col} AS STRING)))"
    return (
        df.withColumn("__rnk", F.expr(
            f"row_number() OVER (PARTITION BY {by} "
            f"ORDER BY {sk}, {id_col})"))
        .where(F.col("__rnk") <= k)
        .select(*df.columns)
    )


def corpus_mix_downsample(df: DataFrame, id_col: str, stratum_col: str,
                          weight_expr: str = "1",
                          denominator: int = 1_000_000) -> DataFrame:
    """Uniform-target corpus mixing as a FILTER: each stratum's
    resample weight is (corpus_total / n_strata) / stratum_total
    (the ``corpus_mix_weights`` catalog table's resample_weight_ppm,
    weighted by ``weight_expr`` — ``1`` mixes by document count,
    a token-count expression mixes by tokens), capped at 1e6 ppm:
    over-represented strata are hash-downsampled toward the uniform
    share, under-represented strata are kept whole (upsampling is
    repetition — a different op; this step never duplicates rows).
    Same shape as temperature_resample: one |strata|-row aggregate
    broadcast back, per-row integer hash compare, zero corpus
    shuffle; NULL strata are a real stratum (null-safe join — see
    temperature_resample)."""
    from pyspark.sql.window import Window

    per = df.groupBy(stratum_col).agg(
        F.expr(f"CAST(SUM({weight_expr}) AS DECIMAL(38,0))").alias("__t"))
    w = Window.partitionBy()
    rates = (
        per.withColumn("__corpus", F.sum("__t").over(w))
        .withColumn("__n", F.count("*").over(w))
        .withColumn(
            "threshold_ppm",
            F.expr(
                f"least(CAST({denominator} AS BIGINT), "
                f"CAST(floor((CAST(__corpus AS DOUBLE) / __n) "
                f"/ CAST(__t AS DOUBLE) * {denominator}) AS BIGINT))"))
        .select(stratum_col, "threshold_ppm")
    )
    return _apply_threshold_filter(df, rates, id_col, stratum_col,
                                   denominator)


def reservoir_key_expr(id_col: str, weight_expr: str) -> str:
    """A-ES weighted-reservoir key (Efraimidis & Spirakis): with
    u ~ Uniform(0,1), taking the k SMALLEST values of -ln(u)/w draws a
    weighted sample without replacement where P(pick) scales with w.
    u is md5-derived from the id (deterministic: same sample on every
    run and any partitioning — no RNG state across executors), strictly
    inside (0,1) via the +0.5 offset. The key is rounded to 9 dp
    BEFORE ranking so both engines order identically even if their
    libm ln() differs in the last ulp; ties break on the id."""
    h = (f"CAST(conv(substring(md5(CAST({id_col} AS STRING)), 1, 15), "
         f"16, 10) AS BIGINT) % 1000000000")
    u = f"(({h}) + 0.5) / 1000000000.0"
    return f"round(-ln({u}) / ({weight_expr}), 9)"


def reservoir_key_sql(id_col: str, weight_expr: str) -> str:
    """DuckDB twin of reservoir_key_expr."""
    h = (f"(('0x' || substring(md5(CAST({id_col} AS VARCHAR)), 1, 15))"
         f"::BIGINT % 1000000000)")
    u = f"(({h}) + 0.5) / 1000000000.0"
    return f"round(-ln({u}) / ({weight_expr}), 9)"
