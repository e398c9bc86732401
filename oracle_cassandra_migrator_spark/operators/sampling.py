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


def temperature_resample_audit(df: DataFrame, id_col: str,
                               stratum_col: str,
                               denominator: int = 1_000_000) -> DataFrame:
    """Temperature-based corpus rebalancing (T=2, i.e. sampling
    exponent alpha=1/2 as in multilingual-pretraining mixes): stratum
    l with share p_l is downsampled at rate (p_min/p_l)^(1-alpha) =
    sqrt(n_min/n_l) — the head flattens, the smallest stratum keeps
    everything. Returns the per-stratum audit (n_docs, integer ppm
    threshold, n_kept).

    Exactness: the rate is floored to an integer ppm threshold before
    comparing against the md5 bucket, so membership is an
    integer-vs-integer comparison — no knife-edge double compare to
    drift between engines (sqrt is IEEE-exact, unlike pow(x, 0.5)).

    Scale: two tiny stratum-keyed aggregations + a broadcast of the
    per-stratum thresholds back onto the corpus; the keep-filter is a
    per-row hash compare that pushes into the scan pass. No corpus
    shuffle beyond the audit counts."""
    counts = df.groupBy(stratum_col).agg(
        F.count("*").cast("bigint").alias("n_docs"))
    n_min = counts.agg(F.min("n_docs").alias("n_min"))
    rates = (
        counts.crossJoin(F.broadcast(n_min))
        .withColumn(
            "threshold_ppm",
            F.expr(
                f"CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs) "
                f"* {denominator}) AS BIGINT)"))
        .drop("n_min")
    )
    bucket = hash_bucket_expr(id_col, denominator)
    kept = (
        df.join(F.broadcast(rates), stratum_col)
        .where(F.expr(f"({bucket}) < threshold_ppm"))
        .groupBy(stratum_col)
        .agg(F.count("*").cast("bigint").alias("n_kept"))
    )
    return (
        rates.join(kept, stratum_col, "left")
        .select(
            stratum_col, "n_docs", "threshold_ppm",
            F.coalesce("n_kept", F.lit(0)).cast("bigint").alias("n_kept"))
    )


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
