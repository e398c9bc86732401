"""Corpus-curation operators a training-data pipeline runs after dedup:
repetition filtering (Gopher-style), benchmark-contamination checks,
per-domain document caps, and incremental (snapshot-over-snapshot)
fingerprint dedup.

All hot-path logic is built-in Spark SQL expressions (whole-stage
codegen, no Python), and every operator is a narrow map or a single
keyed shuffle — the shapes hold at 100 TB:

- ``repetition_stats``: strictly per-row (zero shuffle). The max-word-
  frequency fold sorts each row's word array locally instead of
  exploding the corpus into a (doc_id, word) shuffle.
- ``contamination_overlap``: the benchmark n-gram set is tiny relative
  to the corpus (eval suites, not web crawl), so it broadcasts; the
  corpus side stays narrow until the final per-doc count, which
  map-side partial-aggregates before one doc_id-keyed shuffle.
- ``cap_per_group``: one hash shuffle on the group key + in-partition
  sort. Caveat: a single pathological domain serializes into one task.
- ``cap_per_group_salted``: the skew-safe default for head-heavy domain
  distributions — per-(group, salt) top-n prune first (the hot group
  fans out over n_salts tasks), then a re-rank over the <= n * n_salts
  survivors per group. Output provably identical to ``cap_per_group``
  under a total order, rank included.
- ``incremental_fingerprint_dedup``: fingerprint-keyed anti join of the
  new snapshot against the base — at scale the base side is served from
  its bucketed fingerprint layout (no re-shuffle) and AQE inserts a
  runtime bloom filter on the new side (session.py pins
  runtimeFilter.bloomFilter.enabled).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.operators.text import (
    all_shingles_expr,
    fast_words_expr,
    fingerprint_expr,
    max_word_count_expr,
    shingles_once_expr,
)

# Gopher-style repetition thresholds (Rae et al. 2021, table A1 uses
# 0.2 for top-bigram and ~0.3 for duplicate n-gram fractions; we apply
# them to top-word and duplicate-3-gram).
TOP_WORD_FRAC_MAX = 0.2
DUP_3GRAM_FRAC_MAX = 0.3


def repetition_stats(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Per-document repetition features + a keep/drop flag.

    dup_word_fraction   = 1 - distinct_words / words
    top_word_fraction   = max single-word frequency / words
    dup_3gram_fraction  = 1 - distinct_3grams / 3grams
    is_repetitive       = thresholds on the *rounded* fractions (both
                          engines make the flag decision on identical
                          6-decimal values).
    """
    out = (
        df.select(id_col, F.expr(fast_words_expr(text_col)).alias("w"))
        .select(
            id_col,
            "w",
            F.expr(all_shingles_expr("w", 3)).alias("s"),
            F.expr(max_word_count_expr("w")).alias("top_cnt"),
        )
        .select(
            id_col,
            F.expr("CAST(size(w) AS BIGINT)").alias("n_words"),
            F.expr(
                "round(CASE WHEN size(w) > 0 THEN 1.0 - CAST(size(array_distinct(w)) "
                "AS DOUBLE) / size(w) ELSE 0.0 END, 6)"
            ).alias("dup_word_fraction"),
            F.expr(
                "round(CASE WHEN size(w) > 0 THEN CAST(top_cnt AS DOUBLE) / size(w) "
                "ELSE 0.0 END, 6)"
            ).alias("top_word_fraction"),
            F.expr(
                "round(CASE WHEN size(s) > 0 THEN 1.0 - CAST(size(array_distinct(s)) "
                "AS DOUBLE) / size(s) ELSE 0.0 END, 6)"
            ).alias("dup_3gram_fraction"),
        )
        .withColumn(
            "is_repetitive",
            F.expr(
                f"top_word_fraction > {TOP_WORD_FRAC_MAX} "
                f"OR dup_3gram_fraction > {DUP_3GRAM_FRAC_MAX}"
            ),
        )
    )
    return out


def contamination_overlap(
    df: DataFrame, text_col: str, id_col: str,
    bench_filter: str, n: int = 5,
) -> DataFrame:
    """Benchmark-contamination check: for every corpus document, count
    its distinct word n-grams that also appear in any benchmark
    document (``bench_filter`` selects the benchmark rows; the corpus
    is its complement). Docs with zero overlap are not emitted."""
    sh = df.select(
        id_col, F.expr(shingles_once_expr(text_col, n)).alias("s"),
        F.expr(bench_filter).alias("is_bench"),
    )
    bench = (
        sh.filter("is_bench")
        .select(F.explode("s").alias("tok"))
        .distinct()
    )
    corpus = (
        sh.filter(~F.col("is_bench"))
        .select(
            id_col,
            F.expr("CAST(size(s) AS BIGINT)").alias(f"n_{n}grams"),
            F.explode("s").alias("tok"),
        )
    )
    return (
        corpus.join(F.broadcast(bench), "tok")
        .groupBy(id_col, f"n_{n}grams")
        .agg(F.count("*").alias(f"shared_{n}grams"))
        .select(
            id_col,
            f"n_{n}grams",
            f"shared_{n}grams",
            F.expr(
                f"round(CAST(shared_{n}grams AS DOUBLE) / n_{n}grams, 6)"
            ).alias("contaminated_share"),
        )
    )


def cap_per_group(
    df: DataFrame, group_col: str, order_by, n: int,
    rank_col: str = "keep_rank",
) -> DataFrame:
    """Keep at most ``n`` rows per group, in ``order_by`` preference
    order (must be a total order for determinism)."""
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .filter(F.col(rank_col) <= n)
    )


def cap_per_group_salted(
    df: DataFrame, group_col: str, order_by, n: int,
    n_salts: int = 16, salt_on: list[str] | None = None,
    rank_col: str = "keep_rank",
) -> DataFrame:
    """Skew-safe ``cap_per_group``: identical output (including the
    rank), bounded task time even when one pathological group holds
    half the corpus.

    Stage 1 ranks within (group, salt) — the hot group fans out over
    ``n_salts`` tasks — and keeps the per-salt top-``n``; a row ranked
    below ``n`` within its own salt is dominated by >= ``n`` rows
    globally, so no global top-``n`` row is ever pruned. Stage 2
    re-ranks the survivors (<= n * n_salts rows per group, bounded
    regardless of group size) with the plain window; every row ranked
    above a global top-``n`` row also survives stage 1, so the final
    rank equals the unsalted rank exactly. ``order_by`` must be a total
    order — same contract as ``cap_per_group``. The salt is a
    deterministic hash of ``salt_on`` (default: all columns), so reruns
    are reproducible."""
    if n_salts < 1:
        raise ValueError(f"cap_per_group_salted: n_salts must be >= 1, "
                         f"got {n_salts}")
    salt_cols = salt_on if salt_on is not None else df.columns
    salted = df.withColumn(
        "__salt", F.pmod(F.xxhash64(*salt_cols), F.lit(n_salts)))
    w1 = Window.partitionBy(group_col, "__salt").orderBy(*order_by)
    pruned = (
        salted.withColumn("__presalt_rank", F.row_number().over(w1))
        .filter(F.col("__presalt_rank") <= n)
        .drop("__presalt_rank", "__salt")
    )
    w2 = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        pruned.withColumn(rank_col, F.row_number().over(w2))
        .filter(F.col(rank_col) <= n)
    )


def incremental_fingerprint_dedup(
    base: DataFrame, new: DataFrame, text_col: str, id_col: str,
) -> DataFrame:
    """Docs in ``new`` whose normalized-text fingerprint never appeared
    in ``base``, deduplicated within ``new`` (min-id representative) —
    the per-snapshot incremental step of a crawl-over-crawl pipeline."""
    fp = fingerprint_expr(text_col)
    base_fp = base.select(F.expr(fp).alias("fingerprint")).distinct()
    new_fp = new.select(F.expr(fp).alias("fingerprint"), id_col)
    return (
        new_fp.join(base_fp, "fingerprint", "left_anti")
        .groupBy("fingerprint")
        .agg(
            F.min(id_col).cast("bigint").alias("representative_id"),
            F.count("*").cast("bigint").alias("n_new_copies"),
        )
    )


def target_encoding_table(
    df: DataFrame, cat_col: str, target_col: str, m: float = 10.0,
) -> DataFrame:
    """Smoothed target (mean) encoding table for a categorical
    feature: one row per category with ``n`` (support) and ``enc`` =
    (Σ_c y + m·ȳ) / (n_c + m) — rare categories shrink toward the
    global mean, the standard leakage-averse alternative to raw
    per-category means (encode_target_mean_smoothed is the
    driver-checked query form).

    One aggregation collapses the input to |categories| rows with
    exact decimal target sums; the global prior is a window OVER that
    aggregate. The result is the broadcast-sized table a training
    pipeline joins onto its feature frame map-side."""
    from pyspark.sql.window import Window

    g = df.groupBy(cat_col).agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
        F.expr(f"SUM(CAST({target_col} AS DECIMAL(18,4)))").alias("__s"))
    w = Window.partitionBy()
    gmean = F.sum("__s").over(w).cast("double") / F.sum("n").over(w)
    return g.select(
        cat_col, "n",
        ((F.expr("CAST(__s AS DOUBLE)") + F.lit(m) * gmean)
         / (F.col("n") + F.lit(m))).alias("enc"))
