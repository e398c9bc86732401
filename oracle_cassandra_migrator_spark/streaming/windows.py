"""Structured Streaming windowed aggregations (SURVEY.md §2.9 T1 —
absent from the reference, which is strictly batch; its "checkpoints"
are batch resume markers, not streaming state).

These transformations are source-agnostic: they accept any streaming
*or* batch DataFrame with an event-time column, so the same code is
unit-testable in batch and deployable on ``readStream`` (Kafka, files,
rate). Watermarks bound state for late data; at 100 TB/day scale the
watermark delay is THE knob that caps state-store size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _with_event_time(df: DataFrame, ts_col: str, watermark: str) -> DataFrame:
    """Watermarks require TIMESTAMP (with local timezone); the testdata
    arrives as TIMESTAMP_NTZ. Cast on both batch and streaming paths so
    their results stay directly comparable."""
    df = df.withColumn(ts_col, F.col(ts_col).cast("timestamp"))
    if df.isStreaming:
        df = df.withWatermark(ts_col, watermark)
    return df


def tumbling_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    group_cols: tuple[str, ...] = ("event_type",),
) -> DataFrame:
    """Non-overlapping event-time windows with counts and value sums.
    Watermark lets Spark finalize+evict window state once event time
    passes window_end + delay."""
    df = _with_event_time(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_duration), *group_cols)
        .agg(
            F.count("*").alias("n_events"),
            F.sum("value").alias("total_value"),
        )
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            *group_cols, "n_events", "total_value",
        )
    )


def sliding_window_agg(
    events: DataFrame,
    window_duration: str = "1 hour",
    slide: str = "15 minutes",
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Overlapping windows (each event lands in duration/slide windows)."""
    df = _with_event_time(events, ts_col, watermark)
    return (
        df.groupBy(F.window(ts_col, window_duration, slide))
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "n_events",
        )
    )


def session_window_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    ts_col: str = "ts",
    watermark: str = "1 hour",
    key_col: str = "user_id",
) -> DataFrame:
    """Data-driven session windows (close after ``gap`` inactivity) —
    the streaming twin of the batch gaps-and-islands sessionization in
    queries.extensions.events_sessionize."""
    df = _with_event_time(events, ts_col, watermark)
    return (
        df.groupBy(F.session_window(ts_col, gap), key_col)
        .agg(F.count("*").alias("n_events"))
        .select(
            F.col(key_col),
            F.col("session_window.start").alias("session_start"),
            F.col("session_window.end").alias("session_end"),
            "n_events",
        )
    )


def drift_psi_windows(
    events: DataFrame,
    ref_bounds: list[float],
    ref_counts: list[int],
    window_duration: str = "1 hour",
    ts_col: str = "ts",
    val_col: str = "value",
    watermark: str = "1 hour",
) -> DataFrame:
    """Per-window population-stability-index drift monitor — the
    streaming twin of the batch ``stats_psi_doclen_drift`` query: each
    tumbling event-time window's ``val_col`` distribution is scored
    against a static reference histogram, so a drifting producer
    raises an alertable psi_micro within one window of landing.

    ``ref_bounds`` (k-1 interior boundaries) and ``ref_counts``
    (k bucket counts) come from a batch training pass — e.g.
    ``operators.quantiles.quantile_boundaries`` + a bucket count — and
    enter the plan as literals (a bounded k-element collect,
    the codebook-literal convention). The whole monitor is ONE
    windowed aggregation: per-bucket counts are conditional sums, so
    no chained-aggregation limitation applies, and state per window is
    k integers. Zero-count buckets clamp to one observation and the
    per-bucket (p-q)*ln(p/q) terms are micro-quantized before summing,
    matching the batch query bit-for-bit on identical input.
    """
    k = len(ref_counts)
    if len(ref_bounds) != k - 1:
        raise ValueError(
            f"need {k - 1} interior bounds for {k} buckets, "
            f"got {len(ref_bounds)}")
    ref_total = sum(ref_counts)
    if ref_total <= 0:
        raise ValueError(
            "drift_psi_windows: reference histogram is empty "
            f"(ref_counts sums to {ref_total})")
    df = _with_event_time(events, ts_col, watermark)
    bounds_arr = ", ".join(f"CAST({b!r} AS DOUBLE)" for b in ref_bounds)
    # project the O(k) bucket assignment ONCE per row; the k
    # conditional sums below then compare a precomputed INT (inlining
    # the filter into every SUM would evaluate it k times per event)
    df = df.withColumn(
        "__bucket",
        F.expr(f"CAST(1 + size(filter(array({bounds_arr}),"
               f" b -> {val_col} > b)) AS INT)"))
    aggs = [
        F.expr(f"CAST(SUM(CASE WHEN __bucket = {i + 1} THEN 1 ELSE 0 END)"
               f" AS BIGINT)").alias(f"c{i}")
        for i in range(k)
    ] + [F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events")]
    agg = df.groupBy(F.window(ts_col, window_duration)).agg(*aggs)
    terms = []
    for i in range(k):
        p = max(ref_counts[i], 1) / ref_total
        q = f"(CAST(GREATEST(c{i}, 1) AS DOUBLE) / n_events)"
        terms.append(
            f"CAST(floor((CAST({p!r} AS DOUBLE) - {q})"
            f" * ln(CAST({p!r} AS DOUBLE) / {q}) * 1e6 + 0.5) AS BIGINT)")
    return agg.select(
        F.col("window.start").alias("window_start"),
        F.col("window.end").alias("window_end"),
        "n_events",
        F.expr(" + ".join(terms)).alias("psi_micro"),
    )
