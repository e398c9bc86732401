"""Custom stateful streaming operator via ``applyInPandasWithState``:
per-user running totals that survive across micro-batches.

This is the pattern for operators Spark's built-in windows can't
express (per-key accumulators, custom eviction, model state): state is
partitioned by key in the state store, each micro-batch delivers a
key's new rows as pandas frames, and the handler merges them into the
stored tuple. State size is O(keys), not O(events) — the property that
matters at 100 TB/day.
"""

from __future__ import annotations

from typing import Any, Iterable, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = (
    "user_id BIGINT, n_events BIGINT, total_value DOUBLE, "
    "last_event_type STRING"
)
STATE_SCHEMA = "n BIGINT, total DOUBLE, last_type STRING"


def _update_user_totals(
    key: tuple[Any, ...],
    pdfs: Iterable[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    n, total, last_type = state.get if state.exists else (0, 0.0, None)
    for pdf in pdfs:
        pdf = pdf.sort_values(["ts", "event_id"])
        n += len(pdf)
        total += float(pdf["value"].sum())
        if len(pdf):
            last_type = str(pdf["event_type"].iloc[-1])
    state.update((n, total, last_type))
    yield pd.DataFrame({
        "user_id": [key[0]],
        "n_events": [n],
        "total_value": [total],
        "last_event_type": [last_type],
    })


def running_user_totals(events: DataFrame) -> DataFrame:
    """Streaming per-user accumulator (update output mode). Requires a
    streaming DataFrame with user_id/event_id/ts/event_type/value."""
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_user_totals,
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def stream_dedup_exact(stream: DataFrame, key_cols: list[str],
                       watermark_col: str,
                       delay: str = "1 hour") -> DataFrame:
    """Streaming twin of operators.dedup.exact_dedup: emit the first
    row seen per key, suppress replays and late duplicates.

    ``dropDuplicatesWithinWatermark`` bounds the dedup state by the
    watermark — a key's fingerprint is evicted once the watermark
    passes its event time plus ``delay`` — so state is O(keys per
    watermark window), not O(stream history). That bound is the whole
    design at 100 TB/day: an unbounded dropDuplicates would accrete
    every fingerprint ever seen into the state store."""
    return (
        stream.withWatermark(watermark_col, delay)
        .dropDuplicatesWithinWatermark(key_cols)
    )
