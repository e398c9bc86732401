"""Per-key streaming quota enforcement via ``transformWithStateInPandas``
(Spark 4.0's arbitrary-state v2 API — typed state variables instead of
applyInPandasWithState's single tuple).

The operator: admit at most ``quota`` rows per key across the lifetime
of the stream (per-domain crawl caps, per-source ingest budgets — the
streaming complement of the batch ``cap_docs_per_source``). Rows
beyond the quota are dropped; admitted rows pass through with their
running admission index. State is ONE bigint per key (a ValueState),
so the store is O(keys) forever; a processing-time TTL can be added
via the ``ttl_ms`` option to expire idle keys — both knobs the old
applyInPandasWithState API could not express as declaratively.

Determinism: within a micro-batch rows are admitted in (ts, event_id)
order, so a replayed batch admits the identical subset — the property
exactly-once sinks need.
"""

from __future__ import annotations

from typing import TYPE_CHECKING, Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

if TYPE_CHECKING:  # pragma: no cover
    pass

OUTPUT_SCHEMA = (
    "user_id BIGINT, event_id BIGINT, event_type STRING, value DOUBLE, "
    "admit_idx BIGINT"
)


class QuotaProcessor(StatefulProcessor):
    """Admit the first ``quota`` rows per key; drop the rest."""

    def __init__(self, quota: int, ttl_ms: int | None = None):
        self.quota = int(quota)
        self.ttl_ms = ttl_ms

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.admitted = handle.getValueState(
            "admitted", "n BIGINT", ttlDurationMs=self.ttl_ms)

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        n = (self.admitted.get() or (0,))[0] if self.admitted.exists() \
            else 0
        for pdf in rows:
            if n >= self.quota:
                continue
            pdf = pdf.sort_values(["ts", "event_id"]).reset_index(drop=True)
            room = self.quota - n
            take = pdf.iloc[:room]
            if len(take):
                out = pd.DataFrame({
                    "user_id": take["user_id"].astype("int64"),
                    "event_id": take["event_id"].astype("int64"),
                    "event_type": take["event_type"].astype(str),
                    "value": take["value"].astype("float64"),
                    "admit_idx": (n + 1 + take.index).astype("int64"),
                })
                yield out
            n = min(self.quota, n + len(pdf))
        self.admitted.update((n,))

    def close(self) -> None:
        pass


def quota_limit_stream(
    events: DataFrame, quota: int, ttl_ms: int | None = None
) -> DataFrame:
    """Apply the per-user quota to a streaming events frame. Append
    output mode: each admitted row is emitted exactly once."""
    from oracle_cassandra_migrator_spark._vendor import ensure_protobuf

    # the state-v2 runner speaks protobuf to the JVM; fall back to the
    # vendored runtime when no install exists (workers included —
    # effective only if no SparkSession existed yet, see _vendor)
    ensure_protobuf()
    return (
        events.select("user_id", "event_id", "ts", "event_type", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            QuotaProcessor(quota, ttl_ms=ttl_ms),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
