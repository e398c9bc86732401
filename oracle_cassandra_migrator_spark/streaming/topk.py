"""Per-key streaming top-k via ``transformWithStateInPandas`` ListState.

The operator: maintain the k best (score, id) rows per key for the
lifetime of the stream — the streaming leaderboard, the curation twin
of the batch ``cap_per_group_salted``: "keep the k highest-quality
documents per domain seen so far". State is ONE bounded list per key
(k tuples — O(keys * k) forever, never O(rows)); each micro-batch
merges its rows into the list and emits only the rows that ENTERED
the top-k this batch.

Append-mode contract (documented, deliberate): the sink receives
every row that was EVER in its key's top-k — a superset of the final
leaderboard, in admission order; the state always holds the exact
current top-k, and a row evicted later is simply never re-emitted
(append sinks cannot retract). Deterministic: merge order is
(-score, id), ties break on id, so a replayed batch emits the
identical set. A document re-delivered with a HIGHER score keeps one
slot (best score wins) and re-emits at its new score; a lower re-score
is ignored.

Like quota.py, the state-v2 runner needs google.protobuf — satisfied
by the vendored pure-Python runtime (``_vendor.ensure_protobuf``);
both the integration path and the processor contract are covered in
tests/test_topk_stream.py.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

OUTPUT_SCHEMA = "key STRING, doc_id BIGINT, score DOUBLE"


class TopKProcessor(StatefulProcessor):
    """Keep the k best (score DESC, doc_id ASC) rows per key; emit
    rows newly entering the top-k."""

    def __init__(self, k: int):
        self.k = int(k)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self.best = handle.getListState(
            "best", "score DOUBLE, doc_id BIGINT")

    def handleInputRows(
        self, key, rows, timerValues
    ) -> Iterator[pd.DataFrame]:
        old = [(float(s), int(d)) for s, d in self.best.get()] \
            if self.best.exists() else []
        merged = list(old)
        for pdf in rows:
            merged.extend(
                (float(r.score), int(r.doc_id))
                for r in pdf.itertuples(index=False))
        # ONE slot per document: a re-scored doc keeps only its best
        # score (otherwise it would occupy multiple top-k slots and
        # evict distinct docs); exact-duplicate rows collapse too, so
        # replays stay idempotent
        best_by_doc: dict[int, float] = {}
        for s, d in merged:
            if d not in best_by_doc or s > best_by_doc[d]:
                best_by_doc[d] = s
        # deterministic order: score DESC, id ASC
        merged = sorted(((s, d) for d, s in best_by_doc.items()),
                        key=lambda t: (-t[0], t[1]))[:self.k]
        self.best.clear()
        for t in merged:
            self.best.appendValue(t)
        entered = [t for t in merged if t not in set(old)]
        if not entered:
            return iter(())
        return iter([pd.DataFrame({
            "key": [str(key[0])] * len(entered),
            "doc_id": [d for _, d in entered],
            "score": [s for s, _ in entered],
        })])

    def close(self) -> None:
        pass


def topk_stream(stream: DataFrame, k: int = 5) -> DataFrame:
    """Wire the processor: input needs (key STRING, doc_id BIGINT,
    score DOUBLE) columns; output = OUTPUT_SCHEMA rows as keys' top-k
    membership changes."""
    from oracle_cassandra_migrator_spark._vendor import ensure_protobuf

    ensure_protobuf()  # state-v2 runner dependency; see _vendor
    return (
        stream.groupBy("key")
        .transformWithStateInPandas(
            TopKProcessor(k),
            outputStructType=OUTPUT_SCHEMA,
            outputMode="append",
            timeMode="none",
        )
    )
