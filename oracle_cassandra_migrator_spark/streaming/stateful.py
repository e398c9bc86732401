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
    # concat BEFORE sorting: the runtime delivers a group's batch as
    # multiple arrow chunks in shuffle order, so per-chunk sorting
    # would take last_event_type from whichever chunk arrived last
    batch = pd.concat(list(pdfs), ignore_index=True)
    if len(batch):
        batch = batch.sort_values(["ts", "event_id"], kind="mergesort")
        n += len(batch)
        total += float(batch["value"].sum())
        last_type = str(batch["event_type"].iloc[-1])
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


HH_OUTPUT_SCHEMA = (
    "bucket INT, item BIGINT, count_lo BIGINT, count_hi BIGINT"
)
HH_STATE_SCHEMA = "counters STRING, decrements BIGINT"


def _update_heavy_hitters(capacity: int):
    import json

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            raw, decs = state.get
            counters = {int(k): int(v) for k, v in json.loads(raw).items()}
        else:
            counters, decs = {}, 0
        for pdf in pdfs:
            for item, n in pdf["item"].value_counts().items():
                counters[int(item)] = counters.get(int(item), 0) + int(n)
            # batch Misra-Gries compression: while over capacity,
            # subtract the minimum counter from ALL and drop zeros
            # (equivalent to n_min rounds of the classic decrement)
            while len(counters) > capacity:
                m = min(counters.values())
                counters = {
                    k: v - m for k, v in counters.items() if v - m > 0}
                decs += m
        state.update((json.dumps(counters), decs))
        items = sorted(counters)
        yield pd.DataFrame({
            "bucket": [key[0]] * len(items),
            "item": items,
            "count_lo": [counters[i] for i in items],
            "count_hi": [counters[i] + decs for i in items],
        })

    return update


def heavy_hitters_stream(
    stream: DataFrame, item_col: str,
    n_buckets: int = 16, capacity: int = 8,
) -> DataFrame:
    """Distributed streaming heavy hitters via bucketed Misra-Gries
    summaries in ``applyInPandasWithState``: items hash into
    ``n_buckets`` state groups (B-way parallel state store), each
    bucket keeps <= ``capacity`` counters with the classic
    decrement-compression, and every micro-batch re-emits the bucket's
    surviving candidates with count BOUNDS (true count in
    [count_lo, count_hi] — hi adds the bucket's total decrements).

    Guarantees (Misra-Gries): any item whose true count in its bucket
    exceeds n_bucket/(capacity+1) SURVIVES in state; state is
    O(n_buckets x capacity) forever — the property that matters for an
    unbounded stream. Final top-k = merge the per-bucket candidates
    (tiny) and rank by count_lo."""
    from pyspark.sql import functions as F

    return (
        stream.select(
            F.expr(f"CAST(pmod(hash({item_col}), {n_buckets}) AS INT)")
            .alias("bucket"),
            F.col(item_col).cast("bigint").alias("item"))
        .groupBy("bucket")
        .applyInPandasWithState(
            _update_heavy_hitters(capacity),
            outputStructType=HH_OUTPUT_SCHEMA,
            stateStructType=HH_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


SESSION_OUT_SCHEMA = (
    "user_id BIGINT, session_start_us BIGINT, session_end_us BIGINT, "
    "n_events BIGINT"
)
SESSION_STATE_SCHEMA = "start_us BIGINT, last_us BIGINT, n BIGINT"


def _update_sessions(gap_us: int):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        def row(start_us: int, last_us: int, n: int) -> pd.DataFrame:
            return pd.DataFrame({
                "user_id": [key[0]],
                "session_start_us": [int(start_us)],
                "session_end_us": [int(last_us)],
                "n_events": [int(n)],
            })

        if state.hasTimedOut:
            # the watermark passed last_event + gap with no new data:
            # the open session is definitively closed — emit and drop.
            start_us, last_us, n = state.get
            state.remove()
            yield row(start_us, last_us, n)
            return

        pdf = pd.concat(list(pdfs)).sort_values(["ts", "event_id"])
        ts_us = list((pdf["ts"].astype("int64") // 1_000).to_numpy())
        if not ts_us:
            if state.exists:
                _, last_us, _ = state.get
                state.setTimeoutTimestamp(max(
                    last_us // 1_000 + gap_us // 1_000,
                    state.getCurrentWatermarkMs() + 1))
            return
        if state.exists:
            start_us, last_us, n = state.get
            if ts_us and ts_us[0] - last_us <= gap_us:
                # batch continues the open session
                sess_start, sess_last, sess_n = start_us, last_us, n
            else:
                yield row(start_us, last_us, n)
                sess_start = sess_last = ts_us[0]
                sess_n = 1
                ts_us = ts_us[1:]
        else:
            sess_start = sess_last = ts_us[0]
            sess_n = 1
            ts_us = ts_us[1:]
        for t in ts_us:
            if t - sess_last > gap_us:
                yield row(sess_start, sess_last, sess_n)
                sess_start, sess_n = t, 0
            sess_last = t
            sess_n += 1
        state.update((int(sess_start), int(sess_last), int(sess_n)))
        # fire when the event-time watermark passes last + gap; Spark
        # rejects a timeout at-or-before the current watermark, so
        # clamp just past it (fires on the next microbatch)
        timeout_ms = int(sess_last) // 1_000 + gap_us // 1_000
        state.setTimeoutTimestamp(
            max(timeout_ms, state.getCurrentWatermarkMs() + 1))

    return update


def sessionize_stateful(
    events: DataFrame, gap_minutes: int = 30, watermark: str = "10 minutes",
) -> DataFrame:
    """Custom sessionization with EVENT-TIME STATE TIMEOUT — the
    applyInPandasWithState capability ``F.session_window`` cannot
    express (arbitrary per-session logic + explicit state eviction):
    per user, events within ``gap_minutes`` of the previous one extend
    the open session; a session is emitted either when a later event
    provably splits it, or when the WATERMARK passes last_event + gap
    and ``state.hasTimedOut`` fires — so state for idle users is
    dropped deterministically instead of accumulating forever. State
    per key is one (start, last, n) triple; output is in append mode
    (sessions emit exactly once, when closed)."""
    gap_us = gap_minutes * 60 * 1_000_000
    return (
        events.select("user_id", "event_id", "ts")
        .withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _update_sessions(gap_us),
            outputStructType=SESSION_OUT_SCHEMA,
            stateStructType=SESSION_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


EWMA_OUT_SCHEMA = "key STRING, n_obs BIGINT, ewma DOUBLE, last_ts_us BIGINT"
EWMA_STATE_SCHEMA = "n BIGINT, s DOUBLE, last_us BIGINT"


def _update_ewma(alpha: float):
    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        n, s, last_us = state.get if state.exists else (0, 0.0, -1)
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["ts_us", "x"], kind="mergesort")
        for r in batch.itertuples(index=False):
            x = float(r.x)
            s = x if n == 0 else alpha * x + (1.0 - alpha) * s
            n += 1
            last_us = max(last_us, int(r.ts_us))
        state.update((int(n), float(s), int(last_us)))
        yield pd.DataFrame({
            "key": [key[0]], "n_obs": [int(n)],
            "ewma": [float(s)], "last_ts_us": [int(last_us)],
        })

    return update


def ewma_stream(
    stream: DataFrame, key_col: str, value_col: str, ts_col: str,
    alpha: float = 0.5,
) -> DataFrame:
    """Streaming per-key EWMA: the incremental recursive form of
    ``events_daily_ewma``'s closed formula — s := alpha*x +
    (1-alpha)*s per observation, folded in (event-time, value) order
    within each micro-batch, with s carried across batches in the
    state store. This IS the 100 TB/unbounded-span answer the batch
    query's docstring points to: the closed form needs the day index
    inside the double mantissa, the recursion needs only O(keys)
    state forever.

    Emits one updated (key, n_obs, ewma, last_ts_us) row per key per
    micro-batch (update mode). Exactly equal to the batch fold over
    the same rows in the same order — identical FP operations — which
    the stream==batch pytest pins across a two-batch split."""
    from pyspark.sql import functions as F

    prepared = stream.select(
        F.col(key_col).cast("string").alias("key"),
        F.expr(f"CAST(unix_micros(CAST({ts_col} AS TIMESTAMP)) AS BIGINT)")
        .alias("ts_us"),
        F.col(value_col).cast("double").alias("x"))
    return prepared.groupBy("key").applyInPandasWithState(
        _update_ewma(alpha),
        outputStructType=EWMA_OUT_SCHEMA,
        stateStructType=EWMA_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


BLOOM_DEDUP_OUT_SCHEMA = "shard INT, doc_id BIGINT"
BLOOM_DEDUP_STATE_SCHEMA = "words BINARY"


def _bloom_dedup_positions(fp: str, m_bits: int, k: int) -> list[int]:
    import hashlib

    return [
        int(hashlib.md5(f"{i}:{fp}".encode()).hexdigest()[:15], 16) % m_bits
        for i in range(k)
    ]


def _update_bloom_dedup(m_bits: int, k: int):
    n_words = m_bits // 64

    def update(
        key: tuple[Any, ...],
        pdfs: Iterable[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import numpy as np

        if state.exists:
            words = np.frombuffer(state.get[0], dtype=np.uint64).copy()
        else:
            words = np.zeros(n_words, dtype=np.uint64)
        admitted = []
        batch = pd.concat(list(pdfs), ignore_index=True)
        batch = batch.sort_values(["doc_id"], kind="mergesort")
        for r in batch.itertuples(index=False):
            pos = _bloom_dedup_positions(str(r.fp), m_bits, k)
            hit = all(
                (int(words[p // 64]) >> (p % 64)) & 1 for p in pos)
            if not hit:
                admitted.append(int(r.doc_id))
                for p in pos:
                    words[p // 64] = np.uint64(
                        int(words[p // 64]) | (1 << (p % 64)))
        state.update((words.tobytes(),))
        yield pd.DataFrame({
            "shard": [int(key[0])] * len(admitted),
            "doc_id": admitted,
        })

    return update


def bloom_dedup_stream(
    stream: DataFrame, fp_col: str, id_col: str,
    n_shards: int = 8, m_bits: int = 16_384, k: int = 3,
) -> DataFrame:
    """Streaming dedup with BOUNDED state: fingerprints shard by hash
    into ``n_shards`` state groups, each holding one fixed-size Bloom
    filter (m_bits/8 bytes — forever); a row is admitted iff its
    fingerprint's bits were not already all set in its shard, then the
    bits are set. Exactly-once admission of first-seen fingerprints,
    with an approximate twist: a false positive DROPS a unique row
    (rate = the bloom FP rate at the shard's fill), never duplicates.

    This is the 100 TB/unbounded-stream counterpart of
    ``stream.dropDuplicates`` — whose state grows with DISTINCT KEYS
    FOREVER unless a watermark bounds it, which only works when dups
    arrive close in time. Sharding multiplies both capacity and
    parallelism (state ops scale across the shard keys); at a real
    deployment m_bits scales with expected corpus cardinality. The
    md5-position scheme is the batch operator's exactly
    (operators/sketches.py), and the whole thing is deterministic:
    rows fold in (shard, doc_id) order, so a replayed batch admits the
    identical set — pinned against a plain-Python simulation in
    pytest."""
    from pyspark.sql import functions as F

    if m_bits % 64 != 0:
        raise ValueError(
            f"bloom_dedup_stream: m_bits must be a multiple of 64 "
            f"(packed words), got {m_bits}")
    # Hash the STRING-cast fingerprint: positions/state probe the cast
    # `fp`, and md5() rejects non-string input — a binary/bigint
    # fp_col must shard through the same cast it probes with.
    prepared = stream.select(
        F.expr(f"CAST(CAST(conv(substring("
               f"md5(CAST({fp_col} AS STRING)), 1, 8), 16, 10)"
               f" AS BIGINT) % {n_shards} AS INT)").alias("shard"),
        F.col(fp_col).cast("string").alias("fp"),
        F.col(id_col).cast("bigint").alias("doc_id"))
    return prepared.groupBy("shard").applyInPandasWithState(
        _update_bloom_dedup(m_bits, k),
        outputStructType=BLOOM_DEDUP_OUT_SCHEMA,
        stateStructType=BLOOM_DEDUP_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
