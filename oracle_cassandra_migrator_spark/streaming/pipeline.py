"""Declarative STREAMING pipelines — the readStream twin of
``pipeline.py``/``plans/compiler.py``: one spec document describes
source -> stateless transform steps -> optional event-time windowed
aggregation -> exactly-once sink, so a reference-style config user
drives streams the same way they drive batch tables.

    {
      "source":    {read_stream_source spec, incl. watermark},
      "transform": [{"op": "filter", "expr": ...},
                    {"op": "select", "exprs": [...]}, ...],
      "window":    {"duration": "1 hour", "slide": optional,
                    "session_gap": optional (mutually exclusive),
                    "ts": "ts", "watermark": "2 hours",
                    "group_by": ["event_type"],
                    "aggs": {"n_events": "count(*)"}},
      "sink":      {"format": "parquet", "path": ..., "mode": "append",
                    "marker_dir": ..., "checkpoint_dir": ...}
    }

Transform steps reuse the BATCH compiler's op implementations (same
config language, one semantics), restricted to the stream-safe
stateless subset — a spec that says ``sort``/``limit``/``join`` on a
stream is rejected up front with the reason, instead of failing deep
inside Spark's unsupported-operation checker.

``run_batch_equivalent`` executes the SAME spec on a batch DataFrame
(source read through the batch reader, identical transforms, identical
window aggregation semantics — ``F.window`` works on batch frames), so
every spec carries its own stream==batch parity check; the pytest pins
it on real events.
"""

from __future__ import annotations

from typing import Any, Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery

# stateless row-wise ops only: anything needing a global order, an
# unbounded state, or a second relation is not a stream transform step
# (joins have their own dedicated stream operators; see
# streaming/joins.py and streaming/enrich.py). decode_media qualifies
# (r12): Arrow mapInPandas header parsing is per-row with an explicit
# output schema, its quarantine handling is a row filter, and the
# resize geometry is a JVM-side projection — so a streaming media
# ingest (crawl firehose -> decode -> quality gate -> sink) never
# exits the spec either.
# Stream-safe = stateless per-row work: no step here may aggregate,
# join, or order across the stream. sample_stratified qualifies (r12)
# because its rates are EXPLICIT spec constants and the survivor
# predicate is a pure md5-bucket compare per row — the same row
# survives in any micro-batch slicing; its siblings do NOT
# (sample_temperature / corpus_mix derive thresholds from a
# corpus-wide aggregate, sample_fixed_n orders across the corpus —
# stateful shapes that belong to the dedicated streaming operators).
STREAM_SAFE_OPS = frozenset({
    "filter", "select", "with_columns", "drop", "alias",
    "decode_media", "sample_stratified",
})


def _apply_transform(spark: SparkSession, df: DataFrame,
                     steps: list[Mapping[str, Any]]) -> DataFrame:
    from oracle_cassandra_migrator_spark.plans.compiler import (
        OPS, Namespace)

    for step in steps or []:
        op = step.get("op")
        if op not in STREAM_SAFE_OPS:
            raise ValueError(
                f"stream pipeline step {op!r} is not stream-safe "
                f"(allowed: {sorted(STREAM_SAFE_OPS)}); stateful shapes "
                f"(windows, joins, dedup) have dedicated spec slots / "
                f"streaming operators")
        ns = Namespace(spark)
        ns.put("__stream__", df)
        df = OPS[op](ns, {**step, "input": "__stream__"})
    return df


def _apply_window(df: DataFrame, win: Mapping[str, Any]) -> DataFrame:
    ts = win.get("ts", "ts")
    if win.get("watermark"):
        df = df.withWatermark(ts, win["watermark"])
    if win.get("session_gap"):
        if win.get("duration") or win.get("slide"):
            raise ValueError(
                "window spec: session_gap is mutually exclusive with "
                "duration/slide")
        w = F.session_window(F.col(ts), win["session_gap"])
        wcol = "session_window"
    elif win.get("slide"):
        w = F.window(F.col(ts), win["duration"], win["slide"])
        wcol = "window"
    else:
        w = F.window(F.col(ts), win["duration"])
        wcol = "window"
    aggs = win.get("aggs") or {"n_rows": "count(*)"}
    agg_exprs = [F.expr(e).alias(name) for name, e in aggs.items()]
    grouped = df.groupBy(w, *[F.col(c) for c in win.get("group_by", [])])
    return (grouped.agg(*agg_exprs)
            .select(F.col(f"{wcol}.start").alias("window_start"),
                    F.col(f"{wcol}.end").alias("window_end"),
                    *win.get("group_by", []),
                    *aggs.keys()))


def build_stream(spark: SparkSession,
                 spec: Mapping[str, Any]) -> DataFrame:
    """Source + transforms + optional window as a lazy streaming
    DataFrame (no sink started) — what ``run_stream_pipeline`` starts,
    exposed for plan inspection and memory-sink tests."""
    from oracle_cassandra_migrator_spark.streaming.sources import (
        read_stream_source)

    df = read_stream_source(spark, spec["source"])
    df = _apply_transform(spark, df, spec.get("transform"))
    if spec.get("window"):
        df = _apply_window(df, spec["window"])
    return df


def _spec_bool(value: Any, key: str) -> bool:
    """Strict spec-boolean parse — shared helper (configspec.py) so
    source specs (layout.refresh) and stream specs (allow_missing)
    reject the same string-form hazards identically."""
    from oracle_cassandra_migrator_spark.configspec import spec_bool

    return spec_bool(value, key)


def run_stream_pipeline(spark: SparkSession,
                        spec: Mapping[str, Any]) -> StreamingQuery:
    """Start the spec end-to-end. The sink's ``type`` selects the
    exactly-once terminal operator (all marker-committed, all replay
    no-ops):

    - absent / ``"files"``: append file sink (streaming/sinks.py)
    - ``"upsert"`` / ``"partitioned_upsert"``: continuously-maintained
      keyed snapshot (streaming/upsert.py / partitioned.py); needs
      ``keys`` + ``order_by`` (+ ``n_buckets`` for partitioned)
    - ``"rollup"`` / ``"partitioned_rollup"``: continuously-maintained
      (count, sum) GROUP BY from CDC rows; needs ``keys`` + ``new`` +
      ``old`` measure-image expressions
    - ``"neardedup"``: MinHash-LSH near-duplicate admission gate over
      a document stream (streaming/neardedup.py); needs ``base_dir``
      (+ optional ``text_col``/``id_col``/``threshold``/``n``)
    - ``"ann_maintain"``: drift-gated incremental ANN index
      maintenance over an embedding stream (streaming/annmaintain.py);
      needs ``base_dir`` (+ optional ``algo`` ivf/pq,
      ``id_col``/``vec_col``/``gate_micro``/``assume_new_ids`` and the
      algo's train knobs)

    Maintenance sinks consume CHANGE rows, so they pair with the
    stateless transform subset rather than a windowed aggregation
    (windowed-agg output in append mode is insert-only — route it to
    the file sink)."""
    from oracle_cassandra_migrator_spark.streaming.sinks import (
        foreach_batch_sink)

    sink = dict(spec["sink"])
    checkpoint_dir = sink.pop("checkpoint_dir")
    kind = sink.pop("type", "files")
    df = build_stream(spark, spec)
    if kind == "files":
        marker_dir = sink.pop("marker_dir")
        return foreach_batch_sink(df, sink, marker_dir, checkpoint_dir)
    if kind in ("upsert", "partitioned_upsert"):
        from oracle_cassandra_migrator_spark.streaming import (
            partitioned, upsert)
        if kind == "upsert":
            return upsert.foreach_batch_upsert(
                df, sink["base_dir"], sink["keys"], sink["order_by"],
                checkpoint_dir,
                allow_missing=_spec_bool(
                    sink.get("allow_missing", False), "allow_missing"))
        return partitioned.foreach_batch_upsert_partitioned(
            df, sink["base_dir"], sink["keys"], sink["order_by"],
            checkpoint_dir, n_buckets=sink.get("n_buckets", 16))
    if kind in ("rollup", "partitioned_rollup"):
        from oracle_cassandra_migrator_spark.streaming import (
            partitioned, rollup)
        if kind == "rollup":
            return rollup.foreach_batch_rollup(
                df, sink["base_dir"], sink["keys"], sink["new"],
                sink["old"], checkpoint_dir,
                op_col=sink.get("op_col", "op"))
        return partitioned.foreach_batch_rollup_partitioned(
            df, sink["base_dir"], sink["keys"], sink["new"],
            sink["old"], checkpoint_dir,
            n_buckets=sink.get("n_buckets", 16),
            op_col=sink.get("op_col", "op"))
    if kind == "neardedup":
        from oracle_cassandra_migrator_spark.streaming import neardedup

        mbs = sink.get("max_band_size", neardedup.LSH_MAX_BAND_SIZE)
        return neardedup.foreach_batch_near_dedup(
            df, sink["base_dir"], checkpoint_dir,
            text_col=sink.get("text_col", "text"),
            id_col=sink.get("id_col", "doc_id"),
            n=int(sink.get("n", 3)),
            threshold=float(sink.get("threshold", 0.5)),
            max_band_size=int(mbs) if mbs is not None else None)
    if kind == "ann_maintain":
        from oracle_cassandra_migrator_spark.streaming import annmaintain
        from oracle_cassandra_migrator_spark.operators.similarity import (
            CENTROID_DRIFT_GATE_MICRO)

        known = {"base_dir", "algo", "id_col", "vec_col", "gate_micro",
                 "assume_new_ids"}
        # algo knobs are read with .get() defaults inside _IvfAlgo/
        # _PqAlgo, so a typo'd key ('gatemicro', 'initlimit') would be
        # silently ignored and the default applied — fail loudly like
        # the rest of this file's spec parsing (ADVICE r11). An
        # invalid algo falls through to the sink's own ValueError.
        algo_knobs = {"ivf": {"modulus", "iters", "init_limit"},
                      "pq": {"n_sub", "sub_dim", "modulus", "iters",
                             "init_limit"}}
        algo = sink.get("algo", "ivf")
        if algo in algo_knobs:
            unknown = sorted(set(sink) - known - algo_knobs[algo])
            if unknown:
                raise ValueError(
                    f"ann_maintain sink: unknown key(s) {unknown} — "
                    f"accepted: {sorted(known)} plus {algo!r} knobs "
                    f"{sorted(algo_knobs[algo])}")
        algo_opts = {k: v for k, v in sink.items() if k not in known}
        return annmaintain.foreach_batch_ann_maintain(
            df, sink["base_dir"], checkpoint_dir,
            algo=algo,
            id_col=sink.get("id_col", "vec_id"),
            vec_col=sink.get("vec_col", "embedding"),
            gate_micro=int(sink.get("gate_micro",
                                    CENTROID_DRIFT_GATE_MICRO)),
            assume_new_ids=_spec_bool(
                sink.get("assume_new_ids", False), "assume_new_ids"),
            **algo_opts)
    raise ValueError(
        f"unknown sink type {kind!r}: expected files / upsert / "
        f"rollup / partitioned_upsert / partitioned_rollup / neardedup "
        f"/ ann_maintain")


def run_batch_equivalent(spark: SparkSession, spec: Mapping[str, Any],
                         batch_df: DataFrame | None = None) -> DataFrame:
    """The same spec on a batch frame: batch source read (or a caller-
    supplied DataFrame), identical transform steps, identical window
    aggregation (``F.window``/``session_window`` work on batch input).
    Late-data caveat: a batch replay sees ALL data, so it equals the
    stream only when no row was dropped by the watermark — which is
    exactly the invariant worth testing."""
    if batch_df is None:
        from oracle_cassandra_migrator_spark.sources.readers import (
            read_source)

        src = {k: v for k, v in spec["source"].items()
               if k not in ("watermark",)}
        src.setdefault("options", {})
        batch_df = read_source(spark, src)
    df = _apply_transform(spark, batch_df, spec.get("transform"))
    if spec.get("window"):
        win = {k: v for k, v in spec["window"].items()
               if k != "watermark"}
        df = _apply_window(df, win)
    return df
