"""Declarative streaming pipeline spec (streaming/pipeline.py):
source -> stream-safe transforms -> windowed agg -> exactly-once sink,
with the spec's own batch equivalent pinning stream==batch parity."""

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMALL


def _events_src(spark, tmp_path):
    """Two TIME-ORDERED source files (arrival follows event time, as a
    real ingest does) plus a far-future sentinel row in the last file:
    with availableNow the final watermark only reaches
    max(ts) - delay, so without the sentinel the trailing windows
    never finalize and append mode never emits them — the sentinel
    pushes the watermark past every real window. Tests exclude the
    sentinel's own window from comparisons."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    ev = read_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    mid, hi = ev.selectExpr(
        "timestamp_micros(CAST(percentile_disc(0.5) WITHIN GROUP"
        " (ORDER BY unix_micros(ts)) AS BIGINT))", "max(ts)").collect()[0]
    sentinel = ev.limit(1).selectExpr(
        "CAST(-1 AS BIGINT) AS event_id", "CAST(-1 AS BIGINT) AS user_id",
        "'sentinel' AS event_type",
        f"CAST('{hi}' AS TIMESTAMP) + INTERVAL 30 DAYS AS ts",
        "CAST(1.0 AS DOUBLE) AS value", "props")
    sentinel = sentinel.select(*ev.columns)  # column order parity
    src = str(tmp_path / "src")
    ev.where(F.col("ts") <= mid).coalesce(1).write.mode(
        "overwrite").parquet(src)
    (ev.where(F.col("ts") > mid).unionByName(sentinel)
     .coalesce(1).write.mode("append").parquet(src))
    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                       for f in ev.schema.fields)
    return ev, src, schema, hi


def _spec(src, schema, tmp_path):
    return {
        "source": {"format": "parquet", "path": src, "schema": schema,
                   "options": {"maxFilesPerTrigger": "1"}},
        "transform": [
            {"op": "filter", "expr": "event_type <> 'view' OR value > 0"},
            {"op": "with_columns",
             "columns": {"vtype": "upper(event_type)"}},
            {"op": "select",
             "exprs": ["event_id", "user_id", "ts", "vtype", "value"]},
        ],
        "window": {"duration": "1 day", "ts": "ts",
                   "watermark": "2 days", "group_by": ["vtype"],
                   "aggs": {"n_events": "CAST(count(*) AS BIGINT)",
                            "total_value":
                                "CAST(SUM(CAST(value AS DECIMAL(18,4)))"
                                " AS DOUBLE)"}},
        "sink": {"format": "parquet",
                 "path": str(tmp_path / "out"),
                 "marker_dir": str(tmp_path / "markers"),
                 "checkpoint_dir": str(tmp_path / "ckpt")},
    }


def test_spec_stream_equals_batch_equivalent(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_batch_equivalent, run_stream_pipeline)

    ev, src, schema, hi = _events_src(spark, tmp_path)
    spec = _spec(src, schema, tmp_path)
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(180)

    got = spark.read.parquet(spec["sink"]["path"]) \
        .where(F.expr(f"window_start <= CAST('{hi}' AS TIMESTAMP)"))
    want = run_batch_equivalent(spark, spec) \
        .where(F.expr(f"window_start <= CAST('{hi}' AS TIMESTAMP)"))
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    assert got.count() > 0
    assert set(got.columns) == {"window_start", "window_end", "vtype",
                                "n_events", "total_value"}

    # replay with a fresh checkpoint: markers make it a no-op
    import glob

    n_files = len(glob.glob(f"{spec['sink']['path']}/**/*.parquet",
                            recursive=True))
    spec2 = dict(spec,
                 sink={**spec["sink"],
                       "checkpoint_dir": str(tmp_path / "ckpt2")})
    q2 = run_stream_pipeline(spark, spec2)
    q2.awaitTermination(180)
    assert len(glob.glob(f"{spec['sink']['path']}/**/*.parquet",
                         recursive=True)) == n_files


def test_spec_rejects_stream_unsafe_ops(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        build_stream)

    ev, src, schema, hi = _events_src(spark, tmp_path)
    for bad in ({"op": "sort", "cols": ["ts"]},
                {"op": "limit", "n": 5},
                {"op": "join", "right": "x", "on": "y"}):
        spec = {"source": {"format": "parquet", "path": src,
                           "schema": schema},
                "transform": [bad]}
        with pytest.raises(ValueError, match="not stream-safe"):
            build_stream(spark, spec)


def test_spec_session_window_variant(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_batch_equivalent, build_stream)

    ev, src, schema, hi = _events_src(spark, tmp_path)
    spec = {
        "source": {"format": "parquet", "path": src, "schema": schema},
        "window": {"session_gap": "30 minutes", "ts": "ts",
                   "watermark": "2 days", "group_by": ["user_id"],
                   "aggs": {"n_events": "CAST(count(*) AS BIGINT)"}},
    }
    out = build_stream(spark, spec)
    assert out.isStreaming
    # session windows per user in batch mode equal the sessionize
    # query's (user, session) row count on the same 30-min gap
    batch = run_batch_equivalent(spark, spec, batch_df=ev)
    from oracle_cassandra_migrator_spark.queries.extensions import (
        run_sessionize)

    assert batch.count() == run_sessionize(ev).count()

    # mutually exclusive window kinds rejected
    with pytest.raises(ValueError, match="mutually exclusive"):
        build_stream(spark, {
            "source": spec["source"],
            "window": {"session_gap": "30 minutes", "duration": "1 hour",
                       "ts": "ts"}})


def test_cli_runs_streaming_config(spark, tmp_path, monkeypatch):
    """`python -m oracle_cassandra_migrator_spark <config>` with a
    `streams` section must drain the stream through the spec runner
    (the example config, repointed at tmp dirs)."""
    import json
    import pathlib
    import shutil

    shutil.rmtree("/tmp/ocm-streaming-rollup", ignore_errors=True)
    ev, src, schema, hi = _events_src(spark, tmp_path)
    cfg_path = (pathlib.Path(__file__).resolve().parent.parent
                / "examples" / "streaming_rollup_config.json")
    cfg = json.load(open(cfg_path))
    stream = cfg["streams"][0]
    stream["source"]["path"] = src
    stream["source"]["schema"] = schema
    for k in ("path",):
        stream["sink"][k] = str(tmp_path / "out")
    stream["sink"]["marker_dir"] = str(tmp_path / "markers")
    stream["sink"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    patched = tmp_path / "cfg.json"
    patched.write_text(json.dumps(cfg))

    # run in a SUBPROCESS: main() builds-or-gets and then STOPS its
    # session — in-process that would tear down the shared test session
    import subprocess
    import sys

    proc = subprocess.run(
        [sys.executable, "-m", "oracle_cassandra_migrator_spark",
         str(patched)],
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '"stream": "daily_event_rollup"' in proc.stdout
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() > 0
    assert set(out.columns) == {"window_start", "window_end",
                                "event_type", "n_events", "total_value"}


def test_replayed_batches_still_feed_state(spark, tmp_path):
    """THE scenario behind sinks.consume_without_writing: a fresh-
    checkpoint replay over marker-committed files followed by NEW data
    in the SAME event-time window. The replayed batch must EXECUTE
    (feeding the window state) even though its write is skipped —
    otherwise the new batch's window counts silently miss every
    replayed row. (Found via Spark 4.1's state-commit validation.)"""
    import glob
    import json

    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    base = "2024-06-01 10:{:02d}:00"
    rows1 = [(i, base.format(i)) for i in range(5)]           # hour 10
    rows2 = [(10 + i, base.format(30 + i)) for i in range(3)]  # hour 10
    sentinel = [(99, "2024-06-02 00:00:00")]                   # flush
    schema = "id BIGINT, ts TIMESTAMP"

    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, "id BIGINT, ts STRING").selectExpr(
        "id", "CAST(ts AS TIMESTAMP) AS ts").coalesce(1).write.mode(
        "overwrite").parquet(src)

    def spec(ckpt):
        return {
            "source": {"format": "parquet", "path": src,
                       "schema": schema,
                       "options": {"maxFilesPerTrigger": "1"}},
            "window": {"duration": "1 hour", "ts": "ts",
                       "watermark": "1 minute",
                       "aggs": {"n": "CAST(count(*) AS BIGINT)"}},
            "sink": {"format": "parquet",
                     "path": str(tmp_path / "out"),
                     "marker_dir": str(tmp_path / "markers"),
                     "checkpoint_dir": str(tmp_path / ckpt)},
        }

    # run 1: only file 1 — its batches get markers; the hour-10 window
    # stays unflushed (watermark never passes its end)
    q = run_stream_pipeline(spark, spec("ckpt1"))
    q.awaitTermination(120)
    assert len(glob.glob(f"{tmp_path}/markers/*.marker")) >= 1

    # new data lands in the SAME window, plus the flush sentinel
    spark.createDataFrame(rows2 + sentinel, "id BIGINT, ts STRING") \
        .selectExpr("id", "CAST(ts AS TIMESTAMP) AS ts") \
        .coalesce(1).write.mode("append").parquet(src)

    # run 2, FRESH checkpoint: batch 0 replays file 1 (marker exists ->
    # write skipped, but the batch must still execute), batch 1 is new
    q2 = run_stream_pipeline(spark, spec("ckpt2"))
    q2.awaitTermination(120)

    out = spark.read.parquet(str(tmp_path / "out"))
    hour10 = out.where("hour(window_start) = 10").collect()
    assert len(hour10) == 1
    # all 8 rows — 5 replayed + 3 new — must be in the window count;
    # the pre-fix skip-without-executing code would report 3 here
    assert hour10[0]["n"] == 8


def test_spec_driven_maintenance_sinks(spark, tmp_path):
    """The declarative spec drives the maintenance sinks end-to-end:
    a CDC file stream -> filter step -> partitioned_rollup sink, and
    the maintained rollup equals the recompute of the surviving rows;
    an unknown sink type fails loudly."""
    import pytest
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.streaming import partitioned
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    schema = "op STRING, g STRING, new_v INT, old_v INT, seq INT"
    rows = ([("I", f"g{i % 5}", i, None, i) for i in range(50)]
            + [("I", "noise", 1, None, 999)])
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)

    base = str(tmp_path / "state")
    spec = {
        "source": {"format": "parquet", "path": src, "schema": schema},
        "transform": [{"op": "filter", "expr": "g <> 'noise'"}],
        "sink": {"type": "partitioned_rollup", "base_dir": base,
                 "keys": ["g"], "new": "new_v", "old": "old_v",
                 "n_buckets": 4,
                 "checkpoint_dir": str(tmp_path / "ck")},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(180)

    got = {r.g: (r.n, int(r.s)) for r in
           partitioned.latest_partitioned_snapshot(
               spark, base).collect()}
    want = {f"g{j}": (10, sum(i for i in range(50) if i % 5 == j))
            for j in range(5)}
    assert got == want  # the filter step ran before the sink

    bad = dict(spec)
    bad["sink"] = {"type": "nonesuch", "checkpoint_dir": "/tmp/x"}
    with pytest.raises(ValueError, match="unknown sink type"):
        run_stream_pipeline(spark, bad)


def test_cli_runs_cdc_mirror_config(spark, tmp_path):
    """The shipped CDC-mirror example (partitioned_upsert sink) must
    run through the real CLI; the maintained snapshot holds the
    last-writer-wins state of the non-deleted change rows."""
    import json
    import pathlib
    import shutil
    import subprocess
    import sys

    shutil.rmtree("/tmp/ocm-cdc-mirror", ignore_errors=True)
    rows = [
        (1, "ada", 10.0, "2024-01-01 00:00:00", 1, False),
        (2, "bo", 20.0, "2024-01-01 00:00:01", 2, False),
        (1, "ada2", 11.0, "2024-01-01 00:00:02", 3, False),
        (3, "cy", 30.0, "2024-01-01 00:00:03", 4, True),  # tombstone
    ]
    schema = ("cust_id BIGINT, name STRING, balance DOUBLE, "
              "change_ts_s STRING, change_seq BIGINT, deleted BOOLEAN")
    src = str(tmp_path / "in")
    (spark.createDataFrame(rows, schema)
     .selectExpr("cust_id", "name", "balance",
                 "CAST(change_ts_s AS TIMESTAMP) AS change_ts",
                 "change_seq", "deleted")
     .coalesce(1).write.mode("overwrite").parquet(src))

    cfg_path = (pathlib.Path(__file__).resolve().parent.parent
                / "examples" / "streaming_cdc_mirror.json")
    cfg = json.load(open(cfg_path))
    stream = cfg["streams"][0]
    stream["source"]["path"] = src
    base = str(tmp_path / "state")
    stream["sink"]["base_dir"] = base
    stream["sink"]["checkpoint_dir"] = str(tmp_path / "ckpt")
    patched = tmp_path / "cfg.json"
    patched.write_text(json.dumps(cfg))

    proc = subprocess.run(
        [sys.executable, "-m", "oracle_cassandra_migrator_spark",
         str(patched)],
        cwd=str(pathlib.Path(__file__).resolve().parent.parent),
        capture_output=True, text=True, timeout=600)
    assert proc.returncode == 0, proc.stderr[-2000:]
    assert '"stream": "customer_mirror"' in proc.stdout

    from oracle_cassandra_migrator_spark.streaming import partitioned
    snap = partitioned.latest_partitioned_snapshot(spark, base)
    got = {r.cust_id: (r.name, r.balance) for r in snap.collect()}
    assert got == {1: ("ada2", 11.0), 2: ("bo", 20.0)}
    shutil.rmtree("/tmp/ocm-cdc-mirror", ignore_errors=True)


def test_cdc_pysource_tail_to_partitioned_rollup(spark, tmp_path):
    """Config alone expresses CDC landing zone -> maintained table
    (example: streaming_cdc_pysource.json): the jsonl_dir PYTHON data
    source tails a directory of sequence-named change dumps as a
    stream, and the spec terminates in the partitioned rollup sink. A
    later file drop drains incrementally from the same checkpoint
    (committed batches replay as no-ops), and the maintained state
    equals the recompute over the surviving change rows."""
    import json as _json

    from oracle_cassandra_migrator_spark.streaming import partitioned
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    src = tmp_path / "in"
    src.mkdir()

    def drop(name, rows):
        with open(src / name, "w") as fh:
            for r in rows:
                fh.write(_json.dumps(r) + "\n")

    drop("000001.jsonl", [
        {"op": "I", "g": "A", "new_v": 10, "old_v": None, "seq": 1},
        {"op": "I", "g": "B", "new_v": 5, "old_v": None, "seq": 2},
        {"op": "X", "g": "A", "new_v": 99, "old_v": None, "seq": 3},
    ])
    drop("000002.jsonl", [
        {"op": "U", "g": "A", "new_v": 12, "old_v": 10, "seq": 4},
        {"op": "I", "g": "A", "new_v": 7, "old_v": None, "seq": 5},
    ])
    schema = "op STRING, g STRING, new_v INT, old_v INT, seq INT"
    base = str(tmp_path / "state")
    spec = {
        "source": {"format": "jsonl_dir", "schema": schema,
                   "options": {"path": str(src)}},
        "transform": [{"op": "filter", "expr": "op IN ('I','U','D')"}],
        "sink": {"type": "partitioned_rollup", "base_dir": base,
                 "keys": ["g"], "new": "new_v", "old": "old_v",
                 "n_buckets": 4,
                 "checkpoint_dir": str(tmp_path / "ck")},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(180)
    got = {r.g: (r.n, int(r.s)) for r in
           partitioned.latest_partitioned_snapshot(
               spark, base).collect()}
    # A: I 10, U 10->12 (+2), I 7 => (2, 19); B: I 5 => (1, 5);
    # the op='X' row was filtered by the spec step
    assert got == {"A": (2, 19), "B": (1, 5)}

    # a LATE dump: rerunning the same spec drains only the new file
    drop("000003.jsonl", [
        {"op": "D", "g": "B", "new_v": None, "old_v": 5, "seq": 6}])
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(180)
    got = {r.g: (r.n, int(r.s)) for r in
           partitioned.latest_partitioned_snapshot(
               spark, base).collect()}
    # B's count returned to 0 -> the group dies out of its bucket
    assert got == {"A": (2, 19)}


def test_spec_driven_neardedup_sink(spark, tmp_path):
    """r9: the near-dup admission gate is spec-selectable like the
    other maintenance sinks — a document file stream through a
    'neardedup' sink leaves the admitted-state equal to the same
    batches replayed through admit_batch."""
    from oracle_cassandra_migrator_spark.streaming import neardedup
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    base_txt = ("the quick brown fox jumps over the lazy dog while "
                "the cat naps in the warm afternoon sun by the wall")
    rows = [(1, base_txt),
            (2, base_txt.replace("afternoon", "evening")),  # near-dup
            (3, "a completely different document about adaptive "
                "query execution over columnar shuffle partitions")]
    schema = "doc_id BIGINT, text STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(rows, schema).coalesce(1) \
        .write.mode("overwrite").parquet(src)

    base = str(tmp_path / "state")
    spec = {
        "source": {"format": "parquet", "path": src, "schema": schema},
        "sink": {"type": "neardedup", "base_dir": base,
                 "text_col": "text", "id_col": "doc_id",
                 "threshold": 0.5,
                 "checkpoint_dir": str(tmp_path / "ck")},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(120)

    sigs, _ = neardedup.read_state(spark, base)
    assert sorted(r["doc_id"] for r in sigs.collect()) == [1, 3]


def test_spec_bool_parses_strictly():
    import pytest

    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        _spec_bool)

    assert _spec_bool(True, "k") is True
    assert _spec_bool(False, "k") is False
    assert _spec_bool("true", "k") is True
    assert _spec_bool("FALSE", "k") is False  # bool("false") trap
    for bad in ("yes", 1, None, ""):
        with pytest.raises(ValueError, match="'k' must be"):
            _spec_bool(bad, "k")


def test_streaming_examples_have_runnable_shape():
    """Every streaming example must carry the CLI 'streams' wrapper
    (a bare spec is a silent no-op through __main__) and jsonl_dir
    sources must put 'path' inside options (the reader only looks
    there) — both shipped-example regressions from the r9 review."""
    import json
    import pathlib

    ex_dir = pathlib.Path(__file__).resolve().parent.parent / "examples"
    for p in sorted(ex_dir.glob("streaming_*.json")):
        cfg = json.loads(p.read_text())
        assert cfg.get("streams"), f"{p.name}: no 'streams' wrapper"
        for stream in cfg["streams"]:
            src = stream["source"]
            assert "sink" in stream, p.name
            assert "checkpoint_dir" in stream["sink"], p.name
            if src.get("format") == "jsonl_dir":
                assert "path" in (src.get("options") or {}), (
                    f"{p.name}: jsonl_dir path must live in options")


def test_spec_stream_decode_media_equals_batch(spark, tmp_path):
    """r12: decode_media is a stream-safe transform step — a media
    ingest stream (two source files -> two micro-batches, one corrupt
    payload planted) decodes, quarantine-drops, and resizes inside the
    spec; the file sink's rows equal the batch equivalent of the same
    spec, and the corrupt payload is gone from both."""
    from pyspark.sql.types import (BinaryType, LongType, StructField,
                                   StructType)

    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_batch_equivalent, run_stream_pipeline)
    from oracle_cassandra_migrator_spark.operators.multimodal import (
        payload_for_doc)

    schema_t = StructType([StructField("doc_id", LongType()),
                           StructField("payload", BinaryType())])
    rows1 = [(i, payload_for_doc(i)) for i in range(0, 9)]
    rows2 = ([(i, payload_for_doc(i)) for i in range(9, 17)]
             + [(99, b"corrupt-not-a-container")])
    src = str(tmp_path / "src")
    spark.createDataFrame(rows1, schema_t).coalesce(1) \
        .write.mode("overwrite").parquet(src)
    spark.createDataFrame(rows2, schema_t).coalesce(1) \
        .write.mode("append").parquet(src)

    spec = {
        "source": {"format": "parquet", "path": src,
                   "schema": "doc_id BIGINT, payload BINARY",
                   "options": {"maxFilesPerTrigger": "1"}},
        "transform": [
            {"op": "decode_media", "quarantine": "drop",
             "resize_box": 224},
            {"op": "filter",
             "expr": "(mm_format IN ('wav', 'flac', 'ogg', 'mp3') AND "
                     "duration_ms >= 0) OR width >= 1"},
        ],
        "sink": {"format": "parquet", "path": str(tmp_path / "out"),
                 "marker_dir": str(tmp_path / "markers"),
                 "checkpoint_dir": str(tmp_path / "ckpt")},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(120)

    got = spark.read.parquet(spec["sink"]["path"])
    want = run_batch_equivalent(spark, spec)
    nullsafe = lambda t: tuple((v is None, v) for v in t)  # noqa: E731
    assert sorted(map(tuple, got.select(*sorted(got.columns)).collect()),
                  key=nullsafe) \
        == sorted(map(tuple, want.select(*sorted(want.columns)).collect()),
                  key=nullsafe)
    ids = sorted(r["doc_id"] for r in got.select("doc_id").collect())
    assert ids == list(range(17))        # corrupt doc 99 quarantined
    assert "payload" not in got.columns  # binary projected away
    fmts = {r["mm_format"] for r in got.select("mm_format").collect()}
    assert fmts == {"bmp", "ppm", "wav", "png", "gif", "jpeg", "webp",
                    "mp4", "flac", "tiff", "ogg", "mp3"}


def test_spec_stream_sample_stratified_equals_batch(spark, tmp_path):
    """r12: sample_stratified is a stream-safe transform step — its
    rates are explicit spec constants and the survivor predicate is a
    pure per-row md5-bucket compare, so the same rows survive under
    any micro-batch slicing. Two source files -> two micro-batches;
    the file sink's rows equal the batch equivalent of the same spec,
    and per-stratum survivor sets are exactly the operator's."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        sample_stratified)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_batch_equivalent, run_stream_pipeline)

    docs = read_table(spark, SF_SMALL, "documents") \
        .select("doc_id", "lang", "source")
    src = str(tmp_path / "src")
    docs.where("doc_id % 2 = 0").coalesce(1) \
        .write.mode("overwrite").parquet(src)
    docs.where("doc_id % 2 = 1").coalesce(1) \
        .write.mode("append").parquet(src)

    spec = {
        "source": {"format": "parquet", "path": src,
                   "schema": "doc_id BIGINT, lang STRING, source STRING",
                   "options": {"maxFilesPerTrigger": "1"}},
        "transform": [
            {"op": "sample_stratified", "id": "doc_id",
             "stratum": "lang",
             "rates": {"en": 0.3, "zh": 0.8},
             "default_rate": 0.5},
            {"op": "select", "exprs": ["doc_id", "lang"]},
        ],
        "sink": {"format": "parquet", "path": str(tmp_path / "out"),
                 "marker_dir": str(tmp_path / "markers"),
                 "checkpoint_dir": str(tmp_path / "ckpt")},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(120)

    got = spark.read.parquet(spec["sink"]["path"])
    want = run_batch_equivalent(spark, spec)
    assert sorted(map(tuple, got.collect())) \
        == sorted(map(tuple, want.collect()))
    # and both equal the operator applied to the whole corpus: the
    # stream slicing changed nothing
    op = sample_stratified(docs, "doc_id", "lang",
                           rates={"en": 0.3, "zh": 0.8},
                           default_rate=0.5)
    assert sorted(r["doc_id"] for r in got.collect()) \
        == sorted(r["doc_id"] for r in op.collect())
    assert 0 < got.count() < docs.count()
