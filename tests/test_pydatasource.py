"""Python Data Source API coverage (Spark 4.0+ batch, 4.1 pushFilters,
SimpleDataSourceStreamReader): partition planning, filter pushdown
before the Python->JVM boundary, and deterministic offset replay."""

import json
import time

import pytest

from pyspark.sql.datasource import EqualTo, GreaterThanOrEqual, StringContains

from oracle_cassandra_migrator_spark.sources.pydatasource import (
    JsonlDirReader,
    SynthEventsStreamReader,
    register_python_sources,
    synth_row,
)


@pytest.fixture()
def jsonl_dir(tmp_path):
    rows = [
        {"event_id": i, "event_type": ("click" if i % 3 else "view"),
         "value": float(i)}
        for i in range(40)]
    for part in range(4):
        with open(tmp_path / f"part-{part}.jsonl", "w") as fh:
            for r in rows[part * 10:(part + 1) * 10]:
                fh.write(json.dumps(r) + "\n")
    return str(tmp_path)


def test_jsonl_dir_reads_partition_per_file(spark, jsonl_dir):
    register_python_sources(spark)
    df = spark.read.format("jsonl_dir").option("path", jsonl_dir).load()
    assert df.count() == 40
    # one planned InputPartition per file
    assert df.rdd.getNumPartitions() == 4
    got = {r["event_id"]: (r["event_type"], r["value"])
           for r in df.collect()}
    assert got[0] == ("view", 0.0) and got[7] == ("click", 7.0)


def test_jsonl_dir_filter_results_match(spark, jsonl_dir):
    """End-to-end: results under pushdown equal the unfiltered read
    filtered in Spark — pushdown must neither drop nor duplicate."""
    register_python_sources(spark)
    df = spark.read.format("jsonl_dir").option("path", jsonl_dir).load()
    filtered = df.filter("value >= 20 AND event_type = 'click'")
    ids = sorted(r["event_id"] for r in filtered.collect())
    assert ids == [i for i in range(20, 40) if i % 3]


def test_jsonl_dir_push_filters_unit():
    """Reader-level contract: supported filters are absorbed (and
    applied in read()), unsupported kinds are handed back to Spark."""
    from pyspark.sql.types import StructType

    schema = StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE")
    reader = JsonlDirReader(schema, {"path": "/nonexistent"})
    supported = [GreaterThanOrEqual(("value",), 5.0),
                 EqualTo(("event_type",), "click")]
    unsupported = [StringContains(("event_type",), "cl")]
    leftover = list(reader.pushFilters(supported + unsupported))
    assert leftover == unsupported
    assert len(reader.predicates) == 2
    assert all(p({"event_type": "click", "value": 9.0})
               for p in reader.predicates)
    assert not all(p({"event_type": "view", "value": 9.0})
                   for p in reader.predicates)


def test_synth_stream_reader_replay_is_deterministic():
    """readBetweenOffsets must regenerate exactly the rows read()
    handed out for the same offset range — the exactly-once recovery
    contract."""
    r = SynthEventsStreamReader({"rows_per_batch": 7})
    assert r.initialOffset() == {"i": 0}
    it1, off1 = r.read({"i": 0})
    rows1 = list(it1)
    assert off1 == {"i": 7} and len(rows1) == 7
    it2, off2 = r.read(off1)
    rows2 = list(it2)
    assert off2 == {"i": 14}
    replay = list(r.readBetweenOffsets({"i": 0}, {"i": 14}))
    assert replay == rows1 + rows2
    assert replay == [synth_row(i) for i in range(14)]


def test_synth_batch_range_partitions(spark):
    register_python_sources(spark)
    df = (spark.read.format("synth_events")
          .option("n_rows", 100).option("n_partitions", 5).load())
    assert df.rdd.getNumPartitions() == 5
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    assert len(rows) == 100
    assert [tuple(r) for r in rows[:3]] == [synth_row(0), synth_row(1),
                                            synth_row(2)]


def test_synth_stream_end_to_end_exactly_once_prefix(spark, tmp_path):
    """Run the streaming source for a few micro-batches into a memory
    sink: whatever arrived must be a gap-free, duplicate-free prefix
    of the deterministic sequence."""
    register_python_sources(spark)
    q = (spark.readStream.format("synth_events")
         .option("rows_per_batch", 25).load()
         .writeStream.format("memory").queryName("synth_sink")
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(processingTime="200 milliseconds")
         .start())
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql("SELECT count(*) c FROM synth_sink").first()["c"]
            if n >= 50:
                break
            time.sleep(0.5)
    finally:
        q.stop()
    rows = sorted(
        spark.sql("SELECT * FROM synth_sink").collect(),
        key=lambda r: r["event_id"])
    assert len(rows) >= 50
    ids = [r["event_id"] for r in rows]
    assert ids == list(range(len(ids)))  # gap-free, duplicate-free prefix
    assert all(tuple(r) == synth_row(r["event_id"]) for r in rows)


def test_read_source_spec_drives_python_formats(spark, jsonl_dir):
    """Pipeline specs can name the Python formats like any built-in:
    read_source auto-registers them, path/filter/select/alias apply."""
    from oracle_cassandra_migrator_spark.sources import read_source

    df = read_source(spark, {
        "format": "jsonl_dir",
        "path": jsonl_dir,
        "filter": "event_type = 'click'",
        "select": ["event_id", "value * 2 AS double_value"],
        "alias": "clicks",
    })
    rows = sorted(df.collect(), key=lambda r: r["event_id"])
    assert [r["event_id"] for r in rows] == [i for i in range(40) if i % 3]
    assert rows[0]["double_value"] == 2.0
    synth = read_source(spark, {
        "format": "synth_events",
        "options": {"n_rows": "30", "n_partitions": "3"},
    })
    assert synth.count() == 30 and synth.rdd.getNumPartitions() == 3


def test_jsonl_dir_batch_writer_roundtrip(spark, tmp_path):
    """Custom Python writer: temp-write + driver-commit rename; a
    read-back through the same source equals what was written, and no
    .tmp residue survives a successful commit."""
    import os

    register_python_sources(spark)
    out = str(tmp_path / "out")
    df = (spark.read.format("synth_events")
          .option("n_rows", 60).option("n_partitions", 3).load())
    df.write.format("jsonl_dir").option("path", out).mode("append").save()
    files = sorted(os.listdir(out))
    assert files == [f"part-{i:05d}.jsonl" for i in range(3)]
    back = spark.read.format("jsonl_dir").option("path", out).load()
    assert sorted(tuple(r) for r in back.collect()) == [
        synth_row(i) for i in range(60)]


def test_jsonl_dir_stream_writer_batch_prefixed_idempotent(
        spark, tmp_path):
    """Streaming writer: per-micro-batch commit under a batch-<id>
    prefix (a replayed batch overwrites itself — idempotent delivery);
    rows written across batches reassemble to the exact input."""
    import os

    register_python_sources(spark)
    src = str(tmp_path / "src")
    out = str(tmp_path / "out")
    events = [(i, "click" if i % 2 else "view", float(i)) for i in range(40)]
    sdf = spark.createDataFrame(
        events, "event_id BIGINT, event_type STRING, value DOUBLE")
    sdf.repartition(2).write.parquet(src)
    stream = (spark.readStream.schema(sdf.schema)
              .option("maxFilesPerTrigger", 1).parquet(src))
    q = (stream.writeStream.format("jsonl_dir")
         .option("path", out)
         .option("checkpointLocation", str(tmp_path / "ckpt"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    names = sorted(os.listdir(out))
    assert all(n.startswith("batch-") and n.endswith(".jsonl")
               for n in names)
    assert len({n.split("-")[1] for n in names}) >= 2  # >=2 batch ids
    back = spark.read.format("jsonl_dir").option("path", out).load()
    assert sorted(tuple(r) for r in back.collect()) == sorted(events)


def test_jsonl_dir_writer_overwrite_truncates_on_commit(spark, tmp_path):
    """mode('overwrite') removes stale files only at commit time: the
    second (smaller) write leaves exactly its own files behind."""
    import os

    register_python_sources(spark)
    out = str(tmp_path / "out")
    big = (spark.read.format("synth_events")
           .option("n_rows", 40).option("n_partitions", 4).load())
    big.write.format("jsonl_dir").option("path", out).mode("append").save()
    assert len(os.listdir(out)) == 4
    small = (spark.read.format("synth_events")
             .option("n_rows", 10).option("n_partitions", 1).load())
    small.write.format("jsonl_dir").option("path", out).mode(
        "overwrite").save()
    assert sorted(os.listdir(out)) == ["part-00000.jsonl"]
    back = spark.read.format("jsonl_dir").option("path", out).load()
    assert back.count() == 10


def test_write_sink_spec_drives_jsonl_dir(spark, tmp_path):
    """Sink specs can target the Python writer like any built-in
    format (write_sink auto-registers)."""
    import os

    from oracle_cassandra_migrator_spark.sinks.writers import write_sink

    df = spark.createDataFrame(
        [(1, "view", 1.0), (2, "click", 2.0)],
        "event_id BIGINT, event_type STRING, value DOUBLE")
    out = str(tmp_path / "sink_out")
    write_sink(df.coalesce(1), {
        "format": "jsonl_dir", "path": out, "mode": "append"})
    assert os.listdir(out) == ["part-00000.jsonl"]
    back = spark.read.format("jsonl_dir").option("path", out).load()
    assert back.count() == 2


def test_jsonl_dir_stream_settle_blocks_on_unsettled_gap(spark, tmp_path):
    """ADVICE r8: with settle_seconds, an in-place appender touching
    file N after N+1 lands must NOT be skipped — the watermark may
    only advance through a CONTIGUOUS settled prefix, so the fresh
    mtime on N blocks N+1 (and above) until N settles."""
    import os as _os

    from pyspark.sql.types import StructType

    from oracle_cassandra_migrator_spark.sources.pydatasource import (
        JsonlDirStreamReader)

    schema = StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE")
    for name, eid in (("a.jsonl", 1), ("b.jsonl", 2), ("c.jsonl", 3)):
        (tmp_path / name).write_text(json.dumps(
            {"event_id": eid, "event_type": "view", "value": 0.0}) + "\n")
    old = time.time() - 3600
    _os.utime(tmp_path / "a.jsonl", (old, old))
    _os.utime(tmp_path / "c.jsonl", (old, old))
    # b is mid-append (fresh mtime): batch 1 must stop at a, NOT jump
    # the watermark to c.
    reader = JsonlDirStreamReader(
        schema, {"path": str(tmp_path), "settle_seconds": "60"})
    rows, end = reader.read(reader.initialOffset())
    assert [r[0] for r in rows] == [1]
    assert end == {"last": "a.jsonl"}
    # b settles -> the next batch picks up b THEN c, nothing skipped.
    _os.utime(tmp_path / "b.jsonl", (old, old))
    rows, end = reader.read(end)
    assert [r[0] for r in rows] == [2, 3]
    assert end == {"last": "c.jsonl"}


def test_jsonl_dir_stream_retouched_consumed_file_never_stalls(
        spark, tmp_path):
    """Self-review r9: a producer appending IN PLACE to an
    already-consumed file (fresh mtime at/below the watermark) must
    not block the settled-prefix truncation — only unsettled files
    ABOVE the watermark defer the batch."""
    import os as _os

    from pyspark.sql.types import StructType

    from oracle_cassandra_migrator_spark.sources.pydatasource import (
        JsonlDirStreamReader)

    schema = StructType.fromDDL(
        "event_id BIGINT, event_type STRING, value DOUBLE")
    old = time.time() - 3600
    (tmp_path / "a.jsonl").write_text(json.dumps(
        {"event_id": 1, "event_type": "view", "value": 0.0}) + "\n")
    _os.utime(tmp_path / "a.jsonl", (old, old))
    reader = JsonlDirStreamReader(
        schema, {"path": str(tmp_path), "settle_seconds": "60"})
    rows, end = reader.read(reader.initialOffset())
    assert [r[0] for r in rows] == [1] and end == {"last": "a.jsonl"}
    # a is re-touched (fresh mtime, below the watermark) while a NEW
    # settled file lands: the batch must deliver c, not stall forever
    (tmp_path / "a.jsonl").write_text(json.dumps(
        {"event_id": 9, "event_type": "view", "value": 0.0}) + "\n")
    (tmp_path / "c.jsonl").write_text(json.dumps(
        {"event_id": 3, "event_type": "view", "value": 0.0}) + "\n")
    _os.utime(tmp_path / "c.jsonl", (old, old))
    rows, end = reader.read(end)
    assert [r[0] for r in rows] == [3]
    assert end == {"last": "c.jsonl"}
