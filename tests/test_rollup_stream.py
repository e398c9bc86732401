"""Streaming materialized-aggregate maintenance
(streaming/rollup.py): a multi-batch CDC stream must leave the rollup
equal to a from-scratch aggregate of the final table state — across
group births, updates, and deaths — and a full checkpoint-preserving
restart must be a no-op (marker replay discipline)."""

import glob

from pyspark.sql import functions as F

CDC_SCHEMA = "op STRING, k STRING, new_v INT, old_v INT, seq INT"


def _write_batches(spark, src):
    # batch 1: births a(10+20), b(5)
    # batch 2: update a:20->25, delete b:5 (group death), insert c(7)
    b1 = spark.createDataFrame(
        [("I", "a", 10, None, 1), ("I", "a", 20, None, 2),
         ("I", "b", 5, None, 3)], CDC_SCHEMA)
    b2 = spark.createDataFrame(
        [("U", "a", 25, 20, 4), ("D", "b", None, 5, 5),
         ("I", "c", 7, None, 6)], CDC_SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    b2.coalesce(1).write.mode("append").parquet(src)
    return b1.schema


def _run(spark, src, schema, base_dir, ckpt):
    from oracle_cassandra_migrator_spark.streaming import rollup

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = rollup.foreach_batch_rollup(
        stream, base_dir, ["k"], "new_v", "old_v", ckpt)
    q.awaitTermination(180)


def test_stream_rollup_end_to_end(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import rollup

    src = str(tmp_path / "src")
    schema = _write_batches(spark, src)
    base_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _run(spark, src, schema, base_dir, ckpt)
    snap = rollup.latest_rollup(spark, base_dir)
    got = {r.k: (r.n, int(r.s)) for r in snap.collect()}
    # final table state: a = {10, 25}, c = {7}; b died
    assert got == {"a": (2, 35), "c": (1, 7)}

    # two committed versions exist; time travel to v0 sees pre-CDC
    from oracle_cassandra_migrator_spark.streaming.upsert import (
        snapshot_at)
    v0 = {r.k: (r.n, int(r.s))
          for r in snapshot_at(spark, base_dir, 0).collect()}
    assert v0 == {"a": (2, 30), "b": (1, 5)}


def test_stream_rollup_restart_is_noop(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import rollup

    src = str(tmp_path / "src")
    schema = _write_batches(spark, src)
    base_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")

    _run(spark, src, schema, base_dir, ckpt)
    before = sorted(glob.glob(f"{base_dir}/markers/*.marker"))
    # restart with the SAME checkpoint: no new input -> no new version;
    # replayed bookkeeping must not corrupt the committed rollup
    _run(spark, src, schema, base_dir, ckpt)
    after = sorted(glob.glob(f"{base_dir}/markers/*.marker"))
    assert before == after
    snap = rollup.latest_rollup(spark, base_dir)
    got = {r.k: (r.n, int(r.s)) for r in snap.collect()}
    assert got == {"a": (2, 35), "c": (1, 7)}


def test_stream_rollup_matches_batch_recompute_on_events(spark, tmp_path):
    """stream==batch parity on real data: insert-only CDC built from
    events (3 file-batches), maintained rollup == groupBy recompute."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming import rollup

    ev = read_table(spark, "/root/testdata/sf0.001", "events").selectExpr(
        "'I' AS op", "event_type AS k",
        "CAST(floor(value * 100 + 0.5) AS INT) AS new_v",
        "CAST(NULL AS INT) AS old_v",
        "CAST(event_id AS INT) AS seq")
    src = str(tmp_path / "src")
    for i in range(3):
        (ev.filter(F.expr(f"seq % 3 = {i}")).coalesce(1)
         .write.mode("append").parquet(src))
    base_dir = str(tmp_path / "state")
    _run(spark, src, ev.schema, base_dir, str(tmp_path / "ckpt"))

    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base_dir).collect()}
    want = {r.k: (r.n, int(r.s)) for r in ev.groupBy("k").agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("SUM(CAST(new_v AS DECIMAL(38,0)))").alias("s")).collect()}
    assert got == want


def test_rollup_vacuum_shares_upsert_retention(spark, tmp_path):
    """vacuum_snapshots operates on the rollup's version layout
    unchanged (shared protocol): old versions drop, the latest
    survives, time travel to vacuumed ids refuses."""
    import pytest

    from oracle_cassandra_migrator_spark.streaming import rollup
    from oracle_cassandra_migrator_spark.streaming.upsert import (
        snapshot_at, vacuum_snapshots)

    src = str(tmp_path / "src")
    schema = _write_batches(spark, src)
    base_dir = str(tmp_path / "state")
    _run(spark, src, schema, base_dir, str(tmp_path / "ckpt"))

    vacuumed = vacuum_snapshots(spark, base_dir, keep_last=1)
    assert vacuumed == [0]
    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base_dir).collect()}
    assert got == {"a": (2, 35), "c": (1, 7)}
    with pytest.raises(ValueError, match="not a committed"):
        snapshot_at(spark, base_dir, 0)


def test_rollup_uncommitted_version_is_invisible_and_overwritten(
        spark, tmp_path):
    """Crash between snapshot write and marker commit: the orphan
    version dir must be invisible to readers (markers gate reads) and
    the replayed batch must overwrite it with the correct rollup."""
    from oracle_cassandra_migrator_spark.streaming import rollup

    src = str(tmp_path / "src")
    # only batch 1 on disk for the first run
    b1 = spark.createDataFrame(
        [("I", "a", 10, None, 1), ("I", "a", 20, None, 2),
         ("I", "b", 5, None, 3)], CDC_SCHEMA)
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    base_dir = str(tmp_path / "state")
    ckpt = str(tmp_path / "ckpt")
    _run(spark, src, b1.schema, base_dir, ckpt)

    # simulate the crash: batch 1's snapshot-v1 written, marker LOST
    garbage = spark.createDataFrame(
        [("zzz", 999, 999)], "k STRING, n LONG, s LONG").selectExpr(
        "k", "n", "CAST(s AS DECIMAL(38,0)) AS s")
    garbage.write.mode("overwrite").parquet(f"{base_dir}/snapshot-v1")

    # readers never see the orphan
    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base_dir).collect()}
    assert got == {"a": (2, 30), "b": (1, 5)}

    # batch 2 arrives; its id is 1 -> the replay overwrites the orphan
    b2 = spark.createDataFrame(
        [("U", "a", 25, 20, 4), ("D", "b", None, 5, 5),
         ("I", "c", 7, None, 6)], CDC_SCHEMA)
    b2.coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, b1.schema, base_dir, ckpt)

    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base_dir).collect()}
    assert got == {"a": (2, 35), "c": (1, 7)}
    assert "zzz" not in got
