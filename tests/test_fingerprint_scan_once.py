"""The fingerprint ledger must not double-execute the micro-batch
(ADVICE r10): computing the content fingerprint is one aggregate job
over the batch plan, and pre-fix the sink's own consumption re-ran the
source scan + upstream transforms a second time per trigger. Each
state-maintaining sink now persists the batch ACROSS the fp aggregate
and its write, so the source side executes ONCE per commit.

The pin instruments the batch plan itself: a ``mapInPandas`` stage
appends its row count to a local file every time it executes, so the
file's total equals the number of rows that flowed OUT OF THE SOURCE —
scanning twice would double it. The counter sits upstream of the
sink's ``persist()``, exactly where a real source scan sits."""

import os

import pytest


def _counting_stage(df, counter_path):
    """Identity mapInPandas that appends each pandas chunk's row count
    to ``counter_path`` (O_APPEND — concurrent tasks interleave lines,
    never bytes, for these short writes)."""
    schema = df.schema

    def count_rows(batches):
        for pdf in batches:
            fd = os.open(counter_path,
                         os.O_APPEND | os.O_CREAT | os.O_WRONLY)
            try:
                os.write(fd, f"{len(pdf)}\n".encode())
            finally:
                os.close(fd)
            yield pdf

    return df.mapInPandas(count_rows, schema)


def _rows_scanned(counter_path) -> int:
    if not os.path.exists(counter_path):
        return 0
    with open(counter_path) as fh:
        return sum(int(line) for line in fh if line.strip())


def _stream(spark, src, schema):
    return (spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1").parquet(src))


N_ROWS = 60


@pytest.fixture()
def counter(tmp_path):
    return str(tmp_path / "scan_counter.txt")


def test_upsert_scans_source_once_per_commit(spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)

    schema = "k LONG, seq LONG, val STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i, f"v{i}") for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    q = foreach_batch_upsert(
        _counting_stage(_stream(spark, src, schema), counter),
        str(tmp_path / "snap"), keys=["k"], order_by=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert latest_snapshot(spark, str(tmp_path / "snap")).count() == N_ROWS
    assert _rows_scanned(counter) == N_ROWS


def test_rollup_scans_source_once_per_commit(spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming.rollup import (
        foreach_batch_rollup, latest_rollup)

    schema = "op STRING, k STRING, new_v INT, old_v INT"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("I", f"g{i % 4}", i, None) for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    q = foreach_batch_rollup(
        _counting_stage(_stream(spark, src, schema), counter),
        str(tmp_path / "roll"), keys=["k"], new_expr="new_v",
        old_expr="old_v", checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert latest_rollup(spark, str(tmp_path / "roll")).count() == 4
    assert _rows_scanned(counter) == N_ROWS


def test_partitioned_upsert_scans_source_once(spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming.partitioned import (
        foreach_batch_upsert_partitioned, latest_partitioned_snapshot)

    schema = "k LONG, seq LONG, val STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i, f"v{i}") for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "part")
    q = foreach_batch_upsert_partitioned(
        _counting_stage(_stream(spark, src, schema), counter),
        base, keys=["k"], order_by=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt"), n_buckets=4)
    q.awaitTermination(180)
    assert latest_partitioned_snapshot(spark, base).count() == N_ROWS
    assert _rows_scanned(counter) == N_ROWS


def test_neardedup_scans_source_once(spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming.neardedup import (
        foreach_batch_near_dedup, read_state)

    schema = "doc_id LONG, text STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"wholly distinct document number {i} "
             f"with its own trailing words {i * 7}")
         for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "nd")
    q = foreach_batch_near_dedup(
        _counting_stage(_stream(spark, src, schema), counter),
        base, str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    sigs, _ = read_state(spark, base)
    assert sigs.count() > 0
    assert _rows_scanned(counter) == N_ROWS


def test_replay_skip_path_scans_source_once(spark, tmp_path, counter):
    """VERDICT r11 item 8: the replay (skip) path must ALSO be
    scan-once — a fresh-checkpoint re-delivery of a committed batch
    computes the content fingerprint (one aggregate over the batch)
    and consumes nothing else, so total source rows after run+replay
    is exactly 2x the corpus, not 3x."""
    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)

    schema = "k LONG, seq LONG, val STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i, f"v{i}") for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "snap")

    def run(ckpt):
        q = foreach_batch_upsert(
            _counting_stage(_stream(spark, src, schema), counter),
            base, keys=["k"], order_by=["seq"],
            checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination(180)

    run("ckpt")
    assert _rows_scanned(counter) == N_ROWS
    run("ckpt2")  # fresh checkpoint: same batch id, same content
    assert latest_snapshot(spark, base).count() == N_ROWS
    assert _rows_scanned(counter) == 2 * N_ROWS


def test_ann_replay_skip_path_scans_source_once(spark, tmp_path, counter):
    """Same replay-path pin for the ann_maintain sink (its skip path
    sits behind an extra committed-ids listing)."""
    from oracle_cassandra_migrator_spark.streaming import annmaintain

    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    src = str(tmp_path / "src")
    rows = [(i, [float(i % 7) / 7.0 + 0.5] * 16) for i in range(N_ROWS)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    base = str(tmp_path / "ann")

    def run(ckpt):
        q = annmaintain.foreach_batch_ann_maintain(
            _counting_stage(_stream(spark, src, schema), counter),
            base, checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination(180)

    run("ckpt")
    assert _rows_scanned(counter) == N_ROWS
    run("ckpt2")
    assert annmaintain.read_index(spark, base).count() == N_ROWS
    assert _rows_scanned(counter) == 2 * N_ROWS


def test_ann_maintain_scans_source_once(spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming import annmaintain

    schema = "vec_id LONG, embedding ARRAY<FLOAT>"
    src = str(tmp_path / "src")
    rows = [(i, [float(i % 7) / 7.0 + 0.5] * 16) for i in range(N_ROWS)]
    spark.createDataFrame(rows, schema).coalesce(1).write.parquet(src)
    q = annmaintain.foreach_batch_ann_maintain(
        _counting_stage(_stream(spark, src, schema), counter),
        str(tmp_path / "ann"), checkpoint_dir=str(tmp_path / "ckpt"))
    q.awaitTermination(180)
    assert annmaintain.read_index(
        spark, str(tmp_path / "ann")).count() == N_ROWS
    assert _rows_scanned(counter) == N_ROWS


def test_rollup_replay_skip_path_scans_source_once(
        spark, tmp_path, counter):
    """Replay-path scan-once for the remaining three sinks (rollup
    here, partitioned/neardedup below) — same contract as upsert/ANN:
    a fresh-checkpoint re-delivery of a committed batch pays exactly
    the fingerprint aggregate, so run+replay totals 2x the corpus."""
    from oracle_cassandra_migrator_spark.streaming.rollup import (
        foreach_batch_rollup, latest_rollup)

    schema = "op STRING, k STRING, new_v INT, old_v INT"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("I", f"g{i % 4}", i, None) for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "roll")

    def run(ckpt):
        q = foreach_batch_rollup(
            _counting_stage(_stream(spark, src, schema), counter),
            base, keys=["k"], new_expr="new_v", old_expr="old_v",
            checkpoint_dir=str(tmp_path / ckpt))
        q.awaitTermination(180)

    run("ckpt")
    assert _rows_scanned(counter) == N_ROWS
    run("ckpt2")  # fresh checkpoint: same batch id, same content
    assert latest_rollup(spark, base).count() == 4
    assert _rows_scanned(counter) == 2 * N_ROWS


def test_partitioned_replay_skip_path_scans_source_once(
        spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming.partitioned import (
        foreach_batch_upsert_partitioned, latest_partitioned_snapshot)

    schema = "k LONG, seq LONG, val STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, i, f"v{i}") for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "part")

    def run(ckpt):
        q = foreach_batch_upsert_partitioned(
            _counting_stage(_stream(spark, src, schema), counter),
            base, keys=["k"], order_by=["seq"],
            checkpoint_dir=str(tmp_path / ckpt), n_buckets=4)
        q.awaitTermination(180)

    run("ckpt")
    assert _rows_scanned(counter) == N_ROWS
    run("ckpt2")
    assert latest_partitioned_snapshot(spark, base).count() == N_ROWS
    assert _rows_scanned(counter) == 2 * N_ROWS


def test_neardedup_replay_skip_path_scans_source_once(
        spark, tmp_path, counter):
    from oracle_cassandra_migrator_spark.streaming.neardedup import (
        foreach_batch_near_dedup, read_state)

    schema = "doc_id LONG, text STRING"
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [(i, f"wholly distinct document number {i} "
             f"with its own trailing words {i * 7}")
         for i in range(N_ROWS)], schema
    ).coalesce(1).write.parquet(src)
    base = str(tmp_path / "nd")

    def run(ckpt):
        q = foreach_batch_near_dedup(
            _counting_stage(_stream(spark, src, schema), counter),
            base, str(tmp_path / ckpt))
        q.awaitTermination(180)

    run("ckpt")
    assert _rows_scanned(counter) == N_ROWS
    run("ckpt2")
    sigs, _ = read_state(spark, base)
    assert sigs.count() > 0
    assert _rows_scanned(counter) == 2 * N_ROWS
