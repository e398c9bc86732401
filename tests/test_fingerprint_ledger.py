"""Content-fingerprint ledger (streaming/fingerprint.py) across the
state-maintaining sinks: a fresh-checkpoint run reusing a committed
batch id must be REFUSED (not silently swallowed — its data would be
lost forever), a true replay must be skipped exactly (committed
marker or vacuumed), and the ledger's own file count must follow the
maintenance cadence via vacuum-time manifest merging. The near-dedup
gate's ledger behavior is pinned in test_neardedup_stream.py; this
file covers the upsert / rollup / partitioned twins plus the
fingerprint function itself."""

import glob

import pytest

from oracle_cassandra_migrator_spark.streaming import fingerprint

UPSERT_SCHEMA = "k LONG, seq LONG, val STRING"
CDC_SCHEMA = "op STRING, k STRING, new_v INT, old_v INT, seq INT"


# ---------------------------------------------------------------------------
# batch_fingerprint itself
# ---------------------------------------------------------------------------

def test_fingerprint_partitioning_and_order_invariant(spark):
    rows = [(i, i * 2, f"v{i}") for i in range(100)]
    a = spark.createDataFrame(rows, UPSERT_SCHEMA)
    b = spark.createDataFrame(list(reversed(rows)), UPSERT_SCHEMA) \
        .repartition(13)
    assert (fingerprint.batch_fingerprint(a)
            == fingerprint.batch_fingerprint(b))


def test_fingerprint_is_multiset_exact(spark):
    # XOR-style combiners cancel duplicated rows; the DECIMAL sum must
    # not: {A, A, B} != {B} and != {A, B}
    a = spark.createDataFrame([(1, 1, "x"), (1, 1, "x"), (2, 2, "y")],
                              UPSERT_SCHEMA)
    b = spark.createDataFrame([(2, 2, "y")], UPSERT_SCHEMA)
    c = spark.createDataFrame([(1, 1, "x"), (2, 2, "y")], UPSERT_SCHEMA)
    fps = {fingerprint.batch_fingerprint(d) for d in (a, b, c)}
    assert len(fps) == 3


def test_fingerprint_schema_order_independent_by_default(spark):
    a = spark.createDataFrame([(1, "x")], "k LONG, val STRING")
    b = spark.createDataFrame([("x", 1)], "val STRING, k LONG")
    assert (fingerprint.batch_fingerprint(a)
            == fingerprint.batch_fingerprint(b))


# ---------------------------------------------------------------------------
# upsert twin
# ---------------------------------------------------------------------------

def _upsert_run(spark, src, base, ckpt):
    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert)

    stream = (spark.readStream.schema(UPSERT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = foreach_batch_upsert(
        stream, base, keys=["k"], order_by=["seq"],
        checkpoint_dir=ckpt)
    q.awaitTermination(180)
    return q


def _write(spark, rows, src, mode):
    spark.createDataFrame(rows, UPSERT_SCHEMA).coalesce(1) \
        .write.mode(mode).parquet(src)


def test_upsert_fresh_checkpoint_collision_refused(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import latest_snapshot

    src = str(tmp_path / "src")
    _write(spark, [(1, 1, "a1"), (2, 2, "b1")], src, "overwrite")
    base = str(tmp_path / "snap")
    _upsert_run(spark, src, base, str(tmp_path / "ckpt"))
    want = sorted(map(tuple, latest_snapshot(spark, base).collect()))

    # a DIFFERENT source under a fresh checkpoint reuses batch id 0 —
    # pre-ledger this was silently swallowed (its rows lost forever)
    src2 = str(tmp_path / "src2")
    _write(spark, [(9, 9, "NEW")], src2, "overwrite")
    stream2 = (spark.readStream.schema(UPSERT_SCHEMA)
               .option("maxFilesPerTrigger", "1").parquet(src2))
    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert)

    q = foreach_batch_upsert(
        stream2, base, keys=["k"], order_by=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt2"))
    with pytest.raises(Exception, match="committed marker"):
        q.awaitTermination(180)
        raise AssertionError("collision not refused")
    assert sorted(map(tuple,
                      latest_snapshot(spark, base).collect())) == want


def test_upsert_true_replay_skipped_exactly(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import latest_snapshot

    src = str(tmp_path / "src")
    _write(spark, [(1, 1, "a1")], src, "overwrite")
    _write(spark, [(1, 2, "a2"), (3, 3, "c1")], src, "append")
    base = str(tmp_path / "snap")
    _upsert_run(spark, src, base, str(tmp_path / "ckpt"))
    versions = sorted(glob.glob(f"{base}/snapshot-v*"))
    want = sorted(map(tuple, latest_snapshot(spark, base).collect()))

    # fresh checkpoint, SAME source: every batch is a true replay
    q = _upsert_run(spark, src, base, str(tmp_path / "ckpt2"))
    assert q.exception() is None, q.exception()
    assert sorted(glob.glob(f"{base}/snapshot-v*")) == versions
    assert sorted(map(tuple,
                      latest_snapshot(spark, base).collect())) == want


def test_upsert_vacuumed_id_replay_and_collision(spark, tmp_path):
    """After vacuum_snapshots reclaims old markers, a stale batch id's
    write would be INVISIBLE (readers resolve the latest version).
    The ledger — compacted into a manifest by the same vacuum — must
    skip a true replay there and refuse new content."""
    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)
    from oracle_cassandra_migrator_spark.streaming.upsert import (
        vacuum_snapshots)

    src = str(tmp_path / "src")
    _write(spark, [(1, 1, "a1")], src, "overwrite")
    _write(spark, [(2, 2, "b1")], src, "append")
    _write(spark, [(3, 3, "c1")], src, "append")
    base = str(tmp_path / "snap")
    _upsert_run(spark, src, base, str(tmp_path / "ckpt"))
    doomed = vacuum_snapshots(spark, base, keep_last=1)
    assert doomed == [0, 1]
    # ledger compaction: singles below the kept id merged to manifest;
    # the kept id's single stays an O(1)-exists zero-byte file
    singles = sorted(glob.glob(f"{base}/fingerprints/fp-*.marker"))
    assert len(singles) == 1 and "/fp-2-" in singles[0]
    assert len(glob.glob(f"{base}/fingerprints/manifest-*.json")) == 1
    want = sorted(map(tuple, latest_snapshot(spark, base).collect()))

    # fresh checkpoint, same source: batches 0,1 hit the vacuumed-id
    # path and resolve through the manifest; batch 2 hits its marker
    q = _upsert_run(spark, src, base, str(tmp_path / "ckpt2"))
    assert q.exception() is None, q.exception()
    assert glob.glob(f"{base}/snapshot-v0") == []  # no invisible write
    assert sorted(map(tuple,
                      latest_snapshot(spark, base).collect())) == want

    # new content at a vacuumed stale id is refused
    src2 = str(tmp_path / "src2")
    _write(spark, [(7, 7, "NEW")], src2, "overwrite")
    stream = (spark.readStream.schema(UPSERT_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src2))
    q2 = foreach_batch_upsert(
        stream, base, keys=["k"], order_by=["seq"],
        checkpoint_dir=str(tmp_path / "ckpt3"))
    with pytest.raises(Exception, match="DIFFERENT content"):
        q2.awaitTermination(180)
        raise AssertionError("stale-id collision not refused")
    assert sorted(map(tuple,
                      latest_snapshot(spark, base).collect())) == want


# ---------------------------------------------------------------------------
# rollup twin (non-idempotent delta merge — the most dangerous one)
# ---------------------------------------------------------------------------

def test_rollup_fresh_checkpoint_collision_refused(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import rollup

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("I", "a", 10, None, 1)], CDC_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    base = str(tmp_path / "state")

    def run(s, ckpt):
        stream = (spark.readStream.schema(CDC_SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(s))
        q = rollup.foreach_batch_rollup(
            stream, base, ["k"], "new_v", "old_v",
            str(tmp_path / ckpt))
        q.awaitTermination(180)
        return q

    run(src, "ckpt")
    want = {r.k: (r.n, int(r.s))
            for r in rollup.latest_rollup(spark, base).collect()}
    assert want == {"a": (1, 10)}

    # true replay (fresh checkpoint, same source): skipped, unchanged
    q = run(src, "ckpt2")
    assert q.exception() is None, q.exception()
    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base).collect()}
    assert got == want

    # colliding new deltas under the committed id: refused — silently
    # swallowing them would permanently under-count group b
    src2 = str(tmp_path / "src2")
    spark.createDataFrame(
        [("I", "b", 5, None, 2)], CDC_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src2)
    stream = (spark.readStream.schema(CDC_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src2))
    q3 = rollup.foreach_batch_rollup(
        stream, base, ["k"], "new_v", "old_v", str(tmp_path / "ckpt4"))
    with pytest.raises(Exception, match="committed marker"):
        q3.awaitTermination(180)
        raise AssertionError("collision not refused")
    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base).collect()}
    assert got == want


# ---------------------------------------------------------------------------
# partitioned twin
# ---------------------------------------------------------------------------

PART_SCHEMA = "k LONG, val STRING, seq LONG"


def _part_run(spark, src, base, ckpt):
    from oracle_cassandra_migrator_spark.streaming import partitioned

    stream = (spark.readStream.schema(PART_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = partitioned.foreach_batch_upsert_partitioned(
        stream, base, ["k"], ["seq"], ckpt, n_buckets=4)
    q.awaitTermination(180)
    return q


def test_partitioned_collision_refused_and_replay_skipped(
        spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import partitioned

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "v1", 1), (2, "v2", 2)], PART_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    base = str(tmp_path / "state")
    _part_run(spark, src, base, str(tmp_path / "ckpt"))
    want = sorted(map(tuple, partitioned.latest_partitioned_snapshot(
        spark, base).collect()))

    # true replay: fresh checkpoint, same source — skipped exactly
    versions = sorted(glob.glob(f"{base}/v*"))
    q = _part_run(spark, src, base, str(tmp_path / "ckpt2"))
    assert q.exception() is None, q.exception()
    assert sorted(glob.glob(f"{base}/v*")) == versions

    # collision: fresh checkpoint, different source — refused
    src2 = str(tmp_path / "src2")
    spark.createDataFrame([(9, "NEW", 9)], PART_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src2)
    stream = (spark.readStream.schema(PART_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src2))
    q2 = partitioned.foreach_batch_upsert_partitioned(
        stream, base, ["k"], ["seq"], str(tmp_path / "ckpt3"),
        n_buckets=4)
    with pytest.raises(Exception, match="committed marker"):
        q2.awaitTermination(180)
        raise AssertionError("collision not refused")
    assert sorted(map(tuple, partitioned.latest_partitioned_snapshot(
        spark, base).collect())) == want


def test_partitioned_vacuumed_token_replay_resolves_via_manifest(
        spark, tmp_path):
    """compact + vacuum reclaims pre-compaction markers AND merges
    their fingerprint singles into a manifest; a fresh-checkpoint
    re-feed of the same batches must skip through it (no invisible
    below-compaction versions), and the ledger stays one manifest plus
    post-boundary singles."""
    from oracle_cassandra_migrator_spark.streaming import partitioned

    src = str(tmp_path / "src")
    spark.createDataFrame([(1, "v1", 1)], PART_SCHEMA) \
        .coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame([(2, "v2", 2)], PART_SCHEMA) \
        .coalesce(1).write.mode("append").parquet(src)
    base = str(tmp_path / "state")
    _part_run(spark, src, base, str(tmp_path / "ckpt"))
    partitioned.compact_partitioned(spark, base)
    doomed = partitioned.vacuum_partitioned(spark, base, keep_last=1)
    assert doomed
    assert len(glob.glob(f"{base}/fingerprints/manifest-*.json")) == 1
    assert glob.glob(f"{base}/fingerprints/fp-*.marker") == []
    want = sorted(map(tuple, partitioned.latest_partitioned_snapshot(
        spark, base).collect()))

    q = _part_run(spark, src, base, str(tmp_path / "ckpt2"))
    assert q.exception() is None, q.exception()
    # no version dirs re-appeared below the compaction
    assert sorted(glob.glob(f"{base}/v[0-9]")) == []
    assert sorted(map(tuple, partitioned.latest_partitioned_snapshot(
        spark, base).collect())) == want


def test_fingerprint_distinguishes_null_swapped_columns(spark):
    """Review r10 (confirmed empirically pre-fix): Spark's variadic
    xxhash64 SKIPS null arguments, so (new=10, old=NULL) and
    (new=NULL, old=10) hashed to the identical non-null stream — a
    semantically OPPOSITE CDC batch was misread as a true replay and
    silently dropped. Per-column pre-hashing anchors every position."""
    a = spark.createDataFrame([("U", "k", 10, None, 1)], CDC_SCHEMA)
    b = spark.createDataFrame([("U", "k", None, 10, 1)], CDC_SCHEMA)
    assert (fingerprint.batch_fingerprint(a)
            != fingerprint.batch_fingerprint(b))
    # and NULL is distinguished from absent-value lookalikes
    c = spark.createDataFrame([("U", "k", None, None, 1)], CDC_SCHEMA)
    fps = {fingerprint.batch_fingerprint(d) for d in (a, b, c)}
    assert len(fps) == 3


def test_fingerprint_handles_map_columns(spark):
    """Review r10: xxhash64 refuses MAP inputs, so a whole-row
    fingerprint crashed every batch of a stream carrying a map-typed
    payload. Maps route through to_json."""
    schema = "k LONG, payload MAP<STRING,INT>"
    a = spark.createDataFrame([(1, {"x": 1})], schema)
    b = spark.createDataFrame([(1, {"x": 2})], schema)
    fa, fb = (fingerprint.batch_fingerprint(d) for d in (a, b))
    assert fa != fb


def test_rollup_with_map_payload_column_still_commits(spark, tmp_path):
    """Review r10: the rollup fingerprints only its semantic
    projection (op, keys, measure images), so an unhashable payload
    column the sink ignores neither crashes the batch nor flips a
    replay into a collision."""
    from oracle_cassandra_migrator_spark.streaming import rollup

    schema = ("op STRING, k STRING, new_v INT, old_v INT, seq INT, "
              "payload MAP<STRING,INT>")
    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("I", "a", 10, None, 1, {"m": 1})], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    base = str(tmp_path / "state")

    def run(ckpt):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = rollup.foreach_batch_rollup(
            stream, base, ["k"], "new_v", "old_v",
            str(tmp_path / ckpt))
        q.awaitTermination(180)
        return q

    q = run("ckpt")
    assert q.exception() is None, q.exception()
    got = {r.k: (r.n, int(r.s))
           for r in rollup.latest_rollup(spark, base).collect()}
    assert got == {"a": (1, 10)}
    # fresh-checkpoint true replay still skips through the semantic fp
    q2 = run("ckpt2")
    assert q2.exception() is None, q2.exception()
    got2 = {r.k: (r.n, int(r.s))
            for r in rollup.latest_rollup(spark, base).collect()}
    assert got2 == got


def test_fingerprint_handles_nested_map_columns(spark):
    """xxhash64 refuses MAP at ANY nesting depth (struct<..map..>,
    array<map..>), so the to_json routing must be a substring check on
    the dtype, not a top-level type test."""
    schema = ("k LONG, s STRUCT<m: MAP<STRING,INT>>, "
              "a ARRAY<MAP<STRING,INT>>")
    x = spark.createDataFrame([(1, ((({"p": 1}),)), [{"q": 2}])], schema)
    y = spark.createDataFrame([(1, ((({"p": 1}),)), [{"q": 3}])], schema)
    fx, fy = (fingerprint.batch_fingerprint(d) for d in (x, y))
    assert fx != fy


def test_fingerprint_version_gates_collision_detection(spark, tmp_path):
    """Review r10: the fp string embeds FP_VERSION, and entries under
    a DIFFERENT version are legacy (incomparable), never collision —
    an unversioned algorithm change would make every committed entry
    mismatch its own true replay after an upgrade."""
    from oracle_cassandra_migrator_spark.reliability.state import (
        LocalFSStateStore)

    store = LocalFSStateStore()
    base = str(tmp_path / "state")
    df = spark.createDataFrame([(1, 1, "x")], UPSERT_SCHEMA)
    fp = fingerprint.batch_fingerprint(df)
    assert fp.startswith(fingerprint.FP_VERSION + "-")

    # old-format entry (no version prefix): legacy, not collision
    store.put_marker(fingerprint.fp_key(base, 7, "3-aaaa-bbbb"))
    assert fingerprint.decide_replay(
        spark, store, base, 7, fp, "boom") == "legacy"
    # current-version entry with different content: collision
    store.put_marker(fingerprint.fp_key(
        base, 8, fingerprint.FP_VERSION + "-3-aaaa-bbbb"))
    with pytest.raises(RuntimeError, match="boom"):
        fingerprint.decide_replay(spark, store, base, 8, fp, "boom")
    # exact match: skip
    store.put_marker(fingerprint.fp_key(base, 9, fp))
    assert fingerprint.decide_replay(
        spark, store, base, 9, fp, "boom") == "skip"
    # no entry at all: legacy
    assert fingerprint.decide_replay(
        spark, store, base, 10, fp, "boom") == "legacy"


def test_rollup_reserved_key_names_refused(spark, tmp_path):
    from oracle_cassandra_migrator_spark.streaming import rollup

    src = str(tmp_path / "src")
    spark.createDataFrame(
        [("I", "a", 1, None, 1)], CDC_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(CDC_SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    with pytest.raises(ValueError, match="__op"):
        rollup.foreach_batch_rollup(
            stream, str(tmp_path / "state"), ["__op"],
            "new_v", "old_v", str(tmp_path / "ckpt"))
