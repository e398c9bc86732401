"""Streaming ANN index maintenance (streaming/annmaintain.py —
VERDICT r10 item 3): stream==batch parity with the incremental
operator (`extend_or_retrain_ivf`/`_pq` over the same appends, carried
sums folded the same way), the append arm writing O(|batch|) bytes,
the drift-gated rebuild, replay/collision exactness under the
fingerprint ledger, vacuum, and the spec-level `type: ann_maintain`
wiring."""

import glob
import os

import pytest

from oracle_cassandra_migrator_spark.operators import similarity
from oracle_cassandra_migrator_spark.streaming import annmaintain

SCHEMA = "vec_id LONG, embedding ARRAY<FLOAT>"
DIM = 64


def _vecs(ids, direction=1.0, spread=0.02):
    """Synthetic dim-64 vectors clustered around `direction` * e0 with
    a small deterministic per-id wiggle: same-direction batches stay
    inside the 0.98-cosine drift gate, a negated batch falls far
    outside it."""
    rows = []
    for i in ids:
        v = [0.0] * DIM
        v[0] = direction
        v[1 + i % 8] = spread * (1 + i % 5)
        rows.append((i, v))
    return rows


def _write(spark, rows, src):
    spark.createDataFrame(rows, SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)


def _run(spark, src, base, ckpt, **kw):
    stream = (spark.readStream.schema(SCHEMA)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = annmaintain.foreach_batch_ann_maintain(
        stream, base, checkpoint_dir=ckpt, **kw)
    q.awaitTermination(180)
    return q


def _index_rows(spark, base):
    df = annmaintain.read_index(spark, base)
    return sorted(map(tuple, df.collect()))


def test_ann_maintain_stream_equals_batch_operator(spark, tmp_path):
    """The maintained index after three micro-batches (bootstrap +
    in-gate append + drifted rebuild) is row-identical to iterating
    the batch operator over the same appends with the same carried
    sums, and the sidecar's kind/drift routing matches the operator's
    retrained flags."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")

    batches = [
        _vecs(range(0, 40)),                      # bootstrap
        _vecs(range(40, 60)),                     # same direction: append
        _vecs(range(60, 90), direction=-1.0),     # negated: rebuild
    ]
    for i, rows in enumerate(batches):
        _write(spark, rows, src)
        _run(spark, src, base, ckpt)
        side = annmaintain.read_sidecar(spark, base, i)
        assert side["kind"] == ("rebuild", "append", "rebuild")[i]
        if i == 2:
            assert side["drift_micro"] < similarity.\
                CENTROID_DRIFT_GATE_MICRO

    got = _index_rows(spark, base)

    # batch replay: bootstrap, then extend_or_retrain_ivf per batch,
    # folding the carried sums exactly like the sink does
    b = [spark.createDataFrame(r, SCHEMA) for r in batches]
    rows0 = similarity.kmeans_codebook(
        b[0], modulus=43, iters=2, init_limit=64).collect()
    cells = similarity.assign_cells_literal(
        b[0], similarity.codebook_literal_expr(rows0))
    sums = similarity.embedding_dim_sums_micro(b[0])
    codebook = rows0
    retrained_flags = []
    for batch in b[1:]:
        cells, codebook, retrained, drift = \
            similarity.extend_or_retrain_ivf(
                cells, batch, codebook, base_sums=sums)
        retrained_flags.append(retrained)
        sums = annmaintain.fold_dim_sums(
            sums, similarity.embedding_dim_sums_micro(batch))
    assert retrained_flags == [False, True]
    want = sorted(map(tuple, cells.collect()))
    assert got == want and len(got) == 90

    # carried sums in the final sidecar equal the batch-side fold
    final = annmaintain.read_sidecar(spark, base, 2)
    assert final["base_sums"] == sums

    # append version holds ONLY its batch's rows (O(|batch|) bytes)
    v1 = spark.read.parquet(str(tmp_path / "ann" / "index-v1"))
    assert sorted(r["vec_id"] for r in v1.collect()) == list(range(40, 60))


def test_ann_maintain_replay_collision_and_duplicates(spark, tmp_path):
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    _write(spark, _vecs(range(0, 30)), src)
    _run(spark, src, base, str(tmp_path / "ckpt"))
    want = _index_rows(spark, base)

    # true replay under a FRESH checkpoint (same source, same content
    # at batch id 0): skipped exactly via the fingerprint ledger
    _run(spark, src, base, str(tmp_path / "ckpt2"))
    assert _index_rows(spark, base) == want

    # fresh checkpoint with DIFFERENT content at the committed id:
    # refused loudly, state unchanged
    src2 = str(tmp_path / "src2")
    _write(spark, _vecs(range(100, 120), spread=0.05), src2)
    stream2 = (spark.readStream.schema(SCHEMA)
               .option("maxFilesPerTrigger", "1").parquet(src2))
    q2 = annmaintain.foreach_batch_ann_maintain(
        stream2, base, checkpoint_dir=str(tmp_path / "ckpt3"))
    with pytest.raises(Exception, match="fingerprint|fresh-checkpoint"):
        q2.awaitTermination(180)
        raise RuntimeError("collision was not refused")
    assert _index_rows(spark, base) == want

    # an all-duplicate batch commits an EMPTY append (marker + fp kept
    # per-batch contiguous), index unchanged
    _write(spark, _vecs(range(0, 30)), src)
    _run(spark, src, base, str(tmp_path / "ckpt"))
    assert _index_rows(spark, base) == want
    side = annmaintain.read_sidecar(spark, base, 1)
    assert side["kind"] == "append"
    assert spark.read.parquet(
        str(tmp_path / "ann" / "index-v1")).count() == 0


def test_ann_maintain_vacuum_and_ledger_compaction(spark, tmp_path):
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, _vecs(range(0, 30)), src)
    _run(spark, src, base, ckpt)
    _write(spark, _vecs(range(30, 45)), src)
    _run(spark, src, base, ckpt)
    _write(spark, _vecs(range(45, 80), direction=-1.0), src)
    _run(spark, src, base, ckpt)  # rebuild at v2
    want = _index_rows(spark, base)

    doomed = annmaintain.vacuum_ann_index(spark, base)
    assert doomed == [0, 1]
    assert _index_rows(spark, base) == want
    assert not os.path.exists(str(tmp_path / "ann" / "index-v0"))
    # fingerprint singles below the rebuild merged into one manifest
    fdir = str(tmp_path / "ann" / "fingerprints")
    assert len(glob.glob(os.path.join(fdir, "manifest-*.json"))) == 1

    # a post-vacuum replay of a vacuumed batch id (fresh checkpoint,
    # same source prefix) is still skipped exactly via the manifest
    src_prefix = str(tmp_path / "srcp")
    _write(spark, _vecs(range(0, 30)), src_prefix)
    _run(spark, src_prefix, base, str(tmp_path / "ckptp"))
    assert _index_rows(spark, base) == want


def test_ann_maintain_pq_parity(spark, tmp_path):
    """The PQ arm: maintained code table ≡ batch extend_or_retrain_pq
    over the same appends."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    batches = [_vecs(range(0, 40)), _vecs(range(40, 60))]
    for rows in batches:
        _write(spark, rows, src)
        _run(spark, src, base, ckpt, algo="pq")

    got = _index_rows(spark, base)

    b = [spark.createDataFrame(r, SCHEMA) for r in batches]
    books = similarity.pq_train_codebooks(b[0])
    codes = similarity.pq_encode(b[0], books, 16)
    sums = similarity.embedding_dim_sums_micro(b[0])
    codes, books, retrained, _ = similarity.extend_or_retrain_pq(
        codes, b[1], books, base_sums=sums)
    assert retrained is False  # same direction: the append arm
    want = sorted(map(tuple, codes.collect()))
    assert got == want and len(got) == 60
    assert annmaintain.read_sidecar(spark, base, 1)["kind"] == "append"


def test_ann_maintain_spec_wiring(spark, tmp_path):
    """`type: ann_maintain` end-to-end through run_stream_pipeline."""
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    _write(spark, _vecs(range(0, 25)), src)
    spec = {
        "source": {"format": "parquet", "path": src,
                   "schema": SCHEMA,
                   "options": {"maxFilesPerTrigger": "1"}},
        "sink": {"type": "ann_maintain", "base_dir": base,
                 "checkpoint_dir": str(tmp_path / "ckpt"),
                 "init_limit": 16},
    }
    q = run_stream_pipeline(spark, spec)
    q.awaitTermination(180)
    idx = annmaintain.read_index(spark, base)
    assert idx.count() == 25
    assert set(idx.columns) == {"vec_id", "embedding", "cell_id"}
    # the serving half probes the maintained frame directly
    top = similarity.topk_within_cells(idx, k=5, query_id=0)
    assert top.count() == 5


def test_ann_maintain_pq_rebuild_keeps_index_geometry(spark, tmp_path):
    """Geometry is a property of the INDEX, not the spec (the
    extend_or_retrain_pq lesson): a restarted stream whose config says
    a different n_sub/sub_dim must rebuild with the STORED codebooks'
    geometry, or the new code table silently mismatches the serving
    schema."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    _write(spark, _vecs(range(0, 40)), src)
    _run(spark, src, base, str(tmp_path / "ckpt"), algo="pq")
    assert len(annmaintain.read_sidecar(spark, base, 0)["codebook"]) == 4

    # restart with a conflicting geometry config and a drifted batch
    # that forces the rebuild arm
    _write(spark, _vecs(range(40, 80), direction=-1.0), src)
    _run(spark, src, base, str(tmp_path / "ckpt"), algo="pq",
         n_sub=8, sub_dim=8)
    side = annmaintain.read_sidecar(spark, base, 1)
    assert side["kind"] == "rebuild"
    assert len(side["codebook"]) == 4  # index geometry, not the spec's
    assert len(side["codebook"][0][0]["cvec"]) == 16
    idx = annmaintain.read_index(spark, base)
    assert {c for c in idx.columns if c.startswith("code")} == {
        "code0", "code1", "code2", "code3"}


def test_train_probe_tests_the_capped_set(spark):
    """ADVICE r11: kmeans_codebook caps training to the
    KMEANS_TRAIN_CAP rows with the smallest salted id hash BEFORE the
    `% modulus` init filter, so _train_or_fallback's emptiness probe
    must run over the SAME capped set — probing the full frame passes
    on an input whose only modulus-multiple id is outside the cap, and
    training then crashes on the NULL-cid centroid of the empty init.
    This builds exactly that input: >cap rows, one qualifying id,
    chosen (by replaying the salted-hash ranking in Python) to rank
    OUTSIDE the bottom-cap set."""
    import hashlib

    cap = similarity.KMEANS_TRAIN_CAP
    n = cap + 617  # ~3.6% of rows fall outside the cap
    modulus = 50021  # prime > every base id: 1..n qualify never

    def h(i):
        return hashlib.md5(
            f"{similarity.KMEANS_TRAIN_SALT}:{i}".encode()).hexdigest()

    fixed = sorted(h(i) for i in range(1, n + 1))
    threshold = fixed[cap - 1]  # cap-th smallest of the fixed ids
    cand = next(k * modulus for k in range(1, 400)
                if h(k * modulus) > threshold)

    rows = _vecs(list(range(1, n + 1)) + [cand], spread=0.02)
    df = spark.createDataFrame(rows, SCHEMA)
    alg = annmaintain._IvfAlgo(
        {"modulus": modulus, "vec_col": "embedding", "id_col": "vec_id"})
    codebook = annmaintain._train_or_fallback(alg, df)
    assert codebook and all(c["cid"] is not None for c in codebook)


def test_legacy_write_between_rebuild_and_latest_is_skipped(
        spark, tmp_path):
    """ADVICE r11: a legacy (no-ledger-entry) batch id BETWEEN the
    rebuild and the latest committed id must be skipped, not written —
    such a version WOULD be stitched by read_index while its rows were
    never folded into later sidecars' carried sums. Reproduced by
    vacating one mid-stream marker+fingerprint (the pre-ledger /
    crash-window shape) and replaying the source under a fresh
    checkpoint."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    for lo, hi in ((0, 40), (40, 55), (55, 70), (70, 85)):
        _write(spark, _vecs(range(lo, hi)), src)
        _run(spark, src, base, ckpt)
    # committed [0,1,2,3], all same direction: rebuild_id stays 0
    assert annmaintain.read_sidecar(spark, base, 3)["rebuild_id"] == 0

    # vacate batch 2's marker AND ledger entry -> legacy shape with
    # rebuild_id(0) < batch_id(2) < committed[-1](3)
    os.remove(str(tmp_path / "ann" / "markers" / "batch-2.marker"))
    for f in glob.glob(str(tmp_path / "ann" / "fingerprints" /
                           "fp-2-*.marker")):
        os.remove(f)
    want = _index_rows(spark, base)  # stitch of committed [0,1,3]

    _run(spark, src, base, str(tmp_path / "ckpt2"))  # fresh checkpoint
    assert not os.path.exists(
        str(tmp_path / "ann" / "markers" / "batch-2.marker"))
    assert _index_rows(spark, base) == want


def test_vacuum_deletes_sidecars_without_the_store(spark, tmp_path):
    """ADVICE r11: sidecars are written via the Hadoop FS API (never
    through a StateStore), so vacuum must delete them the same way —
    under a non-filesystem store, store.delete would silently leak
    every sidecar file. Pinned with a dict-backed store that holds
    ONLY markers/fingerprints."""
    from oracle_cassandra_migrator_spark.reliability.state import (
        StateStore)

    class DictStore(StateStore):
        def __init__(self):
            self.keys = set()

        def exists(self, key):
            return key in self.keys

        def put_marker(self, key):
            self.keys.add(key)

        def list(self, prefix, suffix=""):
            p = prefix.rstrip("/") + "/"
            return sorted(k for k in self.keys
                          if k.startswith(p) and k.endswith(suffix))

        def delete(self, key):
            self.keys.discard(key)

    store = DictStore()
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    for rows in (_vecs(range(0, 30)), _vecs(range(30, 45)),
                 _vecs(range(45, 80), direction=-1.0)):
        _write(spark, rows, src)
        stream = (spark.readStream.schema(SCHEMA)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = annmaintain.foreach_batch_ann_maintain(
            stream, base, checkpoint_dir=ckpt, state=store)
        q.awaitTermination(180)
    assert annmaintain.read_sidecar(spark, base, 2)["rebuild_id"] == 2

    doomed = annmaintain.vacuum_ann_index(spark, base, state=store)
    assert doomed == [0, 1]
    for bid in doomed:
        assert not os.path.exists(str(tmp_path / "ann" / f"index-v{bid}"))
        assert not os.path.exists(
            str(tmp_path / "ann" / f"codebook-v{bid}.json"))
    # the survivor still reads
    idx = annmaintain.read_index(spark, base, state=store)
    assert idx.count() == 80


def test_ann_maintain_spec_rejects_unknown_keys(spark, tmp_path):
    """ADVICE r11: algo knobs are read with .get() defaults, so a
    typo'd sink key must fail loudly at spec-parse time instead of
    silently applying the default."""
    from oracle_cassandra_migrator_spark.streaming.pipeline import (
        run_stream_pipeline)

    src = str(tmp_path / "src")
    _write(spark, _vecs(range(0, 10)), src)
    spec = {
        "source": {"format": "parquet", "path": src, "schema": SCHEMA,
                   "options": {"maxFilesPerTrigger": "1"}},
        "sink": {"type": "ann_maintain",
                 "base_dir": str(tmp_path / "ann"),
                 "checkpoint_dir": str(tmp_path / "ckpt"),
                 "initlimit": 16},  # typo'd init_limit
    }
    with pytest.raises(ValueError, match="initlimit"):
        run_stream_pipeline(spark, spec)
    # pq-only knobs are rejected under ivf (the default algo)
    spec["sink"].pop("initlimit")
    spec["sink"]["n_sub"] = 8
    with pytest.raises(ValueError, match="n_sub"):
        run_stream_pipeline(spark, spec)


def test_antijoin_probes_only_touched_buckets(spark, tmp_path):
    """VERDICT r11 item 2: with assume_new_ids=False the replay
    anti-join must read ONLY the bucket leaf dirs the batch's ids hash
    into, not the full index id column. Pinned behaviorally: corrupt a
    parquet file in an UNTOUCHED bucket of the bootstrap version — a
    full-scan anti-join would crash on it, the pruned probe never
    opens it — while a duplicate id in a TOUCHED bucket still proves
    the probe actually deduplicates."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")
    _write(spark, _vecs(range(0, 1000)), src)
    _run(spark, src, base, ckpt)
    boot = annmaintain.read_sidecar(spark, base, 0)
    n_b = boot["n_buckets"]
    assert n_b >= 8 and boot["version_buckets"]["0"]

    # the next batch: two fresh ids plus duplicate id 7 — small enough
    # to leave most of the 8+ buckets untouched
    batch_ids = [1000, 1001, 7]
    touched = {r[0] for r in spark.range(0).sparkSession.createDataFrame(
        [(i,) for i in batch_ids], "vec_id LONG"
    ).selectExpr(annmaintain._bucket_expr("vec_id", n_b) + " AS b")
        .distinct().collect()}
    untouched = [b for b in boot["version_buckets"]["0"]
                 if b not in touched]
    assert untouched, "fixture must leave at least one untouched bucket"
    victim = glob.glob(str(
        tmp_path / "ann" / "index-v0" / f"_idb={untouched[0]}" /
        "*.parquet"))[0]
    with open(victim, "wb") as fh:
        fh.write(b"this is not a parquet file")

    _write(spark, _vecs(batch_ids), src)
    _run(spark, src, base, ckpt)  # full-scan would crash on the victim
    side = annmaintain.read_sidecar(spark, base, 1)
    assert side["kind"] == "append"
    # duplicate id 7 was anti-joined away via its touched bucket
    v1 = spark.read.parquet(str(tmp_path / "ann" / "index-v1"))
    assert sorted(r["vec_id"] for r in v1.collect()) == batch_ids[:-1]
    assert side["n_rows"] == 1002


def test_ann_maintain_bootstrap_empty_and_degenerate_batches(
        spark, tmp_path):
    """Review r11: (a) an empty first micro-batch must commit nothing
    and NOT wedge the stream (the next batch bootstraps); (b) a first
    batch whose ids contain no multiple of the kmeans init modulus
    must bootstrap via the modulus-1 fallback instead of raising on an
    empty codebook."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")

    # (a) batch 0 = an empty file (what a transform that filters
    # everything away delivers)
    spark.createDataFrame([], SCHEMA).coalesce(1) \
        .write.mode("append").parquet(src)
    _run(spark, src, base, ckpt)
    assert annmaintain.read_index(spark, base) is None

    # (b) batch 1: ids 1001..1031 contain NO multiple of 43
    # (43*23 = 989, 43*24 = 1032 — the first draft of this test used
    # ..1035, which includes 1032 and never exercised the fallback;
    # review r11 second pass). Without the modulus-1 fallback this
    # batch crashes train on the NULL-cid centroid of the empty init.
    _write(spark, _vecs(range(1001, 1032)), src)
    _run(spark, src, base, ckpt)
    idx = annmaintain.read_index(spark, base)
    assert idx is not None and idx.count() == 31
    side = annmaintain.read_sidecar(spark, base, 1)
    assert side["kind"] == "rebuild" and len(side["codebook"]) > 1
    assert all(c["cid"] is not None for c in side["codebook"])

    # the stream keeps maintaining normally after the rocky start
    _write(spark, _vecs(range(1036, 1050)), src)
    _run(spark, src, base, ckpt)
    assert annmaintain.read_index(spark, base).count() == 45
    assert annmaintain.read_sidecar(spark, base, 2)["kind"] == "append"


def test_rebuild_regeneration_changes_bucket_arity_and_replaces_ids(
        spark, tmp_path):
    """r12 bucket ledger, cross-generation pin: a rebuild starts a
    FRESH bucketed generation sized to the new total — the arity must
    grow with the index (8 -> 16 here), every pre-rebuild id must be
    re-placed under the new arity (so a later duplicate of an OLD id
    is still rejected through the new generation's probe), and the
    probe must use the NEW arity (pinned behaviorally: a corrupt file
    planted in an untouched bucket of the rebuild version never gets
    opened)."""
    src = str(tmp_path / "src")
    base = str(tmp_path / "ann")
    ckpt = str(tmp_path / "ckpt")

    # batch 0: bootstrap 1,000 rows -> arity clamps to MIN (8)
    _write(spark, _vecs(range(0, 1000)), src)
    _run(spark, src, base, ckpt)
    boot = annmaintain.read_sidecar(spark, base, 0)
    assert boot["n_buckets"] == 8

    # batch 1: 9,000 negated rows blow the drift gate -> rebuild of
    # all 10,000 rows -> ceil(10000/1024)=10 -> next pow2 = 16
    _write(spark, _vecs(range(1000, 10_000), direction=-1.0), src)
    _run(spark, src, base, ckpt)
    side = annmaintain.read_sidecar(spark, base, 1)
    assert side["kind"] == "rebuild"
    assert side["n_buckets"] == 16
    assert side["n_rows"] == 10_000
    assert sorted(side["version_buckets"]) == ["1"]

    # corrupt an untouched NEW-generation bucket: the next batch's
    # probe must never open it (old-arity or full-scan probing would)
    batch_ids = [7, 10_000]  # 7 = a BOOTSTRAP-ERA id, re-placed at 16
    touched = {r[0] for r in spark.createDataFrame(
        [(i,) for i in batch_ids], "vec_id LONG"
    ).selectExpr(annmaintain._bucket_expr("vec_id", 16) + " AS b")
        .distinct().collect()}
    untouched = [b for b in side["version_buckets"]["1"]
                 if b not in touched]
    assert untouched, "fixture must leave at least one untouched bucket"
    victim = glob.glob(str(
        tmp_path / "ann" / "index-v1" / f"_idb={untouched[0]}" /
        "*.parquet"))[0]
    with open(victim, "wb") as fh:
        fh.write(b"this is not a parquet file")

    _write(spark, _vecs(batch_ids, direction=-1.0), src)
    _run(spark, src, base, ckpt)
    v2side = annmaintain.read_sidecar(spark, base, 2)
    assert v2side["kind"] == "append"
    assert v2side["n_buckets"] == 16  # generation carried, not resized
    v2 = spark.read.parquet(str(tmp_path / "ann" / "index-v2"))
    # the bootstrap-era duplicate was rejected THROUGH the rebuilt
    # generation; only the fresh id landed
    assert [r["vec_id"] for r in v2.collect()] == [10_000]
    assert v2side["n_rows"] == 10_001
