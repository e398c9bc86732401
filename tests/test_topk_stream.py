"""transformWithStateInPandas streaming top-k (ListState): bounded
per-key leaderboard state, newly-entered rows emitted per batch.

Same env gating as test_quota_stream: the state-v2 runner needs
google.protobuf; the processor contract is covered unconditionally
with a fake handle."""

import pytest

from tests.conftest import HAVE_PROTOBUF as _HAVE_PROTOBUF

from oracle_cassandra_migrator_spark.streaming.topk import TopKProcessor


class _FakeListState:
    def __init__(self):
        self._rows = None

    def exists(self):
        return self._rows is not None

    def get(self):
        return iter(self._rows or [])

    def appendValue(self, v):
        if self._rows is None:
            self._rows = []
        self._rows.append(tuple(v))

    def clear(self):
        self._rows = []


class _FakeHandle:
    def __init__(self):
        self.state = _FakeListState()

    def getListState(self, name, schema):
        return self.state


def _frame(rows):
    import pandas as pd

    return pd.DataFrame(rows, columns=["key", "score", "doc_id"])


def test_topk_processor_merges_evicts_and_emits_entries():
    p = TopKProcessor(k=3)
    p.init(_FakeHandle())
    # batch 1: 4 rows -> top-3 kept and emitted in (score DESC, id) order
    out1 = list(p.handleInputRows(
        ("d",), iter([_frame([("d", 0.5, 10), ("d", 0.9, 11),
                              ("d", 0.7, 12), ("d", 0.1, 13)])]), None))
    assert len(out1) == 1
    assert list(out1[0]["doc_id"]) == [11, 12, 10]
    assert list(out1[0]["score"]) == [0.9, 0.7, 0.5]
    # batch 2: one row beats the floor -> only IT is emitted; floor
    # row 10 is evicted from state (but never retracted downstream)
    out2 = list(p.handleInputRows(
        ("d",), iter([_frame([("d", 0.8, 14), ("d", 0.05, 15)])]), None))
    assert list(out2[0]["doc_id"]) == [14]
    assert sorted(p.best._rows) == [(0.7, 12), (0.8, 14), (0.9, 11)]
    # batch 3: nothing beats the floor -> no emission, state unchanged
    out3 = list(p.handleInputRows(
        ("d",), iter([_frame([("d", 0.2, 16)])]), None))
    assert out3 == []
    assert sorted(p.best._rows) == [(0.7, 12), (0.8, 14), (0.9, 11)]


def test_topk_processor_tie_and_replay_determinism():
    p = TopKProcessor(k=2)
    p.init(_FakeHandle())
    batch = _frame([("d", 0.5, 21), ("d", 0.5, 20), ("d", 0.5, 22)])
    out1 = list(p.handleInputRows(("d",), iter([batch]), None))
    # ties break on id ASC
    assert list(out1[0]["doc_id"]) == [20, 21]
    # replaying the same batch is idempotent: exact (score, id) pairs
    # dedupe, nothing re-enters
    out2 = list(p.handleInputRows(("d",), iter([batch]), None))
    assert out2 == []


def test_topk_state_is_bounded():
    p = TopKProcessor(k=4)
    p.init(_FakeHandle())
    for b in range(10):
        rows = [("d", b + i / 100.0, b * 100 + i) for i in range(50)]
        list(p.handleInputRows(("d",), iter([_frame(rows)]), None))
    assert len(p.best._rows) == 4
    # the final state is the true global top-4
    assert sorted(p.best._rows, reverse=True)[0][0] == pytest.approx(9.49)


@pytest.fixture()
def rocksdb_conf(spark):
    """transformWithState needs the RocksDB state store (the default
    HDFS-backed provider rejects multiple column families)."""
    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key, None)
    spark.conf.set(
        key,
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider")
    yield
    if old is None:
        spark.conf.unset(key)
    else:
        spark.conf.set(key, old)


@pytest.mark.skipif(
    not _HAVE_PROTOBUF,
    reason="transformWithStateInPandas requires google.protobuf "
           "(vendored copy failed to load)")
def test_topk_stream_integration(spark, rocksdb_conf, tmp_path):
    from oracle_cassandra_migrator_spark.streaming.topk import topk_stream

    src = str(tmp_path / "topk_src")
    df = spark.createDataFrame(
        [("a", float(i % 7), i) for i in range(100)],
        "key string, score double, doc_id long")
    df.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(df.schema).parquet(src)
    q = (topk_stream(stream, k=3)
         .writeStream.format("memory").queryName("topk_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {r.doc_id for r in spark.table("topk_sink").collect()}
    assert {6, 13, 20} <= got


def test_rescored_doc_holds_one_slot():
    """A document re-delivered with a higher score must keep exactly
    ONE leaderboard slot (best score), not evict distinct docs by
    occupying several — and it re-emits at the improved score."""
    import pandas as pd

    proc = TopKProcessor(k=3)
    proc.init(_FakeHandle())
    list(proc.handleInputRows(("d",), [pd.DataFrame(
        {"score": [0.5, 0.4, 0.3], "doc_id": [7, 8, 9]})], None))
    out = list(proc.handleInputRows(("d",), [pd.DataFrame(
        {"score": [0.9], "doc_id": [7]})], None))
    state = sorted(proc.best.get(), key=lambda t: -t[0])
    assert [d for _, d in state] == [7, 8, 9]        # 7 once, none evicted
    assert state[0] == (0.9, 7)
    assert len(out) == 1
    emitted = set(zip(out[0]["score"], out[0]["doc_id"]))
    assert (0.9, 7) in emitted
