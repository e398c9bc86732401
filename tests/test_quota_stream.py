"""transformWithStateInPandas quota enforcement: per-key admission
cap that survives micro-batches, admitted set deterministic vs the
batch first-k computation.

The state-v2 Python runner speaks protobuf to the JVM
(pyspark/sql/streaming/proto/StateMessage_pb2) — when google.protobuf
is absent the whole API is unusable, so the integration test gates on
the import (same env-bound pattern as Avro/Cassandra). The processor's
admission logic itself is covered unconditionally below."""

import pytest

from tests.conftest import HAVE_PROTOBUF as _HAVE_PROTOBUF

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.sources.testdata import read_table
from oracle_cassandra_migrator_spark.streaming.quota import (
    quota_limit_stream,
)

from tests.conftest import SF_SMALL

QUOTA = 5


@pytest.fixture(scope="module")
def rocksdb_conf(spark):
    """transformWithState requires the RocksDB state store; scope the
    provider switch to this module and restore after."""
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
def test_quota_stream_admits_first_k_per_user(
        spark, rocksdb_conf, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("quota_stream"))
    events = read_table(spark, SF_SMALL, "events").select(
        "user_id", "event_id", "ts", "event_type", "value")
    # two ts-range files -> two micro-batches in event-time order, so
    # the streamed admission order equals the global (ts, event_id)
    # order and the batch first-k is an exact oracle. The two files
    # are written as SEPARATE jobs, low-ts half first: FileStreamSource
    # orders by modification time, and a single two-partition write
    # lands its part files in task-completion order — under load the
    # high-ts file can finish first and flip the batch order (observed
    # flaking in the full suite).
    from pyspark.sql.window import Window as _W

    ranked = events.withColumn(
        "__rn", F.row_number().over(_W.orderBy("ts", "event_id")))
    half = events.count() // 2
    lo = ranked.where(F.col("__rn") <= half).drop("__rn")
    hi = ranked.where(F.col("__rn") > half).drop("__rn")
    lo.coalesce(1).sortWithinPartitions("ts", "event_id") \
        .write.mode("overwrite").parquet(path)
    import time as _time

    _time.sleep(1.1)  # distinct mtimes even on coarse filesystems
    hi.coalesce(1).sortWithinPartitions("ts", "event_id") \
        .write.mode("append").parquet(path)
    batch = spark.read.parquet(path)
    stream = (spark.readStream.schema(batch.schema)
              .option("maxFilesPerTrigger", 1).parquet(path))
    q = (quota_limit_stream(stream, QUOTA)
         .writeStream.format("memory").queryName("quota_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(180)
    got = spark.table("quota_sink")

    from pyspark.sql.window import Window
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    expected = (batch.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") <= QUOTA)
                .select("user_id", "event_id",
                        F.col("rn").cast("bigint").alias("admit_idx")))
    g = {(r["user_id"], r["event_id"], r["admit_idx"])
         for r in got.collect()}
    e = {(r["user_id"], r["event_id"], r["admit_idx"])
         for r in expected.collect()}
    assert g == e
    # every user capped at QUOTA and no duplicates
    per_user = got.groupBy("user_id").count().collect()
    assert all(r["count"] <= QUOTA for r in per_user)
    assert got.count() == got.dropDuplicates(["event_id"]).count()


class _FakeValueState:
    def __init__(self):
        self._v = None

    def exists(self):
        return self._v is not None

    def get(self):
        return self._v

    def update(self, v):
        self._v = tuple(v)


class _FakeHandle:
    def __init__(self):
        self.state = _FakeValueState()

    def getValueState(self, name, schema, ttlDurationMs=None):
        return self.state


def _frame(rows):
    import pandas as pd

    return pd.DataFrame(
        rows, columns=["user_id", "event_id", "ts", "event_type", "value"])


def test_quota_processor_admission_across_batches():
    """Pure-python contract: admissions accumulate across calls, the
    cap binds mid-frame, saturated keys emit nothing, and admit_idx is
    the global per-key admission sequence."""
    from oracle_cassandra_migrator_spark.streaming.quota import (
        QuotaProcessor)

    p = QuotaProcessor(quota=5)
    p.init(_FakeHandle())
    # batch 1: 3 rows, delivered out of ts order -> admitted sorted
    out1 = list(p.handleInputRows(
        (7,), iter([_frame([(7, 3, 30, "view", 1.0),
                            (7, 1, 10, "click", 2.0),
                            (7, 2, 20, "view", 3.0)])]), None))
    assert len(out1) == 1
    assert list(out1[0]["event_id"]) == [1, 2, 3]
    assert list(out1[0]["admit_idx"]) == [1, 2, 3]
    # batch 2: 4 rows but only 2 slots left -> first 2 by (ts, id)
    out2 = list(p.handleInputRows(
        (7,), iter([_frame([(7, 9, 90, "view", 1.0),
                            (7, 8, 80, "view", 1.0),
                            (7, 7, 70, "view", 1.0),
                            (7, 6, 60, "view", 1.0)])]), None))
    assert list(out2[0]["event_id"]) == [6, 7]
    assert list(out2[0]["admit_idx"]) == [4, 5]
    # batch 3: saturated -> nothing emitted, state unchanged
    out3 = list(p.handleInputRows(
        (7,), iter([_frame([(7, 10, 100, "view", 1.0)])]), None))
    assert out3 == []
