"""Structured Streaming tests: replay the events table as a file
stream, run the windowed aggregations with watermarks, and check the
streaming results against the identical batch computation."""

import pytest

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.sources.testdata import read_table
from oracle_cassandra_migrator_spark.streaming import (
    session_window_counts,
    sliding_window_agg,
    tumbling_window_agg,
)

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def events_stream(spark, tmp_path_factory):
    """events replayed as a file stream (2 parquet files = 2 micro-ish
    batches with availableNow)."""
    path = str(tmp_path_factory.mktemp("events_stream"))
    read_table(spark, SF_SMALL, "events").repartition(2).write.mode(
        "overwrite").parquet(path)
    batch = spark.read.parquet(path)
    stream = spark.readStream.schema(batch.schema).parquet(path)
    return stream, batch


def run_to_completion(spark, streaming_df, name):
    query = (
        streaming_df.writeStream.format("memory").queryName(name)
        .outputMode("complete").trigger(availableNow=True).start()
    )
    query.awaitTermination(120)
    return spark.table(name)


def as_set(df):
    return {tuple(r) for r in df.collect()}


def test_tumbling_window_stream_matches_batch(spark, events_stream):
    stream, batch = events_stream
    got = run_to_completion(
        spark, tumbling_window_agg(stream, "1 hour"), "tumbling")
    expected = tumbling_window_agg(batch, "1 hour")
    assert as_set(got) == as_set(expected)
    assert got.count() > 0


def test_sliding_windows_overlap(spark, events_stream):
    stream, batch = events_stream
    got = run_to_completion(
        spark, sliding_window_agg(stream, "1 hour", "30 minutes"), "sliding")
    expected = sliding_window_agg(batch, "1 hour", "30 minutes")
    assert as_set(got) == as_set(expected)
    # every event lands in duration/slide = 2 windows
    n_events = batch.count()
    assert (got.agg(F.sum("n_events")).collect()[0][0]) == 2 * n_events


def test_session_windows_stream_matches_batch(spark, events_stream):
    stream, batch = events_stream
    got = run_to_completion(
        spark, session_window_counts(stream, gap="30 minutes"), "sessions")
    expected = session_window_counts(batch, gap="30 minutes")
    assert as_set(got) == as_set(expected)
    # session count should also agree with the batch gaps-and-islands op
    from oracle_cassandra_migrator_spark.queries.extensions import (
        events_sessionize,
    )
    n_sessions = events_sessionize(spark, SF_SMALL).count()
    assert got.count() == n_sessions


def test_stateful_running_totals_accumulate_across_batches(spark, tmp_path):
    """applyInPandasWithState: totals must reflect ALL batches, proving
    state persists across micro-batches (not per-batch aggregation)."""
    import time

    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.stateful import (
        running_user_totals,
    )

    events = read_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "src")
    events.where("event_id % 2 = 0").coalesce(1).write.mode(
        "overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    query = (
        running_user_totals(stream)
        .writeStream.format("memory").queryName("running_totals")
        .outputMode("update").trigger(processingTime="500 milliseconds")
        .start()
    )
    truth = {
        tuple(r) for r in events.groupBy("user_id").agg(
            F.count("*").cast("bigint").alias("n")).collect()
    }

    def current():
        # update mode appends one row per (batch, user): the running
        # maximum per user is that user's latest accumulated total
        return {
            tuple(r) for r in spark.table("running_totals")
            .groupBy("user_id").agg(F.max("n_events").alias("n")).collect()
        }

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not spark.table(
                "running_totals").count():
            time.sleep(0.5)
        # second batch: the odd half
        events.where("event_id % 2 = 1").coalesce(1).write.mode(
            "append").parquet(src)
        # poll the actual end condition: state reflects BOTH batches
        deadline = time.time() + 90
        while time.time() < deadline and current() != truth:
            time.sleep(0.5)
    finally:
        query.stop()

    assert current() == truth


def test_stream_stream_join_clicks_to_purchases(spark, tmp_path):
    """Stream-stream inner join with watermarks: purchases join clicks
    by the same user within 1 hour before the purchase."""
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    events = read_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    clicks = (stream.where("event_type = 'click'")
              .select(F.col("user_id").alias("c_user"),
                      F.col("ts").alias("click_ts"),
                      F.col("event_id").alias("click_id"))
              .withWatermark("click_ts", "2 hours"))
    purchases = (stream.where("event_type = 'purchase'")
                 .select(F.col("user_id").alias("p_user"),
                         F.col("ts").alias("purchase_ts"),
                         F.col("event_id").alias("purchase_id"))
                 .withWatermark("purchase_ts", "2 hours"))
    joined = purchases.join(
        clicks,
        F.expr("p_user = c_user AND click_ts <= purchase_ts"
               " AND click_ts >= purchase_ts - INTERVAL 1 HOUR"))

    q = (joined.writeStream.format("memory").queryName("ss_join")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("ss_join").count()

    # batch truth
    c = events.where("event_type = 'click'").selectExpr(
        "user_id AS c_user", "ts AS click_ts")
    p = events.where("event_type = 'purchase'").selectExpr(
        "user_id AS p_user", "ts AS purchase_ts")
    expected = p.join(
        c, F.expr("p_user = c_user AND click_ts <= purchase_ts"
                  " AND click_ts >= purchase_ts - INTERVAL 1 HOUR")).count()
    assert got == expected
    assert got > 0


def test_read_stream_source_rate(spark):
    """The built-in rate source through the declarative spec — proves
    non-file stream formats plumb through (kafka uses the same path
    with connector options)."""
    from oracle_cassandra_migrator_spark.streaming import read_stream_source

    stream = read_stream_source(spark, {
        "format": "rate",
        "options": {"rowsPerSecond": "500"},
        "select": ["value", "timestamp"],
    })
    assert stream.isStreaming
    q = (stream.writeStream.format("memory").queryName("rate_probe")
         .outputMode("append").trigger(processingTime="250 milliseconds")
         .start())
    import time
    try:
        deadline = time.time() + 60
        while time.time() < deadline and not spark.table("rate_probe").count():
            time.sleep(0.25)
        assert spark.table("rate_probe").count() > 0
    finally:
        q.stop()


def test_kafka_stream_spec_options_mapping(spark):
    """No broker in this environment, so the kafka spec is asserted the
    same way the partitioned-JDBC read is (test_sources_sinks):
    subscribe/startingOffsets/bootstrap options must land on the
    readStream builder verbatim and load() must be pathless."""
    from unittest.mock import patch

    from oracle_cassandra_migrator_spark.streaming import read_stream_source

    captured = {}

    class FakeReader:
        def format(self, fmt):
            captured["format"] = fmt
            return self

        def options(self, **kw):
            captured.update(kw)
            return self

        def schema(self, s):
            captured["schema"] = s
            return self

        def load(self, *args):
            captured["load_args"] = args

            class _D:
                def where(self, *_): return self
                def selectExpr(self, *_): return self
            return _D()

    with patch.object(type(spark), "readStream",
                      property(lambda self: FakeReader())):
        read_stream_source(spark, {
            "format": "kafka",
            "options": {"kafka.bootstrap.servers": "broker1:9092,broker2:9092",
                        "subscribe": "payments,events",
                        "startingOffsets": "earliest",
                        "maxOffsetsPerTrigger": 50000},
            "filter": "timestamp > '2024-01-01'",
        })
    assert captured["format"] == "kafka"
    assert captured["kafka.bootstrap.servers"] == "broker1:9092,broker2:9092"
    assert captured["subscribe"] == "payments,events"
    assert captured["startingOffsets"] == "earliest"
    assert captured["maxOffsetsPerTrigger"] == "50000"  # stringified
    assert captured["load_args"] == ()  # no path for kafka


def test_kafka_value_json_projection(spark):
    """The value_schema path (JSON value -> typed columns + kept wire
    metadata) asserted against a real DataFrame shaped like the Kafka
    wire schema: key/value binary + topic/partition/offset/timestamp."""
    import datetime
    from unittest.mock import patch

    from oracle_cassandra_migrator_spark.streaming import read_stream_source

    wire = spark.createDataFrame(
        [
            (bytearray(b"k1"),
             bytearray(b'{"event_id": 7, "amount": 12.5}'),
             "payments", 0, 11,
             datetime.datetime(2024, 1, 2, 3, 4, 5)),
            (bytearray(b"k2"),
             bytearray(b'{"event_id": 9, "amount": 0.25}'),
             "payments", 1, 12,
             datetime.datetime(2024, 1, 2, 3, 4, 6)),
        ],
        "key binary, value binary, topic string, partition int, "
        "offset long, timestamp timestamp",
    )

    class FakeReader:
        def format(self, fmt):
            return self

        def options(self, **kw):
            return self

        def load(self, *args):
            return wire

    with patch.object(type(spark), "readStream",
                      property(lambda self: FakeReader())):
        out = read_stream_source(spark, {
            "format": "kafka",
            "options": {"kafka.bootstrap.servers": "b:9092",
                        "subscribe": "payments"},
            "value_schema": "event_id BIGINT, amount DOUBLE",
        })
    assert out.columns == ["kafka_key", "event_id", "amount",
                           "topic", "partition", "offset", "timestamp"]
    rows = {tuple(r) for r in
            out.selectExpr("kafka_key", "event_id", "amount", "offset")
            .collect()}
    assert rows == {("k1", 7, 12.5, 11), ("k2", 9, 0.25, 12)}


def test_read_stream_source_file_matches_batch(spark, tmp_path, events_stream):
    """File-stream spec with filter/select/watermark: same rows as the
    equivalent batch read; missing schema raises the documented error."""
    import pytest as _pytest

    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming import read_stream_source

    events = read_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.coalesce(2).write.mode("overwrite").parquet(src)

    with _pytest.raises(ValueError, match="schema"):
        read_stream_source(spark, {"format": "parquet", "path": src})

    ddl = ", ".join(f"{f.name} {f.dataType.simpleString()}"
                    for f in events.schema.fields)
    stream = read_stream_source(spark, {
        "format": "parquet", "path": src, "schema": ddl,
        "filter": "event_type = 'click'",
        "select": ["event_id", "user_id"],
        "watermark": None,
    })
    q = (stream.writeStream.format("memory").queryName("file_spec")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("file_spec")
    assert got.columns == ["event_id", "user_id"]
    assert got.count() == events.where("event_type = 'click'").count()


def test_stream_dedup_exact_suppresses_replayed_rows(spark, tmp_path):
    """Watermark-bounded streaming dedup: the same events delivered in
    two batches must come out once per event_id."""
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.stateful import (
        stream_dedup_exact,
    )

    events = read_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # planted dupes

    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    deduped = stream_dedup_exact(
        stream, ["event_id"], watermark_col="ts", delay="2 hours")
    q = (deduped.writeStream.format("memory").queryName("stream_dedup")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    assert spark.table("stream_dedup").count() == events.count()


def test_foreach_batch_sink_is_idempotent(spark, tmp_path):
    """foreachBatch + marker store: replaying the same batches must not
    duplicate sink rows (streaming twin of the per-file checkpoints)."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.sinks import (
        foreach_batch_sink,
    )

    events = read_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))

    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    ckpt = str(tmp_path / "ckpt")
    sink = {"format": "parquet", "path": out}

    q = foreach_batch_sink(stream, sink, markers, ckpt)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out).count()
    assert n1 == events.count()

    # restart with a FRESH checkpoint dir: Spark replays every file as
    # new batches with the same ids -> markers must suppress rewrites
    q2 = foreach_batch_sink(
        stream, sink, markers, str(tmp_path / "ckpt2"))
    q2.awaitTermination(120)
    n2 = spark.read.parquet(out).count()
    assert n2 == n1, "replayed batches were written twice"


def test_foreach_batch_sink_crash_between_write_and_marker(spark, tmp_path):
    """The window the marker alone cannot cover: the sink write lands,
    then the process dies before put_marker. On restart Spark replays
    the batch (its own checkpoint never committed) — the deterministic
    per-batch targets must make that a rewrite, not a second append."""
    from oracle_cassandra_migrator_spark.reliability.state import (
        LocalFSStateStore,
    )
    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.sinks import (
        foreach_batch_sink,
    )

    events = read_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)
    stream = (spark.readStream.schema(events.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")
    ckpt = str(tmp_path / "ckpt")
    sink = {"format": "parquet", "path": out}

    class CrashingStore(LocalFSStateStore):
        def __init__(self):
            self.crashes_left = 1

        def put_marker(self, key):
            if self.crashes_left:
                self.crashes_left -= 1
                raise RuntimeError("injected crash: write done, marker not")
            super().put_marker(key)

    store = CrashingStore()
    q = foreach_batch_sink(stream, sink, markers, ckpt, state=store)
    with pytest.raises(Exception):
        q.awaitTermination(120)
    assert spark.read.parquet(out).count() > 0  # batch 0's write landed

    # restart with the SAME checkpoint dir — real crash recovery; Spark
    # re-delivers the uncommitted batch 0, then the rest
    q2 = foreach_batch_sink(stream, sink, markers, ckpt, state=store)
    q2.awaitTermination(120)
    assert spark.read.parquet(out).count() == events.count(), \
        "replayed uncommitted batch appended instead of overwriting"


def test_heavy_hitters_stream_finds_planted_hot_keys(spark, tmp_path):
    """Bucketed Misra-Gries across micro-batches: planted hot items
    must survive in state with bounds containing their true counts,
    and state stays at <= n_buckets x capacity counters regardless of
    distinct-item cardinality."""
    import time

    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.streaming.stateful import (
        heavy_hitters_stream,
    )

    # two hot items (400 + 300 rows) over a 1000-item uniform tail,
    # split across two files = two micro-batches
    rows = ([(7,)] * 400 + [(13,)] * 300
            + [(1000 + i, ) for i in range(1000)])
    df = spark.createDataFrame(rows, "user_id long").withColumn(
        "part", F.expr("pmod(monotonically_increasing_id(), 2)"))
    src = str(tmp_path / "hh_src")
    df.where("part = 0").select("user_id").coalesce(1).write.mode(
        "overwrite").parquet(src)

    stream = spark.readStream.schema("user_id long").option(
        "maxFilesPerTrigger", "1").parquet(src)
    query = (
        heavy_hitters_stream(stream, "user_id", n_buckets=4, capacity=8)
        .writeStream.format("memory").queryName("hh")
        .outputMode("update").trigger(processingTime="500 milliseconds")
        .start()
    )

    def latest():
        # update mode: last emission per (bucket, item) is current state
        return {
            (r["item"]): (r["count_lo"], r["count_hi"])
            for r in spark.table("hh")
            .withColumn(
                "rn",
                F.expr("row_number() OVER (PARTITION BY bucket, item"
                       " ORDER BY count_hi DESC)"))
            .where("rn = 1").collect()
        }

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not spark.table("hh").count():
            time.sleep(0.5)
        df.where("part = 1").select("user_id").coalesce(1).write.mode(
            "append").parquet(src)
        deadline = time.time() + 90
        ok = False
        while time.time() < deadline and not ok:
            cur = latest()
            ok = (7 in cur and 13 in cur
                  and cur[7][0] <= 400 <= cur[7][1]
                  and cur[13][0] <= 300 <= cur[13][1])
            time.sleep(0.5)
    finally:
        query.stop()

    cur = latest()
    assert 7 in cur and cur[7][0] <= 400 <= cur[7][1], cur.get(7)
    assert 13 in cur and cur[13][0] <= 300 <= cur[13][1], cur.get(13)
    # state bound: distinct surviving items <= n_buckets * capacity
    assert len(cur) <= 4 * 8


def test_interval_join_streams_operator_matches_batch(spark, tmp_path):
    """The packaged stream-stream interval join: same function on the
    stream and on the batch frames must agree (and the streaming run
    must carry watermarks so state is bounded)."""
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming import (
        interval_join_streams)

    events = read_table(spark, SF_SMALL, "events").withColumn(
        "ts", F.col("ts").cast("timestamp"))
    src = str(tmp_path / "ij_src")
    events.coalesce(1).write.mode("overwrite").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    def sides(df):
        p = df.where("event_type = 'purchase'").selectExpr(
            "user_id", "ts AS purchase_ts", "event_id AS purchase_id")
        c = df.where("event_type = 'click'").selectExpr(
            "user_id AS user_id_r", "ts AS click_ts", "event_id AS click_id")
        return p, c

    sp, sc = sides(stream)
    joined = interval_join_streams(
        sp, sc, key="user_id", left_ts="purchase_ts", right_ts="click_ts")
    q = (joined.writeStream.format("memory").queryName("ij_op")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("ij_op").count()

    bp, bc = sides(events)
    expected = interval_join_streams(
        bp, bc, key="user_id", left_ts="purchase_ts",
        right_ts="click_ts").count()
    assert got == expected and got > 0


def test_sessionize_stateful_timeout_closes_idle_session(spark, tmp_path):
    """Event-time state timeout: user 1's burst must be emitted as a
    closed session once OTHER users' later events advance the
    watermark past burst_end + gap — no user-1 event ever closes it.
    Also checks the split path: user 2 has two bursts far apart, so
    the second burst's arrival closes the first inline."""
    import datetime
    import time

    from oracle_cassandra_migrator_spark.streaming.stateful import (
        sessionize_stateful)

    t0 = datetime.datetime(2024, 1, 1, 12, 0, 0)

    def ev(uid, eid, minutes):
        return (uid, eid, t0 + datetime.timedelta(minutes=minutes))

    schema = "user_id long, event_id long, ts timestamp"
    batch1 = spark.createDataFrame(
        [ev(1, 10, 0), ev(1, 11, 5), ev(1, 12, 9),      # user-1 burst
         ev(2, 20, 0)],                                  # user-2 burst A
        schema)
    # hours later: user 2 again (splits their own session) and user 3
    # (advances the watermark so user 1's state times out)
    batch2 = spark.createDataFrame(
        [ev(2, 21, 300), ev(3, 30, 310), ev(3, 31, 600)], schema)

    src = str(tmp_path / "sess_src")
    batch1.coalesce(1).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(batch1.schema).option(
        "maxFilesPerTrigger", "1").parquet(src)
    q = (sessionize_stateful(stream, gap_minutes=30, watermark="10 minutes")
         .writeStream.format("memory").queryName("sessions")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())

    def us(minutes):
        return int((t0 + datetime.timedelta(minutes=minutes))
                   .timestamp() * 1_000_000)

    try:
        deadline = time.time() + 60
        while time.time() < deadline and not spark.sparkContext:
            time.sleep(0.5)
        batch2.coalesce(1).write.mode("append").parquet(src)
        batch2.limit(0).coalesce(1).write.mode("append").parquet(src)
        want_user1 = (1, us(0), us(9), 3)
        deadline = time.time() + 120
        while time.time() < deadline:
            rows = {tuple(r) for r in spark.table("sessions").collect()}
            if want_user1 in rows and (2, us(0), us(0), 1) in rows:
                break
            time.sleep(0.5)
    finally:
        q.stop()

    rows = {tuple(r) for r in spark.table("sessions").collect()}
    assert want_user1 in rows          # closed by TIMEOUT, not by data
    assert (2, us(0), us(0), 1) in rows  # closed inline by the split


def test_bloom_dedup_stream_bounded_state_matches_simulation(spark, tmp_path):
    """Streaming bloom dedup must (a) admit exactly the set a plain-
    Python simulation of the same shard/bloom/order scheme admits —
    determinism — (b) never admit the same fingerprint twice, even
    when the duplicate arrives in a LATER micro-batch (state carries),
    and (c) keep state at one fixed-size filter per shard."""
    import hashlib
    import time

    from oracle_cassandra_migrator_spark.streaming.stateful import (
        _bloom_dedup_positions, bloom_dedup_stream)

    # 300 docs with fingerprints; ids 200-299 duplicate 100-199's fps,
    # split so every duplicate lands in the SECOND batch
    rows = [(i, f"fp-{i % 200}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    src = str(tmp_path / "bloomdedup_src")
    df.where("doc_id < 200").coalesce(1).write.mode("overwrite").parquet(src)

    stream = (spark.readStream.schema("doc_id long, fp string")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (bloom_dedup_stream(stream, "fp", "doc_id", n_shards=4)
         .writeStream.format("memory").queryName("bloom_dedup")
         .outputMode("append").trigger(processingTime="500 milliseconds")
         .start())
    try:
        deadline = time.time() + 90
        while time.time() < deadline and not spark.table(
                "bloom_dedup").count():
            time.sleep(0.5)
        df.where("doc_id >= 200").coalesce(1).write.mode(
            "append").parquet(src)
        time.sleep(5)
        deadline = time.time() + 90
        prev = -1
        while time.time() < deadline:
            n = spark.table("bloom_dedup").count()
            if n == prev:
                break
            prev = n
            time.sleep(2)
        got = {r.doc_id for r in spark.table("bloom_dedup").collect()}
    finally:
        q.stop()

    # python simulation: same sharding, same per-batch (shard, doc_id)
    # fold order, same md5 positions
    def shard_of(fp):
        return int(hashlib.md5(fp.encode()).hexdigest()[:8], 16) % 4

    filters = {s: set() for s in range(4)}
    want = set()
    for lo, hi in ((0, 200), (200, 300)):
        batch = sorted(
            (shard_of(fp), i, fp) for i, fp in rows[lo:hi])
        for s, i, fp in batch:
            pos = _bloom_dedup_positions(fp, 16_384, 3)
            if not all(p in filters[s] for p in pos):
                want.add(i)
                filters[s].update(pos)
    assert got == want
    # no fingerprint admitted twice; ids 200+ are all dups of batch 1
    assert all(i < 200 for i in got)
    # bloom FPs may drop a few uniques, never many at this fill
    assert len(got) >= 190


def test_bloom_dedup_stream_recovers_filters_from_checkpoint(spark, tmp_path):
    """Kill-and-restart for the BINARY bloom state: batch 1 admits the
    originals, the query stops, a new instance restarts from the same
    checkpoint for batch 2 (pure duplicates) — zero new admissions,
    proving the packed filter bytes round-tripped the state store."""
    from oracle_cassandra_migrator_spark.streaming.stateful import (
        bloom_dedup_stream)

    rows = [(i, f"fp-{i % 150}") for i in range(300)]
    df = spark.createDataFrame(rows, "doc_id long, fp string")
    src = str(tmp_path / "bd_ckpt_src")
    out = str(tmp_path / "bd_ckpt_out")
    ckpt = str(tmp_path / "bd_ckpt")
    df.where("doc_id < 150").coalesce(1).write.mode("overwrite").parquet(src)

    def start():
        stream = (spark.readStream.schema("doc_id long, fp string")
                  .option("maxFilesPerTrigger", "10").parquet(src))

        def write_batch(bdf, _bid):
            bdf.write.mode("append").parquet(out)

        return (bloom_dedup_stream(stream, "fp", "doc_id", n_shards=4)
                .writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", ckpt)
                .outputMode("append").trigger(availableNow=True).start())

    q1 = start()
    q1.awaitTermination(120)
    n_first = spark.read.parquet(out).count()
    assert n_first >= 145  # all originals admitted (minus rare FPs)
    df.where("doc_id >= 150").coalesce(1).write.mode("append").parquet(src)
    q2 = start()
    q2.awaitTermination(120)
    admitted = [r.doc_id for r in spark.read.parquet(out).collect()]
    assert len(admitted) == n_first        # batch 2 admitted NOTHING
    assert all(i < 150 for i in admitted)  # only originals ever pass


def test_bloom_dedup_stream_matches_batch_twin_query(spark, tmp_path):
    """Stream==batch parity for the admission semantics (VERDICT r5
    #6): bloom_dedup_stream over the events fingerprints must admit
    exactly the `stream_dedup_admission_batch` driver query's
    admitted_event_ids on this corpus (the only permitted divergence —
    a bloom false positive suppressing a first arrival — does not
    occur at this fill, which this test also proves)."""
    import time

    from oracle_cassandra_migrator_spark.queries.round6 import (
        _ADMISSION_FP, stream_dedup_admission_batch)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming.stateful import (
        bloom_dedup_stream)

    from tests.conftest import SF_SMALL

    want = {r.admitted_event_id
            for r in stream_dedup_admission_batch(
                spark, SF_SMALL).collect()}

    src = str(tmp_path / "admission_src")
    (read_table(spark, SF_SMALL, "events")
     .selectExpr("event_id", f"{_ADMISSION_FP} AS fp")
     .coalesce(1).write.mode("overwrite").parquet(src))
    stream = spark.readStream.schema("event_id long, fp string").parquet(src)
    q = (bloom_dedup_stream(stream, "fp", "event_id")
         .writeStream.format("memory").queryName("admission_twin")
         .outputMode("append").trigger(availableNow=True).start())
    try:
        q.awaitTermination(120)
    finally:
        q.stop()
    got = {r.doc_id for r in spark.table("admission_twin").collect()}
    assert got == want
    assert len(want) > 0


def test_interval_join_streams_left_outer_emits_nulls_after_watermark(
        spark, tmp_path):
    """Stream-stream LEFT OUTER interval join: a purchase with no
    click in its lookback window must surface with NULL click columns
    — but only once the right-side watermark has passed the point
    where a matching click could still arrive. A later flush batch
    advances the watermark; the unmatched row then emits. The matched
    purchase joins normally and the flush click itself produces no
    output row."""
    import datetime

    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.streaming import (
        interval_join_streams)

    t = lambda h, m: datetime.datetime(2024, 1, 1, h, m)
    main = [
        (1, t(11, 30), 101, "click"),     # matches A's purchase
        (1, t(12, 0), 102, "purchase"),   # A: matched
        (2, t(12, 0), 201, "purchase"),   # B: no click -> NULL row
    ]
    # the global watermark is the MIN across both sides' nodes, so the
    # flush batches must advance BOTH sides (a purchase and a matching
    # click each); the second flush batch is where the evicted NULL
    # row actually emits
    flush = [
        (3, t(20, 0), 301, "purchase"),
        (3, t(19, 30), 302, "click"),
    ]
    flush2 = [
        (4, t(21, 0), 401, "purchase"),
        (4, t(20, 30), 402, "click"),
    ]
    schema = "user_id long, ts timestamp, event_id long, event_type string"
    src = str(tmp_path / "ij_outer_src")
    spark.createDataFrame(main, schema).coalesce(1).write.mode(
        "overwrite").parquet(src)
    # later files land as SEPARATE micro-batches (maxFilesPerTrigger=1)
    spark.createDataFrame(flush, schema).coalesce(1).write.mode(
        "append").parquet(src)
    spark.createDataFrame(flush2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    p = stream.where("event_type = 'purchase'").selectExpr(
        "user_id", "ts AS purchase_ts", "event_id AS purchase_id")
    c = stream.where("event_type = 'click'").selectExpr(
        "user_id AS user_id_r", "ts AS click_ts", "event_id AS click_id")
    joined = interval_join_streams(
        p, c, key="user_id", left_ts="purchase_ts", right_ts="click_ts",
        lookback="INTERVAL 1 HOUR", watermark="10 minutes",
        how="left_outer")
    q = (joined.writeStream.format("memory").queryName("ij_outer")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = {r["purchase_id"]: r for r in spark.table("ij_outer").collect()}
    assert {102, 201, 301} <= set(rows)
    assert rows[102]["click_id"] == 101         # matched within lookback
    assert rows[301]["click_id"] == 302         # flush pair joins too
    assert rows[201]["click_id"] is None        # null-extended after wm
    assert rows[201]["click_ts"] is None


def test_foreach_batch_upsert_maintains_keyed_snapshot(spark, tmp_path):
    """Streaming CDC upsert: two micro-batches of change rows with
    overlapping keys must leave the latest committed snapshot equal to
    the batch-order fold (last writer per key wins, within-batch order
    decided by order_by); rerunning the stream over the same source
    with the same checkpoint+markers must be a no-op (exactly-once)."""
    import datetime

    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    schema = "k long, ts timestamp, seq long, val string"
    b1 = [(1, t(0), 1, "a1"), (2, t(0), 2, "b1"),
          (1, t(1), 3, "a2")]          # within-batch: k=1 -> a2
    b2 = [(2, t(5), 4, "b2"), (3, t(5), 5, "c1")]  # cross-batch: k=2 -> b2
    src = str(tmp_path / "upsert_src")
    spark.createDataFrame(b1, schema).coalesce(1).write.mode(
        "overwrite").parquet(src)
    spark.createDataFrame(b2, schema).coalesce(1).write.mode(
        "append").parquet(src)

    base = str(tmp_path / "upsert_snap")
    ckpt = str(tmp_path / "upsert_ckpt")

    def run():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = foreach_batch_upsert(
            stream, base, keys=["k"], order_by=["ts", "seq"],
            checkpoint_dir=ckpt)
        q.awaitTermination(120)

    run()
    snap = {r["k"]: (r["val"], r["seq"])
            for r in latest_snapshot(spark, base).collect()}
    assert snap == {1: ("a2", 3), 2: ("b2", 4), 3: ("c1", 5)}

    # replay: same source, same checkpoint -> markers short-circuit,
    # snapshot unchanged (no new version directories)
    import glob
    versions_before = sorted(glob.glob(f"{base}/snapshot-v*"))
    run()
    assert sorted(glob.glob(f"{base}/snapshot-v*")) == versions_before
    snap2 = {r["k"]: (r["val"], r["seq"])
             for r in latest_snapshot(spark, base).collect()}
    assert snap2 == snap


def test_foreach_batch_upsert_recovers_from_crash_before_marker(
        spark, tmp_path):
    """Crash-between-write-and-marker: delete a batch's marker (its
    snapshot dir stays on disk, possibly half-written) and rerun —
    the replayed batch recomputes from its predecessor, overwrites its
    own version, and the final snapshot is identical."""
    import datetime
    import glob
    import os

    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    schema = "k long, ts timestamp, seq long, val string"
    src = str(tmp_path / "crash_src")
    spark.createDataFrame(
        [(1, t(0), 1, "a1"), (2, t(0), 2, "b1")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, t(5), 3, "a2")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    base = str(tmp_path / "crash_snap")
    ckpt = str(tmp_path / "crash_ckpt")

    def run(checkpoint):
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = foreach_batch_upsert(
            stream, base, keys=["k"], order_by=["ts", "seq"],
            checkpoint_dir=checkpoint)
        q.awaitTermination(120)

    run(ckpt)
    want = {r["k"]: r["val"]
            for r in latest_snapshot(spark, base).collect()}
    # simulate the crash: the LAST batch wrote its snapshot but died
    # before committing its marker; Spark will replay it from a fresh
    # checkpoint while earlier batches' markers still short-circuit
    markers = sorted(glob.glob(f"{base}/markers/batch-*.marker"))
    os.remove(markers[-1])
    run(str(tmp_path / "crash_ckpt2"))
    got = {r["k"]: r["val"]
           for r in latest_snapshot(spark, base).collect()}
    assert got == want == {1: "a2", 2: "b1"}


def test_snapshot_time_travel_reads_committed_versions(spark, tmp_path):
    """VERSION AS OF semantics on the upsert snapshots: a committed
    earlier version reads back its point-in-time state; an uncommitted
    id raises instead of serving a half-written directory."""
    import datetime
    import glob

    import pytest as _pytest

    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot, snapshot_at)

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    schema = "k long, ts timestamp, seq long, val string"
    src = str(tmp_path / "tt_src")
    spark.createDataFrame(
        [(1, t(0), 1, "a1"), (2, t(0), 2, "b1")], schema
    ).coalesce(1).write.mode("overwrite").parquet(src)
    spark.createDataFrame(
        [(1, t(5), 3, "a2")], schema
    ).coalesce(1).write.mode("append").parquet(src)

    base = str(tmp_path / "tt_snap")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = foreach_batch_upsert(
        stream, base, keys=["k"], order_by=["ts", "seq"],
        checkpoint_dir=str(tmp_path / "tt_ckpt"))
    q.awaitTermination(120)

    versions = sorted(int(d.rsplit("-v", 1)[1])
                      for d in glob.glob(f"{base}/snapshot-v*"))
    assert len(versions) == 2
    v0 = {r["k"]: r["val"]
          for r in snapshot_at(spark, base, versions[0]).collect()}
    assert v0 == {1: "a1", 2: "b1"}          # pre-second-batch state
    latest = {r["k"]: r["val"]
              for r in latest_snapshot(spark, base).collect()}
    assert latest == {1: "a2", 2: "b1"}
    with _pytest.raises(ValueError, match="not a committed"):
        snapshot_at(spark, base, 999)


def test_vacuum_snapshots_keeps_latest_and_stays_readable(spark, tmp_path):
    """Retention: vacuum drops the oldest committed versions (data dir
    first, marker last), the latest snapshot survives and reads
    identically, and time-travel to a vacuumed id now raises."""
    import datetime
    import glob

    import pytest as _pytest

    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot, snapshot_at,
        vacuum_snapshots)

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    schema = "k long, ts timestamp, seq long, val string"
    src = str(tmp_path / "vac_src")
    for i, rows in enumerate([[(1, t(0), 1, "a1")],
                              [(1, t(5), 2, "a2")],
                              [(2, t(9), 3, "b1")]]):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "overwrite" if i == 0 else "append").parquet(src)

    base = str(tmp_path / "vac_snap")
    stream = (spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = foreach_batch_upsert(
        stream, base, keys=["k"], order_by=["ts", "seq"],
        checkpoint_dir=str(tmp_path / "vac_ckpt"))
    q.awaitTermination(120)

    before = {r["k"]: r["val"]
              for r in latest_snapshot(spark, base).collect()}
    doomed = vacuum_snapshots(spark, base, keep_last=1)
    assert len(doomed) == 2
    assert sorted(glob.glob(f"{base}/snapshot-v*")) == [
        f"{base}/snapshot-v2"]
    after = {r["k"]: r["val"]
             for r in latest_snapshot(spark, base).collect()}
    assert after == before == {1: "a2", 2: "b1"}
    with _pytest.raises(ValueError, match="not a committed"):
        snapshot_at(spark, base, doomed[0])
    with _pytest.raises(ValueError):
        vacuum_snapshots(spark, base, keep_last=0)


def test_drift_psi_stream_matches_batch_and_flags_planted_drift(
        spark, tmp_path):
    """The streaming PSI monitor must (a) equal the identical batch
    computation window-for-window, and (b) score a window drawn from a
    shifted distribution far above a window drawn from the reference
    distribution."""
    import math

    from pyspark.sql import Row
    from oracle_cassandra_migrator_spark.streaming import drift_psi_windows

    # reference: uniform 0..99 -> decile bounds 9.5-ish; use integer
    # bounds and counts from an explicit training population
    ref_pop = [float(i % 100) for i in range(1000)]
    bounds = [9.5, 19.5, 29.5, 39.5, 49.5, 59.5, 69.5, 79.5, 89.5]
    ref_counts = [sum(1 for v in ref_pop
                      if (i == 0 or v > bounds[i - 1])
                      and (i == 9 or v <= bounds[i]))
                  for i in range(10)]
    assert sum(ref_counts) == len(ref_pop)

    import datetime
    base = datetime.datetime(2024, 1, 1, 0, 0, 0)
    rows = []
    # window 1: drawn from the reference shape (uniform)
    for i in range(400):
        rows.append(Row(ts=base + datetime.timedelta(minutes=1),
                        value=float(i % 100)))
    # window 2: all mass in the top decile (drifted)
    for i in range(400):
        rows.append(Row(ts=base + datetime.timedelta(hours=2),
                        value=95.0))
    batch = spark.createDataFrame(rows)
    path = str(tmp_path / "drift_stream")
    batch.repartition(2).write.mode("overwrite").parquet(path)
    batch_on_disk = spark.read.parquet(path)
    stream = spark.readStream.schema(batch_on_disk.schema).parquet(path)

    got = run_to_completion(
        spark,
        drift_psi_windows(stream, bounds, ref_counts, "1 hour"),
        "drift_psi")
    expected = drift_psi_windows(batch_on_disk, bounds, ref_counts,
                                 "1 hour")
    assert as_set(got) == as_set(expected)
    by_start = {r["window_start"]: r for r in got.collect()}
    assert len(by_start) == 2
    w1, w2 = sorted(by_start)
    # uniform window: near-zero drift; shifted window: large
    assert by_start[w1]["psi_micro"] < 100_000
    assert by_start[w2]["psi_micro"] > 1_000_000
    # python reference for the drifted window (all 400 in bucket 10)
    ref_total = sum(ref_counts)
    psi = 0
    for i in range(10):
        p = max(ref_counts[i], 1) / ref_total
        q = max(400 if i == 9 else 0, 1) / 400
        psi += int((p - q) * math.log(p / q) * 1e6 + 0.5)
    assert by_start[w2]["psi_micro"] == psi


def test_enrich_stream_static_matches_batch_and_broadcasts(spark, tmp_path):
    """Stream-static enrichment must equal the identical batch join
    (same function on both) and plan the dim as a broadcast."""
    from oracle_cassandra_migrator_spark.streaming.enrich import (
        enrich_stream_static)

    events = read_table(spark, SF_SMALL, "events")
    src = str(tmp_path / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)
    batch = spark.read.parquet(src)
    stream = spark.readStream.schema(batch.schema).parquet(src)

    dim = (batch.groupBy("user_id")
           .agg(F.count("*").alias("user_total")))
    dim_path = str(tmp_path / "dim")
    dim.write.mode("overwrite").parquet(dim_path)
    dim = spark.read.parquet(dim_path)

    enriched = enrich_stream_static(
        stream.select("event_id", "user_id"), dim, "user_id", how="left")
    q = (enriched.writeStream.format("memory").queryName("enriched")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = spark.table("enriched")

    expected = enrich_stream_static(
        batch.select("event_id", "user_id"), dim, "user_id", how="left")
    assert as_set(got) == as_set(expected)
    assert got.count() == events.count()          # left join preserves rows
    plan = expected._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan

    with pytest.raises(ValueError, match="not supported with a stream"):
        enrich_stream_static(stream, dim, "user_id", how="right")
    with pytest.raises(ValueError, match="must be a batch"):
        enrich_stream_static(stream, stream, "user_id")


def test_refreshing_enrich_sees_dim_updates_between_batches(spark, tmp_path):
    """The foreachBatch variant must re-read the dim per micro-batch:
    rows processed after a dim update carry the NEW attribute, while
    the plain static join would have kept the stale snapshot. Restart
    replay with committed markers must also skip the dim load."""
    from oracle_cassandra_migrator_spark.streaming.enrich import (
        refreshing_enrich_sink)

    src = str(tmp_path / "src")
    dim_path = str(tmp_path / "dim")
    out = str(tmp_path / "out")
    markers = str(tmp_path / "markers")

    facts1 = spark.createDataFrame(
        [(1, "a"), (2, "b")], "fact_id INT, key STRING")
    facts1.coalesce(1).write.mode("append").parquet(src)
    spark.createDataFrame(
        [("a", "v1"), ("b", "v1")], "key STRING, dim_val STRING"
    ).write.mode("overwrite").parquet(dim_path)

    loads = []

    def load_dim(s):
        loads.append(1)
        return s.read.parquet(dim_path)

    schema = "fact_id INT, key STRING"

    def run(ckpt):
        stream = spark.readStream.schema(schema).parquet(src)
        q = refreshing_enrich_sink(
            stream, load_dim, "key",
            {"format": "parquet", "path": out}, markers,
            str(tmp_path / ckpt))
        q.awaitTermination(120)

    run("ckpt1")
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == {
        ("a", 1, "v1"), ("b", 2, "v1")}

    # dim update + new facts -> the NEXT batch must see v2
    spark.createDataFrame(
        [("a", "v2"), ("b", "v2")], "key STRING, dim_val STRING"
    ).write.mode("overwrite").parquet(dim_path)
    spark.createDataFrame(
        [(3, "a")], "fact_id INT, key STRING"
    ).coalesce(1).write.mode("append").parquet(src)

    run("ckpt1")                     # same checkpoint: only the new file
    got = {tuple(r) for r in spark.read.parquet(out).collect()}
    assert got == {("a", 1, "v1"), ("b", 2, "v1"), ("a", 3, "v2")}

    # fresh checkpoint replays everything as new batch ids 0..N: the
    # markers suppress the writes AND the dim loads
    n_loads = len(loads)
    run("ckpt2")
    assert {tuple(r) for r in spark.read.parquet(out).collect()} == got
    assert len(loads) == n_loads, "replayed batch paid a dim load"


def test_foreach_batch_upsert_schema_evolution_opt_in(spark, tmp_path):
    """Self-review r9: the strict merge default must not hard-break a
    restarted upsert stream whose source gained a column — evolution
    is available via allow_missing=True (spec key 'allow_missing'),
    and the strict default fails the batch loudly instead of silently
    forking the snapshot."""
    import datetime
    import glob

    from oracle_cassandra_migrator_spark.streaming import (
        foreach_batch_upsert, latest_snapshot)

    t = lambda m: datetime.datetime(2024, 1, 1, 12, m)
    v1 = "k long, ts timestamp, seq long, val string"
    v2 = v1 + ", extra string"
    src = str(tmp_path / "src")
    base = str(tmp_path / "snap")
    ckpt = str(tmp_path / "ckpt")
    spark.createDataFrame(
        [(1, t(0), 1, "a1")], v1).coalesce(1).write.mode(
        "overwrite").parquet(src)
    q = foreach_batch_upsert(
        (spark.readStream.schema(v1)
         .option("maxFilesPerTrigger", "1").parquet(src)),
        base, keys=["k"], order_by=["ts", "seq"], checkpoint_dir=ckpt)
    q.awaitTermination(120)

    # restart with the EVOLVED source schema
    spark.createDataFrame(
        [(2, t(5), 2, "b1", "x")], v2).coalesce(1).write.mode(
        "append").parquet(src)

    def rerun(allow):
        q = foreach_batch_upsert(
            (spark.readStream.schema(v2)
             .option("maxFilesPerTrigger", "1").parquet(src)),
            base, keys=["k"], order_by=["ts", "seq"],
            checkpoint_dir=ckpt, allow_missing=allow)
        q.awaitTermination(120)

    # strict default: the evolving batch FAILS loudly, nothing commits
    versions_before = sorted(glob.glob(f"{base}/snapshot-v*"))
    import pytest as _pytest

    from pyspark.errors.exceptions.captured import StreamingQueryException

    with _pytest.raises(StreamingQueryException,
                        match="merge_upsert schema drift"):
        rerun(False)
    assert sorted(glob.glob(f"{base}/snapshot-v*")) == versions_before

    # opt-in: the batch evolves, old rows null-fill the new column
    rerun(True)
    snap = {r["k"]: (r["val"], r["extra"])
            for r in latest_snapshot(spark, base).collect()}
    assert snap == {1: ("a1", None), 2: ("b1", "x")}
