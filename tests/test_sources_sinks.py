"""Source/sink breadth (SURVEY.md §2.1): format roundtrips through the
declarative reader/writer, JDBC partitioned-read option mapping, and
repartition policies."""

import pytest

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.sinks.writers import write_sink
from oracle_cassandra_migrator_spark.sources.readers import read_source

from tests.conftest import SF_SMALL


@pytest.fixture()
def nation(spark):
    return read_source(spark, {
        "format": "parquet", "path": f"{SF_SMALL}/nation.parquet"})


def test_avro_roundtrips_or_fails_cleanly(spark, tmp_path, nation):
    """Avro is an external Spark module: with spark-avro on the
    classpath the roundtrip must work like any other format; without
    it (pip pyspark, this env) both reader and writer must raise a
    clear error naming the required package — never Spark's raw
    ClassNotFoundException mid-job."""
    from oracle_cassandra_migrator_spark.sources.readers import (
        avro_available,
    )

    path = str(tmp_path / "out_avro")
    if avro_available(spark):
        write_sink(nation, {"format": "avro", "path": path})
        back = read_source(spark, {"format": "avro", "path": path})
        assert back.count() == nation.count()
    else:
        with pytest.raises(ValueError, match="spark-avro"):
            write_sink(nation, {"format": "avro", "path": path})
        with pytest.raises(ValueError, match="spark-avro"):
            read_source(spark, {"format": "avro", "path": path})


@pytest.mark.parametrize("fmt", ["parquet", "csv", "json", "orc"])
def test_format_roundtrip(spark, tmp_path, nation, fmt):
    path = str(tmp_path / f"out_{fmt}")
    options = {"header": "true"} if fmt == "csv" else {}
    write_sink(nation, {"format": fmt, "path": path, "options": options,
                        "repartition": 2})
    back = read_source(spark, {
        "format": fmt, "path": path, "options": options,
        "schema": "n_nationkey INT, n_name STRING, n_regionkey INT",
    })
    assert back.count() == nation.count()
    assert {r.n_name for r in back.collect()} == \
        {r.n_name for r in nation.collect()}


def test_text_format_roundtrip(spark, tmp_path, nation):
    """S7 line-oriented text source/sink: a single string column per
    line (the raw-corpus ingest format for LLM pipelines)."""
    path = str(tmp_path / "out_text")
    lines = nation.selectExpr("n_name AS value")
    write_sink(lines, {"format": "text", "path": path})
    back = read_source(spark, {"format": "text", "path": path})
    assert back.columns == ["value"]
    assert {r.value for r in back.collect()} == \
        {r.n_name for r in nation.collect()}


def test_source_filter_and_projection_pushdown(spark):
    df = read_source(spark, {
        "format": "parquet",
        "path": f"{SF_SMALL}/customer.parquet",
        "filter": "c_acctbal > 0",
        "select": ["c_custkey", "c_acctbal"],
    })
    assert df.columns == ["c_custkey", "c_acctbal"]
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "c_name" not in plan  # column pruned at the scan
    assert df.where("c_acctbal <= 0").count() == 0


def test_jdbc_partitioned_options_mapping(spark):
    """The range-partitioned parallel read options (reference S2,
    py:109-114) must land on the JDBC reader verbatim. No database in
    this environment, so assert on the built reader's option map."""
    from unittest.mock import patch

    captured = {}

    class FakeReader:
        def format(self, fmt):
            captured["format"] = fmt
            return self

        def options(self, **kw):
            captured.update(kw)
            return self

        def schema(self, s):
            return self

        def load(self, *a):
            captured["loaded"] = True

            class _D:
                def where(self, *_): return self
                def selectExpr(self, *_): return self
                def alias(self, *_): return self
            return _D()

    with patch.object(type(spark), "read", property(lambda self: FakeReader())):
        read_source(spark, {
            "format": "jdbc",
            "options": {"url": "jdbc:oracle:thin:@db:1521/XE",
                        "dbtable": "table_contact",
                        "driver": "oracle.jdbc.OracleDriver"},
            "partitioning": {"column": "objid", "lower_bound": 100009,
                             "upper_bound": 999995, "num_partitions": 8},
            "fetch_size": 10000,
        })
    assert captured["format"] == "jdbc"
    assert captured["partitionColumn"] == "objid"
    assert captured["lowerBound"] == "100009"
    assert captured["upperBound"] == "999995"
    assert captured["numPartitions"] == "8"
    assert captured["fetchsize"] == "10000"
    assert captured["loaded"]


def test_repartition_policies(spark, nation, tmp_path):
    from oracle_cassandra_migrator_spark.sinks.writers import _apply_repartition

    assert _apply_repartition(nation, 4).rdd.getNumPartitions() == 4
    assert _apply_repartition(nation, "coalesce:1").rdd.getNumPartitions() == 1
    by_key = _apply_repartition(nation, {"partitions": 3, "by": ["n_regionkey"]})
    assert by_key.rdd.getNumPartitions() == 3
    ranged = _apply_repartition(
        nation, {"partitions": 2, "range_by": ["n_nationkey"]})
    assert ranged.rdd.getNumPartitions() == 2
    with pytest.raises(ValueError):
        _apply_repartition(nation, 3.5)


def test_partition_by_writes_hive_layout(spark, nation, tmp_path):
    import os

    path = str(tmp_path / "partitioned")
    write_sink(nation, {"format": "parquet", "path": path,
                        "partition_by": ["n_regionkey"]})
    dirs = {d for d in os.listdir(path) if d.startswith("n_regionkey=")}
    assert len(dirs) == 5
    back = spark.read.parquet(path)
    assert back.count() == nation.count()


def test_partition_pruned_read(spark, tmp_path):
    """Hive-partitioned layout + filter -> PartitionFilters prune whole
    directories at plan time (the 100 TB layout story: readers touch
    1/N of the data)."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    path = str(tmp_path / "events_by_day")
    events = read_table(spark, SF_SMALL, "events").selectExpr(
        "event_id", "user_id", "event_type", "value",
        "CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING) AS event_day")
    write_sink(events, {"format": "parquet", "path": path,
                        "partition_by": ["event_day"]})

    pruned = read_source(spark, {
        "format": "parquet", "path": path,
        "filter": "event_day = '2024-01-05'",
    })
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    # the equality predicate must surface as a PartitionFilter on the
    # scan (directory-level pruning), not a post-scan Filter
    import re

    assert "PartitionFilters" in plan
    start = plan.index("PartitionFilters")
    assert re.search(r"event_day#\d+ = 2024-01-05", plan[start:start + 200])
    assert pruned.count() == events.where("event_day = '2024-01-05'").count()


def test_zorder_layout_narrows_file_stats_on_both_columns(spark, tmp_path):
    """Z-clustered files must carry narrow min/max spans on EVERY
    zordered column (that is the pruning property parquet scans use);
    a plain round-robin layout spans ~the full range in every file."""
    import glob

    import pyarrow.parquet as pq

    orders = read_source(spark, {
        "format": "parquet", "path": f"{SF_SMALL}/orders.parquet",
        "select": ["o_orderkey", "o_custkey", "o_totalprice"],
    })

    plain_dir = str(tmp_path / "plain")
    z_dir = str(tmp_path / "zorder")
    write_sink(orders, {"format": "parquet", "path": plain_dir,
                        "repartition": 8})
    write_sink(orders, {"format": "parquet", "path": z_dir,
                        "zorder_by": {"cols": ["o_custkey", "o_orderkey"],
                                      "n_files": 8}})

    def mean_span(out_dir, col):
        spans = []
        for f in glob.glob(f"{out_dir}/part-*.parquet"):
            md = pq.ParquetFile(f).metadata
            idx = md.schema.names.index(col)
            lo = min(md.row_group(i).column(idx).statistics.min
                     for i in range(md.num_row_groups))
            hi = max(md.row_group(i).column(idx).statistics.max
                     for i in range(md.num_row_groups))
            spans.append(hi - lo)
        assert len(spans) >= 4
        return sum(spans) / len(spans)

    for col in ("o_custkey", "o_orderkey"):
        z = mean_span(z_dir, col)
        plain = mean_span(plain_dir, col)
        assert z < 0.7 * plain, (col, z, plain)


def test_compaction_plan_properties():
    """FFD plan invariants under hypothesis: every file lands in
    exactly one bin, no bin exceeds the target unless it holds a
    single oversized file, and the bin count is within the FFD bound
    of the volume lower bound."""
    import math

    from hypothesis import given, settings
    from hypothesis import strategies as st

    from oracle_cassandra_migrator_spark.operators.layout import (
        plan_compaction)

    @settings(max_examples=200, deadline=None)
    @given(
        sizes=st.lists(st.integers(1, 5000), min_size=0, max_size=60),
        target=st.integers(1, 6000),
    )
    def check(sizes, target):
        files = [(f"f{i:03d}", s) for i, s in enumerate(sizes)]
        by_path = dict(files)
        bins = plan_compaction(files, target)
        flat = [p for b in bins for p in b]
        assert sorted(flat) == sorted(p for p, _ in files)
        for b in bins:
            total = sum(by_path[p] for p in b)
            assert total <= target or len(b) == 1
        if sizes and all(s <= target for s in sizes):
            lower = math.ceil(sum(sizes) / target)
            assert len(bins) <= math.ceil(11 * lower / 9) + 1
        assert bins == plan_compaction(list(reversed(files)), target)

    check()


def test_compaction_apply_roundtrip(spark, tmp_path):
    """Applying the plan merges many small files into one file per
    bin with no row lost or duplicated."""
    import glob
    import os

    from oracle_cassandra_migrator_spark.operators.layout import (
        compact_parquet_bins, plan_compaction)

    src = tmp_path / "small"
    for i in range(6):
        (spark.range(i * 100, (i + 1) * 100)
         .coalesce(1).write.mode("overwrite")
         .parquet(str(src / f"part{i}")))
    files = []
    for i in range(6):
        for p in glob.glob(str(src / f"part{i}" / "*.parquet")):
            files.append((p, os.path.getsize(p)))
    target = 3 * max(s for _, s in files)
    bins = plan_compaction(files, target)
    assert 1 < len(bins) < 6
    outs = compact_parquet_bins(spark, bins, str(tmp_path / "compacted"))
    for d in outs:
        assert len(glob.glob(f"{d}/*.parquet")) == 1
    total = spark.read.parquet(*outs).count()
    assert total == 600
    assert (spark.read.parquet(*outs).distinct().count() == 600)


def test_read_source_merges_evolved_schemas(spark, tmp_path):
    """Incremental snapshots drift columns over time; read_source must
    surface the union schema via option passthrough (mergeSchema) with
    NULLs for the missing columns — the evolution-safe read an
    append-only corpus needs."""
    from oracle_cassandra_migrator_spark.sources.readers import read_source

    base = str(tmp_path / "evolved")
    spark.createDataFrame(
        [(1, "a")], "doc_id long, text string"
    ).write.mode("overwrite").parquet(base + "/day=1")
    spark.createDataFrame(
        [(2, "b", "en")], "doc_id long, text string, lang string"
    ).write.mode("overwrite").parquet(base + "/day=2")

    df = read_source(spark, {
        "format": "parquet", "path": base,
        "options": {"mergeSchema": "true", "recursiveFileLookup": "true"},
    })
    assert set(df.columns) >= {"doc_id", "text", "lang"}
    rows = {r.doc_id: (r.text, r.lang) for r in df.collect()}
    assert rows == {1: ("a", None), 2: ("b", "en")}


def test_xml_format_roundtrip(spark, tmp_path, nation):
    """S7 native XML (built into Spark 4): rowTag-scoped records
    roundtrip through the declarative reader/writer with option
    passthrough — the config-ingest format enterprise feeds still
    ship. Values compare via the declared schema so typing is
    explicit, not inference-lucky."""
    path = str(tmp_path / "out_xml")
    write_sink(nation, {"format": "xml", "path": path,
                        "options": {"rowTag": "nation"},
                        "repartition": 2})
    back = read_source(spark, {
        "format": "xml", "path": path,
        "options": {"rowTag": "nation"},
        "schema": "n_nationkey INT, n_name STRING, n_regionkey INT",
    })
    assert back.count() == nation.count()
    assert {(r.n_nationkey, r.n_name) for r in back.collect()} == \
        {(r.n_nationkey, r.n_name) for r in nation.collect()}


def test_read_table_fan_out_gate(spark):
    """r12 scan fan-out: `read_table(..., fan_out=True)` round-robin
    repartitions ONLY when the parquet's row-group count (footer-read,
    never df.rdd — that costs ~50 ms of driver planning inside a
    timed query) is below half the session cores; with enough row
    groups it is the identity, so at real scale the extra exchange
    never exists."""
    from oracle_cassandra_migrator_spark.sources import testdata
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    plain = read_table(spark, SF_SMALL, "lineitem")
    assert "RoundRobinPartitioning" not in \
        plain._jdf.queryExecution().toString()

    fanned = read_table(spark, SF_SMALL, "lineitem", fan_out=True)
    assert "RoundRobinPartitioning" in \
        fanned._jdf.queryExecution().toString()

    real = testdata._row_group_count
    testdata._row_group_count = lambda p: 10**9
    try:
        split_enough = read_table(spark, SF_SMALL, "lineitem",
                                  fan_out=True)
        assert "RoundRobinPartitioning" not in \
            split_enough._jdf.queryExecution().toString()
    finally:
        testdata._row_group_count = real


def test_with_shingles_gate_uses_footers_for_file_sources(spark):
    """r13: with_shingles' fan-out gate reads parquet footers through
    the same cached pyarrow path as read_table (inputFiles ~10 ms vs
    df.rdd ~37 ms per plan, both inside every shingle consumer's timed
    region); on the single-row-group testdata the repartition fires,
    with enough row groups it is the identity, and non-file sources
    (in-memory frames) still fall back to the RDD probe."""
    from oracle_cassandra_migrator_spark.operators.text import with_shingles
    from oracle_cassandra_migrator_spark.sources import testdata
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    docs = read_table(spark, SF_SMALL, "documents").select("doc_id", "text")
    fanned = with_shingles(docs, "text", 3)
    assert "RoundRobinPartitioning" in \
        fanned._jdf.queryExecution().toString()

    real = testdata._row_group_count
    testdata._row_group_count = lambda p: 10**9
    try:
        identity = with_shingles(docs, "text", 3)
        assert "RoundRobinPartitioning" not in \
            identity._jdf.queryExecution().toString()
    finally:
        testdata._row_group_count = real

    mem = spark.createDataFrame([(1, "a b c")], ["doc_id", "text"])
    assert with_shingles(mem, "text", 3).count() == 1  # RDD fallback path
