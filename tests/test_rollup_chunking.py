"""Continuous aggregate: incremental refresh must equal full recompute
and must only rewrite touched partitions. Chunking UDTF: lossless,
ordered, fixed-size."""

import os

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators.chunking import chunk_documents
from oracle_cassandra_migrator_spark.operators.rollup import ContinuousAggregate
from oracle_cassandra_migrator_spark.sources.testdata import read_table

from tests.conftest import SF_SMALL


def test_incremental_refresh_equals_full_recompute(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    first = events.where("ts < TIMESTAMP '2024-01-15 00:00:00'")
    second = events.where("ts >= TIMESTAMP '2024-01-15 00:00:00'")

    agg = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    days1 = agg.refresh(first)
    days2 = agg.refresh(second)
    assert days1 and days2

    got = {
        (str(r.event_day), r.event_type, r.n_events, float(r.total_value))
        for r in agg.read().collect()
    }
    full = {
        (str(r.event_day), r.event_type, r.n_events, float(r.total_value))
        for r in agg._aggregate(events).collect()
    }
    assert got == full


def test_refresh_rewrites_only_touched_partitions(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    agg = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    agg.refresh(events.where("ts < TIMESTAMP '2024-01-10 00:00:00'"))

    untouched_dir = str(tmp_path / "rollup" / "event_day=2024-01-05")
    mtime_before = max(
        os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir))

    days = agg.refresh(
        events.where("ts >= TIMESTAMP '2024-01-20 00:00:00'"))
    assert all(str(d) >= "2024-01-20" for d in days)
    mtime_after = max(
        os.path.getmtime(os.path.join(untouched_dir, f))
        for f in os.listdir(untouched_dir))
    assert mtime_after == mtime_before  # old partition untouched


def test_overlapping_refresh_merges_not_duplicates(spark, tmp_path):
    events = read_table(spark, SF_SMALL, "events")
    day = events.where(
        "ts >= TIMESTAMP '2024-01-10 00:00:00'"
        " AND ts < TIMESTAMP '2024-01-11 00:00:00'")
    agg = ContinuousAggregate(spark, str(tmp_path / "rollup"))
    # same day refreshed in two halves must merge into one exact total
    agg.refresh(day.where("event_id % 2 = 0"))
    agg.refresh(day.where("event_id % 2 = 1"))
    got = agg.read().agg(F.sum("n_events")).collect()[0][0]
    assert got == day.count()


def test_chunking_is_lossless_and_sized(spark):
    docs = read_table(spark, SF_SMALL, "documents")
    chunks = chunk_documents(spark, docs, size=50).persist()
    # token-count preservation per doc
    per_doc = chunks.groupBy("doc_id").agg(
        F.sum("n_tokens").alias("n"),
        F.max("n_tokens").alias("mx"),
        F.count("*").alias("n_chunks"))
    truth = docs.selectExpr(
        "doc_id", "size(split(trim(text), '\\\\s+')) AS n_words")
    joined = per_doc.join(truth, "doc_id")
    bad = joined.where("n != n_words OR mx > 50").count()
    assert bad == 0
    # chunk indices are dense from 0
    dense = chunks.groupBy("doc_id").agg(
        F.max("chunk_idx").alias("mx"), F.count("*").alias("c"))
    assert dense.where("mx != c - 1").count() == 0
