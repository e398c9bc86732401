"""Bucketed interval join — the equi-key rewrite of a range/theta join
against a LARGE interval table (SCALE.md's promised "bucketing trick",
same family as the IVF/LSH cell joins).

A naive `probe.value BETWEEN iv.lo AND iv.hi` join is a
BroadcastNestedLoopJoin (fine for 3 intervals, catastrophic for 10M):
every probe row tests every interval. The rewrite grids the domain
into fixed-width buckets, explodes each interval into the buckets it
covers (cost: interval_span/width extra rows on the SMALL side), keys
every probe row by its single bucket, and hash-joins on the bucket key
— then re-checks the exact bounds. The shuffle is O(probe + exploded
intervals) on a dense integer key; no nested loop anywhere.

Width tuning: ~median interval span. Too small → interval side
explodes; too large → each bucket pairs probes with intervals they
miss (wasted exact-filter work), degenerating toward the nested loop.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bucketed_interval_join(
    probe: DataFrame, intervals: DataFrame, value_col: str,
    lo_col: str, hi_col: str, width: float,
) -> DataFrame:
    """Inner-join probe rows to every interval containing them
    ([lo, hi] inclusive), via the bucket-grid equi-join. Result carries
    all probe and interval columns."""
    iv = intervals.withColumn(
        "__bucket",
        F.explode(F.expr(
            f"sequence(CAST(floor({lo_col} / {width}) AS BIGINT),"
            f" CAST(floor({hi_col} / {width}) AS BIGINT))")))
    pr = probe.withColumn(
        "__bucket",
        F.expr(f"CAST(floor({value_col} / {width}) AS BIGINT)"))
    return (
        pr.join(iv, "__bucket")
        .where(f"{value_col} >= {lo_col} AND {value_col} <= {hi_col}")
        .drop("__bucket")
    )
