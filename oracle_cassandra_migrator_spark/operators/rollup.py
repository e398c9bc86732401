"""Continuous aggregate (hypertable-rollup style): a partitioned
rollup table over event time, refreshed incrementally.

``ContinuousAggregate.refresh(batch)`` aggregates only the NEW batch,
reads back only the rollup partitions that batch touches, merges the
partials (exact decimal sums, so merge == recompute), and rewrites
just those partitions via dynamic partition overwrite. At 100 TB/day
this is the difference between an O(batch) nightly refresh and an
O(history) full recompute; the partition column doubles as the pruning
key for readers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class ContinuousAggregate:
    """Daily (event_day, event_type) rollup with n_events / total_value
    partials stored as exact decimals."""

    def __init__(self, spark: SparkSession, path: str,
                 ts_col: str = "ts", group_col: str = "event_type"):
        self.spark = spark
        self.path = path
        self.ts_col = ts_col
        self.group_col = group_col

    def _aggregate(self, batch: DataFrame) -> DataFrame:
        return (
            batch.groupBy(
                F.expr(f"CAST(date_trunc('day', {self.ts_col}) AS DATE)")
                .alias("event_day"),
                self.group_col,
            )
            .agg(
                F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
                # fixed storage type so every partition write agrees
                F.expr("CAST(SUM(CAST(value AS DECIMAL(18,4)))"
                       " AS DECIMAL(18,4))").alias("total_value"),
            )
        )

    def _exists(self) -> bool:
        try:
            self.spark.read.parquet(self.path)
            return True
        except Exception:
            return False

    def refresh(self, batch: DataFrame) -> list:
        """Merge a new batch into the rollup; returns the affected days."""
        new_partials = self._aggregate(batch).persist()
        days = [r.event_day for r in
                new_partials.select("event_day").distinct().collect()]
        if not days:
            return days
        day_list = ", ".join(f"DATE '{d}'" for d in days)

        merged = new_partials
        if self._exists():
            existing = (
                self.spark.read.parquet(self.path)
                # partition pruning: only the touched days are read back
                .where(f"event_day IN ({day_list})")
            )
            merged = (
                new_partials.unionByName(existing)
                .groupBy("event_day", self.group_col)
                .agg(
                    F.expr("CAST(SUM(n_events) AS BIGINT)").alias("n_events"),
                    F.expr("CAST(SUM(total_value) AS DECIMAL(18,4))")
                    .alias("total_value"),
                )
            )
        (
            merged.coalesce(1)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("event_day")
            .parquet(self.path)
        )
        new_partials.unpersist()
        return days

    def read(self) -> DataFrame:
        return self.spark.read.parquet(self.path)
