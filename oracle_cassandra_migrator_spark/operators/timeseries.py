"""Time-series gap-filling — the hypertable ``time_bucket_gapfill``
analog, batch form. Single corpus pass: collapse to the (key, day)
aggregate, build a per-key day->count map + bounds (a second tiny
aggregation over the aggregated rows), generate the calendar via
sequence+explode, 0-fill from the map, forward-fill with a window over
|keys x days| rows only.

The reference engine has no time-series operator; this extends its
daily-report shape (events grouped by day) with the gap semantics a
monitoring/feature pipeline needs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window


def daily_gapfill(
    events: DataFrame, key: str, ts_col: str, out_day: str = "day",
) -> DataFrame:
    """(key, STRING day, n_events, days_since_active) for every
    calendar day between each key's first and last active day; absent
    days carry n_events = 0 and days_since_active counts from the last
    day that had events (forward fill)."""
    daily = (
        events.selectExpr(
            key, f"CAST(date_trunc('DAY', {ts_col}) AS DATE) AS __day")
        .groupBy(key, "__day")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_events"))
    )
    per_key = daily.groupBy(key).agg(
        F.expr("map_from_entries(collect_list(struct(__day, n_events)))")
        .alias("m"),
        F.min("__day").alias("d0"), F.max("__day").alias("d1"))
    cal = per_key.select(
        key, "m",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("__day"))
    filled = cal.selectExpr(
        key, "__day",
        "coalesce(element_at(m, __day), CAST(0 AS BIGINT)) AS n_events")
    w = (Window.partitionBy(key).orderBy("__day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        filled.withColumn(
            "last_active",
            F.max(F.expr("CASE WHEN n_events > 0 THEN __day END")).over(w))
        .selectExpr(
            key, f"CAST(__day AS STRING) AS {out_day}", "n_events",
            "CAST(datediff(__day, last_active) AS INT) AS days_since_active")
    )
