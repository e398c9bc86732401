"""Timezone immunity: the driver's session timezone is unknown, so
every date/time-bearing query must produce identical results under a
non-UTC session (guaranteed by NTZ-only timestamp handling — see
NOTES.md). Flips the runtime conf, compares against DuckDB, flips back."""

import pytest

from oracle_cassandra_migrator_spark.queries import ORACLES, QUERIES

from tests.test_queries_vs_duckdb import (
    SF_DIR,
    duck_connection,
    normalize_rows,
)

DATE_BEARING = [
    "flagship_payment_pipeline",
    "scalar_date_functions",
    "events_daily_type_counts",
    "events_sessionize",
    "asof_join_purchase_click",
    "pricing_summary",
    "tpch_q6_forecast_revenue",
    "events_funnel_counts",
    # round-5 second wave: the EWMA day index derives from CAST(ts AS
    # DATE) over NTZ micros, the rolling/gapfill pair already proved
    # the pattern; drift/sampling are date-free but ride along cheap
    "events_daily_ewma",
    "events_type_transition_matrix",
    # round-6 continuation: session-day truncation, ISO-week
    # truncation, order-date recency diffs, funnel-latency µs diffs,
    # shipdate zone-map months, Q3's date-literal predicates
    "events_session_stats",
    "events_wow_delta",
    "orders_rfm_segments",
    "events_funnel_latency",
    "layout_minmax_pruning_stats",
    "tpch_q3_shipping_priority",
]


@pytest.mark.parametrize("name", DATE_BEARING)
def test_query_is_timezone_immune(spark, name):
    saved = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        result = QUERIES[name](spark, SF_DIR)
        spark_rows = [tuple(r) for r in result.collect()]
        con = duck_connection(SF_DIR)  # keep a ref: GC closes the conn
        oracle = con.sql(ORACLES[name])
        duck_rows = oracle.fetchall()
        duck_cols = [d[0] for d in oracle.description]
        assert normalize_rows(result.columns, spark_rows) == \
            normalize_rows(duck_cols, duck_rows), name
    finally:
        spark.conf.set("spark.sql.session.timeZone", saved)
