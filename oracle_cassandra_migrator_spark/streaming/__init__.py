from oracle_cassandra_migrator_spark.streaming.windows import (
    session_window_counts,
    sliding_window_agg,
    tumbling_window_agg,
)

__all__ = [
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_counts",
]
