from oracle_cassandra_migrator_spark.streaming.enrich import (
    enrich_stream_static,
    refreshing_enrich_sink,
)
from oracle_cassandra_migrator_spark.streaming.joins import (
    interval_join_streams,
)
from oracle_cassandra_migrator_spark.streaming.stateful import (
    sessionize_stateful,
)
from oracle_cassandra_migrator_spark.streaming.quota import (
    quota_limit_stream,
)
from oracle_cassandra_migrator_spark.streaming.sources import (
    read_stream_source,
)
from oracle_cassandra_migrator_spark.streaming.windows import (
    drift_psi_windows,
    session_window_counts,
    sliding_window_agg,
    tumbling_window_agg,
)
from oracle_cassandra_migrator_spark.streaming.upsert import (
    foreach_batch_upsert,
    latest_snapshot,
    snapshot_at,
    vacuum_snapshots,
)
from oracle_cassandra_migrator_spark.streaming.neardedup import (
    compact_near_dedup,
    foreach_batch_near_dedup,
    vacuum_near_dedup,
)

__all__ = [
    "compact_near_dedup",
    "foreach_batch_near_dedup",
    "vacuum_near_dedup",
    "enrich_stream_static",
    "refreshing_enrich_sink",
    "interval_join_streams",
    "foreach_batch_upsert",
    "latest_snapshot",
    "snapshot_at",
    "vacuum_snapshots",
    "sessionize_stateful",
    "quota_limit_stream",
    "read_stream_source",
    "tumbling_window_agg",
    "drift_psi_windows",
    "sliding_window_agg",
    "session_window_counts",
]
