"""Stream-stream joins with watermark-bounded state.

A stream-stream equi-join must buffer both sides until the watermark
proves no more matches can arrive; without a time bound the state
grows forever. ``interval_join_streams`` encodes the standard recipe:
watermarks on BOTH sides plus an event-time interval condition, so
Spark derives a state-eviction bound (a left row is dropped once the
right watermark passes ``left_ts + upper``). State per key is then
bounded by (watermark delay + interval width) x input rate, at any
scale. See tests/test_streaming.py for the stream==batch parity check
(the same function runs unchanged on batch DataFrames, which is also
how the driver-side equivalence is established).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    lookback: str = "INTERVAL 1 HOUR",
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join ``left`` rows to ``right`` rows with the same ``key`` whose
    ``right_ts`` falls in [left_ts - lookback, left_ts] — e.g.
    purchases (left) to the clicks (right) that preceded them within
    an hour. Works identically on streaming and batch frames; on
    streams the watermarks + interval make the join state bounded.

    Column names must already be disjoint apart from ``key`` being the
    left-side name and ``key + '_r'`` expected on the right (rename
    before calling, as with any self-join)."""
    lw = left.withWatermark(left_ts, watermark) if left.isStreaming else left
    rw = (right.withWatermark(right_ts, watermark)
          if right.isStreaming else right)
    cond = F.expr(
        f"{key} = {key}_r AND {right_ts} <= {left_ts}"
        f" AND {right_ts} >= {left_ts} - {lookback}")
    return lw.join(rw, cond, how)
