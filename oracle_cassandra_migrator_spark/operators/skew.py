"""Skew mitigation: salting for hot keys.

At 100 TB a handful of hot keys (one huge customer, one dominant event
type) can pin an entire shuffle partition to a single task. Two
standard remedies, both expressible as plain DataFrame ops:

- ``salted_aggregate``: two-stage aggregation — group by (key, salt)
  first so the hot key fans out over N partitions, then re-aggregate by
  key. Works for any decomposable aggregate (sum/count/min/max).
  Results are bit-identical to a direct groupBy when the partial
  aggregates are exact (decimal sums, counts), so the oracle is just
  the plain GROUP BY.
- ``salted_broadcast_join``: replicate the small side N times (one copy
  per salt value) and salt the big side's key, so a hot join key
  spreads over N tasks. Equivalent rows, different physical layout.

AQE's skewJoin handles sort-merge skew automatically (enabled in
session defaults); salting is for the aggregation case and for
deliberate layout control.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    key_cols: list[str],
    partial_aggs: list[str],
    final_aggs: list[str],
    n_salts: int = 16,
) -> DataFrame:
    """Two-stage skew-safe aggregation.

    ``partial_aggs`` aggregate within (key, salt); ``final_aggs``
    combine the partials per key. E.g. partial ``SUM(x) AS s`` +
    final ``SUM(s) AS total``; partial ``COUNT(*) AS c`` + final
    ``CAST(SUM(c) AS BIGINT) AS n``. The salt is a uniform hash of the
    full row spread, so each hot key splits ~evenly."""
    salted = df.withColumn(
        "__salt", (F.spark_partition_id() + F.monotonically_increasing_id())
        % n_salts)
    partial = salted.groupBy(*key_cols, "__salt").agg(
        *[F.expr(a) for a in partial_aggs])
    return partial.groupBy(*key_cols).agg(*[F.expr(a) for a in final_aggs])


def salted_broadcast_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: explode the small side across salt values
    and join on (key, salt). The big side's salt is derived from a
    uniform hash so each hot key's rows scatter over ``n_salts`` tasks.

    Join shapes that preserve only big-side rows are safe — ``inner``,
    ``left`` (outer), ``left_semi``, ``left_anti`` — because each big
    row carries exactly one salt, so match presence and at-most-once
    emission are unaffected by replicating the small side. Shapes that
    emit *unmatched small-side rows* (right/full outer) would emit each
    unmatched row ``n_salts`` times; for those swap the sides or use
    AQE's skew-join handling instead."""
    norm = how.lower().replace("_", "")
    if norm not in ("inner", "left", "leftouter", "leftsemi", "semi",
                    "leftanti", "anti"):
        raise ValueError(
            f"salted_broadcast_join supports inner/left/left_semi/left_anti "
            f"joins only, got {how!r}: the replicated small side would "
            "duplicate unmatched rows under right/full outer joins")
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))).alias("__salt")
    small_rep = small.select("*", salts)
    big_salted = big.withColumn(
        "__salt", F.pmod(F.xxhash64(*big.columns), F.lit(n_salts)))
    joined = big_salted.join(
        F.broadcast(small_rep),
        on=[big_salted["__salt"] == small_rep["__salt"],
            big_salted[big_key] == small_rep[small_key]],
        how=how,
    )
    return joined.drop("__salt")
