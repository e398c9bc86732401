"""Incremental aggregate maintenance: apply a CDC delta batch to a
previously materialized grouped aggregate instead of recomputing it
from the base table.

This is the 100 TB answer to "the nightly rollup": once the base
aggregate exists (|groups| rows), each maintenance step touches ONLY
the CDC batch — one shuffle over the batch to form per-group deltas,
then a broadcast merge into the base aggregate. The base table is
never re-scanned. Only fully incremental measures are supported
(COUNT / SUM, and anything derived from them like AVG); MIN/MAX are
deliberately excluded because a delete of the current extremum forces
a rescan of the group — callers who need them should keep a per-group
sketch (e.g. the KLL family in operators/sketches.py) or accept
recompute-on-delete.

CDC rows follow the usual change-stream shape: an ``op`` column with
values ``I`` (insert: only the new image is meaningful), ``D``
(delete: only the old image), ``U`` (update: both images, same key).
Grouping keys must be immutable under updates (a key-changing update
must be emitted as D+I by the producer — asserted here by contract,
not scanned).

No reference counterpart (the 450-line reference recomputes and
overwrites per table, verizon_table_migration_Rakesh_filters.py's
phase 3); this generalizes its sink into a maintenance step.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

OP_COL = "op"
VALID_OPS = ("I", "U", "D")


def cdc_to_group_deltas(
    cdc: DataFrame,
    keys: list[str],
    new_expr: str,
    old_expr: str,
    op_col: str = OP_COL,
) -> DataFrame:
    """Collapse a CDC batch to per-group (d_n, d_sum) deltas.

    ``new_expr`` / ``old_expr`` are SQL expressions for the measure's
    new and old images (e.g. ``"price_cents"`` / ``"old_price_cents"``).
    Insert contributes (+1, +new), delete (-1, -old), update
    (0, new - old). Sums accumulate as DECIMAL(38,0) so the merge is
    exact and order-independent at any batch size.

    One hash shuffle over the CDC batch — the base table and the base
    aggregate are not touched here.
    """
    # ops outside I/U/D fail LOUDLY, engine-side: a silently-absorbed
    # 'T' (truncate) or lowercase 'i' would drift the maintained
    # aggregate from the true state with no error
    contrib_n = (
        f"CASE WHEN {op_col} = 'I' THEN 1 "
        f"WHEN {op_col} = 'D' THEN -1 "
        f"WHEN {op_col} = 'U' THEN 0 "
        f"ELSE CAST(raise_error(concat('cdc op must be one of "
        f"I/U/D, got: ', COALESCE({op_col}, 'NULL'))) AS INT) END"
    )
    contrib_sum = (
        f"CASE WHEN {op_col} = 'I' THEN CAST(({new_expr}) AS DECIMAL(38,0)) "
        f"WHEN {op_col} = 'D' THEN -CAST(({old_expr}) AS DECIMAL(38,0)) "
        f"ELSE CAST(({new_expr}) AS DECIMAL(38,0)) "
        f"     - CAST(({old_expr}) AS DECIMAL(38,0)) END"
    )
    return (
        cdc.groupBy(*[F.col(k) for k in keys])
        .agg(
            F.expr(f"CAST(SUM({contrib_n}) AS BIGINT)").alias("d_n"),
            F.expr(f"SUM({contrib_sum})").alias("d_sum"),
        )
    )


def maintain_sum_count(
    base_agg: DataFrame,
    deltas: DataFrame,
    keys: list[str],
    n_col: str = "n",
    sum_col: str = "s",
) -> DataFrame:
    """Merge per-group deltas into a materialized (count, sum)
    aggregate and return the maintained aggregate.

    UNION + re-aggregate rather than a join: groups only in the delta
    are births for free, and groups whose maintained count reaches 0
    are removed (a count going NEGATIVE means the CDC stream and the
    base aggregate disagree — surfaced rather than silently clamped,
    so audits catch producer bugs). A full-outer join is the naive
    shape, but Spark cannot broadcast either side of a full outer
    (the hint is rejected), so it would shuffle BOTH sides anyway;
    the union re-aggregate is one hash exchange with map-side
    partials, and when the materialized aggregate is stored BUCKETED
    by the group keys (sources/bucketed.py) that exchange collapses to
    shuffling only the delta — the maintenance step then never moves
    the base at any scale.
    """
    b = base_agg.select(
        *keys,
        F.col(n_col).cast("bigint").alias("__m_n"),
        F.col(sum_col).cast("decimal(38,0)").alias("__m_s"))
    d = deltas.select(
        *keys,
        F.col("d_n").cast("bigint").alias("__m_n"),
        F.col("d_sum").cast("decimal(38,0)").alias("__m_s"))
    return (
        b.unionByName(d)
        .groupBy(*[F.col(k) for k in keys])
        .agg(
            F.expr("CAST(SUM(__m_n) AS BIGINT)").alias(n_col),
            F.expr("SUM(__m_s)").alias(sum_col),
        )
        .filter(F.col(n_col) != 0)
    )
