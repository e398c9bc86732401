"""Data-layout control: Z-order (Morton) clustering for multi-column
row-group pruning on plain parquet.

Parquet scans prune row groups by min/max statistics; a sort on one
column gives perfect pruning for that column and none for the others.
Interleaving the bits of several columns' normalized values (the
Z-curve, what Delta OSS's OPTIMIZE ZORDER BY does on top of the same
idea) clusters rows so EVERY zordered column's min/max per file spans
only a fraction of its range — at 100 TB this is the difference
between scanning a whole snapshot and a few percent of it for
predicates on any of the clustered columns.

All pure built-in expressions (bit ops inside one projection): the
normalization bounds come from one cheap min/max aggregation over the
frame being written, then the write is repartitionByRange +
sortWithinPartitions on the z-value — one range shuffle, the same cost
any sorted write pays.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def zorder_value_expr(cols: list[str],
                      bounds: dict[str, tuple[float, float]],
                      bits: int = 8) -> str:
    """BIGINT Morton code: each column scales to [0, 2^bits) using its
    (min, max) bounds, then bit i of column j lands at position
    i * n_cols + j. Degenerate columns (min == max) contribute 0."""
    n = len(cols)
    parts = []
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        span = hi - lo
        if span <= 0:
            continue
        scaled = (f"CAST(least(greatest(floor((CAST({c} AS DOUBLE) - {lo!r})"
                  f" / {span!r} * {2 ** bits}), 0), {2 ** bits - 1}) AS BIGINT)")
        for i in range(bits):
            # fully parenthesized: SQL '+' binds tighter than '<<'
            parts.append(
                f"(((({scaled}) >> {i}) & 1) << {i * n + j})")
    if not parts:
        return "CAST(0 AS BIGINT)"
    return "CAST(" + " + ".join(parts) + " AS BIGINT)"


def zorder_frame(df: DataFrame, cols: list[str], n_files: int,
                 bits: int = 8) -> DataFrame:
    """Return ``df`` range-partitioned and sorted by its Morton code,
    ready for a parquet write of ~``n_files`` z-clustered files. One
    min/max aggregation job over the z columns, one range shuffle."""
    aggs = []
    for c in cols:
        aggs += [F.expr(f"CAST(min({c}) AS DOUBLE)").alias(f"__min_{c}"),
                 F.expr(f"CAST(max({c}) AS DOUBLE)").alias(f"__max_{c}")]
    row = df.agg(*aggs).collect()[0]
    bounds = {c: (row[f"__min_{c}"], row[f"__max_{c}"]) for c in cols}
    z = zorder_value_expr(cols, bounds, bits)
    return (df.repartitionByRange(n_files, F.expr(z))
            .sortWithinPartitions(F.expr(z)))
