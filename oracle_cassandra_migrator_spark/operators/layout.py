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
    if bits * n > 63:
        # Spark's shift is mod 64 and bit 63 is the BIGINT sign: past
        # that the interleave silently wraps/inverts — fail loudly
        raise ValueError(
            f"zorder: {n} cols x {bits} bits = {bits * n} interleaved "
            f"bits exceeds the 63 a positive BIGINT holds; lower bits "
            f"or split the key")
    parts = []
    for j, c in enumerate(cols):
        lo, hi = bounds[c]
        # empty/all-NULL inputs bound to (None, None): treat like a
        # degenerate column so an empty incremental batch still writes
        if lo is None or hi is None:
            continue
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


def plan_compaction(
    files: list[tuple[str, int]], target_bytes: int,
) -> list[list[str]]:
    """Small-files compaction plan: first-fit-decreasing bin packing
    of (path, size) pairs into bins of at most ``target_bytes`` (a
    file larger than the target gets its own bin — compaction never
    splits files). Returns lists of paths, deterministic for a given
    input (sizes descending, path ascending tiebreak).

    This is the ops half of the small-files problem every incremental
    pipeline accumulates (the reference writes one object per staged
    file, so daily runs produce thousands of KB-sized parquet files;
    scan cost and NameNode/liststore pressure are O(files)). The plan
    is pure driver-side metadata — O(files) like the marker store,
    never touching rows; the APPLY step is a per-bin coalesced read →
    write (see compact_parquet_bins), embarrassingly parallel across
    bins at any scale. FFD guarantees <= (11/9)·OPT + 1 bins — within
    ~22% of the best possible file count."""
    if target_bytes <= 0:
        raise ValueError("target_bytes must be positive")
    ordered = sorted(files, key=lambda f: (-f[1], f[0]))
    bins: list[list[str]] = []
    space: list[int] = []
    for path, size in ordered:
        for i in range(len(bins)):
            if space[i] >= size:
                bins[i].append(path)
                space[i] -= size
                break
        else:
            bins.append([path])
            space.append(max(target_bytes - size, 0))
    return bins


def compact_parquet_bins(
    spark, bins: list[list[str]], dest_dir: str,
) -> list[str]:
    """Apply a compaction plan: each bin's files are read together and
    written as ONE parquet file under ``dest_dir/bin-<i>`` (coalesce(1)
    is safe — a bin is at most target_bytes by construction). Returns
    the bin output directories. Bins are independent: on a cluster,
    run them as parallel jobs or one job over a bin-id-partitioned
    file list; locally the loop is fine because each bin is tiny."""
    out = []
    for i, paths in enumerate(bins):
        d = f"{dest_dir.rstrip('/')}/bin-{i:05d}"
        spark.read.parquet(*paths).coalesce(1).write.mode(
            "overwrite").parquet(d)
        out.append(d)
    return out
