"""Merge/upsert for incremental migration — the capability gap between
the reference's full-reload model (it re-stages whole tables,
verizon_table_migration_Rakesh_filters.py:187-223) and an ongoing
sync: apply a batch of changed rows onto the previous snapshot.

Plain Spark-on-parquet has no MERGE INTO (that is a table-format
feature — Delta/Iceberg); the standard hand-rolled equivalent is an
anti-join + union, expressed here declaratively so Catalyst plans it:

- ``merge_upsert``: updates win by key; unmatched current rows are
  kept. One anti-join (keys only on the build side) + one union — at
  scale both sides shuffle once on the merge key, and AQE broadcasts
  the update keys when the change batch is small (the common case:
  daily deltas against a 100 TB snapshot).
- ``scd2_apply``: slowly-changing-dimension history — close the
  current version of each changed key and append the new version,
  keeping full validity ranges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def merge_upsert(current: DataFrame, updates: DataFrame,
                 keys: list[str], *,
                 allow_missing: bool = False) -> DataFrame:
    """Upsert ``updates`` into ``current`` by ``keys``: a key present
    in both yields the update row; keys only in ``current`` are kept;
    keys only in ``updates`` are inserts. Columns match by name.

    Schema evolution is OPT-IN (ADVICE r8): by default a column
    present on only one side raises with the symmetric difference
    named, so a renamed or typo'd column in the update stream fails
    loudly instead of silently forking into two half-null columns.
    Pass ``allow_missing=True`` for genuinely evolving pipelines
    (e.g. the manifest-schema'd partitioned snapshot applier) — then
    the missing side null-fills."""
    if not allow_missing:
        only_cur = set(current.columns) - set(updates.columns)
        only_upd = set(updates.columns) - set(current.columns)
        if only_cur or only_upd:
            raise ValueError(
                "merge_upsert schema drift: current-only columns "
                f"{sorted(only_cur)}, updates-only columns "
                f"{sorted(only_upd)}; pass allow_missing=True to "
                "null-fill (schema evolution) if this is intended")
    survivors = current.join(
        updates.select(*keys).distinct(), keys, "left_anti")
    return updates.unionByName(
        survivors, allowMissingColumns=allow_missing)


def scd2_apply(history: DataFrame, updates: DataFrame, keys: list[str],
               effective_col: str, valid_from: str = "valid_from",
               valid_to: str = "valid_to") -> DataFrame:
    """Type-2 slowly-changing-dimension merge: for each updated key,
    close the open version (``valid_to`` = the update's effective
    date) and append the update as the new open version
    (``valid_to`` = NULL). Unchanged keys and already-closed versions
    pass through untouched.

    ``history`` rows carry ``valid_from``/``valid_to`` (NULL = open);
    ``updates`` rows carry the business columns plus ``effective_col``.
    One broadcast-friendly join of history against the (small) update
    key set + a union — no window over history required."""
    upd_keys = updates.select(*keys).distinct()
    eff = updates.select(
        *keys, F.col(effective_col).alias("__new_from")).distinct()
    closed = (
        history.where(F.col(valid_to).isNull())
        .join(eff, keys)
        .withColumn(valid_to, F.col("__new_from"))
        .drop("__new_from")
    )
    untouched_open = history.where(F.col(valid_to).isNull()).join(
        upd_keys, keys, "left_anti")
    already_closed = history.where(F.col(valid_to).isNotNull())
    new_versions = updates.select(
        *[c for c in updates.columns if c != effective_col],
        F.col(effective_col).alias(valid_from),
    ).withColumn(
        valid_to,
        F.lit(None).cast(updates.schema[effective_col].dataType))
    return (already_closed
            .unionByName(closed)
            .unionByName(untouched_open)
            .unionByName(new_versions))
