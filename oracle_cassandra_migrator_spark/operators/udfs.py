"""Python-UDF surface (SURVEY.md §2.10) — used only where built-ins
genuinely can't express the computation, and always Arrow-batched
(pandas_udf / applyInPandas), never row-at-a-time Python.

Determinism notes for the oracle gate: the grouped median works on
integer microsecond gaps (exact halves at worst), and the vectorized
norm is rounded to 6 dp, so float summation-order noise (~1e-16
relative) can't flip a comparison.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType

GAP_SCHEMA = "user_id BIGINT, n_events BIGINT, median_gap_us DOUBLE"


def user_gap_median(events: DataFrame) -> DataFrame:
    """Per-user median inter-event gap via grouped applyInPandas: each
    user's events arrive as one pandas frame (shuffle on user_id), get
    sorted locally, and reduce to one row. The classic 'custom per-group
    logic' shape — state bounded by the largest single group."""

    def median_gap(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts", "event_id"])
        # integer nanosecond arithmetic -> exact microsecond gaps
        # (float total_seconds() would drift vs the SQL date_diff oracle)
        ts_ns = pdf["ts"].astype("int64").to_numpy()
        gaps = np.diff(ts_ns) // 1_000
        return pd.DataFrame({
            "user_id": [pdf["user_id"].iloc[0]],
            "n_events": [len(pdf)],
            "median_gap_us": [float(np.median(gaps)) if len(gaps) else None],
        })

    return (
        events.select("user_id", "event_id", "ts")
        .groupBy("user_id")
        .applyInPandas(median_gap, GAP_SCHEMA)
    )


@F.pandas_udf(DoubleType())
def l2_norm(embedding: pd.Series) -> pd.Series:
    """Vectorized L2 norm over array<float> columns: the whole Arrow
    batch is flattened once and reduced segment-wise
    (``np.add.reduceat``) — no per-row Python loop (the previous
    ``Series.map`` + per-row ``np.dot`` paid ~µs of interpreter
    dispatch per vector). reduceat sums each segment sequentially,
    the same order as ``embedding_norms_arrow`` and the SQL fold the
    parity pytest compares against."""
    if len(embedding) == 0:
        return pd.Series([], dtype="float64")
    if embedding.isna().any():
        # NULL vectors would crash len() below; the slow path's NaN
        # placeholder round-trips through Arrow as SQL NULL (NULL in ->
        # NULL out) and stays exact for the rest of the batch
        return embedding.map(
            lambda v: np.nan if v is None else
            float(np.sqrt(np.dot(np.asarray(v, dtype=np.float64),
                                 np.asarray(v, dtype=np.float64)))))
    lens = np.fromiter((len(v) for v in embedding),
                       dtype=np.int64, count=len(embedding))
    if (lens == 0).any():
        # reduceat cannot express zero-length segments; vectors are
        # fixed-width in practice, so keep the exact slow path for the
        # degenerate batch instead of special-casing offsets
        return embedding.map(
            lambda v: float(np.sqrt(np.dot(np.asarray(v, dtype=np.float64),
                                           np.asarray(v, dtype=np.float64)))))
    flat = np.concatenate(embedding.to_numpy()).astype(np.float64,
                                                       copy=False)
    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
    return pd.Series(np.sqrt(np.add.reduceat(flat * flat, offsets)))


def embedding_norms(embeddings: DataFrame) -> DataFrame:
    return embeddings.select(
        "vec_id",
        F.round(l2_norm("embedding"), 6).alias("l2_norm"),
    )


@F.pandas_udf("double")
def trimmed_mean_cents(cents: pd.Series) -> float:
    """GROUPED_AGG pandas UDAF (Series -> scalar, usable inside
    groupBy().agg() next to built-ins): 10%-trimmed mean over exact
    integer cents. Spark feeds each group's column as one Arrow batch;
    partial aggregation doesn't apply (the trim is order-statistic,
    not decomposable), so state is bounded by the largest group — the
    same boundedness argument as applyInPandas. Sum is exact int64,
    the single float division is deterministic; rounding happens
    Spark-side (F.round) to keep the engine-parity convention."""
    c = cents.sort_values().to_numpy()
    k = len(c) // 10
    kept = c[k:len(c) - k]
    return float(kept.sum()) / len(kept) / 100.0


NORM_SCHEMA = "vec_id BIGINT, l2_norm DOUBLE"


def embedding_norms_arrow(embeddings: DataFrame) -> DataFrame:
    """The same per-vector L2 norm as ``embedding_norms`` but through
    ``mapInArrow`` — the lowest-overhead Python data path (raw Arrow
    RecordBatches, no pandas conversion on either side). Used where
    the per-batch work is pure columnar math and even the
    Arrow->pandas copy of a pandas_udf is measurable; completes the
    Python-surface matrix: scalar pandas_udf, GROUPED_AGG pandas_udf,
    applyInPandas, mapInPandas, applyInPandasWithState, UDTF, and now
    mapInArrow."""
    import pyarrow as pa

    def batches(it):
        for batch in it:
            tbl = pa.table(batch)
            flat = tbl.column("embedding").combine_chunks()
            # genuinely columnar: read the ListArray's flat values
            # buffer + offsets directly — no per-row as_py()/ndarray
            # allocation (that would be slower than the pandas_udf
            # this path exists to beat)
            vals = flat.values.to_numpy(zero_copy_only=False).astype(
                np.float64, copy=False)
            offsets = flat.offsets.to_numpy(zero_copy_only=False)
            sq = vals * vals
            # reduceat sums each row's segment independently and
            # sequentially — same order as the SQL fold the parity
            # test compares against (a cumsum-difference would subtract
            # large prefixes and drift in the last bits)
            norms = np.sqrt(np.add.reduceat(sq, offsets[:-1]))
            yield pa.record_batch([
                tbl.column("vec_id").combine_chunks(),
                pa.array(np.round(norms, 6), type=pa.float64()),
            ], names=["vec_id", "l2_norm"])

    return embeddings.select("vec_id", "embedding").mapInArrow(
        batches, NORM_SCHEMA)


def cogroup_asof_align(left: DataFrame, right: DataFrame, key: str,
                       left_ts: str, right_ts: str,
                       right_cols: list[str]) -> DataFrame:
    """Backward as-of alignment via ``groupBy().cogroup()
    .applyInPandas`` — the last member of the Python-execution matrix
    (pandas_udf / applyInPandas / mapInPandas / mapInArrow / UDTF /
    applyInPandasWithState / transformWithStateInPandas / cogroup):
    both sides shuffle ONCE on the key, each key's two groups meet in
    a single Arrow-batched pandas callback, and pandas' merge_asof
    does the per-key backward search in C.

    When to prefer this over the window-union form
    (queries/relational.asof_join_purchase_click): the sides have
    DIFFERENT wide schemas (the union trick needs a common shape and
    NULL-pads every non-shared column), or the per-key logic grows
    beyond what last(ignorenulls) expresses (nearest-within-tolerance,
    multi-column carry). Same shuffle topology — one exchange per side
    on the key — so the scale shape is identical; the pandas hop costs
    the usual Arrow serialization, which the parity pytest quantifies
    is worth paying only when the window form can't express the
    semantics."""
    import pandas as pd

    from pyspark.sql.types import StructField, StructType

    rfields = {f.name: f for f in right.schema.fields}
    out_schema = StructType(
        list(left.schema.fields)
        + [StructField(c, rfields[c].dataType, True) for c in right_cols])
    left_names = [f.name for f in left.schema.fields]

    def align(lpdf: pd.DataFrame, rpdf: pd.DataFrame) -> pd.DataFrame:
        lpdf = lpdf.sort_values(left_ts)
        if rpdf.empty:
            for c in right_cols:
                lpdf[c] = None
            return lpdf[left_names + right_cols]
        rcols = [right_ts] + [c for c in right_cols if c != right_ts]
        rpdf = rpdf.sort_values(right_ts)[rcols]
        merged = pd.merge_asof(
            lpdf, rpdf, left_on=left_ts, right_on=right_ts,
            direction="backward", suffixes=("", "__r"))
        return merged[left_names + right_cols]

    return (left.groupBy(key).cogroup(right.groupBy(key))
            .applyInPandas(align, schema=out_schema))
