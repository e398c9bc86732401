"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Real decode libraries (PIL/librosa/ffmpeg) are absent from this
environment, so the decode step is a clearly-marked deterministic fake
(`_fake_decode`) — but the Spark-side plumbing is real and what matters
at scale: binary columns flow through Arrow-batched ``mapInPandas``
with an explicit output schema, partition sizes bounded by
``maxRecordsPerBatch``, and no driver collection anywhere.

Swap ``_fake_decode`` for a real decoder (e.g. PIL Image.open over
io.BytesIO) and nothing else changes.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, mm_format STRING, width INT, height INT"
)

_FORMATS = ["jpeg", "png", "webp"]


def _fake_decode(payload: bytes) -> tuple[str, int, int]:
    """STUB decoder: deterministic metadata derived from the payload
    length. A real implementation would parse the container header.
    Raising NotImplementedError here would also be acceptable; the fake
    keeps the pipeline end-to-end testable."""
    n = len(payload)
    return _FORMATS[n % 3], n % 640, (n * 7) % 480


def decode_binary_metadata(df: DataFrame, id_col: str = "doc_id",
                           payload_col: str = "payload") -> DataFrame:
    """Arrow-batched metadata extraction over a binary column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            decoded = [_fake_decode(p) for p in pdf[payload_col]]
            yield pd.DataFrame({
                "doc_id": pdf[id_col].astype("int64"),
                "n_bytes": [len(p) for p in pdf[payload_col]],
                "mm_format": [d[0] for d in decoded],
                "width": pd.Series([d[1] for d in decoded], dtype="int32"),
                "height": pd.Series([d[2] for d in decoded], dtype="int32"),
            })

    return df.select(id_col, payload_col).mapInPandas(extract, DECODE_SCHEMA)


def documents_as_binary(documents: DataFrame) -> DataFrame:
    """Adapter for the testdata: treat the utf-8 bytes of ``text`` as an
    opaque payload, the way image/audio bytes would arrive."""
    return documents.select(
        "doc_id", F.encode("text", "utf-8").alias("payload"))
