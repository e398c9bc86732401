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


RESIZE_SCHEMA = ("doc_id BIGINT, width INT, height INT, "
                 "resized_w INT, resized_h INT")


def resize_metadata(decoded: DataFrame, box: int = 224) -> DataFrame:
    """Fit-into-box resize (aspect preserved) over decoded metadata —
    the geometry step of an image pipeline; a real implementation would
    also carry the resampled pixel payload through the same plumbing."""

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            w = pdf["width"].to_numpy()
            h = pdf["height"].to_numpy()
            # scale = box / max(dim), 0-dims pass through unscaled
            denom = pd.Series([max(a, b, 1) for a, b in zip(w, h)])
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype("int64"),
                "width": pdf["width"].astype("int32"),
                "height": pdf["height"].astype("int32"),
                "resized_w": (w * box // denom).astype("int32"),
                "resized_h": (h * box // denom).astype("int32"),
            })

    return decoded.select("doc_id", "width", "height").mapInPandas(
        compute, RESIZE_SCHEMA)


FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_sig STRING"


def frame_sample(documents: DataFrame, frame_len: int = 64,
                 stride: int = 256) -> DataFrame:
    """Frame sampling: fixed-length windows every ``stride`` positions
    of the payload (video-keyframe analog over an opaque stream), each
    reduced to an md5 signature. One input row fans out to
    ceil(len/stride) frame rows — mapInPandas handles the 1->N shape
    with only per-row state."""
    import hashlib

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"doc_id": [], "frame_idx": [], "frame_sig": []}
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                n = len(text)
                idx = 0
                for start in range(0, n, stride):
                    window = text[start:start + frame_len]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(idx)
                    out["frame_sig"].append(
                        hashlib.md5(window.encode("utf-8")).hexdigest())
                    idx += 1
            yield pd.DataFrame({
                "doc_id": pd.Series(out["doc_id"], dtype="int64"),
                "frame_idx": pd.Series(out["frame_idx"], dtype="int32"),
                "frame_sig": pd.Series(out["frame_sig"], dtype="object"),
            })

    return documents.select("doc_id", "text").mapInPandas(frames, FRAME_SCHEMA)
