"""Pipeline state store: the marker-object pattern the reference builds
on S3 (existence of staged parquet gates a phase — R2, py:156-184;
zero-byte ``<file>.checkpoint`` objects mark per-file sink completion —
R3, py:237-276), abstracted behind an interface so tests run on local
FS and production points at any object store / Hadoop-compatible FS.

Markers are tiny driver-side metadata — never Spark data — so the cost
is O(files), not O(rows), exactly like the reference's boto3 calls.
"""

from __future__ import annotations

import abc
import glob as globlib
import os


class StateStore(abc.ABC):
    """exists/put/list of zero-byte markers + data-file listing."""

    @abc.abstractmethod
    def exists(self, key: str) -> bool: ...

    @abc.abstractmethod
    def put_marker(self, key: str) -> None: ...

    @abc.abstractmethod
    def list(self, prefix: str, suffix: str = "") -> list[str]: ...

    @abc.abstractmethod
    def delete(self, key: str) -> None: ...

    def checkpoint_key(self, data_file: str) -> str:
        """Derive the marker key for a data file (reference py:330-331:
        `<staged file>.checkpoint`, file-level not job-level)."""
        return f"{data_file}.checkpoint"


class LocalFSStateStore(StateStore):
    """Local-filesystem markers; production analog is an S3/GCS client
    or the Hadoop FileSystem API with identical semantics."""

    def exists(self, key: str) -> bool:
        return os.path.exists(key)

    def put_marker(self, key: str) -> None:
        os.makedirs(os.path.dirname(key), exist_ok=True)
        with open(key, "w"):
            pass

    def list(self, prefix: str, suffix: str = "") -> list[str]:
        return sorted(
            p for p in globlib.glob(os.path.join(prefix, "**"), recursive=True)
            if os.path.isfile(p) and p.endswith(suffix)
        )

    def delete(self, key: str) -> None:
        if os.path.exists(key):
            os.remove(key)

    def output_committed(self, path: str) -> bool:
        """Spark's parquet commit protocol writes _SUCCESS; that is the
        phase-done signal (reference R2 checks staged-parquet existence)."""
        return os.path.exists(os.path.join(path, "_SUCCESS"))
