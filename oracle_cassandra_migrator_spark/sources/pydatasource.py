"""Python Data Source API (Spark 4.0+, `pyspark.sql.datasource`) —
the user-extensible source surface, exercised two ways:

- ``jsonl_dir``: a batch source over a directory of JSONL dumps with
  partition-per-file parallel planning and REAL filter pushdown
  (DataSourceReader.pushFilters, Spark 4.1): supported predicates are
  evaluated inside the Python reader before rows are serialized to the
  JVM — for a Python source that pre-JVM drop is exactly where
  pushdown pays.
- ``synth_events``: a deterministic streaming source built on
  SimpleDataSourceStreamReader with replayable offset ranges —
  ``readBetweenOffsets(start, end)`` regenerates byte-identical rows,
  which is the contract exactly-once recovery rests on. A batch
  reader over the same generator provides seeded load-gen with
  explicit range partitions.

Reference parity: the reference's source surface is a partitioned
parallel JDBC scan (verizon_table_migration_Rakesh_filters.py:101-116
options dict); this module shows the same partition-planned parallel read
through Spark's public Python DS API, where the reference had to rely
on the built-in JDBC source. Everything here is driver/executor-safe:
readers are pickled to Python workers, so they hold only plain data.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamWriter,
    DataSourceWriter,
    EqualTo,
    Filter,
    GreaterThan,
    GreaterThanOrEqual,
    InputPartition,
    IsNotNull,
    LessThan,
    LessThanOrEqual,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)
from pyspark.sql.types import StructType

_DEFAULT_SCHEMA = "event_id BIGINT, event_type STRING, value DOUBLE"


# ---------------------------------------------------------------------------
# jsonl_dir — batch, partition-per-file, filter pushdown
# ---------------------------------------------------------------------------


class _JsonlFilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


def _filter_predicate(f: Filter):
    """Compile one pushable Filter into a row-dict predicate, or None
    if the filter kind/shape is unsupported (multi-part column paths
    are never pushed)."""
    col = f.attribute[0] if len(getattr(f, "attribute", ())) == 1 else None
    if col is None:
        return None
    if isinstance(f, EqualTo):
        return lambda r: r.get(col) == f.value
    if isinstance(f, GreaterThan):
        return lambda r: r.get(col) is not None and r.get(col) > f.value
    if isinstance(f, GreaterThanOrEqual):
        return lambda r: r.get(col) is not None and r.get(col) >= f.value
    if isinstance(f, LessThan):
        return lambda r: r.get(col) is not None and r.get(col) < f.value
    if isinstance(f, LessThanOrEqual):
        return lambda r: r.get(col) is not None and r.get(col) <= f.value
    if isinstance(f, IsNotNull):
        return lambda r: r.get(col) is not None
    return None


class JsonlDirReader(DataSourceReader):
    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir requires a 'path' option")
        self.predicates = []

    def pushFilters(self, filters: list[Filter]) -> Iterator[Filter]:
        """Keep every filter we can evaluate row-wise; hand the rest
        back to Spark. The AND of the accepted set is applied in
        read(), before rows cross the Python->JVM boundary."""
        unsupported = []
        for f in filters:
            pred = _filter_predicate(f)
            if pred is None:
                unsupported.append(f)
            else:
                self.predicates.append(pred)
        return unsupported

    def partitions(self) -> Sequence[InputPartition]:
        files = sorted(
            os.path.join(self.path, n)
            for n in os.listdir(self.path)
            if n.endswith(".jsonl"))
        if not files:
            raise ValueError(f"no .jsonl files under {self.path}")
        return [_JsonlFilePartition(p) for p in files]

    def read(self, partition: _JsonlFilePartition):
        names = [f.name for f in self.schema.fields]
        with open(partition.path, "r", encoding="utf-8") as fh:
            for line in fh:
                line = line.strip()
                if not line:
                    continue
                rec = json.loads(line)
                if all(p(rec) for p in self.predicates):
                    yield tuple(rec.get(n) for n in names)


class JsonlDirStreamReader(SimpleDataSourceStreamReader):
    """CDC-dump directory tailer — the streaming complement of the
    batch reader: each micro-batch consumes the ``.jsonl`` files that
    arrived since the committed offset, the landing-zone shape CDC
    tools write (Debezium file sink, DMS drops, export cron jobs).

    Offsets are ``{"last": "<filename>"}``; a batch reads every file
    sorting strictly above it. File names must therefore be
    MONOTONICALLY increasing (sequence- or timestamp-stamped — the
    standard change-dump convention) and files must LAND ATOMICALLY
    (write to a temp name, rename to the final ``.jsonl`` — exactly
    what JsonlDirStreamWriter below does): a file consumed mid-append
    would be truncated forever, since the filename watermark never
    revisits it. For producers that append in place, the
    ``settle_seconds`` option defers files until their mtime is at
    least that old — and the listing is truncated at the FIRST
    unsettled name (contiguous settled prefix), not filtered per file:
    if file N is still being appended when N+1 lands and settles, a
    per-file filter would advance the watermark past N and skip it
    forever once it finally settles (ADVICE r8).
    ``readBetweenOffsets`` replays a committed range
    by name interval, deterministic under the same two rules. A late
    file sorting at or below the consumed watermark is ignored (never
    silently reordered into an already-committed range)."""

    def __init__(self, schema: StructType, options):
        self.names = [f.name for f in schema.fields]
        self.path = options.get("path")
        self.settle_seconds = float(options.get("settle_seconds", 0))
        if not self.path:
            raise ValueError("jsonl_dir stream requires a 'path' option")

    def initialOffset(self) -> dict:
        return {"last": ""}

    def _files(self) -> list[str]:
        return sorted(n for n in os.listdir(self.path)
                      if n.endswith(".jsonl"))

    def _settled_prefix(self, names: list[str]) -> list[str]:
        """Truncate at the first unsettled name: an unsettled file
        BLOCKS everything sorting above it, else the watermark would
        jump past it and never come back. Applies to the
        ABOVE-watermark listing only — a re-touched already-consumed
        file (whose appended rows are lost by contract anyway) must
        not stall the stream forever (self-review r9)."""
        if self.settle_seconds <= 0:
            return names
        import time

        cutoff = time.time() - self.settle_seconds
        settled = []
        for n in names:
            if os.path.getmtime(os.path.join(self.path, n)) > cutoff:
                break
            settled.append(n)
        return settled

    def _rows(self, files: list[str]):
        for name in files:
            with open(os.path.join(self.path, name),
                      "r", encoding="utf-8") as fh:
                for line in fh:
                    line = line.strip()
                    if line:
                        rec = json.loads(line)
                        yield tuple(rec.get(c) for c in self.names)

    def read(self, start: dict):
        fresh = self._settled_prefix(
            [n for n in self._files() if n > start["last"]])
        end = {"last": fresh[-1] if fresh else start["last"]}
        return iter(list(self._rows(fresh))), end

    def readBetweenOffsets(self, start: dict, end: dict):
        # committed ranges replay WITHOUT the settle filter: every file
        # in the interval was settled when the range first committed
        names = [n for n in sorted(os.listdir(self.path))
                 if n.endswith(".jsonl")
                 and start["last"] < n <= end["last"]]
        return iter(list(self._rows(names)))


class JsonlDirDataSource(DataSource):
    """``spark.read.format("jsonl_dir").schema(...).option("path", d)``
    (batch, partition-per-file, pushdown) or
    ``spark.readStream.format("jsonl_dir")`` (CDC directory tailing) —
    register with ``spark.dataSource.register(JsonlDirDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "jsonl_dir"

    def schema(self) -> str:
        return self.options.get("schema", _DEFAULT_SCHEMA)

    def reader(self, schema: StructType) -> DataSourceReader:
        return JsonlDirReader(schema, self.options)

    def simpleStreamReader(self, schema: StructType):
        return JsonlDirStreamReader(schema, self.options)

    def writer(self, schema: StructType, overwrite: bool):
        return JsonlDirWriter(schema, self.options, overwrite=overwrite)

    def streamWriter(self, schema: StructType, overwrite: bool):
        return JsonlDirStreamWriter(schema, self.options)


# ---------------------------------------------------------------------------
# synth_events — deterministic generator: streaming + range-partitioned batch
# ---------------------------------------------------------------------------

_TYPES = ("view", "click", "purchase", "refund")


def synth_row(i: int) -> tuple:
    """Row ``i`` of the synthetic event stream — pure function of i,
    so any offset range can be replayed byte-identically (md5-free:
    a Weyl-style integer mix keeps workers import-light)."""
    h = (i * 2654435761) % 2**32
    return (i, _TYPES[h % len(_TYPES)], float(h % 10_000) / 100.0)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthEventsBatchReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("n_rows", 1000))
        self.n_partitions = int(options.get("n_partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        step = -(-self.n_rows // self.n_partitions)
        return [
            _RangePartition(lo, min(lo + step, self.n_rows))
            for lo in range(0, self.n_rows, step)]

    def read(self, partition: _RangePartition):
        for i in range(partition.start, partition.end):
            yield synth_row(i)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Offsets are ``{"i": n}`` — the index of the next unread row.
    ``read`` advances by rows_per_batch; ``readBetweenOffsets`` replays
    any committed range deterministically (the exactly-once recovery
    path Spark exercises after a restart)."""

    def __init__(self, options):
        self.rows_per_batch = int(options.get("rows_per_batch", 10))

    def initialOffset(self) -> dict:
        return {"i": 0}

    def read(self, start: dict):
        lo = start["i"]
        hi = lo + self.rows_per_batch
        return iter([synth_row(i) for i in range(lo, hi)]), {"i": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter([synth_row(i) for i in range(start["i"], end["i"])])


class SynthEventsDataSource(DataSource):
    """``spark.readStream.format("synth_events")`` (streaming) or
    ``spark.read.format("synth_events").option("n_rows", n)`` (batch
    load-gen with explicit range partitions)."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return _DEFAULT_SCHEMA

    def reader(self, schema: StructType) -> DataSourceReader:
        return SynthEventsBatchReader(self.options)

    def simpleStreamReader(self, schema: StructType):
        return SynthEventsStreamReader(self.options)


def register_python_sources(spark) -> None:
    """Register both formats on a session (idempotent). Python-source
    filter pushdown is opt-in (Spark 4.1) — planning fails fast if a
    reader implements pushFilters while the flag is off, so flip it
    here."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    spark.dataSource.register(JsonlDirDataSource)
    spark.dataSource.register(SynthEventsDataSource)


# ---------------------------------------------------------------------------
# jsonl_dir writer — task-temp + driver-commit rename (batch and streaming)
# ---------------------------------------------------------------------------


@dataclass
class _JsonlCommit(WriterCommitMessage):
    temp_path: str
    final_name: str
    n_rows: int


class JsonlDirWriter(DataSourceWriter):
    """Per-task: write rows to a uniquely-named ``.tmp`` file; return
    the path in the commit message. Driver commit: rename every temp
    to its final ``.jsonl`` name — readers never observe a partial
    file (the same temp-write + deterministic-rename protocol as the
    package's exactly-once file sink, sinks/writers.py). Abort removes
    the temps."""

    def __init__(self, schema: StructType, options, prefix: str = "part",
                 overwrite: bool = False):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("jsonl_dir writer requires a 'path' option")
        self.field_names = [f.name for f in schema.fields]
        self.prefix = prefix
        self.overwrite = overwrite

    def write(self, iterator) -> _JsonlCommit:
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        os.makedirs(self.path, exist_ok=True)
        final_name = f"{self.prefix}-{pid:05d}.jsonl"
        temp_path = os.path.join(self.path, f".{final_name}.tmp")
        n = 0
        with open(temp_path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps(
                    {k: row[k] for k in self.field_names}) + "\n")
                n += 1
        return _JsonlCommit(temp_path=temp_path, final_name=final_name,
                            n_rows=n)

    def commit(self, messages) -> None:
        if self.overwrite:
            # truncate-on-commit: stale files vanish only after every
            # task succeeded, so a failed overwrite leaves the old data
            keep = {m.final_name for m in messages if m is not None}
            for name in os.listdir(self.path):
                if name.endswith(".jsonl") and name not in keep:
                    os.remove(os.path.join(self.path, name))
        for m in messages:
            if m is None:
                continue
            os.replace(
                m.temp_path, os.path.join(self.path, m.final_name))

    def abort(self, messages) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.temp_path)
            except FileNotFoundError:
                pass


class JsonlDirStreamWriter(DataSourceStreamWriter):
    """Streaming flavor: each micro-batch commits under a
    ``batch-<id>-`` prefix, so a replayed batch OVERWRITES its own
    files instead of duplicating rows — idempotent exactly-once
    delivery on top of at-least-once batch replay, the
    marker-per-batch recipe of streaming/sinks.py expressed through
    the public writer API."""

    def __init__(self, schema: StructType, options):
        self.schema = schema
        self.options = options

    def _delegate(self, batch_id: int) -> JsonlDirWriter:
        return JsonlDirWriter(
            self.schema, self.options, prefix=f"batch-{batch_id:08d}")

    def write(self, iterator) -> _JsonlCommit:
        # batchId is not visible inside write(); stage under a task-
        # unique temp and let commit(batchId) assign the final name.
        from pyspark import TaskContext

        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx is not None else 0
        path = self.options.get("path")
        os.makedirs(path, exist_ok=True)
        names = [f.name for f in self.schema.fields]
        temp_path = os.path.join(path, f".stream-{pid:05d}.tmp")
        n = 0
        with open(temp_path, "w", encoding="utf-8") as fh:
            for row in iterator:
                fh.write(json.dumps({k: row[k] for k in names}) + "\n")
                n += 1
        return _JsonlCommit(temp_path=temp_path, final_name=f"{pid:05d}",
                            n_rows=n)

    def commit(self, messages, batchId: int) -> None:
        path = self.options.get("path")
        for m in messages:
            if m is None:
                continue
            os.replace(m.temp_path, os.path.join(
                path, f"batch-{batchId:08d}-{m.final_name}.jsonl"))

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is None:
                continue
            try:
                os.remove(m.temp_path)
            except FileNotFoundError:
                pass
