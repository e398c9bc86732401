#!/usr/bin/env python
"""Measure the near-dedup state compaction payoff: drive N micro-batches
through the admission gate (documents corpus split round-robin), then
time a probe-shaped state read (read_state + the band equi-join count
an admission performs) BEFORE and AFTER compact+vacuum, along with the
stitched file count. The data volume is identical either way — the
delta is pure version/file fan-out, which is what compaction exists to
bound (streaming/neardedup.py).

Usage: python scripts/bench_neardedup_compaction.py [sf_dir] [n_batches]
           [drain_timeout_sec]
Prints one JSON line. (drain_timeout defaults to 1800; the 30x
batch-count probe — hundreds of versions — needs more, since the
before-arm's per-batch stitch cost grows with the version count,
which is exactly the fan-out being measured.)
"""

from __future__ import annotations

import glob
import json
import shutil
import sys
import tempfile
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def state_files(base_dir: str) -> int:
    return (len(glob.glob(f"{base_dir}/sigs-v*/part-*"))
            + len(glob.glob(f"{base_dir}/bands-v*/part-*")))


def probe_wall(spark, base_dir: str, probe_bands) -> float:
    """One admission-shaped state read: stitch committed versions and
    run the banded candidate join against a fixed probe."""
    from oracle_cassandra_migrator_spark.streaming import neardedup

    t0 = time.monotonic()
    _, bands = neardedup.read_state(spark, base_dir)
    (probe_bands.join(
        bands.withColumnRenamed("doc_id", "admitted_id"),
        ["band_idx", "band_key"]).count())
    return round(time.monotonic() - t0, 3)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    drain_timeout = int(sys.argv[3]) if len(sys.argv) > 3 else 1800

    from oracle_cassandra_migrator_spark.sources.testdata import read_table
    from oracle_cassandra_migrator_spark.streaming import neardedup

    spark = build_session(app_name="ocm-neardedup-compaction",
                          master="local[32]")
    spark.sparkContext.setLogLevel("ERROR")
    work = tempfile.mkdtemp(prefix="ocm-ndc-")
    try:
        docs = read_table(spark, sf_dir, "documents").select(
            "doc_id", "text")
        src = f"{work}/src"
        # one file per micro-batch, one job per file (mtime ordering)
        for i in range(n_batches):
            docs.where(f"doc_id % {n_batches} = {i}").coalesce(1) \
                .write.mode("append").parquet(src)
        base = f"{work}/state"
        stream = (spark.readStream.schema(docs.schema)
                  .option("maxFilesPerTrigger", "1").parquet(src))
        q = neardedup.foreach_batch_near_dedup(
            stream, base, f"{work}/ckpt")
        if not q.awaitTermination(drain_timeout):
            q.stop()
            raise RuntimeError(
                f"stream did not drain in {drain_timeout} s — refusing "
                "to measure compaction against a mid-flight state")

        probe = neardedup.band_rows(
            neardedup.batch_signatures(
                docs.limit(2000), "text", "doc_id"), "doc_id").cache()
        probe.count()

        files_before = state_files(base)
        wall_before = min(probe_wall(spark, base, probe)
                          for _ in range(3))
        t0 = time.monotonic()
        token = neardedup.compact_near_dedup(spark, base)
        neardedup.vacuum_near_dedup(spark, base)
        compact_wall = round(time.monotonic() - t0, 3)
        files_after = state_files(base)
        wall_after = min(probe_wall(spark, base, probe)
                         for _ in range(3))

        sigs, _ = neardedup.read_state(spark, base)
        print(json.dumps({
            "metric": "neardedup_compaction", "sf_dir": sf_dir,
            "n_batches": n_batches,
            "admitted_rows": sigs.count(), "token": token,
            "state_files_before": files_before,
            "state_files_after": files_after,
            "probe_read_sec_before": wall_before,
            "probe_read_sec_after": wall_after,
            "compact_plus_vacuum_sec": compact_wall,
        }))
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
