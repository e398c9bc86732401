#!/usr/bin/env python
"""Scale posture probe for the streaming ANN maintenance sink
(streaming/annmaintain.py): the append arm's per-trigger cost must be
O(|batch|) — independent of index size — when the stream runs the
production steady state (``assume_new_ids=True``: no exact-id
anti-join, drift gate fed by the CARRIED sums). The anti-join arm is
measured alongside: since the r12 bucketed id ledger it probes only
the leaf dirs the batch's ids hash into, so its per-trigger cost is
O(min(|batch|, n_buckets) x bucket_rows) — the probe row count is
reported next to the index size to show the sub-linear growth
directly (wall alone is noise-floor-flat at local scale either way).

For each index size N: bootstrap an index from one N-row batch of
synthetic dim-64 vectors, then time ONE 1,000-row append trigger under
each arm (fresh checkpoint dirs; the append batch is in-gate by
construction — same generator, same direction).

Usage: python scripts/bench_ann_maintain.py [N,N,...]
Prints one JSON line per N.
"""

from __future__ import annotations

import json
import shutil
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def synth(spark, lo, n):
    return spark.range(lo, lo + n).selectExpr(
        "id AS vec_id",
        "transform(sequence(1, 64), i -> "
        "CAST(pmod(id * i, 97) / 97.0 + 0.5 AS FLOAT)) AS embedding")


def main():
    sizes = ([int(x) for x in sys.argv[1].split(",")]
             if len(sys.argv) > 1 else [10_000, 100_000, 1_000_000])
    spark = build_session(
        app_name="ocm-ann-maintain-probe",
        conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_cassandra_migrator_spark.streaming import annmaintain

    root = "/tmp/ocm-ann-probe"
    for n in sizes:
        out = {"index_rows": n, "batch_rows": 1000}
        for arm, new_ids in (("append_assume_new", True),
                             ("append_antijoin", False)):
            work = f"{root}/{arm}-{n}"
            shutil.rmtree(work, ignore_errors=True)
            src = f"{work}/src"
            synth(spark, 0, n).coalesce(4).write.parquet(src)

            def run(ckpt):
                stream = (spark.readStream
                          .schema("vec_id LONG, embedding ARRAY<FLOAT>")
                          .option("maxFilesPerTrigger", "16")
                          .parquet(src))
                q = annmaintain.foreach_batch_ann_maintain(
                    stream, f"{work}/ann", checkpoint_dir=ckpt,
                    assume_new_ids=new_ids)
                q.awaitTermination(600)

            run(f"{work}/ckpt0")  # bootstrap (all N rows, one trigger)
            synth(spark, n, 1000).coalesce(1).write.mode("append") \
                .parquet(src)
            t0 = time.monotonic()
            run(f"{work}/ckpt0")
            out[arm + "_s"] = round(time.monotonic() - t0, 2)
            side = annmaintain.read_sidecar(spark, f"{work}/ann", 1)
            assert side["kind"] == "append", side["kind"]
            if not new_ids:
                # replicate the sink's probe over the bootstrap
                # sidecar to report HOW MANY index id rows the
                # anti-join actually read (the sub-linearity evidence)
                boot = annmaintain.read_sidecar(spark, f"{work}/ann", 0)
                n_b = boot["n_buckets"]
                out["n_buckets"] = n_b
                touched = {r[0] for r in synth(spark, n, 1000)
                           .selectExpr(annmaintain._bucket_expr(
                               "vec_id", n_b) + " AS b")
                           .distinct().collect()}
                probe = annmaintain._stitch_paths(
                    f"{work}/ann", boot, [0], touched)
                out["probe_rows"] = (
                    spark.read.parquet(*probe).count() if probe else 0)
                out["probe_buckets"] = len(probe)
            shutil.rmtree(work, ignore_errors=True)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
