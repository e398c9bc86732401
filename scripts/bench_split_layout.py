#!/usr/bin/env python
"""One-off side reading (VERDICT r12 item 8): the headline bench
against a multi-row-group re-write of the sf0.1 testdata, to test the
engine's claim that it needs no artifact-specific help on splittable
input (the standard testdata is one row group per table, so every
scan is a 1-task map stage and the fan-out gate fires).

Generate the layout first (32 row groups per table):
    python /tmp/make_split_layout.py   # or see NOTES.md r13 entry

Run:
    SPARK_GRAFT_SF_DIR=/tmp/testdata_split/sf0.1 \
    SPARK_GRAFT_CPUS=32 python scripts/bench_split_layout.py

Identical methodology to bench.py (noop sink, best-of-3, clearCache
between headliners, calibration stamps) with ONE extra conf:
``spark.sql.files.maxPartitionBytes=512k`` — the re-written files are
a few MB, so the default 128 MB split packs all 32 row groups back
into one task and the layout would measure nothing. 512 KB ~= one row
group of the largest table. This script does NOT replace bench.py;
its reading is recorded in NOTES.md only.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402 — same query list, same order
from oracle_cassandra_migrator_spark.queries import QUERIES  # noqa: E402
from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/testdata_split/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = build_session(
        app_name="ocm-spark-bench-split",
        master=f"local[{cpus}]",
        conf={"spark.sql.shuffle.partitions": cpus,
              "spark.driver.memory": "8g",
              "spark.sql.files.maxPartitionBytes": "512k",
              "spark.sql.files.openCostInBytes": "64k"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    for warm in ("pricing_summary", "dedup_exact_documents",
                 "sim_topk_bruteforce", "udf_embedding_norms",
                 "dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "sim_ann_lsh_exact"):
        QUERIES[warm](spark, "/root/testdata/sf0.001").write.format(
            "noop").mode("overwrite").save()

    def calibrate() -> float:
        start = time.time()
        (spark.range(20_000_000, numPartitions=32)
         .selectExpr("id % 100000 AS k", "id AS v")
         .groupBy("k").sum("v")
         .write.format("noop").mode("overwrite").save())
        return round(time.time() - start, 3)

    calibrate()
    calib_before = calibrate()
    timings: dict[str, float] = {}
    for name in HEADLINE:
        spark.catalog.clearCache()
        runs = []
        for _ in range(3):
            start = time.time()
            QUERIES[name](spark, sf_dir).write.format("noop").mode(
                "overwrite").save()
            runs.append(time.time() - start)
        timings[name] = round(min(runs), 3)
        print(f"# {name}: {timings[name]}s (runs: {[round(r,2) for r in runs]})",
              file=sys.stderr)
    calib_after = calibrate()
    print(json.dumps({
        "metric": "headline_queries_total_wall_sec_split_layout",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": 0.1,
        "layout": "32 row groups/table, maxPartitionBytes=512k",
        "cache_isolated": True,
        "calib_sec": {"before": calib_before, "after": calib_after,
                      "quiet_host_ref": 1.0},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
