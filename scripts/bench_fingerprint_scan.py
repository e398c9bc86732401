#!/usr/bin/env python
"""Measure the fingerprint double-execution fix (ADVICE r10 / VERDICT
r10 item 2): per micro-batch, the ledger's content-fingerprint
aggregate plus the sink's own consumption used to execute the batch
plan TWICE; the sinks now persist the batch across both, so the source
scan + upstream transforms run once.

This probe isolates exactly that delta on the upsert sink's shape
(fingerprint aggregate + last-writer-wins winners aggregation) over a
full-width batch:

- BEFORE arm: fp over the raw frame, then the winners consumption —
  two executions of the scan.
- AFTER arm: persist, fp (materializes the cache), winners from
  cache, unpersist — one execution.

Usage: python scripts/bench_fingerprint_scan.py [sf_dir] [runs]
Prints one JSON line {"before_s": ..., "after_s": ..., "rows": N}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402
from oracle_cassandra_migrator_spark.sources.testdata import read_table  # noqa: E402
from oracle_cassandra_migrator_spark.streaming import fingerprint  # noqa: E402


def winners(df):
    """The upsert sink's within-batch last-writer-wins aggregation."""
    ordered = F.struct(F.col("l_linenumber"), F.struct("*").alias("__row"))
    return (df.groupBy("l_orderkey")
            .agg(F.max(ordered).alias("__w"))
            .select("__w.__row.*"))


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    spark = build_session(app_name="ocm-fp-scan-bench")
    spark.sparkContext.setLogLevel("ERROR")

    def batch():
        # an expensive upstream transform a real stream would carry,
        # so the double execution is visible beyond raw scan cost
        return read_table(spark, sf_dir, "lineitem").withColumn(
            "norm_tag", F.expr(
                "regexp_replace(repeat(lower(concat_ws(' ', "
                "l_returnflag, l_linestatus, CAST(l_shipdate AS STRING)"
                ")), 8), '[^a-z0-9 ]', '')"))

    n = batch().count()  # warm-up + row count

    before, after = [], []
    for _ in range(runs):
        df = batch()
        t0 = time.monotonic()
        fingerprint.batch_fingerprint(df)
        winners(df).write.format("noop").mode("overwrite").save()
        before.append(time.monotonic() - t0)

        df = batch().persist()
        t0 = time.monotonic()
        fingerprint.batch_fingerprint(df)
        winners(df).write.format("noop").mode("overwrite").save()
        after.append(time.monotonic() - t0)
        df.unpersist()

    print(json.dumps({
        "rows": n,
        "before_s": round(min(before), 3),
        "after_s": round(min(after), 3),
        "speedup": round(min(before) / min(after), 2),
    }))


if __name__ == "__main__":
    main()
