#!/usr/bin/env python
"""Build the ~sf1 scaling-probe dataset: each sf0.1 fact table
replicated ``N_COPIES`` times with consistent key shifts, so every
foreign key still joins and every per-copy distribution matches the
original. Dimension tables (region, nation) stay fixed, exactly as
TPC-H scales them.

Documents get a per-copy word-suffix perturbation (copy 0 is the
original): word counts, lengths, and the intra-copy near-duplicate
structure are preserved, but shingles never collide ACROSS copies —
without this, every doc would gain 9 exact duplicates and the pair
count would grow quadratically by construction rather than the ~10x a
real 10x crawl shows. Embeddings replicate with shifted vec_ids
(duplicate vectors are realistic for ANN/top-k at scale).

Usage: python scripts/make_scale_probe.py [out_dir] [n_copies]
Then:  SPARK_GRAFT_SF_DIR=<out_dir> python bench.py
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.session import build_session
from oracle_cassandra_migrator_spark.sources.testdata import read_table

SRC = "/root/testdata/sf0.1"

# key-shift strides: comfortably above every sf0.1 max key
STRIDES = {
    "c_custkey": 1_000_000,
    "o_custkey": 1_000_000,
    "s_suppkey": 1_000_000,
    "p_partkey": 1_000_000,
    "o_orderkey": 10_000_000,
    "l_orderkey": 10_000_000,
    "l_partkey": 1_000_000,
    "l_suppkey": 1_000_000,
    "event_id": 10_000_000,
    "user_id": 1_000_000,
    "doc_id": 1_000_000,
    "vec_id": 1_000_000,
}

FIXED = ("region", "nation")
SCALED = ("customer", "supplier", "part", "orders", "lineitem",
          "events", "documents", "embeddings")


def one_copy(df, i: int, name: str):
    out = df
    for col in df.columns:
        if col in STRIDES:
            out = out.withColumn(
                col, (F.col(col) + F.lit(i * STRIDES[col])).cast("bigint"))
    if name == "documents" and i > 0:
        out = out.withColumn(
            "text",
            F.expr(f"array_join(transform(split(text, ' '), "
                   f"w -> concat(w, '~{i}')), ' ')"))
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ocm-sf1"
    n_copies = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = build_session(app_name="ocm-scale-probe")
    for name in FIXED:
        read_table(spark, SRC, name).write.mode("overwrite").parquet(
            f"{out_dir}/{name}.parquet")
    for name in SCALED:
        base = read_table(spark, SRC, name)
        df = one_copy(base, 0, name)
        for i in range(1, n_copies):
            df = df.unionByName(one_copy(base, i, name))
        df.write.mode("overwrite").parquet(f"{out_dir}/{name}.parquet")
        print(f"{name}: x{n_copies}", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
