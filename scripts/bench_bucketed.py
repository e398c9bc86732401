"""Plain vs bucketed layout for the two shuffle-bound headliners at
the ~sf1 probe (VERDICT r6 item 4).

Builds the order-key-bucketed lineitem/orders tables from the probe
dir once (that write IS the amortized shuffle), then times
q21 / topk_order_revenue over plain parquet vs the bucketed layout.
Broadcast threshold is left at the session default: at probe scale the
dims broadcast and the fact-fact joins are SMJ, the same shape a
1000-executor cluster would plan.

Usage: python scripts/bench_bucketed.py [probe_dir] [n_buckets] [runs]
Prints one JSON line; readings go into SCALE.md.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402
from oracle_cassandra_migrator_spark.queries.relational import (  # noqa: E402
    run_topk_order_revenue)
from oracle_cassandra_migrator_spark.queries.tpch_suite import run_q21  # noqa: E402
from oracle_cassandra_migrator_spark.sources import bucketed  # noqa: E402
from oracle_cassandra_migrator_spark.sources.testdata import read_table  # noqa: E402


def best_of(fn, runs):
    times = []
    for _ in range(runs):
        t0 = time.monotonic()
        fn()
        times.append(round(time.monotonic() - t0, 3))
    return min(times), times


def main():
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ocm-sf1"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 3

    # 4 MB broadcast cap: dims (supplier/nation/customer, <= ~3.5 MB
    # at the probe) still broadcast — as they would at any scale — but
    # orders (~28 MB) and lineitem (~100 MB) take the SortMergeJoin
    # path. Without the cap, AQE broadcasts the probe's fact tables
    # too (they fit a 16 GB driver) and BOTH layouts collapse to the
    # same exchange-free broadcast plan — a shape that cannot exist at
    # 100 TB, where facts never broadcast. The cap makes the probe
    # measure the plan a real cluster would run.
    spark = build_session(
        app_name="ocm-bench-bucketed",
        conf={"spark.driver.memory": "16g",
              "spark.sql.autoBroadcastJoinThreshold": "4194304"})

    t0 = time.monotonic()
    bkt = bucketed.bucketed_fact_tables(spark, probe_dir,
                                        n_buckets=n_buckets, refresh=True)
    t_write = round(time.monotonic() - t0, 3)

    plain = {n: read_table(spark, probe_dir, n)
             for n in ("supplier", "nation", "customer",
                       "lineitem", "orders")}

    cases = {
        "q21_plain": lambda: run_q21(
            spark, {k: plain[k] for k in
                    ("supplier", "nation", "lineitem", "orders")}).count(),
        "q21_bucketed": lambda: run_q21(
            spark, {"supplier": plain["supplier"],
                    "nation": plain["nation"], **bkt}).count(),
        "topk_plain": lambda: run_topk_order_revenue(
            {k: plain[k] for k in
             ("customer", "lineitem", "orders")}).count(),
        "topk_bucketed": lambda: run_topk_order_revenue(
            {"customer": plain["customer"], **bkt}).count(),
    }

    out = {"probe_dir": probe_dir, "n_buckets": n_buckets,
           "bucketed_write_sec": t_write, "runs": {}}
    for name, fn in cases.items():
        best, times = best_of(fn, runs)
        out["runs"][name] = {"best": best, "times": times}
        print(f"# {name}: {best}s {times}", file=sys.stderr, flush=True)
    for q in ("q21", "topk"):
        p = out["runs"][f"{q}_plain"]["best"]
        b = out["runs"][f"{q}_bucketed"]["best"]
        out[f"{q}_speedup"] = round(p / b, 2) if b else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
