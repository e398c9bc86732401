"""Config-selected bucketed layout e2e at a scale probe (VERDICT r9
item 7a): the r9 ``layout: {bucketed_by, buckets}`` source-spec path —
not the direct ``bucketed_fact_tables`` helper — must materialize the
bucketed tables once from the spec, reuse them by name on re-read, and
plan q21 over the CONFIG-built tables with zero order-key Exchanges.
Measures materialize cost (the amortized shuffle), reuse cost, and
q21 plain vs config-bucketed wall.

Usage: python scripts/bench_bucketed_config.py [probe_dir] [n_buckets] [runs]
Prints one JSON line; readings go into SCALE.md.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402
from oracle_cassandra_migrator_spark.queries.tpch_suite import run_q21  # noqa: E402
from oracle_cassandra_migrator_spark.sources.readers import read_source  # noqa: E402
from oracle_cassandra_migrator_spark.sources.testdata import read_table  # noqa: E402


def spec_for(probe_dir, name, key, n_buckets):
    return {"format": "parquet", "path": f"{probe_dir}/{name}.parquet",
            "alias": name,
            "layout": {"bucketed_by": key, "buckets": n_buckets,
                       "table": f"cfg_{name}"}}


def main():
    probe_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/ocm-sf10"
    n_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    # 4 MB broadcast cap: same rationale as bench_bucketed.py — keep
    # the fact-fact joins on the SMJ path a real cluster would plan.
    spark = build_session(
        app_name="ocm-bench-bucketed-config",
        conf={"spark.driver.memory": "20g",
              "spark.sql.autoBroadcastJoinThreshold": "4194304"})
    spark.sparkContext.setLogLevel("ERROR")

    keys = {"orders": "o_orderkey", "lineitem": "l_orderkey"}
    for name in keys:
        spark.sql(f"DROP TABLE IF EXISTS cfg_{name}_b{n_buckets}")

    # first read through the spec: materializes (the amortized shuffle)
    t0 = time.monotonic()
    cfg = {name: read_source(spark, spec_for(probe_dir, name, key,
                                             n_buckets))
           for name, key in keys.items()}
    t_materialize = round(time.monotonic() - t0, 3)

    # second read through the SAME spec: must reuse by table name
    t0 = time.monotonic()
    cfg = {name: read_source(spark, spec_for(probe_dir, name, key,
                                             n_buckets))
           for name, key in keys.items()}
    t_reuse = round(time.monotonic() - t0, 3)

    plain = {n: read_table(spark, probe_dir, n)
             for n in ("supplier", "nation", "lineitem", "orders")}
    q21_cfg = run_q21(spark, {"supplier": plain["supplier"],
                              "nation": plain["nation"], **cfg})
    plan = q21_cfg._jdf.queryExecution().executedPlan().toString()
    zero_orderkey_exchanges = (
        "Exchange hashpartitioning(l_orderkey" not in plan
        and "Exchange hashpartitioning(o_orderkey" not in plan)

    out = {"metric": "bucketed_config_probe", "probe_dir": probe_dir,
           "n_buckets": n_buckets,
           "materialize_sec": t_materialize, "reuse_sec": t_reuse,
           "zero_orderkey_exchanges": zero_orderkey_exchanges,
           "runs": {}}
    # rebuild the query per run in BOTH arms (bench_bucketed.py's
    # rule): counting the same DataFrame object twice lets the second
    # run reuse the first run's shuffle stages (skipped stages), which
    # inflated the bucketed arm's best-of-N vs the rebuilt plain arm
    # (review r10)
    cases = {
        "q21_plain": lambda: run_q21(spark, plain).count(),
        "q21_config_bucketed": lambda: run_q21(
            spark, {"supplier": plain["supplier"],
                    "nation": plain["nation"], **cfg}).count(),
    }
    for name, fn in cases.items():
        times = []
        for _ in range(runs):
            t0 = time.monotonic()
            fn()
            times.append(round(time.monotonic() - t0, 3))
        out["runs"][name] = {"best": min(times), "times": times}
        print(f"# {name}: {min(times)}s {times}", file=sys.stderr,
              flush=True)
    p = out["runs"]["q21_plain"]["best"]
    b = out["runs"]["q21_config_bucketed"]["best"]
    out["q21_speedup"] = round(p / b, 2) if b else None
    print(json.dumps(out))


if __name__ == "__main__":
    main()
