"""Time a list of catalog queries at one or more sf dirs (the scale-
probe harness behind SCALE.md's measured tables).

Usage:
  python scripts/bench_scale_probe.py QUERY[,QUERY...] DIR[,DIR...] [runs]

Prints one JSON line: {query: {dir: best_sec}}. best-of-``runs`` per
(query, dir) after a warm-up pass of the first query at sf0.001.
"""

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def main():
    names = sys.argv[1].split(",")
    dirs = sys.argv[2].split(",")
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from oracle_cassandra_migrator_spark.queries import QUERIES

    spark = build_session(
        app_name="ocm-scale-probe-bench",
        conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    # JVM / codegen warm-up
    QUERIES[names[0]](spark, "/root/testdata/sf0.001").write.format(
        "noop").mode("overwrite").save()

    out = {}
    for name in names:
        out[name] = {}
        for d in dirs:
            times = []
            for _ in range(runs):
                t0 = time.monotonic()
                QUERIES[name](spark, d).write.format("noop") \
                    .mode("overwrite").save()
                times.append(round(time.monotonic() - t0, 2))
            out[name][d] = min(times)
            print(f"# {name} @ {d}: {min(times)}s {times}",
                  file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
