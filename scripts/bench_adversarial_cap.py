#!/usr/bin/env python
"""The max_token_df cap against the corpus it exists for: every doc
shares one boilerplate phrase, so the inverted-index self-join emits
~N^2/2 rows for the hot shingles UNCAPPED while the capped path drops
them before the join. The synthetic probes cannot show this (their
per-copy max shingle df is 25 by construction — SCALE.md r8), so this
generates the adversarial corpus directly.

Usage: python scripts/bench_adversarial_cap.py [cap] [runs]
Prints one JSON line per (arm, n_docs).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def corpus(spark, n):
    boiler = ("please subscribe to our newsletter for updates and "
              "follow us on every social platform today")
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat('{boiler}', ' unique token ', id, ' tail ', id * 7, "
        f"' mark ', id * 13) AS text")


def main():
    cap = int(sys.argv[1]) if len(sys.argv) > 1 else 1000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 1

    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)

    spark = build_session(app_name="ocm-adversarial-cap",
                          conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")
    corpus(spark, 100).count()  # warm-up

    def timed(fn):
        best, n_pairs = None, None
        for _ in range(runs):
            t0 = time.monotonic()
            n_pairs = fn()
            dt = round(time.monotonic() - t0, 2)
            best = dt if best is None else min(best, dt)
        return best, n_pairs

    for op_name, op in (("ngram", ngram_jaccard_pairs),
                        ("allpairs", allpairs_jaccard_pairs)):
        # uncapped melts quadratically: keep N small enough to finish
        for n in (2000, 4000, 8000):
            docs = corpus(spark, n)
            sec, np_ = timed(lambda: op(
                docs, "text", "doc_id", threshold=0.5).count())
            print(json.dumps({"arm": f"{op_name}_uncapped", "n_docs": n,
                              "sec": sec, "n_pairs": np_}), flush=True)
        for n in (2000, 8000, 32000, 128000):
            docs = corpus(spark, n)
            sec, np_ = timed(lambda: op(
                docs, "text", "doc_id", threshold=0.5,
                max_token_df=cap).count())
            print(json.dumps({"arm": f"{op_name}_capped_df{cap}",
                              "n_docs": n, "sec": sec, "n_pairs": np_}),
                  flush=True)


if __name__ == "__main__":
    main()
