#!/usr/bin/env python
"""100x-notch probe for the declarative ``dedup_near`` step (VERDICT
r10 item 8): the step runs connected components EAGERLY at compile
time (checkpointed label propagation), so the claim to verify at the
probe corpus is that (a) compile time stays bounded — the CC rounds
shuffle the PAIR GRAPH, never the corpus — and (b) the pair graph
itself grows ~linearly with the corpus (the make_scale_probe fixture
perturbs shingles across copies exactly so that a 10x corpus has ~10x
pairs, like a real crawl).

Usage: python scripts/bench_dedup_near_step.py [dir,dir...] [runs]
Prints one JSON line per dir: {dir, n_docs, n_pairs, compile_s,
action_s, decisions}.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402
from oracle_cassandra_migrator_spark.sources.testdata import read_table  # noqa: E402


def main():
    dirs = (sys.argv[1].split(",") if len(sys.argv) > 1
            else ["/root/testdata/sf0.1", "/tmp/ocm-sf10"])
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    spark = build_session(
        app_name="ocm-dedup-near-step-probe",
        conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_cassandra_migrator_spark.operators.dedup import (
        minhash_lsh_pairs)
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    for d in dirs:
        docs = read_table(spark, d, "documents")
        n_docs = docs.count()
        n_pairs = minhash_lsh_pairs(docs, "text", "doc_id",
                                    threshold=0.5).count()
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            decisions = compile_transform(spark, {"docs": docs}, [
                {"op": "dedup_near", "input": "docs", "text": "text",
                 "id": "doc_id", "threshold": 0.5},
            ])
            compile_s = time.monotonic() - t0
            t1 = time.monotonic()
            n_dec = decisions.count()
            action_s = time.monotonic() - t1
            if best is None or compile_s + action_s < sum(best):
                best = (compile_s, action_s)
        print(json.dumps({
            "dir": d, "n_docs": n_docs, "n_pairs": n_pairs,
            "compile_s": round(best[0], 2),
            "action_s": round(best[1], 2),
            "decisions": n_dec,
        }), flush=True)


if __name__ == "__main__":
    main()
