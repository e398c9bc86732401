#!/usr/bin/env python
"""Scale probe for the declarative ``embed_neardup`` step (r12): like
the dedup_near probe, the step runs connected components EAGERLY at
compile time, so the claims to verify are (a) compile wall is bounded
by the PAIR graph (labels shuffle, never vectors) and (b) with
``n_planes`` sized so per-bucket occupancy stays bounded, the sign-LSH
pair graph grows ~linearly with the corpus (the make_scale_probe
fixture replicates vectors with shifted ids, so a 10x corpus has ~10x
true near-dup pairs — every replica is an exact duplicate of its
source vector, cosine 1.0).

The n_planes knob is the scale lever the SURVEY row documents: buckets
are 2^n_planes, so occupancy ~ n / 2^n_planes — a 100 TB corpus raises
n_planes (or ORs multiple tables for recall), keeping the bucket join
quadratic only within bounded cells.

The probe fixture (make_scale_probe) replicates every vector 100x
with shifted ids, so UNCAPPED pair enumeration is data-quadratic:
a duplicate group of g vectors inherently holds g*(g-1)/2 verified
pairs (9.9M at the 100x notch) — mass-duplicate structure belongs to
an exact-hash dedup pass BEFORE pairwise verification (the curation
funnel's ordering), and ``max_bucket_size`` is the in-step valve that
refuses to enumerate such buckets. The probe therefore runs CAPPED:
wall must track the surviving pair graph, not the corpus.

Usage: python scripts/bench_embed_neardup_step.py [dir,dir...]
    [n_planes] [max_bucket_size|none] [runs]
Prints one JSON line per dir: {dir, n_vecs, n_planes,
max_bucket_size, n_pairs, compile_s, action_s, decisions, dropped}.
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
    n_planes = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    cap = (None if len(sys.argv) > 3 and sys.argv[3] == "none"
           else int(sys.argv[3]) if len(sys.argv) > 3 else 150)
    runs = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    spark = build_session(
        app_name="ocm-embed-neardup-step-probe",
        conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    from oracle_cassandra_migrator_spark.operators.similarity import (
        cosine_pairs_lsh_blocked)
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    for d in dirs:
        emb = read_table(spark, d, "embeddings")
        n_vecs = emb.count()
        n_pairs = cosine_pairs_lsh_blocked(
            emb, threshold=0.9, dim=64, n_planes=n_planes,
            max_bucket_size=cap).count()
        best = None
        for _ in range(runs):
            t0 = time.monotonic()
            decisions = compile_transform(spark, {"emb": emb}, [
                {"op": "embed_neardup", "input": "emb", "id": "vec_id",
                 "vec": "embedding", "threshold": 0.9, "dim": 64,
                 "n_planes": n_planes, "max_bucket_size": cap},
            ])
            compile_s = time.monotonic() - t0
            t1 = time.monotonic()
            n_dec = decisions.count()
            dropped = decisions.where("NOT is_kept").count()
            action_s = time.monotonic() - t1
            if best is None or compile_s + action_s < sum(best):
                best = (compile_s, action_s)
        print(json.dumps({
            "dir": d, "n_vecs": n_vecs, "n_planes": n_planes,
            "max_bucket_size": cap, "n_pairs": n_pairs,
            "compile_s": round(best[0], 2),
            "action_s": round(best[1], 2),
            "decisions": n_dec, "dropped": dropped,
        }), flush=True)


if __name__ == "__main__":
    main()
