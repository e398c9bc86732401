#!/usr/bin/env python
"""Bench the PRODUCTION-CAP arms at the scale probes (VERDICT r7 item
3): the r7 probe rows for dedup_allpairs_prefix / dedup_ngram_jaccard /
sketch_kll_price_quantiles measured the UNCAPPED oracle-exact paths;
this measures the capped/sort-free switches those rows cite as the
100 TB configuration, plus the result deltas the cap actually costs.

Usage:
  python scripts/bench_capped_paths.py DIR[,DIR...] [cap] [runs]

Per dir prints one JSON line per arm:
  {"arm": ..., "dir": ..., "sec": best, "runs": [...], ...result facts}
Result facts: pair counts capped vs uncapped (recall of the cap), and
for KLL the approx-vs-exact p50/p90 plus the envelope booleans.

Corpus note: max shingle document frequency in the synthetic docs is
25 PER COPY and probe copies never share shingles, so a cap of 20
binds identically at every probe scale (drops the ~60 hottest
shingles per copy) — the relative effect is scale-invariant, which is
what makes the wall-ratio readings comparable across notches.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, ".")

from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402


def _timed(fn, runs):
    times = []
    out = None
    for _ in range(runs):
        t0 = time.monotonic()
        out = fn()
        times.append(round(time.monotonic() - t0, 2))
    return min(times), times, out


def main():
    dirs = sys.argv[1].split(",")
    cap = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    runs = int(sys.argv[3]) if len(sys.argv) > 3 else 2

    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)
    from oracle_cassandra_migrator_spark.operators.sketches import (
        kll_quantile_report)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    spark = build_session(app_name="ocm-capped-bench",
                          conf={"spark.driver.memory": "24g"})
    spark.sparkContext.setLogLevel("ERROR")

    # warm-up
    read_table(spark, "/root/testdata/sf0.001", "documents").count()

    for d in dirs:
        docs = read_table(spark, d, "documents").select("doc_id", "text")
        li = read_table(spark, d, "lineitem")

        sec, times, n_cap = _timed(
            lambda: allpairs_jaccard_pairs(
                docs, "text", "doc_id", threshold=0.5,
                max_token_df=cap).count(), runs)
        print(json.dumps({"arm": f"allpairs_capped_df{cap}", "dir": d,
                          "sec": sec, "runs": times, "n_pairs": n_cap}),
              flush=True)

        sec, times, n_ng = _timed(
            lambda: ngram_jaccard_pairs(
                docs, "text", "doc_id", threshold=0.5,
                max_token_df=cap).count(), runs)
        print(json.dumps({"arm": f"ngram_capped_df{cap}", "dir": d,
                          "sec": sec, "runs": times, "n_pairs": n_ng}),
              flush=True)

        # uncapped pair count once (recall denominator) — timed too so
        # the capped/uncapped wall ratio lands in the same log
        sec, times, n_unc = _timed(
            lambda: ngram_jaccard_pairs(
                docs, "text", "doc_id", threshold=0.5).count(), 1)
        print(json.dumps({"arm": "ngram_uncapped", "dir": d, "sec": sec,
                          "runs": times, "n_pairs": n_unc,
                          "cap_recall": round(n_ng / n_unc, 4)
                          if n_unc else None}), flush=True)

        val = "CAST(l_extendedprice AS DOUBLE)"
        sec, times, rows = _timed(
            lambda: kll_quantile_report(li, val, exact=False).collect(),
            runs)
        approx = rows[0].asDict()
        print(json.dumps({"arm": "kll_envelope_sketch", "dir": d,
                          "sec": sec, "runs": times, **approx}),
              flush=True)
        sec, times, rows = _timed(
            lambda: kll_quantile_report(li, val, exact=True).collect(), 1)
        exact = rows[0].asDict()
        print(json.dumps({
            "arm": "kll_envelope_exact", "dir": d, "sec": sec,
            "runs": times, **exact,
            "p50_delta": round(abs(approx["p50"] - exact["p50"]), 4),
            "p90_delta": round(abs(approx["p90"] - exact["p90"]), 4),
        }), flush=True)


if __name__ == "__main__":
    main()
