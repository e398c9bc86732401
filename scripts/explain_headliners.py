#!/usr/bin/env python
"""Dump the formatted physical plan of the bench headliners (and any
extra query names given on argv) to plans/$PLANS_ROUND/<name>_<tag>.txt
(default round dir: r13) — the before/after evidence artifacts for the
optimization rounds.

Usage: [PLANS_ROUND=rNN] python scripts/explain_headliners.py <tag> [extra_query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from oracle_cassandra_migrator_spark.queries import QUERIES  # noqa: E402
from oracle_cassandra_migrator_spark.session import build_session  # noqa: E402

HEADLINE = [
    "flagship_payment_pipeline", "pricing_summary", "topk_order_revenue",
    "rollup_acctbal_region_nation", "window_rank_top_orders",
    "window_running_total", "tpch_q8_market_share",
    "tpch_q21_waiting_suppliers", "asof_join_purchase_click",
    "events_sessionize", "events_daily_type_counts",
    "dedup_exact_documents", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "sim_topk_bruteforce", "sim_ann_lsh_exact", "text_bpe_token_counts",
    "udf_embedding_norms", "skew_salted_revenue_by_status",
]


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = HEADLINE + [n for n in sys.argv[2:] if n in QUERIES]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans",
        os.environ.get("PLANS_ROUND", "r13"))
    os.makedirs(out_dir, exist_ok=True)
    # local[32] so the plans reflect the bench session (the fan-out
    # gate keys off defaultParallelism)
    spark = build_session("explain-headliners",
                          master=os.environ.get("EXPLAIN_MASTER",
                                                "local[32]"))
    spark.sparkContext.setLogLevel("ERROR")
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    for name in names:
        df = QUERIES[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{tag}.txt")
        with open(path, "w") as out:
            out.write(f"# {name} — explain('formatted') at {sf_dir} ({tag})\n\n")
            out.write(plan)
        print(f"wrote {path}", file=sys.stderr)
    spark.stop()


if __name__ == "__main__":
    main()
