"""Shuffle-budget lockfile: every headline query's physical plan is
pinned to a maximum number of exchanges (hash / range / single), so a
refactor that silently adds a shuffle — the classic 100 TB regression —
fails here instead of in the next benchmark round.

Budgets are the counts measured from the current, audited plans
(PLANS.md / VERDICT r4 plan review). Raising a budget is allowed but
must be a conscious edit of this file, with the reason in the commit.
"""

import re

import pytest

from oracle_cassandra_migrator_spark.queries import QUERIES

from tests.conftest import SF_SMALL

# name -> (max hashpartitioning, max rangepartitioning, max SinglePartition)
SHUFFLE_BUDGET = {
    "flagship_payment_pipeline": (0, 0, 0),   # all dims broadcast
    # r12: +1 = the keyed scan fan-out (single-row-group input; the
    # exchange parallelizes the 6-decimal-aggregate map stage, 1.6s ->
    # 0.7s at sf0.1, and is gated off whenever the input splits)
    "pricing_summary": (2, 0, 0),
    "topk_order_revenue": (1, 0, 0),
    "rollup_acctbal_region_nation": (1, 0, 0),
    "window_rank_top_orders": (1, 0, 0),
    "window_running_total": (1, 0, 0),
    "tpch_q8_market_share": (1, 0, 0),
    # r12: EXISTS/NOT-EXISTS -> one l_orderkey window pass. +1 hash
    # exchange on paper, but it REPLACES two lineitem-wide broadcast
    # builds and two of the three lineitem scans (measured 1.10s ->
    # 0.80s at sf0.1; at scale: one shuffle of lineitem instead of
    # three passes + two unbroadcastable builds).
    "tpch_q21_waiting_suppliers": (2, 0, 0),
    "asof_join_purchase_click": (1, 0, 0),
    "events_sessionize": (1, 0, 0),
    "events_daily_type_counts": (1, 0, 0),
    "dedup_exact_documents": (1, 0, 0),
    # r12: per-row array-expression signatures + grouped in-band pair
    # generation — band group agg + candidate distinct + pair agg only
    # (was 6: the explode+groupBy signature pipeline and its band-cap
    # window ran TWICE, once per self-join side)
    "dedup_minhash_lsh": (3, 0, 0),
    "dedup_ngram_jaccard": (1, 0, 0),
    "sim_topk_bruteforce": (0, 0, 0),
    "sim_ann_lsh_exact": (0, 0, 0),
    "text_bpe_token_counts": (0, 0, 0),
    "udf_embedding_norms": (0, 0, 0),
    "skew_salted_revenue_by_status": (2, 0, 0),  # salted two-stage agg
}


@pytest.mark.parametrize("name", sorted(SHUFFLE_BUDGET))
def test_headline_query_within_shuffle_budget(spark, name):
    plan = (QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    h = len(re.findall(r"Exchange hashpartitioning", plan))
    r = len(re.findall(r"Exchange rangepartitioning", plan))
    s = len(re.findall(r"Exchange SinglePartition", plan))
    mh, mr, ms = SHUFFLE_BUDGET[name]
    assert h <= mh and r <= mr and s <= ms, (
        f"{name}: exchanges (hash={h}, range={r}, single={s}) exceed "
        f"budget (hash={mh}, range={mr}, single={ms}) — a shuffle was "
        f"added; if intentional, raise the budget here with rationale")
