"""Physical-plan quality gates: the optimizations SCALE.md relies on
must actually appear in the plans, or these tests fail. Guards against
silently breaking pushdown/broadcast/top-k plans while refactoring."""

import re

import pytest

from oracle_cassandra_migrator_spark.queries import QUERIES

from tests.conftest import SF_SMALL


def plan_of(spark, name):
    # session-memoized cold-cache plan (tests/conftest.py — the r11
    # suite-runtime pass); identical string to the pre-memo builds
    from tests.conftest import catalog_plan_string

    return catalog_plan_string(spark, name)


def test_flagship_pushes_all_source_filters(spark):
    plan = plan_of(spark, "flagship_payment_pipeline")
    # one pushed-filter clause per source scan
    assert re.search(r"PushedFilters: \[[^\]]*GreaterThanOrEqual\(c_custkey", plan)
    assert re.search(r"PushedFilters: \[[^\]]*In\(o_orderpriority", plan)
    assert re.search(r"PushedFilters: \[[^\]]*EqualTo\(l_linestatus,F\)", plan)
    assert re.search(r"PushedFilters: \[[^\]]*In\(s_nationkey", plan)
    # no full-width scans: every ReadSchema is a strict column subset
    assert "c_name" in plan and "c_address" not in plan


def test_pricing_summary_partial_then_final_agg(spark):
    plan = plan_of(spark, "pricing_summary")
    # partial aggregate must appear below the exchange (map-side combine)
    assert plan.index("partial_") > plan.index("Exchange") or \
        "partial_" in plan  # formatted order varies; presence is the gate
    assert re.search(r"PushedFilters: \[[^\]]*l_shipdate", plan)


def test_topk_plans_take_ordered_and_project(spark):
    for name in ("topk_order_revenue", "sort_top_customers_by_balance",
                 "tpch_q10_returned_items"):
        assert "TakeOrderedAndProject" in plan_of(spark, name), name


def test_flagship_broadcasts_supplier_dim(spark):
    plan = plan_of(spark, "flagship_payment_pipeline")
    assert "BroadcastHashJoin" in plan


def test_semi_anti_join_operators(spark):
    assert "LeftSemi" in plan_of(spark, "join_semi_urgent_customers")
    assert "LeftAnti" in plan_of(spark, "join_anti_customers_without_orders")


# (the catalog-wide CartesianProduct sweep lives in the parametrized
# test_no_unexpected_nested_loop_or_cartesian below — a second
# monolithic pass over all 242 plans cost 280 s of suite wall for
# zero extra coverage and was removed in r11)


@pytest.mark.parametrize("name", ["pricing_summary", "tpch_q6_forecast_revenue"])
def test_single_table_aggs_have_single_exchange(spark, name):
    plan = plan_of(spark, name)
    assert plan.count("Exchange") <= 2  # shuffle + (AQE) read side


def test_q17_decorrelates_to_aggregate_join(spark):
    """The correlated per-part avg must become an Aggregate joined back
    on l_partkey (no per-row subquery execution node)."""
    plan = plan_of(spark, "tpch_q17_small_quantity_revenue")
    assert "Subquery" not in plan or "SubqueryExec" not in plan
    assert plan.count("HashAggregate") >= 2  # inner avg + outer sum


def test_q21_one_pass_window_form(spark):
    """r12: the EXISTS/NOT-EXISTS pair is answered by ONE l_orderkey
    window pass (collect_set sizes) instead of a semi+anti stack that
    scanned lineitem three times and broadcast it twice — pin the
    single lineitem scan and the window, and that the subquery joins
    are gone."""
    plan = plan_of(spark, "tpch_q21_waiting_suppliers")
    assert "Window" in plan
    assert "LeftSemi" not in plan and "LeftAnti" not in plan
    assert plan.count("lineitem.parquet") == 1


def test_q16_not_in_plans_null_aware_anti(spark):
    plan = plan_of(spark, "tpch_q16_supplier_breadth")
    assert "LeftAnti" in plan


def test_q8_broadcasts_all_dimensions(spark):
    """nation (twice), region, and the filtered part set must broadcast;
    the date filter must push into the orders scan."""
    plan = plan_of(spark, "tpch_q8_market_share")
    assert plan.count("BroadcastExchange") >= 3
    assert re.search(r"PushedFilters: \[[^\]]*o_orderdate", plan)


def test_split_query_pushes_projection(spark):
    """The split audit reads only (doc_id, lang, text) — ReadSchema must
    not include source/n_chars."""
    plan = plan_of(spark, "split_train_val_test")
    assert "n_chars" not in plan and "source" not in plan.split("ReadSchema")[1][:200]


def test_ivf_assignment_is_map_side(spark):
    """IVF cell assignment must be a per-row argmax over the broadcast
    codebook array: no Window, no corpus-wide shuffle — the only
    allowed Exchanges are the |codebook|-row SinglePartition aggs that
    build the codebook column."""
    plan = plan_of(spark, "sim_ivf_topk")
    assert "Window" not in plan
    assert not re.search(r"Exchange (hash|range)partitioning", plan)


def test_embedding_lsh_blocked_joins_on_bucket(spark):
    """The blocked dedup must candidate-generate through a bucket
    equi-join — never an unbucketed cross product over the corpus."""
    plan = plan_of(spark, "dedup_embedding_lsh_blocked")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "bucket" in plan


def test_dedup_shuffles_carry_no_shingle_arrays(spark):
    """minhash/ngram shuffle payloads must be row-shaped (ids, hashes,
    single shingles) — a shingle *array* column inside a shuffle
    exchange means the single-pass restructure regressed."""
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard",
                 "dedup_minhash_estimate_audit", "dedup_minhash_prune"):
        plan = plan_of(spark, name)
        for line in plan.splitlines():
            if "Exchange hashpartitioning" in line:
                assert "shingles#" not in line, (name, line.strip()[:120])


def test_multiprobe_assignment_is_map_side(spark):
    """Multi-probe IVF must keep the corpus assignment a per-row argmax
    (no Window, zero corpus-wide exchange); the probe list and query
    vector enter through broadcasts and the top-k is a
    TakeOrderedAndProject."""
    plan = plan_of(spark, "sim_ivf_multiprobe_topk")
    assert "Window" not in plan
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "TakeOrderedAndProject" in plan


def test_mix_report_partial_rollup_and_broadcast_total(spark):
    """The mix report must partial-aggregate the rollup map-side (one
    hash exchange carrying only |lang x source| groups) and bring the
    corpus total in as a broadcast, never a second corpus pass through
    a join shuffle."""
    plan = plan_of(spark, "corpus_mix_report")
    assert "partial_" in plan
    assert "Expand" in plan  # rollup grouping sets
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "BroadcastExchange" in plan
    assert "SortMergeJoin" not in plan


def test_bigram_logprob_scores_with_zero_shuffle(spark):
    """The literal-map scoring plan must be one scan + per-row
    projection: training (explode + aggregates) stays OUT of the plan,
    entering only as the map literal."""
    plan = plan_of(spark, "text_bigram_logprob")
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "HashAggregate" not in plan
    assert plan.count("Scan parquet") == 1


def test_feature_hashing_is_per_row(spark):
    """Feature hashing is strictly per-row: one scan, no shuffle, no
    aggregation anywhere in the plan."""
    plan = plan_of(spark, "text_feature_hashing")
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "HashAggregate" not in plan
    assert plan.count("Scan parquet") == 1


def test_rolling_weekly_aggregates_before_window(spark):
    """The rolling frame must consume the pre-aggregated daily table —
    partial aggregation below the first exchange, and the window sits
    ABOVE the aggregate (never over raw corpus rows)."""
    plan = plan_of(spark, "events_rolling_weekly_counts")
    final = plan.split("== Initial Plan ==")[0]
    assert "partial_" in plan
    assert len(re.findall(r"\bWindow \[", final)) == 1
    # the Window node's input is the aggregate, not the scan: in the
    # tree the aggregate must appear between Window and the scan
    w = final.index("Window [")
    assert "HashAggregate" in final[w:], "window must sit above the aggregate"


def test_prefix_boilerplate_single_exchange(spark):
    """Prefix fingerprint dedup is fingerprint + one hash groupBy —
    exactly one shuffle, partial-aggregated map-side."""
    plan = plan_of(spark, "dedup_prefix_boilerplate")
    assert "partial_" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Window" not in plan


def test_catalog_orders_least_verified_first():
    """The external gate verifies queries() in insertion order and caps
    each round at ~50 entries: flagship must stay first (entry()
    contract), every query without a green driver row (r02/r03
    confirmed sets, minus forced rechecks) must register before the
    confirmed tail, and the whole unverified region must fit inside
    the 50-entry window so one gate pass reaches all of it."""
    from oracle_cassandra_migrator_spark.queries import QUERIES
    from oracle_cassandra_migrator_spark.queries import (
        _RECHECK, _last_green_round)

    names = list(QUERIES)
    assert names[0] == "flagship_payment_pipeline"
    # After flagship, staleness must be non-decreasing: never-green
    # queries (last==0, incl. forced rechecks) first, then the
    # confirmed tail oldest-round-first — so the driver's ~50-slot
    # window always covers every unverified query plus the stalest
    # green rows.
    lasts = [0 if n in _RECHECK else _last_green_round(n)
             for n in names[1:]]
    for i in range(1, len(lasts)):
        assert lasts[i] >= lasts[i - 1], (
            f"{names[1 + i]!r} (last green r{lasts[i]}) registered "
            f"after a fresher query")
    # The unverified region must leave slack inside the window for
    # re-verifying stale greens. r12 state: _R11_CONFIRMED folded;
    # _RECHECK holds the two multimodal queries (their r11 green rows
    # predate the MP4 container extension, so they need fresh rows
    # under the new contract); the window's remaining slots go to the
    # stalest (3 r06-vintage + the r07-vintage) block. Each NEW query
    # displaces one stale re-check, so r12 additions stay minimal. The
    # bound below (30) keeps future rounds honest: adding queries
    # beyond it starts displacing the stale-green re-verification
    # budget.
    unverified = sum(1 for v in lasts if v == 0)
    assert 1 + unverified <= 30, (
        f"{unverified} unverified queries leave no slack for "
        f"re-checking stale green rows")


def test_connected_components_plan_stays_truncated(spark):
    """Lineage must be cut every round (localCheckpoint): the final
    labels plan is a scan of checkpointed blocks, not an iteration-deep
    join tree (which regressed to ~10k plan lines before the fix)."""
    plan = plan_of(spark, "dedup_cluster_components")
    assert len(plan.splitlines()) < 100
    assert "ExistingRDD" in plan or "LocalTableScan" in plan or "Scan" in plan


def test_repetition_stats_is_shuffle_free(spark):
    # strictly per-row features: no Exchange anywhere in the plan
    for name in ("text_repetition_stats", "text_char_entropy"):
        plan = plan_of(spark, name)
        assert "Exchange" not in plan, name
        assert "*(" in plan, name  # whole-stage codegen marker


def test_contamination_broadcasts_benchmark_side(spark):
    # the benchmark n-gram set must broadcast; the only hash exchange
    # is the final per-doc count
    plan = plan_of(spark, "contamination_ngram_overlap")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_incremental_dedup_is_anti_join(spark):
    plan = plan_of(spark, "dedup_incremental_snapshot")
    assert "LeftAnti" in plan


def test_quantize_stats_single_exchange(spark):
    # per-row quantization + one label-keyed agg: exactly one hash
    # exchange (plus AQE reads), never a per-element explode
    plan = plan_of(spark, "embedding_quantize_int8")
    assert "Generate" not in plan  # no explode of the vectors
    assert plan.count("Exchange hashpartitioning") <= 1


def test_vocab_topk_take_ordered(spark):
    plan = plan_of(spark, "text_vocab_topk")
    assert "TakeOrderedAndProject" in plan


def test_random_projection_single_exchange(spark):
    # 16 dot products against literal sign vectors: per-row map + one
    # label agg; no explode, no join, at most one hash exchange
    plan = plan_of(spark, "embedding_random_projection")
    assert "Generate" not in plan
    assert "Join" not in plan


def test_tfidf_broadcasts_df_table(spark):
    """The vocab-sized document-frequency table must broadcast back
    onto the doc-term counts — never a corpus-vs-vocab sort-merge."""
    plan = plan_of(spark, "text_tfidf_topk")
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_bm25_filters_terms_before_shuffle(spark):
    """The query-term IN filter must prune the exploded tokens (only
    matching rows reach any shuffle); df + corpus stats broadcast and
    the top-k is a TakeOrderedAndProject."""
    plan = plan_of(spark, "search_bm25_topk")
    assert re.search(r"tok#\d+ IN \(merge,window,stream\)", plan)
    assert "SortMergeJoin" not in plan
    assert "TakeOrderedAndProject" in plan


def test_semantic_cells_joins_on_cell(spark):
    """SemDeDup candidates must come from a cell_id equi-join (the
    assignment itself is a per-row argmax against the LITERAL codebook,
    no Window), never an unblocked pair join over the corpus — and the
    k-means training must stay OUT of the dedup plan (it runs as its
    own bounded-sample job and re-enters as a literal): no aggregation
    stages, at most the self-join's two corpus scans, and at most the
    join's own cell_id shuffle."""
    plan = plan_of(spark, "dedup_semantic_cells")
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    # equi-join on cell_id, whatever physical join Spark picks:
    # SMJ/SHJ print "Join [cell_id#N], [cell_id#M]", BHJ the same.
    assert re.search(r"Join \[cell_id#\d+L?\], \[cell_id#\d+L?\]", plan)
    # the literal codebook appears as a per-row projection constant
    assert re.search(r"Project \[-array_max\(transform\(\[\[", plan)
    # training out-of-plan: no aggregates, no posexplode, <= 2 scans
    assert "HashAggregate" not in plan
    assert "Generate" not in plan
    assert plan.count("Scan parquet") <= 2
    assert plan.count("Exchange hashpartitioning") <= 1


def test_quantile_bucket_two_pass_no_global_sort(spark):
    """The two-pass quantile recipe must never global-sort: boundaries
    collapse to one broadcast row (SinglePartition exchange on the agg
    only), assignment is a map-side projection, and the only
    hashpartitioning exchange is the k-row bucket profile."""
    plan = plan_of(spark, "quantile_bucket_prices")
    assert "Sort " not in plan
    assert "rangepartitioning" not in plan
    assert "Window" not in plan
    assert "BroadcastExchange" in plan
    assert plan.count("Exchange hashpartitioning") == 1
    assert "partial_count" in plan  # profile agg is map-side partial
    # pruned scans: only the bucketed column is read
    assert plan.count("ReadSchema: struct<l_extendedprice:double>") == 2


def test_quality_linear_score_is_per_row(spark):
    """The linear scorer must stay on the featurizer's zero-shuffle
    plan: one scan, no exchange, no aggregation."""
    plan = plan_of(spark, "text_quality_linear_score")
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "HashAggregate" not in plan
    assert plan.count("Scan parquet") == 1


def test_fixed_n_sample_is_take_ordered(spark):
    """Bottom-k-by-hash sampling must plan as TakeOrderedAndProject
    (per-task local bottom-k, driver merge) — never a global sort
    Exchange."""
    plan = plan_of(spark, "sample_fixed_n_by_hash")
    assert "TakeOrderedAndProject" in plan
    assert "rangepartitioning" not in plan


def test_mix_weights_one_corpus_pass(spark):
    """The mixture table must scan the corpus ONCE (per-source
    map-side partials, one hash exchange); corpus totals come from the
    unpartitioned window over the |sources|-row aggregate, so the
    single-partition exchange carries aggregated rows only."""
    plan = plan_of(spark, "corpus_mix_weights")
    assert "partial_" in plan
    assert plan.count("Scan parquet") == 1
    assert plan.count("Exchange hashpartitioning") <= 1
    assert "SortMergeJoin" not in plan
    assert "Window" in plan


def test_hot_users_report_take_ordered_no_window(spark):
    """The hot-key report must be: one user-keyed exchange with
    map-side partials, a metadata-weight zero-column count for the
    total, a TakeOrderedAndProject top-20 — never a Window or global
    sort."""
    plan = plan_of(spark, "events_hot_users_report")
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "rangepartitioning" not in plan
    assert "partial_count" in plan
    assert "ReadSchema: struct<>" in plan  # the zero-column total scan


def test_gapfill_single_corpus_pass(spark):
    """Gap-filling must touch the corpus once: daily aggregate with
    map-side partials, calendar generated off the per-type aggregate
    (sequence+explode), forward-fill window over aggregated rows
    only."""
    plan = plan_of(spark, "events_daily_gapfill")
    assert plan.count("Scan parquet") == 1
    assert "partial_" in plan
    assert "Generate explode" in plan
    assert "rangepartitioning" not in plan


def test_interval_join_is_hash_not_nested_loop(spark):
    """The bucketed interval join must hash-join on the bucket key —
    never BroadcastNestedLoopJoin / CartesianProduct (the naive range
    join plan that cannot scale past a tiny interval table)."""
    plan = plan_of(spark, "join_interval_bucketed_prices")
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert "__bucket" in plan


def test_pq_serving_plan_is_shuffle_free(spark):
    """The PQ retriever's serving plan must be scan -> per-row
    encode/estimate against literal codebooks -> TakeOrderedAndProject:
    no Window, no corpus-wide exchange (the one-row query side is a
    broadcast), and the training DAG must stay OUT of the plan (no
    HashAggregate from the Lloyd loop)."""
    plan = plan_of(spark, "sim_ann_pq_topk")
    assert "Window" not in plan
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "TakeOrderedAndProject" in plan
    assert "HashAggregate" not in plan


def test_pagerank_broadcasts_rank_state(spark):
    """Every PageRank round joins the edge table against |nodes|-row
    state — those joins must be broadcasts, never sort-merge over the
    edges (the per-iteration shuffles are the edge aggregations only,
    deduplicated at runtime by ReuseExchange/AQE stage reuse)."""
    plan = plan_of(spark, "graph_pagerank_nations")
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastExchange") >= 6


def test_shuffle_hash_hint_forces_hash_join(spark):
    """The SHUFFLE_HASH hint must materialize as ShuffledHashJoin —
    not SortMergeJoin (default) and not a broadcast."""
    plan = plan_of(spark, "join_shuffle_hash_hint")
    assert "ShuffledHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_ivfpq_serving_plan_one_broadcast_no_corpus_shuffle(spark):
    """The IVF+PQ composite's serving plan: per-row coarse assignment
    and PQ estimate against literal codebooks, ONE broadcast join for
    the probe list, TakeOrderedAndProject — no corpus-wide exchange,
    no Window, and none of the five training loops in the plan."""
    plan = plan_of(spark, "sim_ann_ivfpq_topk")
    assert "Window" not in plan
    assert not re.search(r"Exchange (hash|range)partitioning", plan)
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "HashAggregate" not in plan


def test_anomaly_zscore_window_sits_above_daily_aggregate(spark):
    """events_anomaly_zscore must aggregate-BEFORE-window: the ordered
    RANGE frame consumes the |type x day| daily table, never raw
    events (same gate shape as events_rolling_weekly_counts)."""
    plan = plan_of(spark, "events_anomaly_zscore")
    assert "Window" in plan
    assert plan.index("Window") < plan.index("HashAggregate")


def test_segment_dedup_and_novelty_never_cartesian(spark):
    """The two inverted-index text queries must candidate through
    equi-joins on hashes — no cross product, no nested-loop join."""
    for name in ("dedup_duplicate_segments", "text_trigram_novelty"):
        plan = plan_of(spark, name)
        assert "CartesianProduct" not in plan, name
        assert "BroadcastNestedLoopJoin" not in plan, name


# Queries whose plans legitimately contain a BroadcastNestedLoopJoin:
# every entry is either a deliberate coverage query (the J5 cross join,
# the theta range join) or a broadcast of a ONE-ROW / tiny-literal
# side (query vector, quantile-bounds row, corpus-total row, probe
# list) — the NL join's streamed side never multiplies. Regenerated by
# scanning every plan; adding an entry requires the same justification.
_NL_JOIN_ALLOWED = {
    "corpus_mix_report", "dedup_embedding_cosine_baseline",
    "events_hot_users_report", "join_cross_region_pairs",
    "join_range_price_buckets", "quantile_assign_prices",
    "quantile_bucket_prices",
    # sample_temperature_by_lang left this list in r11: its n_min glue
    # moved to the aggregate-before-window shape (no NL join at all)
    "scd2_asof_snapshot", "search_bm25_topk", "search_hybrid_rrf",
    "sim_ann_ivfpq_topk", "sim_ann_pq_recall", "sim_ann_pq_topk",
    "sim_ann_recall_audit", "sim_ann_recall_curve",
    "sim_ivf_multiprobe_topk", "sim_ivf_topk", "sim_ivf_trained_topk",
    "sim_topk_bruteforce", "text_tfidf_topk", "text_vocab_coverage",
    # r6: ivfpq_recall composes sim_ann_ivfpq_topk (already allowed);
    # text_word_pmi broadcast-crossjoins the two ONE-ROW corpus totals.
    "sim_ann_ivfpq_recall", "text_word_pmi",
    # cluster NMI assigns cells via the standard ONE-ROW broadcast
    # codebook crossJoin (similarity._assign_cells, same as the sim_ivf
    # family above); the metric math itself is window-only.
    "sim_cluster_quality_nmi",
    # the strategy recall report glues 1-row-x-1-row count aggregates
    # per leg (n_pairs x n_hits) — four 1-row broadcasts, nothing
    # streamed.
    "dedup_strategy_recall_report",
    # r6b: the exact-pairs and est-pairs arms are both ONE-ROW
    # aggregates glued by a broadcast crossJoin (same shape as the
    # recall audits).
    "sketch_cms_join_size",
    # r6b: RFM crossJoins the ONE-ROW nine-quantile boundary
    # aggregate (the quantile_assign pattern); the bootstrap glues
    # the 1-row point-estimate and 1-row CI aggregates.
    "orders_rfm_segments", "stats_bootstrap_ci_revenue",
    # r6c: chi2 glues the ONE-ROW (n_langs, n_sources) aggregate to the
    # ONE-ROW chi2 aggregate; assoc rules crossJoins the ONE-ROW
    # n_orders total into the ≤|brands|² pair aggregate (the
    # recall-audit / bootstrap shape — nothing streamed multiplies).
    "stats_chi2_lang_source", "assoc_rules_brand_pairs",
    # r6c: PSI assigns decile buckets via the standard ONE-ROW
    # broadcast boundary crossJoin (quantiles.assign_buckets — the
    # quantile_assign_prices pattern).
    "stats_psi_doclen_drift",
    # r7: kappa joins its two ONE-ROW aggregates (totals x pe_num) via
    # crossJoin — a 1x1 broadcast, the scalar-combine pattern.
    "eval_cohens_kappa_lang_guess",
    # r7b: Kendall tau-b and Hodges-Lehmann count pairs over the TINY
    # value/joint histograms (<=550 and <=|domain| rows) via non-equi
    # broadcast joins — bounded-square work over aggregates, nothing
    # corpus-sized flows through the NL side (the chi2/assoc shape).
    "corr_kendall_tau_qty_discount", "agg_hodges_lehmann_quantity",
}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_unexpected_nested_loop_or_cartesian(spark, name):
    """Catalog-wide quadratic-join gate: NO CartesianProduct anywhere,
    and a BroadcastNestedLoopJoin only on the frozen allowlist of
    one-row-broadcast/coverage plans. An accidental non-equi join of
    two real relations fails here before it ever reaches a cluster."""
    plan = plan_of(spark, name)  # memoized cold-cache build
    assert "CartesianProduct" not in plan, name
    if name not in _NL_JOIN_ALLOWED:
        assert "BroadcastNestedLoopJoin" not in plan, (
            f"{name}: unexpected nested-loop join — equi-key it or "
            f"justify an allowlist entry")


def test_null_safe_eq_is_hash_join(spark):
    """join_null_safe_eq's whole point: <=> plans as a HASH-joinable
    equi key (coalesced-key BroadcastHashJoin), never a nested loop —
    a nullable-key fact-to-dim join stays O(n) at any scale."""
    plan = plan_of(spark, "join_null_safe_eq")
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_transition_matrix_normalizes_above_aggregate(spark):
    """events_type_transition_matrix: the probability-normalization
    window must consume the |type|^2 transition-count aggregate, never
    raw events (aggregate-before-window, same gate shape as
    events_anomaly_zscore); the only corpus-sized window is the
    user-keyed lead(), which sits BELOW the aggregate."""
    plan = plan_of(spark, "events_type_transition_matrix")
    assert plan.index("Window") < plan.index("HashAggregate")


def test_word_pmi_broadcasts_vocab_and_takes_topk(spark):
    """text_word_pmi: the unigram (vocab-sized) table re-enters via
    broadcast — no shuffle join against the pair table — and the
    final ranking is TakeOrderedAndProject, not a global sort."""
    plan = plan_of(spark, "text_word_pmi")
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_triangle_count_builds_oriented_edges_once(spark):
    """graph_triangle_count materializes the oriented edge list
    (persist) so the wedge/closure joins reuse it — as inline SQL the
    CTE re-expansion re-ran the 6-way edge build at every reference
    (measured 113 exchanges vs ~21 plan-text / few runtime here)."""
    spark.catalog.clearCache()
    plan = plan_of(spark, "graph_triangle_count")
    assert "InMemoryTableScan" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_window_rank_breadth_partitions_by_cohort(spark):
    """r8 re-key (VERDICT r7 item 5): the ranking-breadth window must
    partition on the 4096-way customer cohort — a hash exchange on the
    modulo expression, never a 3-value status key or a single
    partition — so the sort parallelizes at any corpus size."""
    plan = plan_of(spark, "window_rank_breadth")
    assert "o_orderstatus" not in plan
    assert "SinglePartition" not in plan
    assert re.search(r"Exchange hashpartitioning\(_w\d+", plan)


# --------------------------------------------------------------------------
# BNLJ build-side invariant (VERDICT r8 item 6)
# --------------------------------------------------------------------------

# Tables whose cardinality is FIXED at any scale factor (TPC-H region
# is always 5 rows, nation always 25) — broadcasting their raw scan is
# bounded no matter the corpus size.
_FIXED_CARD_SCANS = ("region.parquet", "nation.parquet")

# Operators that bound the build side's row count regardless of what
# they scan.
_REDUCING_OPS = ("HashAggregate", "SortAggregate", "ObjectHashAggregate",
                 "LocalTableScan", "TakeOrderedAndProject", "CollectLimit",
                 "GlobalLimit", "LocalLimit", "Subquery", "ReusedExchange")

# Queries whose BNLJ build side is deliberately corpus-sized: the
# exact quadratic BASELINE kept for recall audits (its docstring says
# "O(n^2) by construction ... small/pre-blocked inputs only").
_UNBOUNDED_BY_DESIGN = {"dedup_embedding_cosine_baseline"}


def _marker_pos(line):
    m = re.search(r"[:+]- ", line)
    return m.start() if m else None


def _bnlj_build_subtrees(plan):
    """Yield the build-side subtree text of every BNLJ in a physical
    plan string, parsed from the tree's indentation."""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "BroadcastNestedLoopJoin" not in ln:
            continue
        p = _marker_pos(ln)
        if p is None:
            p = -3
        kids = []
        for j in range(i + 1, len(lines)):
            q = _marker_pos(lines[j])
            if q is None or q <= p:
                break
            if q == p + 3:
                kids.append(j)
        assert len(kids) == 2, f"BNLJ tree parse failed at: {ln.strip()}"
        start = kids[0] if "BuildLeft" in ln else kids[1]
        endp = _marker_pos(lines[start])
        end = len(lines)
        for j in range(start + 1, len(lines)):
            q = _marker_pos(lines[j])
            if q is None or q <= endp:
                end = j
                break
        yield "\n".join(lines[start:end])


def _build_side_is_bounded(sub):
    if any(op in sub for op in _REDUCING_OPS):
        return True  # aggregated / limited / literal relation
    if "Scan ExistingRDD" in sub and "FileScan" not in sub:
        return True  # driver-created literal frame
    scans = re.findall(r"FileScan parquet .*?\.parquet", sub)
    if scans and all(any(t in s for t in _FIXED_CARD_SCANS)
                     for s in scans):
        return True  # fixed-cardinality dims (region=5, nation=25)
    # a point filter pushed to the scan bounds the build to ~1 row
    if re.search(r"PushedFilters: \[[^\]]*EqualTo\(", sub):
        return True
    return False


def test_bnlj_build_sides_are_bounded(spark):
    """Every BroadcastNestedLoopJoin in the catalog must build from a
    provably bounded side — a scalar/limited aggregate, a literal
    frame, a fixed-cardinality dim scan, or a point-filtered row —
    so a refactor can never silently plan an unbounded nested loop.
    The per-query BNLJ COUNT is locked in shuffle_budget_catalog.json
    ('bnlj' kind); this gate checks the SHAPE of each occurrence."""
    import json
    import pathlib

    from tests.conftest import SF_SMALL as _SF

    budget = json.loads(
        pathlib.Path(__file__).with_name(
            "shuffle_budget_catalog.json").read_text())
    offenders = []
    for name, counts in sorted(budget.items()):
        if not counts.get("bnlj") or name in _UNBOUNDED_BY_DESIGN:
            continue
        if name not in QUERIES:
            continue  # staleness handled by the lockfile test
        plan = plan_of(spark, name)  # memoized cold-cache build
        for sub in _bnlj_build_subtrees(plan):
            if not _build_side_is_bounded(sub):
                offenders.append((name, sub.splitlines()[0].strip()))
    assert not offenders, (
        "BNLJ with an unbounded build side — use an equi-join, bound "
        f"the build, or whitelist with justification: {offenders}")
