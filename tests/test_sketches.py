"""Semantics + plan gates for the sketch operators (Bloom pre-filter,
Count-Min heavy hitters), the AllPairs prefix-filtered similarity
join, and the A-ES weighted reservoir sample."""

import re

import pytest
from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators import sketches
from oracle_cassandra_migrator_spark.queries import QUERIES
from oracle_cassandra_migrator_spark.sources.testdata import read_table

from tests.conftest import SF_SMALL, catalog_rows


def plan_of(spark, name):
    return (QUERIES[name](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())


# --------------------------------------------------------------------------
# Bloom filter
# --------------------------------------------------------------------------


def test_bloom_has_no_false_negatives(spark):
    """Every inserted key must probe positive — the property the
    incremental-dedup pruning correctness rests on (a false negative
    would silently re-admit a duplicate)."""
    keys = spark.range(500).selectExpr(
        "md5(CAST(id AS STRING)) AS k")
    bloom = sketches.bloom_literal_map(sketches.bloom_build(keys, "k"))
    n_miss = (keys.withColumn(
        "hit", F.expr(sketches.bloom_probe_expr(bloom, "k")))
        .where("NOT hit").count())
    assert n_miss == 0


def test_bloom_false_positive_rate_is_small(spark):
    """Non-members must mostly miss: with 500 keys in 16384 bits / 3
    probes the theoretical FP rate is ~0.1%; assert < 5% so geometry
    regressions (e.g. an accidental modulus change) fail loudly."""
    keys = spark.range(500).selectExpr("md5(CAST(id AS STRING)) AS k")
    others = spark.range(500, 2500).selectExpr(
        "md5(CAST(id AS STRING)) AS k")
    bloom = sketches.bloom_literal_map(sketches.bloom_build(keys, "k"))
    n_hit = (others.withColumn(
        "hit", F.expr(sketches.bloom_probe_expr(bloom, "k")))
        .where("hit").count())
    assert n_hit / 2000 < 0.05


def test_bloom_build_is_bounded(spark):
    words = sketches.bloom_build(
        spark.range(5000).selectExpr("CAST(id AS STRING) AS k"), "k")
    rows = words.collect()
    assert len(rows) <= sketches.BLOOM_M_BITS // 64
    assert all(0 <= r["word_idx"] < sketches.BLOOM_M_BITS // 64
               for r in rows)


def test_bloom_prefilter_query_audit_invariants(spark):
    """Every base-side doc must hit (no false negatives: n_members ==
    the 400 base docs exactly), hits decompose into members + false
    positives, and the 100 held-out docs bound the FP count — the
    audit row is non-vacuous in both directions."""
    row = catalog_rows(spark, "dedup_bloom_prefilter", SF_SMALL)[1][0]
    assert row.n_members + row.n_false_pos == row.n_bloom_hit
    assert row.n_probed == 500
    assert row.n_members == 400  # all base docs hit — no false negatives
    assert row.n_false_pos <= 100


def test_bloom_probe_plan_is_projection_only(spark):
    """The probe must be a map-literal projection: the only join in
    the whole query is the broadcast exact-check on bloom hits — no
    shuffle join anywhere."""
    plan = plan_of(spark, "dedup_bloom_prefilter")
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# Count-Min
# --------------------------------------------------------------------------


def test_cms_never_underestimates(spark):
    """est >= exact for EVERY key — the one-sided error guarantee that
    makes CMS usable for threshold filtering. Checked over the full
    vocabulary, not just the top-k the query returns."""
    docs = read_table(spark, SF_SMALL, "documents")
    tc = (docs.select(F.explode(F.split(
            F.lower("text"), r"\s+")).alias("tok"))
          .where("tok != ''")
          .groupBy("tok").agg(F.count("*").alias("cnt")))
    sketch = sketches.cms_sketch(tc, "tok", "cnt")
    est = sketches.cms_estimate(tc, sketch, "tok")
    assert est.where("est_cnt < cnt").count() == 0
    assert sketch.count() <= sketches.CMS_DEPTH * sketches.CMS_WIDTH


def test_cms_sketch_is_mergeable(spark):
    """Sketching two disjoint halves and summing slot-wise must equal
    sketching the whole — the property that lets every shard/day build
    its own sketch at 100 TB."""
    docs = read_table(spark, SF_SMALL, "documents")
    tc = (docs.select(F.explode(F.split(
            F.lower("text"), r"\s+")).alias("tok"), "doc_id")
          .where("tok != ''"))
    whole = sketches.cms_sketch(
        tc.groupBy("tok").agg(F.count("*").alias("cnt")), "tok", "cnt")
    half = [
        sketches.cms_sketch(
            tc.where(f"doc_id % 2 = {i}").groupBy("tok")
            .agg(F.count("*").alias("cnt")), "tok", "cnt")
        for i in (0, 1)]
    merged = (half[0].unionByName(half[1])
              .groupBy("depth", "slot")
              .agg(F.sum("cms_count").cast("bigint").alias("cms_count")))
    diff = (whole.alias("w").join(
                merged.alias("m"), ["depth", "slot"], "full")
            .where("coalesce(w.cms_count, -1) != coalesce(m.cms_count, -1)")
            .count())
    assert diff == 0


def test_cms_query_plan_broadcasts_sketch(spark):
    plan = plan_of(spark, "sketch_cms_heavy_hitters")
    assert plan.count("BroadcastHashJoin") >= sketches.CMS_DEPTH
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan


# --------------------------------------------------------------------------
# AllPairs prefix filtering
# --------------------------------------------------------------------------


def test_allpairs_equals_inverted_index_join(spark):
    """Prefix filtering is EXACT: its output must be identical to the
    all-shingles inverted-index join at the same threshold — any
    missing pair is a prefix-selection bug (the theorem violated)."""
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in
           catalog_rows(spark, "dedup_allpairs_prefix", SF_SMALL)[1]}
    want = {(r.doc_a, r.doc_b, r.jaccard) for r in
            catalog_rows(spark, "dedup_ngram_jaccard", SF_SMALL)[1]}
    assert got == want
    assert len(want) > 0


def test_allpairs_prefix_shrinks_join_input(spark):
    """The candidate join must see strictly fewer rows than the full
    inverted index — otherwise the prefix is not filtering and the
    operator is just a slower ngram join."""
    from pyspark.sql.window import Window
    from oracle_cassandra_migrator_spark.operators.text import (
        with_shingles)

    docs = read_table(spark, SF_SMALL, "documents")
    sh = with_shingles(docs.select("doc_id", "text"), "text", 3)
    ex = (sh.select("doc_id", F.expr("size(shingles)").alias("n_sh"),
                    F.explode("shingles").alias("sh"))
          .where("n_sh > 0"))
    total = ex.count()
    dfreq = ex.groupBy("sh").agg(F.count("*").alias("df"))
    ranked = ex.join(dfreq, "sh").withColumn(
        "rn", F.row_number().over(
            Window.partitionBy("doc_id").orderBy("df", "sh")))
    n_prefix = ranked.where(
        "rn <= n_sh - ceil(0.5 * n_sh) + 1").count()
    assert n_prefix < 0.6 * total


def test_allpairs_plan_windows_on_doc_id(spark):
    """The prefix rank must be windowed on the high-cardinality doc_id
    (never a global or low-cardinality sort) and the join graph must
    stay all-equi."""
    plan = plan_of(spark, "dedup_allpairs_prefix")
    assert re.search(r"Window \[row_number\(\).*partitionBy=\[doc_id", plan) \
        or "hashpartitioning(doc_id" in plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


# --------------------------------------------------------------------------
# Weighted reservoir
# --------------------------------------------------------------------------


def test_reservoir_matches_unsalted_window(spark):
    """cap_per_group_salted must reproduce the plain per-stratum
    window exactly (output AND rank) on the reservoir keys."""
    from pyspark.sql.window import Window
    from oracle_cassandra_migrator_spark.operators.sampling import (
        reservoir_key_expr)
    from oracle_cassandra_migrator_spark.operators.text import (
        token_count_expr)

    docs = read_table(spark, SF_SMALL, "documents")
    keyed = docs.selectExpr(
        "lang", "doc_id",
        f"greatest(CAST(1 AS BIGINT), {token_count_expr('text')})"
        " AS w_tokens",
    ).withColumn("res_key", F.expr(
        reservoir_key_expr("doc_id", "CAST(w_tokens AS DOUBLE)")))
    w = Window.partitionBy("lang").orderBy("res_key", "doc_id")
    plain = {(r.lang, r.keep_rank, r.doc_id) for r in
             keyed.withColumn("keep_rank", F.row_number().over(w))
             .where("keep_rank <= 5")
             .selectExpr("lang", "CAST(keep_rank AS BIGINT) AS keep_rank",
                         "doc_id").collect()}
    got = {(r.lang, r.keep_rank, r.doc_id) for r in
           QUERIES["sample_weighted_reservoir"](spark, SF_SMALL)
           .select("lang", "keep_rank", "doc_id").collect()}
    assert got == plain


def test_reservoir_favors_heavy_weights(spark):
    """With exponential keys, weight w multiplies -ln(u) by 1/w: for a
    FIXED u the key strictly decreases as w grows, so heavier rows can
    only rank better. Checked on the expression directly."""
    rows = spark.sql(
        "SELECT " + ", ".join(
            f"round(-ln(0.37) / {w}.0, 9) AS k{w}" for w in (1, 10, 100))
    ).collect()[0]
    assert rows.k1 > rows.k10 > rows.k100


def test_reservoir_plan_is_salted_two_stage(spark):
    plan = plan_of(spark, "sample_weighted_reservoir")
    assert plan.count("Window") >= 2
    assert "__salt" in plan


def test_cms_sketch_stream_matches_batch(spark, tmp_path):
    """The CMS build is ONE commutative aggregation, so the identical
    code runs as a Structured Streaming complete-mode query: sketching
    the token stream across micro-batches must equal the batch sketch
    — the streaming form of the mergeability property."""
    docs = read_table(spark, SF_SMALL, "documents")
    toks = (docs.select(F.explode(F.split(
                F.lower("text"), r"\s+")).alias("tok"))
            .where("tok != ''"))
    src = str(tmp_path / "cms_toks")
    toks.repartition(3).write.mode("overwrite").parquet(src)

    batch_sketch = sketches.cms_sketch(
        spark.read.parquet(src).withColumn("cnt", F.lit(1)),
        "tok", "cnt")
    stream = (spark.readStream.schema("tok string")
              .option("maxFilesPerTrigger", "1").parquet(src)
              .withColumn("cnt", F.lit(1)))
    q = (sketches.cms_sketch(stream, "tok", "cnt")
         .writeStream.format("memory").queryName("cms_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.depth, r.slot): r.cms_count
           for r in spark.table("cms_stream").collect()}
    want = {(r.depth, r.slot): r.cms_count for r in batch_sketch.collect()}
    assert got == want and len(want) > 0


def test_allpairs_equals_inverted_index_on_random_corpora(spark):
    """Seeded-random adversarial cross-check: tiny vocabularies force
    dense shingle sharing (the regime that stresses prefix selection
    hardest — high-df tokens everywhere), docs include empty and
    sub-shingle-length texts, and thresholds hit both ceil() branches.
    AllPairs must equal the inverted-index join on every corpus."""
    import random

    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)

    letters = "abcdefghijkl"
    for seed, vocab, n_docs, t in [
            (1, 8, 60, 0.5), (2, 5, 40, 0.7), (3, 12, 80, 0.3)]:
        rng = random.Random(seed)
        rows = []
        for i in range(n_docs):
            if i >= 5 and i % 5 == 0:
                # planted near-dup: copy an earlier doc, mutate 1 word
                words = rows[rng.randrange(i)][1].split()
                if words:
                    words[rng.randrange(len(words))] = rng.choice(
                        letters[:vocab])
                rows.append((i, " ".join(words)))
            else:
                rows.append((i, " ".join(
                    rng.choice(letters[:vocab])
                    for _ in range(rng.randint(0, 12)))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.doc_a, r.doc_b, r.jaccard) for r in
               allpairs_jaccard_pairs(
                   df, "text", "doc_id", threshold=t).collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard) for r in
                ngram_jaccard_pairs(
                    df, "text", "doc_id", threshold=t).collect()}
        assert got == want, (seed, t, len(got), len(want))
        assert want, f"vacuous corpus for seed {seed}"


def test_hll_sketch_stream_matches_batch(spark, tmp_path):
    """Streaming distinct-user estimation: hll_sketch_agg is a
    commutative mergeable aggregate, so the identical groupBy runs as
    a complete-mode streaming query and must produce the same
    per-type estimates as the batch aggregation — the streaming
    composition of the agg_hll_sketch_rollup pattern (state is one
    fixed-size sketch per key, never the user set)."""
    ev = (read_table(spark, SF_SMALL, "events")
          .select("event_type", "user_id"))
    src = str(tmp_path / "hll_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    def estimates(df):
        return (df.groupBy("event_type")
                .agg(F.expr("hll_sketch_estimate(hll_sketch_agg(user_id))")
                     .alias("est")))

    batch = {(r.event_type, r.est)
             for r in estimates(spark.read.parquet(src)).collect()}
    stream = (spark.readStream.schema("event_type string, user_id long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (estimates(stream)
         .writeStream.format("memory").queryName("hll_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.event_type, r.est) for r in spark.table("hll_stream").collect()}
    assert got == batch and len(batch) > 0
    # sanity vs exact: estimates within 5% of true distinct counts
    exact = {r.event_type: r.n for r in
             spark.read.parquet(src).groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    for typ, est in got:
        assert abs(est - exact[typ]) <= 0.05 * exact[typ] + 1


def test_reservoir_weighting_actually_biases_selection(spark):
    """A-ES must pick heavier items more often: 400 strata, each with
    one weight-9 and one weight-1 item; with k=1 per stratum the
    heavy item's inclusion probability is 0.9, so its deterministic
    md5-driven win count must land near 360 — a sampler that ignores
    weights (p=0.5) or inverts them would fall far outside the band."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        reservoir_key_expr)
    from pyspark.sql.window import Window

    rows = []
    for s in range(400):
        rows.append((s, s * 2, 9.0))      # heavy item
        rows.append((s, s * 2 + 1, 1.0))  # light item
    df = spark.createDataFrame(rows, "stratum int, item_id long, w double")
    keyed = df.withColumn("res_key", F.expr(
        reservoir_key_expr("item_id", "w")))
    win = Window.partitionBy("stratum").orderBy("res_key", "item_id")
    picked = (keyed.withColumn("rn", F.row_number().over(win))
              .where("rn = 1"))
    heavy_wins = picked.where("w = 9.0").count()
    assert 330 <= heavy_wins <= 385, heavy_wins


def test_custom_minhash_vs_spark_ml_minhashlsh(spark):
    """SURVEY 2.12 maps near-dedup to ml.feature.MinHashLSH; the
    catalog ships its own md5-deterministic MinHash instead (ML's
    per-instance hash seeds are not oracle-replayable). Cross-validate
    the two against the exact inverted-index pairs on the SAME shingle
    sets: approxSimilarityJoin's exact-distance filter must emit only
    true pairs, and both LSH front-ends must recall most of them
    (P(band hit) >= 0.82 at j = 0.5 for ours; 1-(1-j)^6 = 0.98 for
    ML's 6 OR-ed tables)."""
    from pyspark.ml.feature import HashingTF, MinHashLSH

    from oracle_cassandra_migrator_spark.operators.text import (
        with_shingles)

    docs = read_table(spark, SF_SMALL, "documents")
    exact = {(r.doc_a, r.doc_b) for r in
             catalog_rows(spark, "dedup_ngram_jaccard", SF_SMALL)[1]}
    assert exact

    shingled = (with_shingles(docs.select("doc_id", "text"), "text", 3)
                .where("size(shingles) > 0"))
    tf = HashingTF(inputCol="shingles", outputCol="features",
                   numFeatures=1 << 18, binary=True)
    feats = tf.transform(shingled)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes",
                     numHashTables=6, seed=42).fit(feats)
    joined = (lsh.approxSimilarityJoin(feats, feats, 0.5, "dist")
              .selectExpr("datasetA.doc_id AS doc_a",
                          "datasetB.doc_id AS doc_b")
              .where("doc_a < doc_b"))
    ml_pairs = {(r.doc_a, r.doc_b) for r in joined.collect()}

    # precision: every ML pair passed an exact distance filter on the
    # same shingle sets (modulo 2^18-feature hash collisions: none at
    # this vocab size)
    assert ml_pairs <= exact
    # recall of both approximate front-ends
    assert len(ml_pairs & exact) >= 0.8 * len(exact)
    ours = {(r.doc_a, r.doc_b) for r in
            catalog_rows(spark, "dedup_minhash_lsh", SF_SMALL)[1]}
    assert len(ours & exact) >= 0.8 * len(exact)


def test_custom_cms_vs_spark_builtin_count_min_sketch(spark):
    """Cross-validate the md5-CMS against Spark's builtin
    count_min_sketch aggregate (read back through the JVM sketch
    class): both must respect the one-sided guarantee (est >= exact
    for every token) and both must be exact on this vocab at matched
    width — so their estimates for the true heavy hitters agree with
    the exact counts and with each other."""
    docs = read_table(spark, SF_SMALL, "documents")
    tc = (docs.select(F.explode(F.split(
            F.lower("text"), r"\s+")).alias("tok"))
          .where("tok != ''")
          .groupBy("tok").agg(F.count("*").alias("cnt")))
    top = tc.orderBy(F.col("cnt").desc(), "tok").limit(10).collect()

    # builtin: eps/confidence sized to a comparable width (w = ceil(e/eps))
    row = (docs.select(F.explode(F.split(
              F.lower("text"), r"\s+")).alias("tok"))
           .where("tok != ''")
           .agg(F.expr("count_min_sketch(tok, 0.001d, 0.99d, 42)")
                .alias("sk")).collect()[0])
    jsketch = spark._jvm.org.apache.spark.util.sketch.CountMinSketch \
        .readFrom(bytes(row.sk))

    ours = {r2.tok: r2.est_cnt for r2 in sketches.cms_estimate(
        tc, sketches.cms_sketch(tc, "tok", "cnt"), "tok").collect()}
    for r2 in top:
        builtin_est = jsketch.estimateCount(r2.tok)
        assert builtin_est >= r2.cnt
        assert ours[r2.tok] >= r2.cnt
        # both sketches are effectively exact on the vocab's heavy
        # tail at these widths — any disagreement is a bug in one
        assert builtin_est == r2.cnt == ours[r2.tok], (
            r2.tok, builtin_est, r2.cnt, ours[r2.tok])


def test_minshingle_neighbors_recall_and_precision(spark):
    """Sorted-neighborhood blocking: every emitted pair must be a true
    pair (exact verification), and recall vs the inverted-index truth
    must clear the floor its 1-hash collision bound implies (planted
    pairs have J >= 0.5; observed 24/28 here)."""
    got = {(r.doc_a, r.doc_b) for r in
           catalog_rows(spark, "dedup_minshingle_neighbors", SF_SMALL)[1]}
    exact = {(r.doc_a, r.doc_b) for r in
             catalog_rows(spark, "dedup_ngram_jaccard", SF_SMALL)[1]}
    assert got <= exact
    assert len(got) >= 0.6 * len(exact)


def test_kll_sketches_merge_hierarchically(spark):
    """The KLL rollup story: per-half sketches merged via
    kll_merge_agg_double must estimate the same quantiles (within the
    sketch's rank-error envelope) as one whole-corpus sketch — the
    per-shard/per-day hierarchical pattern the catalog query's
    docstring claims."""
    li = read_table(spark, SF_SMALL, "lineitem")
    val = "CAST(l_extendedprice AS DOUBLE)"
    halves = (li.selectExpr(f"{val} AS v", "l_orderkey % 2 AS half")
              .groupBy("half")
              .agg(F.expr("kll_sketch_agg_double(v)").alias("sk")))
    merged = halves.agg(F.expr(
        "kll_sketch_get_quantile_double(kll_merge_agg_double(sk), 0.5)"
    ).alias("m50")).collect()[0].m50
    bounds = li.selectExpr(
        f"percentile({val}, 0.46D) AS lo",
        f"percentile({val}, 0.54D) AS hi").collect()[0]
    assert bounds.lo <= merged <= bounds.hi, (merged, bounds)


def test_theta_sketch_stream_matches_batch(spark, tmp_path):
    """theta_sketch_agg is order-insensitive and mergeable, so the
    same per-type distinct-user estimation runs as a complete-mode
    streaming aggregation and must equal the batch result — the third
    leg of the mergeable-sketch streaming matrix (CMS, HLL, theta)."""
    ev = (read_table(spark, SF_SMALL, "events")
          .select("event_type", "user_id"))
    src = str(tmp_path / "theta_src")
    ev.repartition(3).write.mode("overwrite").parquet(src)

    def estimates(df):
        return (df.groupBy("event_type")
                .agg(F.expr(
                    "theta_sketch_estimate(theta_sketch_agg(user_id))")
                    .alias("est")))

    batch = {(r.event_type, r.est)
             for r in estimates(spark.read.parquet(src)).collect()}
    stream = (spark.readStream.schema("event_type string, user_id long")
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (estimates(stream)
         .writeStream.format("memory").queryName("theta_stream")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = {(r.event_type, r.est)
           for r in spark.table("theta_stream").collect()}
    assert got == batch and len(batch) > 0
    # exact mode at this cardinality: estimates equal true distincts
    exact = {(r.event_type, float(r.n)) for r in
             spark.read.parquet(src).groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert {(t, float(e)) for t, e in got} == exact


def test_reservoir_key_matches_python_md5_reference(spark):
    """The A-ES key expression must reproduce, bit-for-bit at 9 dp,
    a from-scratch Python implementation of the same md5 -> uniform ->
    -ln(u)/w formula — so the 'deterministic on any cluster' claim is
    anchored outside Spark."""
    import hashlib
    import math

    from oracle_cassandra_migrator_spark.operators.sampling import (
        reservoir_key_expr)

    rows = [(i, float(w)) for i, w in
            [(3, 1), (17, 2), (123456, 50), (999, 7), (42, 1000)]]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    got = {r.doc_id: r.k for r in df.selectExpr(
        "doc_id", reservoir_key_expr("doc_id", "w") + " AS k").collect()}
    for i, w in rows:
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16)
        u = ((h % 1_000_000_000) + 0.5) / 1_000_000_000.0
        want = round(-math.log(u) / w, 9)
        assert got[i] == want, (i, got[i], want)


def test_builtin_approx_top_k_matches_exact_on_separated_heavy_tail(spark):
    """Spark 4.1's builtin approx_top_k vs exact vocabulary counts on
    the documents word distribution: with maxItemsTracked well above
    the distinct-item count the sketch is exact, so the top-10 items
    AND counts must equal the exact groupBy — the same read-back
    contract test_custom_cms_vs_spark_builtin_count_min_sketch pins
    for frequencies."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    from pyspark.sql import functions as F

    from tests.conftest import SF_SMALL

    words = (read_table(spark, SF_SMALL, "documents")
             .select(F.explode(F.expr(fast_words_expr("text")))
                     .alias("w")))
    approx = words.selectExpr(
        "approx_top_k(w, 10, 100000) AS tk").collect()[0]["tk"]
    exact = (words.groupBy("w").count()
             .orderBy(F.col("count").desc(), "w").limit(10).collect())
    # counts must agree exactly; item ties at the boundary may order
    # differently, so compare the count multiset and the item set of
    # strictly-above-boundary entries
    assert sorted((r["count"] for r in approx), reverse=True) == \
        [r["count"] for r in exact]
    boundary = exact[-1]["count"]
    assert {r["item"] for r in approx if r["count"] > boundary} == \
        {r["w"] for r in exact if r["count"] > boundary}


def test_allpairs_cap_equals_capped_inverted_index(spark):
    """The max_token_df guard (r8): capped AllPairs must stay
    output-identical to the capped inverted-index join — same survivor
    universe, same full-size denominators — on dense seeded corpora
    where the cap BINDS, and the planted rare-overlap pair survives
    while boilerplate-only pairs drop (the ngram cap contract)."""
    import random

    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)

    letters = "abcdefghijkl"
    for seed, vocab, n_docs, t, cap in [
            (11, 6, 60, 0.5, 8), (12, 9, 50, 0.4, 5)]:
        rng = random.Random(seed)
        rows = []
        for i in range(n_docs):
            if i >= 5 and i % 5 == 0:
                words = rows[rng.randrange(i)][1].split()
                if words:
                    words[rng.randrange(len(words))] = rng.choice(
                        letters[:vocab])
                rows.append((i, " ".join(words)))
            else:
                rows.append((i, " ".join(
                    rng.choice(letters[:vocab])
                    for _ in range(rng.randint(0, 12)))))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.doc_a, r.doc_b, r.jaccard) for r in
               allpairs_jaccard_pairs(
                   df, "text", "doc_id", threshold=t,
                   max_token_df=cap).collect()}
        want = {(r.doc_a, r.doc_b, r.jaccard) for r in
                ngram_jaccard_pairs(
                    df, "text", "doc_id", threshold=t,
                    max_token_df=cap).collect()}
        assert got == want, (seed, t, cap, len(got), len(want))
        uncapped = {(r.doc_a, r.doc_b) for r in
                    ngram_jaccard_pairs(
                        df, "text", "doc_id", threshold=t).collect()}
        assert {(a, b) for a, b, _ in got} <= uncapped
        assert uncapped, f"vacuous corpus for seed {seed}"


def test_kll_envelope_sketch_arm_matches_exact(spark):
    """The sort-free scale arm (exact=False, approx_percentile
    envelope — SCALE.md r8): same booleans as the exact-audit arm, and
    the approx quantile values land within the envelope's own 2% rank
    tolerance of the exact ones."""
    from oracle_cassandra_migrator_spark.operators.sketches import (
        kll_quantile_report)
    from oracle_cassandra_migrator_spark.sources.testdata import (
        read_table)

    li = read_table(spark, SF_SMALL, "lineitem")
    val = "CAST(l_extendedprice AS DOUBLE)"
    approx = kll_quantile_report(li, val, exact=False).collect()[0]
    exact = kll_quantile_report(li, val, exact=True).collect()[0]
    assert approx["kll_p50_ok"] and approx["kll_p90_ok"]
    assert exact["kll_p50_ok"] and exact["kll_p90_ok"]
    # approx_percentile's rank error (1/accuracy = 1e-4) is far inside
    # the 2%-rank envelope; value-space check against the exact arm
    lo, hi = exact["p50"], exact["p90"]
    assert abs(approx["p50"] - lo) <= 0.02 * lo
    assert abs(approx["p90"] - hi) <= 0.02 * hi


# --------------------------------------------------------------------------
# AllPairs strategy guard (VERDICT r8 item 1): route / warn / refuse
# --------------------------------------------------------------------------


def _adversarial_corpus(spark, n):
    """The bench_adversarial_cap corpus: every doc shares a boilerplate
    phrase (hot shingles, df = n) plus a few unique tokens."""
    boiler = ("please subscribe to our newsletter for updates and "
              "follow us on every social platform today")
    return spark.range(n).selectExpr(
        "id AS doc_id",
        f"concat('{boiler}', ' unique token ', id, ' tail ', id * 7, "
        f"' mark ', id * 13) AS text")


def test_jaccard_strategy_decision():
    from oracle_cassandra_migrator_spark.operators.dedup import (
        jaccard_pair_strategy)

    assert jaccard_pair_strategy(0.9) == "allpairs"
    assert jaccard_pair_strategy(0.8) == "allpairs"
    assert jaccard_pair_strategy(0.5) == "inverted_index"
    assert jaccard_pair_strategy(0.5, route_threshold=0.5) == "allpairs"
    assert jaccard_pair_strategy(0.9, "inverted_index") == "inverted_index"
    assert jaccard_pair_strategy(0.3, "allpairs") == "allpairs"
    with pytest.raises(ValueError, match="unknown strategy"):
        jaccard_pair_strategy(0.5, "ppjoin")


def test_allpairs_auto_routes_below_bar(spark):
    """auto at t=0.5 must PLAN the inverted-index join (no prefix-rank
    window anywhere) and produce the identical exact result."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)

    docs = read_table(spark, SF_SMALL, "documents")
    routed = allpairs_jaccard_pairs(docs, "text", "doc_id",
                                    threshold=0.5)
    plan = routed._sc._jvm.PythonSQLUtils.explainString(
        routed._jdf.queryExecution(), "formatted")
    assert "row_number" not in plan  # prefix-filter body not planned
    got = {(r.doc_a, r.doc_b, r.jaccard) for r in routed.collect()}
    want = {(r.doc_a, r.doc_b, r.jaccard) for r in
            ngram_jaccard_pairs(docs, "text", "doc_id",
                                threshold=0.5).collect()}
    assert got == want and got


def test_allpairs_forced_below_bar_warns_and_matches(spark):
    """Forcing allpairs below the bar on a small adversarial corpus:
    the candidate estimate stays under the cap, so it WARNS with the
    guidance and still returns the exact result."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs, ngram_jaccard_pairs)

    docs = _adversarial_corpus(spark, 60)
    with pytest.warns(UserWarning, match="pair-density-bound"):
        forced = allpairs_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, strategy="allpairs")
    got = {(r.doc_a, r.doc_b) for r in forced.collect()}
    want = {(r.doc_a, r.doc_b) for r in
            ngram_jaccard_pairs(docs, "text", "doc_id",
                                threshold=0.5).collect()}
    assert got == want and got


def test_allpairs_forced_refuses_on_candidate_blowup(spark):
    """Forcing allpairs below the bar on the adversarial corpus at a
    size where the prefix df histogram predicts a candidate blowup
    must RAISE with the guidance message BEFORE the join runs."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        allpairs_jaccard_pairs)

    docs = _adversarial_corpus(spark, 400)
    with pytest.raises(ValueError, match="estimated candidate volume"):
        allpairs_jaccard_pairs(
            docs, "text", "doc_id", threshold=0.5, strategy="allpairs",
            candidate_cap_per_doc=100)
    # cap override is honored: None disables the guard entirely
    out = allpairs_jaccard_pairs(
        docs, "text", "doc_id", threshold=0.5, strategy="allpairs",
        candidate_cap_per_doc=None)
    assert out.columns == ["doc_a", "doc_b", "jaccard"]
