"""Direct unit tests of the extension operators on synthetic rows
(complementing the DuckDB-oracle equivalence checks in
test_queries_vs_duckdb.py, these pin down the *semantics* on known
inputs: planted duplicates must be found, disjoint items must not)."""

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.operators import dedup, multimodal, similarity


def docs_df(spark):
    rows = [
        (1, "the quick brown fox jumps over the lazy dog tonight"),
        (2, "the quick brown fox jumps over the lazy dog today"),  # near-dup of 1
        (3, "completely different text about spark query engines"),
        (4, "The  quick brown fox jumps over the lazy dog tonight"),  # exact dup of 1 modulo case/ws
        (5, "tiny"),  # fewer than 3 words -> no shingles
    ]
    return spark.createDataFrame(rows, "doc_id BIGINT, text STRING")


def test_exact_dedup_groups_normalized_copies(spark):
    out = dedup.exact_dedup(docs_df(spark), "text", "doc_id").collect()
    groups = {r.representative_id: r.n_copies for r in out}
    assert groups[1] == 2           # docs 1 and 4 collapse
    assert groups[2] == 1
    assert len(out) == 4            # 5 docs -> 4 distinct fingerprints


def test_ngram_jaccard_finds_planted_pair(spark):
    pairs = dedup.ngram_jaccard_pairs(
        docs_df(spark), "text", "doc_id", n=3, threshold=0.5).collect()
    found = {(r.doc_a, r.doc_b) for r in pairs}
    assert (1, 4) in found          # identical after normalization -> j=1.0
    assert (1, 2) in found          # one-word edit -> high overlap
    assert all(3 not in p for p in found)
    j = {(r.doc_a, r.doc_b): r.jaccard for r in pairs}
    assert j[(1, 4)] == 1.0


def test_minhash_lsh_matches_exact_on_planted_pairs(spark):
    exact = {(r.doc_a, r.doc_b)
             for r in dedup.ngram_jaccard_pairs(
                 docs_df(spark), "text", "doc_id", threshold=0.5).collect()}
    lsh = {(r.doc_a, r.doc_b)
           for r in dedup.minhash_lsh_pairs(
               docs_df(spark), "text", "doc_id", threshold=0.5).collect()}
    # LSH candidates are a subset; identical docs always collide
    assert lsh <= exact
    assert (1, 4) in lsh


def test_minhash_band_cap_bounds_adversarial_corpus(spark):
    """Mass-duplicated boilerplate is the quadratic kill case: 300
    identical docs share every band key, so uncapped LSH emits
    300*299/2 candidate pairs per band. The cap must drop those groups
    while a planted near-dup pair with distinct text still surfaces."""
    boiler = "the quick brown fox jumps over the lazy dog again and again"
    rows = [(i, boiler) for i in range(300)]
    rows.append((1000, "completely different planted document about spark "
                       "shuffle partitioning strategies at scale"))
    rows.append((1001, "completely different planted document about spark "
                       "shuffle partitioning strategies at large scale"))
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    capped = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", threshold=0.5, max_band_size=50).collect()
    found = {(r.doc_a, r.doc_b) for r in capped}
    assert (1000, 1001) in found
    # every boilerplate band group has 300 members > cap -> no mass pairs
    assert found == {(1000, 1001)}

    uncapped = dedup.minhash_lsh_pairs(
        df, "text", "doc_id", threshold=0.5, max_band_size=None)
    assert uncapped.count() == 300 * 299 // 2 + 1


def test_simhash_buckets_identical_docs(spark):
    buckets = dedup.simhash_buckets(docs_df(spark), "text", "doc_id").collect()
    assert any(b.n_docs == 2 and b.representative_id == 1 for b in buckets)


def test_simhash_hamming_superset_of_equal_buckets(spark):
    """distance<=d candidate recall: identical docs pair at hamming 0,
    and every equal-bucket pair appears in the hamming output; a
    one-word edit lands within a small distance while staying out of
    the equal-bucket variant unless the hashes coincide exactly."""
    pairs = {(r.doc_a, r.doc_b): r.hamming
             for r in dedup.simhash_hamming_pairs(
                 docs_df(spark), "text", "doc_id", max_distance=3).collect()}
    assert pairs.get((1, 4)) == 0  # identical after normalization
    equal_bucket_pairs = set()
    hashed = {r.doc_id: r.simhash for r in docs_df(spark).selectExpr(
        "doc_id", f"{dedup.simhash_expr('text')} AS simhash").collect()}
    for a in hashed:
        for b in hashed:
            if a < b and hashed[a] == hashed[b]:
                equal_bucket_pairs.add((a, b))
    assert equal_bucket_pairs <= set(pairs)
    for (a, b), d in pairs.items():
        assert bin(hashed[a] ^ hashed[b]).count("1") == d


def vectors_df(spark):
    rows = [
        (0, [1.0, 0.0, 0.0]),
        (1, [0.9, 0.1, 0.0]),   # close to 0
        (2, [0.0, 1.0, 0.0]),   # orthogonal
        (3, [-1.0, 0.0, 0.0]),  # opposite
    ]
    return spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>")


def test_cosine_topk_orders_by_similarity(spark):
    emb = vectors_df(spark)
    q = emb.where("vec_id = 0").select(F.col("embedding").alias("q"))
    top = similarity.cosine_topk(emb.where("vec_id <> 0"), q, k=3).collect()
    assert [r.vec_id for r in top] == [1, 2, 3]
    assert top[0].cosine > 0.99
    assert abs(top[1].cosine) < 1e-9
    assert top[2].cosine == -1.0


def test_cosine_pairs_threshold(spark):
    pairs = similarity.cosine_pairs(vectors_df(spark), threshold=0.9).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {(0, 1)}


def test_lsh_bucket_is_deterministic_and_groups_close_vectors(spark):
    emb = vectors_df(spark)
    bucket = similarity.signbit_bucket_expr("embedding", dim=3, n_planes=4)
    rows = emb.withColumn("b", F.expr(bucket)).collect()
    by_id = {r.vec_id: r.b for r in rows}
    assert by_id[0] == by_id[1]       # near-identical vectors share bucket
    assert by_id[0] != by_id[3]       # opposite vector flips every bit


def test_multimodal_decode_plumbing(spark):
    # r7: decode is real now — raw text bytes are not a recognized
    # container, so they quarantine as 'unknown'; real parsing is
    # pinned by tests/test_round7_semantics.py and the oracle hash
    docs = docs_df(spark)
    out = multimodal.decode_binary_metadata(
        multimodal.documents_as_binary(docs)).collect()
    assert len(out) == 5
    by_id = {r.doc_id: r for r in out}
    assert by_id[5].n_bytes == 4      # "tiny"
    assert by_id[5].mm_format == "unknown"
    assert by_id[5].width is None and by_id[5].duration_ms is None

    real = multimodal.decode_binary_metadata(
        multimodal.synthesized_payloads(docs)).collect()
    assert {r.mm_format for r in real} <= {"bmp", "ppm", "wav", "png",
                                           "gif", "jpeg", "webp", "mp4",
                                           "flac", "tiff", "ogg",
                                           "mp3"}
    assert all(r.n_bytes > 0 for r in real)


SF_SMALL = "/root/testdata/sf0.001"


class TestSampling:
    """operators/sampling.py: deterministic splits and token packing."""

    def test_split_stable_under_repartition(self, spark):
        from oracle_cassandra_migrator_spark.operators import sampling
        from oracle_cassandra_migrator_spark.sources.testdata import read_table

        docs = read_table(spark, SF_SMALL, "documents")
        a = sampling.train_val_test(docs, "doc_id").select("doc_id", "split")
        b = sampling.train_val_test(docs.repartition(7), "doc_id").select(
            "doc_id", "split")
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
        # rough ratio sanity: train is the large split
        counts = dict(a.groupBy("split").count().collect())
        assert counts["train"] > counts.get("val", 0)
        assert counts["train"] > counts.get("test", 0)

    def test_split_is_projection_only(self, spark):
        """No Exchange in the plan — the split must stay map-only."""
        from oracle_cassandra_migrator_spark.operators import sampling
        from oracle_cassandra_migrator_spark.sources.testdata import read_table

        df = sampling.train_val_test(
            read_table(spark, SF_SMALL, "documents"), "doc_id")
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan

    def test_pack_respects_capacity_start_offsets(self, spark):
        from pyspark.sql import functions as F
        from oracle_cassandra_migrator_spark.operators import sampling
        from oracle_cassandra_migrator_spark.operators.text import token_count_expr
        from oracle_cassandra_migrator_spark.sources.testdata import read_table

        cap = 1024
        docs = read_table(spark, SF_SMALL, "documents").withColumn(
            "ntok", F.expr(token_count_expr("text")))
        packed = sampling.pack_token_bins(
            docs, id_col="doc_id", token_col="ntok",
            group_col="lang", capacity=cap)
        rows = packed.select("lang", "bin", "ntok", "cum_tokens").collect()
        assert rows
        # every row STARTS inside its bin: start offset in [bin*cap, (bin+1)*cap)
        for r in rows:
            start = r.cum_tokens - r.ntok
            assert r.bin * cap <= start < (r.bin + 1) * cap
        # bins are dense per lang (0..max with no holes)
        import collections
        bins = collections.defaultdict(set)
        for r in rows:
            bins[r.lang].add(r.bin)
        for lang, bs in bins.items():
            assert bs == set(range(max(bs) + 1))


class TestConnectedComponents:
    def test_chain_and_islands(self, spark):
        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (5, 6), (10, 11), (11, 12), (12, 13), (13, 14)],
            "src BIGINT, dst BIGINT")
        got = {r.node: r.component
               for r in dedup.connected_components(edges).collect()}
        assert got == {1: 1, 2: 1, 3: 1, 5: 5, 6: 5,
                       10: 10, 11: 10, 12: 10, 13: 10, 14: 10}

    def test_converges_on_cycle(self, spark):
        edges = spark.createDataFrame(
            [(7, 8), (8, 9), (9, 7)], "src BIGINT, dst BIGINT")
        got = {r.node: r.component
               for r in dedup.connected_components(edges).collect()}
        assert got == {7: 7, 8: 7, 9: 7}


def test_merge_upsert_semantics(spark):
    from oracle_cassandra_migrator_spark.operators.merge import merge_upsert

    cur = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], ["k", "v"])
    upd = spark.createDataFrame(
        [(2, "B"), (4, "D")], ["k", "v"])
    got = {(r.k, r.v) for r in merge_upsert(cur, upd, ["k"]).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "D")}


def test_merge_upsert_schema_drift_fails_loudly(spark):
    """ADVICE r8: a renamed/typo'd update column must raise with the
    symmetric difference named, not silently fork into two half-null
    columns; allow_missing=True opts into evolution null-fill."""
    import pytest as _pytest

    from oracle_cassandra_migrator_spark.operators.merge import merge_upsert

    cur = spark.createDataFrame([(1, "a")], ["k", "v"])
    upd = spark.createDataFrame([(2, "B")], ["k", "val"])  # typo'd "v"
    with _pytest.raises(ValueError, match=r"\['v'\].*\['val'\]"):
        merge_upsert(cur, upd, ["k"])
    evolved = merge_upsert(cur, upd, ["k"], allow_missing=True)
    got = {(r.k, r.v, r.val) for r in evolved.collect()}
    assert got == {(1, "a", None), (2, None, "B")}


def test_scd2_apply_closes_and_appends(spark):
    from oracle_cassandra_migrator_spark.operators.merge import scd2_apply

    hist = spark.createDataFrame(
        [(1, "x", "2001-01-01", None),       # open, will be updated
         (1, "w", "2000-01-01", "2001-01-01"),  # already closed
         (2, "y", "2001-01-01", None)],      # open, untouched
        "k BIGINT, v STRING, valid_from STRING, valid_to STRING")
    upd = spark.createDataFrame(
        [(1, "X", "2020-06-01")], "k BIGINT, v STRING, eff STRING")
    rows = {tuple(r) for r in scd2_apply(
        hist, upd, ["k"], effective_col="eff").collect()}
    assert rows == {
        (1, "w", "2000-01-01", "2001-01-01"),  # history preserved
        (1, "x", "2001-01-01", "2020-06-01"),  # closed at update time
        (1, "X", "2020-06-01", None),          # new open version
        (2, "y", "2001-01-01", None),          # untouched open
    }


# ---------------------------------------------------------------------------
# Curation operators (operators/curation.py, similarity.quantize_int8_stats)
# ---------------------------------------------------------------------------

def test_repetition_stats_flags_planted_repeats(spark):
    from oracle_cassandra_migrator_spark.operators import curation
    rows = [
        (1, "spam spam spam spam spam spam spam spam spam spam"),
        (2, "one two three four five six seven eight nine ten"),
        (3, "ab cd ab cd ab cd ab cd ab cd"),
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in
           curation.repetition_stats(df, "text", "doc_id").collect()}
    # doc 1: one word repeated 10x
    assert out[1].top_word_fraction == 1.0
    assert out[1].dup_word_fraction == 0.9
    assert out[1].dup_3gram_fraction == 0.875  # 8 trigrams, 1 distinct
    assert out[1].is_repetitive
    # doc 2: all distinct
    assert out[2].top_word_fraction == 0.1
    assert out[2].dup_word_fraction == 0.0
    assert out[2].dup_3gram_fraction == 0.0
    assert not out[2].is_repetitive
    # doc 3: alternating pair -> every word 5x, trigrams cycle with
    # period 2 -> 8 trigrams, 2 distinct
    assert out[3].top_word_fraction == 0.5
    assert out[3].dup_3gram_fraction == 0.75
    assert out[3].is_repetitive
    # invariants for every row
    for r in out.values():
        assert 0.0 <= r.dup_word_fraction <= 1.0
        assert 0.0 < r.top_word_fraction <= 1.0
        assert 0.0 <= r.dup_3gram_fraction <= 1.0


def test_contamination_overlap_finds_planted_leak(spark):
    from oracle_cassandra_migrator_spark.operators import curation
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                                 # benchmark (id % 2 = 0)
        (1, "alpha beta gamma delta epsilon unrelated words here"),  # leaked prefix
        (3, "totally clean document with no overlap at all"),
        (5, bench_text),                                 # full copy in corpus
    ]
    df = spark.createDataFrame(rows, "doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in curation.contamination_overlap(
        df, "text", "doc_id", bench_filter="doc_id % 2 = 0", n=4).collect()}
    assert set(out) == {1, 5}        # doc 3 clean -> absent
    assert out[5].shared_4grams == out[5].n_4grams  # full copy: all shared
    assert out[5].contaminated_share == 1.0
    assert out[1].shared_4grams == 2  # 'alpha beta gamma delta(+epsilon)'
    assert out[1].n_4grams == 5


def test_cap_per_group_keeps_top_n_deterministically(spark):
    from oracle_cassandra_migrator_spark.operators import curation
    rows = [(s, i, 100 - i) for s in ("a", "b") for i in range(5)]
    df = spark.createDataFrame(rows, "source STRING, doc_id BIGINT, n_chars BIGINT")
    out = curation.cap_per_group(
        df, "source", [F.col("n_chars").desc(), F.col("doc_id")], n=2).collect()
    assert len(out) == 4
    kept = {(r.source, r.doc_id) for r in out}
    # highest n_chars = lowest doc_id here
    assert kept == {("a", 0), ("a", 1), ("b", 0), ("b", 1)}


def test_incremental_dedup_excludes_base_and_dedups_new(spark):
    from oracle_cassandra_migrator_spark.operators import curation
    base = spark.createDataFrame(
        [(1, "seen before"), (2, "also seen")], "doc_id BIGINT, text STRING")
    new = spark.createDataFrame(
        [(10, "seen  BEFORE"),      # dup of base modulo normalization
         (11, "brand new text"),
         (12, "brand new text"),    # dup within new
         (13, "another fresh one")],
        "doc_id BIGINT, text STRING")
    out = {r.representative_id: r.n_new_copies for r in
           curation.incremental_fingerprint_dedup(base, new, "text", "doc_id")
           .collect()}
    assert out == {11: 2, 13: 1}    # 10 suppressed by base; 11+12 collapse


def test_quantize_int8_bounds_and_error(spark):
    from oracle_cassandra_migrator_spark.operators import similarity
    rows = [(1, [1.0, -0.5, 0.25, 0.0], 0), (2, [0.001, 0.002, -0.003, 0.004], 1)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = {r.label: r for r in similarity.quantize_int8_stats(df).collect()}
    assert set(out) == {0, 1}
    for r in out.values():
        assert r.n_vecs == 1
        assert r.avg_mse_1e6 >= 0.0
        assert r.avg_scale_1e3 > 0.0
        # at least the max-|x| element saturates to +/-127
        assert r.n_saturated >= 1
    # per-element reconstruction error is bounded by scale/2:
    # mse <= (scale/2)^2 -> mse_1e6 <= (scale_1e3/2)^2 hence tiny here
    r0 = out[0]
    scale = r0.avg_scale_1e3 / 1e3
    assert r0.avg_mse_1e6 / 1e6 <= (scale / 2) ** 2 + 1e-12


def test_random_projection_preserves_unit_norm_approximately(spark):
    from oracle_cassandra_migrator_spark.operators import similarity
    import math
    rows = [(i, [math.cos(0.1 * i * j) for j in range(64)], i % 2)
            for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id BIGINT, embedding ARRAY<FLOAT>, label INT")
    out = similarity.random_projection_stats(df, dim=64, out_dim=16).collect()
    assert len(out) == 2
    for r in out:
        # JL with k=16: norm ratio concentrates around 1
        assert 0.3 < r.min_norm_ratio <= r.avg_norm_ratio <= r.max_norm_ratio < 2.5
        assert r.n_vecs == 20


def test_temperature_resample_flattens_head(spark):
    from oracle_cassandra_migrator_spark.operators.sampling import (
        temperature_resample_audit)
    rows = ([(i, "big") for i in range(400)]
            + [(1000 + i, "small") for i in range(100)])
    df = spark.createDataFrame(rows, "doc_id BIGINT, lang STRING")
    out = {r.lang: r for r in
           temperature_resample_audit(df, "doc_id", "lang").collect()}
    # smallest stratum keeps everything: threshold = 1.0 -> 1e6 ppm
    assert out["small"].threshold_ppm == 1_000_000
    assert out["small"].n_kept == 100
    # head downsampled at sqrt(100/400) = 0.5
    assert out["big"].threshold_ppm == 500_000
    assert 0 < out["big"].n_kept < 400
    # determinism: same answer on a different partitioning
    out2 = {r.lang: r.n_kept for r in temperature_resample_audit(
        df.repartition(13), "doc_id", "lang").collect()}
    assert out2 == {k: v.n_kept for k, v in out.items()}


def test_codebook_literal_roundtrip(spark):
    """The collected-codebook -> SQL-literal path must reproduce the
    exact doubles: every centroid component comes out of a round(6)
    path, so the %.6f rendering parses back bit-identically."""
    vals = [0.123456, -1.0, 0.0, 119.25, -0.000001, 0.999999]
    rows = [{"cid": 7, "cvec": vals}, {"cid": 301, "cvec": vals[::-1]}]
    expr = similarity.codebook_literal_expr(rows)
    got = spark.sql(f"SELECT {expr} AS cents").collect()[0]["cents"]
    assert [c["cid"] for c in got] == [7, 301]
    assert list(got[0]["cvec"]) == vals
    assert list(got[1]["cvec"]) == vals[::-1]
    # a 6-decimal round output always survives the literal round-trip
    for frac in range(-1000000, 1000001, 77777):
        v = frac / 1e6
        assert float(f"{v:.6f}") == v


def test_assign_cells_literal_matches_dataframe_assignment(spark):
    """Literal-codebook assignment must agree with the broadcast-
    codebook DataFrame assignment on every vector."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    # the literal contract requires round(6) components (what the
    # k-means mean path emits), so round the codebook for both paths
    cents = emb.where("vec_id % 43 = 0").selectExpr(
        "vec_id AS cid",
        "transform(embedding, x -> round(CAST(x AS DOUBLE), 6)) AS cvec")
    via_df = similarity._assign_cells(emb, cents, "embedding", "vec_id")
    lit = similarity.codebook_literal_expr(cents.collect())
    via_lit = similarity.assign_cells_literal(emb, lit)
    a = {(r.vec_id, r.cell_id) for r in via_df.collect()}
    b = {(r.vec_id, r.cell_id) for r in via_lit.collect()}
    assert a == b


def test_quantile_buckets_approx_matches_exact_shape(spark):
    """The approx_percentile production path must produce the same
    bucket structure as the exact path: same bucket ids, every row
    assigned, bucket populations within sketch tolerance of n/k."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        assign_buckets, quantile_boundaries, quantile_bucket_profile)

    df = spark.range(0, 10000).selectExpr(
        "CAST(pmod(id * 2654435761, 9973) AS DOUBLE) AS x")
    exact = quantile_bucket_profile(df, "x", 5, exact=True).collect()
    approx = quantile_bucket_profile(
        df, "x", 5, exact=False, accuracy=10000).collect()
    assert sorted(r["bucket"] for r in exact) == [1, 2, 3, 4, 5]
    assert sorted(r["bucket"] for r in approx) == [1, 2, 3, 4, 5]
    assert sum(r["n_rows"] for r in approx) == 10000
    for r in approx:
        assert abs(r["n_rows"] - 2000) <= 220  # sketch tolerance

    # tie rule: a value equal to a boundary lands in the LOWER bucket
    bounds = quantile_boundaries(df, "x", 5, exact=True)
    bvals = bounds.collect()[0]["bounds"]
    probe = spark.createDataFrame([(float(bvals[0]),)], "x double")
    assert assign_buckets(probe, bounds, "x").collect()[0]["bucket"] == 1


def test_quantile_buckets_more_buckets_than_rows(spark):
    """k > n must not crash or emit out-of-range buckets: with n=2
    rows and k=5, percentile_disc boundaries repeat data values and
    every row still lands in [1, k]."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        quantile_bucket_profile)

    df = spark.createDataFrame([(1.0,), (2.0,)], "x double")
    rows = quantile_bucket_profile(df, "x", 5, exact=True).collect()
    assert sum(r["n_rows"] for r in rows) == 2
    assert all(1 <= r["bucket"] <= 5 for r in rows)


def test_grouped_quantile_all_ties_single_bucket(spark):
    """A group whose values are all identical gets every row in bucket
    1 (ties land LOW of every boundary == the value itself)."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        grouped_bucket_profile)

    df = spark.createDataFrame(
        [("a", 7.0)] * 6 + [("b", float(i)) for i in range(8)],
        "g string, x double")
    rows = grouped_bucket_profile(df, "x", 4, "g", exact=True).collect()
    a_rows = [r for r in rows if r["g"] == "a"]
    assert len(a_rows) == 1 and a_rows[0]["bucket"] == 1
    assert a_rows[0]["n_rows"] == 6
    assert sum(r["n_rows"] for r in rows if r["g"] == "b") == 8


def test_gapfill_edges(spark):
    """Gap-fill edge semantics: a key active on ONE day yields exactly
    one row (0 days since active); a key with a hole gets the missing
    days 0-filled with days_since_active counting up from the last
    active day."""
    from oracle_cassandra_migrator_spark.operators.timeseries import (
        daily_gapfill)

    df = spark.createDataFrame(
        [("solo", "2024-03-05 10:00:00"),
         ("holey", "2024-03-01 01:00:00"),
         ("holey", "2024-03-01 02:00:00"),
         ("holey", "2024-03-04 09:00:00")],
        "k string, ts string").selectExpr("k", "CAST(ts AS TIMESTAMP) AS ts")
    out = {(r["k"], r["day"]): (r["n_events"], r["days_since_active"])
           for r in daily_gapfill(df, "k", "ts").collect()}
    assert out[("solo", "2024-03-05")] == (1, 0)
    assert len([1 for (k, _) in out if k == "holey"]) == 4
    assert out[("holey", "2024-03-01")] == (2, 0)
    assert out[("holey", "2024-03-02")] == (0, 1)
    assert out[("holey", "2024-03-03")] == (0, 2)
    assert out[("holey", "2024-03-04")] == (1, 0)


def test_ngram_token_df_cap_bounds_adversarial(spark):
    """One ubiquitous shingle shared by every doc must not melt the
    inverted-index self-join: with max_token_df set, (1) the planted
    rare-shingle near-dup pair still comes out above threshold, and
    (2) an adversarial corpus whose only overlap is the ubiquitous
    boilerplate yields NO pairs (the capped semantics)."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        ngram_jaccard_pairs)

    boiler = "click here to subscribe now"
    rare = "quantum flux capacitor delta nine epsilon"
    rows = [(0, f"{boiler} {rare}"), (1, f"{boiler} {rare}")]
    rows += [(i, f"{boiler} unique filler text number {i} data")
             for i in range(2, 40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = ngram_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.3,
        max_token_df=5).collect()
    found = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert (0, 1) in found, "planted rare-overlap pair lost by the cap"
    # every other pair overlaps ONLY through the ubiquitous boilerplate
    # (df = 40 > cap) so the capped join must not emit it
    assert found == {(0, 1)}, found


def test_simhash_block_cap_bounds_mass_duplication(spark):
    """A mass-duplicated doc (identical simhash -> identical blocks)
    must not melt the pigeonhole join: with max_block_size set, the
    duplicated mass drops out of pairwise verification (it belongs to
    simhash_buckets/exact_dedup) while a distinct near-dup pair with
    small block groups still verifies."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        simhash_hamming_pairs)

    spam = "identical boilerplate spam payload repeated everywhere"
    rows = [(i, spam) for i in range(30)]
    rows += [(100, "alpha beta gamma delta unique content one"),
             (101, "alpha beta gamma delta unique content two")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    capped = simhash_hamming_pairs(
        docs, "text", "doc_id", max_distance=3, max_block_size=5).collect()
    pairs = {(r["doc_a"], r["doc_b"]) for r in capped}
    assert all(a >= 100 for a, _ in pairs), (
        "mass-duplicated block group leaked through the cap")
    assert (100, 101) in pairs, "distinct near-dup pair lost by the cap"


def test_pagerank_conserves_mass_on_closed_graph(spark):
    """On a graph where every node has out-edges (no danglers), total
    rank must stay 1 each iteration (up to the 12-dp rounding): the
    (1-d)/N injections and d-scaled redistributions balance exactly."""
    from oracle_cassandra_migrator_spark.operators.graph import pagerank

    edges = spark.createDataFrame(
        [("a", "b", 2), ("b", "c", 1), ("c", "a", 1), ("a", "c", 3)],
        "src string, dst string, w long")
    nodes = spark.createDataFrame([("a",), ("b",), ("c",)], "node string")
    ranks = {r["node"]: r["rank"]
             for r in pagerank(edges, nodes, iters=3).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    # a receives from b and c fully plus nothing else; c gets 3/5 of a
    assert ranks["c"] > ranks["b"]  # a sends 60% to c, 40% to b


def test_pagerank_dangling_node_gets_base_rank_only(spark):
    """A node with no in-edges settles at the (1-d)/N floor; mass sent
    into a dangler is deliberately not redistributed (documented)."""
    from oracle_cassandra_migrator_spark.operators.graph import pagerank

    edges = spark.createDataFrame([("a", "b", 1)], "src string, dst string, w long")
    nodes = spark.createDataFrame([("a",), ("b",)], "node string")
    ranks = {r["node"]: r["rank"]
             for r in pagerank(edges, nodes, iters=3).collect()}
    assert abs(ranks["a"] - 0.075) < 1e-9  # (1-0.85)/2, no in-edges
    assert ranks["b"] > ranks["a"]


def test_dedup_keep_representative_keeps_min_id_per_group(spark):
    from oracle_cassandra_migrator_spark.operators.dedup import (
        dedup_keep_representative)

    docs = spark.createDataFrame(
        [(5, "x  y"), (2, "X y "), (9, "unique"), (1, "other")],
        "doc_id long, text string")
    out = dedup_keep_representative(docs, "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 2, 9]
    assert out.columns == ["doc_id", "text"]  # helper columns dropped


def test_duplicate_segments_flags_planted_boilerplate(spark):
    """Two docs sharing an identical 10-word opening must both report
    that segment as duplicated; a unique doc reports zero."""
    from oracle_cassandra_migrator_spark.queries.extensions import (
        dedup_duplicate_segments)

    header = " ".join(f"w{i}" for i in range(10))
    rows = [
        (1, header + " tail one two three four five six seven eight nine"),
        (2, header + " other words here that differ a lot more than ten"),
        (3, " ".join(f"u{i}" for i in range(20))),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import oracle_cassandra_migrator_spark.queries.extensions as ext
    orig = ext.read_table  # patched in ext: the query binds it by name
    ext.read_table = lambda s, d, n: docs if n == "documents" else orig(s, d, n)
    try:
        # direct call, NOT catalog_rows: read_table is monkeypatched
        # here, so memoizing would poison the shared result cache
        got = {r["doc_id"]: r for r in
               dedup_duplicate_segments(spark, SF_SMALL).collect()}
    finally:
        ext.read_table = orig
    assert got[1]["n_dup_segments"] == 1 and got[2]["n_dup_segments"] == 1
    assert got[3]["n_dup_segments"] == 0 and got[3]["n_segments"] == 2


def test_trigram_novelty_monotone_planted(spark):
    """Doc 1 is all-novel by construction; doc 2 (a copy) has zero
    novel trigrams; doc 3 mixes half-copied, half-new content."""
    from oracle_cassandra_migrator_spark.queries.extensions import (
        text_trigram_novelty)

    base = " ".join(f"w{i}" for i in range(12))
    rows = [(1, base), (2, base),
            (3, base + " " + " ".join(f"n{i}" for i in range(12)))]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    import oracle_cassandra_migrator_spark.queries.extensions as ext
    orig = ext.read_table
    ext.read_table = lambda s, d, n: docs if n == "documents" else orig(s, d, n)
    try:
        # direct call, NOT catalog_rows: read_table is monkeypatched
        got = {r["doc_id"]: r for r in
               text_trigram_novelty(spark, SF_SMALL).collect()}
    finally:
        ext.read_table = orig
    assert got[1]["novelty_ppm"] == 1_000_000
    assert got[2]["n_novel"] == 0
    assert 0 < got[3]["novelty_ppm"] < 1_000_000


def test_pq_topk_exact_on_clustered_data(spark):
    """With well-separated clusters the ADC estimate must rank the
    query's own cluster on top: PQ top-k == brute-force top-k."""
    import math

    from oracle_cassandra_migrator_spark.operators.similarity import (
        pq_train_codebooks, pq_topk)

    def vec(theta):
        # 8-dim: two 4-dim subspaces tracing a circle each
        c, s = math.cos(theta), math.sin(theta)
        return [c, s, 0.0, 0.0, s, c, 0.0, 0.0]

    # two clusters; ids all divisible by 13 so the codebook init
    # samples BOTH clusters (0,13,26 near theta 0; 39,52,65 near 2.0)
    rows = ([(13 * i, vec(0.02 * i)) for i in range(3)]
            + [(39 + 13 * i, vec(2.0 + 0.02 * i)) for i in range(3)])
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    books = pq_train_codebooks(
        emb, n_sub=2, sub_dim=4, modulus=13, iters=1, init_limit=4)
    got = [r["vec_id"] for r in
           pq_topk(emb, books, sub_dim=4, k=2, query_id=0).collect()]
    assert set(got) == {13, 26}  # own cluster, not the far one


def test_map_in_arrow_norms_match_sql_expression(spark):
    """mapInArrow path must agree with the JVM-side expression fold
    (and therefore with the udf_embedding_norms oracle)."""
    from oracle_cassandra_migrator_spark.operators.udfs import (
        embedding_norms_arrow)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    got = {r["vec_id"]: r["l2_norm"]
           for r in embedding_norms_arrow(emb).collect()}
    want = {r["vec_id"]: r["l2"] for r in emb.selectExpr(
        "vec_id",
        "round(sqrt(aggregate(zip_with(embedding, embedding,"
        " (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),"
        " CAST(0.0 AS DOUBLE), (a, v) -> a + v)), 6) AS l2").collect()}
    assert got == want


def test_l2_norm_null_and_empty_vectors(spark):
    """A NULL embedding must not crash the vectorized fast path's
    len() scan: it routes the batch to the exact slow path, where the
    NaN placeholder round-trips through Arrow as SQL NULL (NULL in ->
    NULL out); empty vectors keep their 0.0 norm alongside."""
    from oracle_cassandra_migrator_spark.operators.udfs import embedding_norms

    emb = spark.createDataFrame(
        [(1, [3.0, 4.0]), (2, None), (3, []), (4, [6.0, 8.0])],
        "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r["l2_norm"] for r in embedding_norms(emb).collect()}
    assert got[1] == 5.0
    assert got[2] is None
    assert got[3] == 0.0
    assert got[4] == 10.0


def test_dedup_funnel_stage_invariants(spark):
    """Provable orderings between funnel stages: every strategy keeps
    at most the raw count; prefix-fingerprinting merges at least as
    much as whole-text fingerprinting (same first 20 words is implied
    by same normalized text); MinHash clusters subsume exact
    duplicates (identical docs have Jaccard 1 >= threshold), so its
    keeps can't exceed the exact survivors — PROVIDED no exact-dup
    group exceeds the LSH band cap (an over-cap mass-duplicate group
    has all its band groups dropped and every copy kept; this corpus
    has no such group, and the cap's contract routes those to the
    linear exact_dedup pass anyway — see minhash_lsh_pairs)."""
    from tests.conftest import catalog_rows

    _, rows = catalog_rows(spark, "corpus_dedup_funnel", SF_SMALL)
    got = {r["stage"]: r["n_kept"] for r in rows}
    assert got["b_exact"] <= got["a_total"]
    assert got["c_prefix"] <= got["b_exact"]
    assert got["d_minhash"] <= got["b_exact"]
    assert got["e_simhash"] <= got["a_total"]
    assert all(v > 0 for v in got.values())


def test_dedup_keep_representative_string_ids(spark):
    """String/UUID ids must work: the representative join must not
    coerce the id to bigint (which would NULL out and drop all rows)."""
    from oracle_cassandra_migrator_spark.operators.dedup import (
        dedup_keep_representative)

    docs = spark.createDataFrame(
        [("u-b", "same  text"), ("u-a", "same text"), ("u-c", "other")],
        "doc_id string, text string")
    out = dedup_keep_representative(docs, "text", "doc_id")
    assert sorted(r["doc_id"] for r in out.collect()) == ["u-a", "u-c"]


def test_pagerank_is_partition_invariant(spark):
    """The decimal-summed contributions make ranks bit-identical under
    any physical partitioning — the exactness contract the unrolled
    SQL oracle relies on."""
    from oracle_cassandra_migrator_spark.operators.graph import pagerank

    edge_rows = [(f"n{i}", f"n{(i * 7 + j) % 40}", 1 + (i + j) % 5)
                 for i in range(40) for j in range(3)]
    node_rows = [(f"n{i}",) for i in range(40)]
    schema_e = "src string, dst string, w long"
    base = spark.createDataFrame(edge_rows, schema_e)
    nodes = spark.createDataFrame(node_rows, "node string")

    def ranks(edges):
        return {r["node"]: r["rank"]
                for r in pagerank(edges, nodes, iters=3).collect()}

    a = ranks(base.repartition(1))
    b = ranks(base.repartition(13, "dst"))
    assert a == b  # bit-identical, not approximately equal


def test_lang_guess_bound_rewrite_value_identical(spark):
    """The r6 bound-once rewrite of lang_guess_expr must produce the
    exact language the naive per-profile inlining produced, row for
    row, on the real corpus (both SFs' documents share the generator;
    sf0.01 suffices) plus adversarial literals (empty, no stopwords,
    cross-language ties)."""
    from oracle_cassandra_migrator_spark.operators.text import (
        LANG_PROFILES, lang_guess_expr, stopword_count_expr)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    def naive(col):
        counts = {lang: stopword_count_expr(col, words)
                  for lang, words in LANG_PROFILES.items()}
        greatest = "greatest(" + ", ".join(counts.values()) + ")"
        case = " ".join(f"WHEN {counts[lang]} = {greatest} THEN '{lang}'"
                        for lang in LANG_PROFILES)
        return (f"CASE WHEN {greatest} = 0 THEN 'und' {case} "
                f"ELSE 'und' END")

    docs = read_table(spark, "/root/testdata/sf0.01", "documents")
    lit = spark.createDataFrame(
        [("",), ("zzz qqq xyz",), ("the el le der und est",),
         ("la la la",), ("de la que",)], "text string")
    for df in (docs, lit):
        n_diff = (df.selectExpr(
            f"{lang_guess_expr('text')} AS new_guess",
            f"{naive('text')} AS old_guess")
            .where("new_guess IS DISTINCT FROM old_guess").count())
        assert n_diff == 0


def test_winsorize_grouped_clamps_per_group(spark):
    """The by= path must clamp each group at ITS OWN envelope: a value
    legal in one group must still clamp in a tighter group."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        winsorize)

    rows = ([("a", float(v)) for v in range(1, 101)]
            + [("b", float(v)) for v in range(1, 11)])
    df = spark.createDataFrame(rows, ["g", "x"])
    out = winsorize(df, "x", lo=0.1, hi=0.9, by="g", exact=True,
                    out="xw").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r["g"], []).append((r["x"], r["xw"]))
    # group a: p10=10, p90=90 (ceil(0.1*100)=10th, ceil(0.9*100)=90th)
    assert min(w for _, w in by_g["a"]) == 10.0
    assert max(w for _, w in by_g["a"]) == 90.0
    # group b: p10=1, p90=9 — 50.0 would be legal in a, impossible in b
    assert max(w for _, w in by_g["b"]) == 9.0
    assert len(by_g["a"]) == 100 and len(by_g["b"]) == 10


def test_winsorize_grouped_keeps_null_group_rows(spark):
    """Row-preserving contract under NULL group keys: the bounds join
    is null-SAFE, so NULL-group rows clamp at their own envelope
    instead of silently dropping (the grouped_bucket_profile pitfall,
    handled here)."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        winsorize)

    rows = ([("a", float(v)) for v in range(1, 21)]
            + [(None, float(v)) for v in range(1, 11)])
    df = spark.createDataFrame(rows, "g string, x double")
    out = winsorize(df, "x", lo=0.1, hi=0.9, by="g", exact=True,
                    out="xw").collect()
    assert len(out) == 30
    nulls = [r["xw"] for r in out if r["g"] is None]
    assert len(nulls) == 10
    assert min(nulls) == 1.0 and max(nulls) == 9.0


def test_cogroup_asof_align_matches_window_asof_join(spark):
    """cogroup().applyInPandas as-of alignment (pandas merge_asof per
    key, one shuffle per side) must reproduce the window-union as-of
    join exactly — including users with no prior click (NULL) and
    equal-timestamp click-before-purchase ties."""
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.operators.udfs import (
        cogroup_asof_align)
    from oracle_cassandra_migrator_spark.queries import QUERIES
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    ev = read_table(spark, SF_SMALL, "events")
    p = ev.where("event_type = 'purchase'").selectExpr(
        "event_id", "user_id", "ts AS p_ts")
    c = ev.where("event_type = 'click'").selectExpr(
        "user_id", "ts AS c_ts")
    aligned = cogroup_asof_align(
        p, c, key="user_id", left_ts="p_ts", right_ts="c_ts",
        right_cols=["c_ts"])
    got = {r["event_id"]: r["us"] for r in aligned.selectExpr(
        "event_id",
        "TIMESTAMPDIFF(MICROSECOND, c_ts, p_ts) AS us").collect()}
    want = {r["event_id"]: r["us_since_click"]
            for r in QUERIES["asof_join_purchase_click"](
                spark, SF_SMALL).collect()}
    assert got == want
    assert any(v is None for v in want.values()) or len(want) > 0


def test_fuzzy_join_tie_breaks_on_right_col_first(spark):
    """Two candidates at equal distance: the winner must be the one
    with the smaller right_col value, regardless of the right table's
    column order (the docstring's contract; a column-order-dependent
    pick would silently diverge from oracles written to it)."""
    from oracle_cassandra_migrator_spark.operators.linkage import (
        fuzzy_join)

    left = spark.createDataFrame([(1, "abc")], ["lid", "lname"])
    # column order puts 'category' BEFORE 'name'; both rows are at
    # lev_dist 1 from 'abc' and share the block key
    right = spark.createDataFrame(
        [("z", "abd"), ("a", "abe")], ["category", "name"])
    got = fuzzy_join(
        left, right, "lname", "name",
        left_block_keys=["substring(lname, 1, 2)"],
        right_block_keys=["substring(name, 1, 2)"],
        max_dist=1, pick_best=True, left_id="lid").collect()
    assert len(got) == 1
    assert got[0]["name"] == "abd"       # min name wins...
    assert got[0]["category"] == "z"     # ...not min category


def test_cosine_pairs_guard_refuses_large_inputs(spark):
    """r9: the quadratic exact-cosine baseline refuses corpus-sized
    inputs with guidance (the jaccard strategy guard's embedding
    analog — refuse-only, since the LSH-blocked twin is not
    output-identical); max_rows=None forces."""
    import pytest

    from oracle_cassandra_migrator_spark.operators import similarity

    emb = spark.range(50).selectExpr(
        "id AS vec_id", "array(CAST(id AS FLOAT), 1.0F) AS embedding")
    with pytest.raises(ValueError, match="cosine_pairs_lsh_blocked"):
        similarity.cosine_pairs(emb, threshold=0.9, max_rows=10)
    forced = similarity.cosine_pairs(
        emb, threshold=0.9, max_rows=None)
    assert forced.columns == ["id_a", "id_b", "cosine"]
    assert forced.count() > 0


def test_temperature_and_mix_treat_null_stratum_as_real(spark):
    """Review r11: NULL strata were counted in the threshold math but
    silently dropped by the equi-join — a tiny NULL-lang group set
    n_min (crushing every real language's threshold) while its own
    rows vanished. NULL is now a REAL stratum via a null-safe join:
    its rows survive at their own threshold, and the audit reports it."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        corpus_mix_downsample,
        temperature_resample,
        temperature_resample_audit,
    )

    rows = ([(i, "en") for i in range(400)]
            + [(400 + i, None) for i in range(3)])
    docs = spark.createDataFrame(rows, "doc_id LONG, lang STRING")

    audit = {r["lang"]: r for r in
             temperature_resample_audit(docs, "doc_id", "lang").collect()}
    assert set(audit) == {"en", None}
    # the NULL stratum is the smallest: it keeps (nearly) everything
    assert audit[None]["threshold_ppm"] == 1_000_000
    assert audit[None]["n_kept"] > 0  # pre-fix: always 0

    kept = temperature_resample(docs, "doc_id", "lang")
    by_lang = {r["lang"]: r["n"] for r in kept.groupBy("lang")
               .agg(F.count("*").alias("n")).collect()}
    assert by_lang.get(None) == audit[None]["n_kept"]
    # and the audit's n_kept matches the filter's survivors per stratum
    assert by_lang.get("en", 0) == audit["en"]["n_kept"]

    mixed = corpus_mix_downsample(docs, "doc_id", "lang")
    langs = {r["lang"] for r in mixed.select("lang").distinct().collect()}
    assert None in langs  # NULL stratum kept whole (under-represented)
