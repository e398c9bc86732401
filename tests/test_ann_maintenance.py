"""Incremental ANN index maintenance (VERDICT r9 item 4,
operators/similarity.py): appending against a frozen codebook must be
row-identical to re-assigning the full corpus against it, the drift
gate must route append vs retrain, and the append path must stay
zero-shuffle."""

from oracle_cassandra_migrator_spark.operators import similarity
from tests.conftest import SF_SMALL


def _emb(spark):
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    return read_table(spark, SF_SMALL, "embeddings").select(
        "vec_id", "embedding")


def _negated(df, id_offset=1_000_000):
    return df.selectExpr(
        f"vec_id + {id_offset} AS vec_id",
        "transform(embedding, x -> CAST(-x AS FLOAT)) AS embedding")


def test_centroid_drift_micro_is_exact_cosine(spark):
    emb = _emb(spark)
    assert similarity.centroid_drift_micro(emb, emb) == 1_000_000
    assert similarity.centroid_drift_micro(emb, _negated(emb)) \
        == -1_000_000


def test_append_within_gate_equals_full_reassign(spark):
    """The maintenance invariant: encode ONLY the appended half
    against the frozen codebook, union under the untouched base index
    — row-identical to assigning the whole corpus against the same
    codebook, and the probe over the maintained index equals the probe
    over the rebuilt one."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    cents = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64)
    rows = cents.collect()
    expr = similarity.codebook_literal_expr(rows)
    base_cells = similarity.assign_cells_literal(base, expr)

    drift = similarity.centroid_drift_micro(base, appended)
    maintained, cb_back, retrained, got_drift = similarity.extend_or_retrain_ivf(
        base_cells, appended, rows, gate_micro=drift)  # gate met exactly
    assert retrained is False and got_drift == drift
    assert cb_back is rows  # append arm hands the frozen codebook back

    want = similarity.assign_cells_literal(emb, expr)
    assert (sorted(map(tuple, maintained.collect()))
            == sorted(map(tuple, want.collect())))

    got_topk = similarity.topk_within_cells(
        maintained, k=10, query_id=0).collect()
    want_topk = similarity.topk_within_cells(
        want, k=10, query_id=0).collect()
    assert [tuple(r) for r in got_topk] == [tuple(r) for r in want_topk]
    assert len(got_topk) == 10


def test_drift_beyond_gate_retrains_full_rebuild(spark):
    """A drifted batch (negated vectors: centroid cosine -1.0) must
    cross the default gate and trigger the full rebuild — maintenance
    equals a from-scratch retrain+reassign over base+appended."""
    emb = _emb(spark)
    base = emb.where("vec_id % 4 = 0")
    appended = _negated(base)
    cents = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64)
    rows = cents.collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows))

    maintained, new_cb, retrained, drift = similarity.extend_or_retrain_ivf(
        base_cells, appended, rows)
    assert retrained is True
    assert drift == -1_000_000 < similarity.CENTROID_DRIFT_GATE_MICRO

    full = base.unionByName(appended)
    want_cents = similarity.kmeans_codebook(
        full, modulus=43, iters=2, init_limit=64)
    # the retrain arm must hand back the NEW codebook (a maintenance
    # loop appends against it next batch)
    assert (sorted((r["cid"], tuple(r["cvec"])) for r in new_cb)
            == sorted((r["cid"], tuple(r["cvec"]))
                      for r in want_cents.collect()))
    want = similarity._assign_cells(
        full, want_cents, "embedding", "vec_id")
    assert (sorted(map(tuple, maintained.collect()))
            == sorted(map(tuple, want.collect())))


def test_gate_routing_is_threshold_exact(spark):
    """Routing is a pure comparison against the measured drift: gate
    at drift appends, gate one micro-unit above retrains."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    rows = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64).collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows))
    drift = similarity.centroid_drift_micro(base, appended)
    _, _, retrained_lo, _ = similarity.extend_or_retrain_ivf(
        base_cells, appended, rows, gate_micro=drift)
    _, _, retrained_hi, _ = similarity.extend_or_retrain_ivf(
        base_cells, appended, rows, gate_micro=drift + 1)
    assert retrained_lo is False and retrained_hi is True


def test_assign_appended_batch_is_zero_shuffle(spark):
    """The append fast path must be a pure per-row projection: no
    Exchange anywhere, inside whole-stage codegen — O(|batch|) at any
    index size."""
    emb = _emb(spark)
    rows = similarity.kmeans_codebook(
        emb.where("vec_id % 2 = 0"), modulus=43, iters=2,
        init_limit=64).collect()
    assigned = similarity.assign_appended_batch(
        emb.where("vec_id % 2 = 1"), rows)
    plan = assigned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_replayed_batch_is_a_noop_not_double_insert(spark):
    """Self-review r10: a retried/redelivered batch whose ids already
    sit in the index must not double-insert (duplicate neighbors would
    crowd the top-k) — the exact-id anti-join dedupes it to empty and
    the index comes back unchanged without a retrain."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    rows = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64).collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows)).cache()
    want = sorted(map(tuple, base_cells.collect()))

    replay, _, retrained, drift = similarity.extend_or_retrain_ivf(
        base_cells, base, rows)  # the whole batch is a replay
    assert retrained is False and drift == 1_000_000
    got = sorted(map(tuple, replay.collect()))
    assert got == want  # no duplicates, nothing changed
    base_cells.unpersist()


def test_empty_batch_short_circuits_without_retrain(spark):
    """Self-review r10: an empty append day must return the unchanged
    index — not feed the degenerate zero-centroid drift into a full
    k-means retrain."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    rows = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64).collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows)).cache()
    empty = emb.where("vec_id < 0")
    cells, _, retrained, drift = similarity.extend_or_retrain_ivf(
        base_cells, empty, rows)
    assert retrained is False and drift == 1_000_000
    assert (sorted(map(tuple, cells.collect()))
            == sorted(map(tuple, base_cells.collect())))
    base_cells.unpersist()


def test_carried_base_sums_match_recomputed_drift(spark):
    """The production O(|batch|) path: base sums are computed once and
    carried forward (they are additive), and routing with them equals
    routing with a fresh index scan."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    rows = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64).collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows))
    sums = similarity.embedding_dim_sums_micro(base)
    drift_scan = similarity.centroid_drift_micro(base, appended)
    _, _, _, drift_carried = similarity.extend_or_retrain_ivf(
        base_cells, appended, rows, gate_micro=-10**7,
        assume_new_ids=True, base_sums=sums)
    assert drift_carried == drift_scan


# ---------------------------------------------------------------------------
# PQ twin (extend_or_retrain_pq / pq_encode / pq_topk_over_codes)
# ---------------------------------------------------------------------------


def test_pq_append_within_gate_equals_full_reencode(spark):
    """PQ maintenance invariant: encode only the appended half against
    the frozen codebooks, union under the untouched code table —
    row-identical to re-encoding the whole corpus, and ADC serving
    over the maintained codes equals serving over the rebuilt table."""
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    books = similarity.pq_train_codebooks(base)
    base_codes = similarity.pq_encode(base, books)

    codes, books_back, retrained, drift = similarity.extend_or_retrain_pq(
        base_codes, appended, books, gate_micro=-10**7)
    assert retrained is False and books_back is books

    want = similarity.pq_encode(emb, books)
    assert (sorted(map(tuple, codes.collect()))
            == sorted(map(tuple, want.collect())))

    query = emb.where("vec_id = 0").selectExpr("embedding AS q")
    got_topk = similarity.pq_topk_over_codes(
        codes, books, query, k=10).collect()
    want_topk = similarity.pq_topk_over_codes(
        want, books, query, k=10).collect()
    assert [tuple(r) for r in got_topk] == [tuple(r) for r in want_topk]
    assert len(got_topk) == 10


def test_pq_retrain_hands_back_new_codebooks(spark):
    """A drifted batch retrains: the returned codebooks equal a
    from-scratch pq_train_codebooks over base+appended and the codes
    equal the full re-encode against them."""
    emb = _emb(spark)
    base = emb.where("vec_id % 4 = 0")
    appended = _negated(base)
    books = similarity.pq_train_codebooks(base)
    base_codes = similarity.pq_encode(base, books)

    codes, new_books, retrained, drift = similarity.extend_or_retrain_pq(
        base_codes, appended, books)
    assert retrained is True and drift == -1_000_000

    full = base.unionByName(appended)
    want_books = similarity.pq_train_codebooks(full)
    assert new_books == want_books
    want = similarity.pq_encode(full, want_books)
    assert (sorted(map(tuple, codes.collect()))
            == sorted(map(tuple, want.collect())))


def test_pq_replayed_and_empty_batches_are_noops(spark):
    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    books = similarity.pq_train_codebooks(base)
    base_codes = similarity.pq_encode(base, books).cache()
    want = sorted(map(tuple, base_codes.collect()))

    replay, books_r, retrained, drift = similarity.extend_or_retrain_pq(
        base_codes, base, books)
    assert retrained is False and drift == 1_000_000
    assert sorted(map(tuple, replay.collect())) == want
    empty, _, retrained_e, _ = similarity.extend_or_retrain_pq(
        base_codes, emb.where("vec_id < 0"), books)
    assert retrained_e is False
    assert sorted(map(tuple, empty.collect())) == want
    base_codes.unpersist()


def test_pq_encode_is_zero_shuffle(spark):
    emb = _emb(spark)
    books = similarity.pq_train_codebooks(emb.where("vec_id % 2 = 0"))
    encoded = similarity.pq_encode(emb.where("vec_id % 2 = 1"), books)
    plan = encoded._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "WholeStageCodegen" in plan or "*(" in plan


def test_pq_geometry_derived_from_codebooks(spark):
    """Review r10: geometry is a property of the index. A non-default
    8x8 index must append with 8-dim slice offsets and retrain to 8
    codebooks — pre-fix the append arm used len(codebooks) while the
    retrain arm used the n_sub=4 default, silently disagreeing."""
    import pytest

    emb = _emb(spark)
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    books = similarity.pq_train_codebooks(base, n_sub=8, sub_dim=8)
    assert len(books) == 8 and len(books[0][0]["cvec"]) == 8
    base_codes = similarity.pq_encode(base, books, sub_dim=8)

    # append arm: encode offsets must match the 8x8 geometry
    codes, _, retrained, _ = similarity.extend_or_retrain_pq(
        base_codes, appended, books, gate_micro=-10**7)
    assert retrained is False
    want = similarity.pq_encode(emb, books, sub_dim=8)
    assert sorted(c for c in codes.columns) == sorted(want.columns)
    assert (sorted(map(tuple, codes.collect()))
            == sorted(map(tuple, want.collect())))

    # retrain arm: new codebooks keep the index's 8x8 geometry
    drifted = _negated(base)
    codes_r, new_books, retrained_r, _ = similarity.extend_or_retrain_pq(
        base_codes, drifted, books)
    assert retrained_r is True
    assert len(new_books) == 8
    assert len(new_books[0][0]["cvec"]) == 8
    assert sorted(codes_r.columns) == sorted(base_codes.columns)

    # explicit geometry conflicting with the index is refused
    with pytest.raises(ValueError, match="n_sub=4 conflicts"):
        similarity.extend_or_retrain_pq(
            base_codes, appended, books, n_sub=4)
    with pytest.raises(ValueError, match="sub_dim=16 conflicts"):
        similarity.extend_or_retrain_pq(
            base_codes, appended, books, sub_dim=16)


def test_ivf_retrain_plan_carries_literal_codebook(spark):
    """Review r10: the retrain arm must re-enter the NEW codebook as a
    literal, not embed the Lloyd training DAG in the returned index
    plan (which would re-run training on every downstream action)."""
    emb = _emb(spark)
    base = emb.where("vec_id % 4 = 0")
    cents = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64)
    rows = cents.collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows))

    cells, new_rows, retrained, _ = similarity.extend_or_retrain_ivf(
        base_cells, _negated(base), rows)
    assert retrained is True
    plan = cells._jdf.queryExecution().optimizedPlan().toString()
    # training runs Lloyd means through a posexplode + aggregate; a
    # literal-codebook plan has neither
    assert "posexplode" not in plan.lower()
    assert "Aggregate" not in plan
    # and the assignment equals a from-scratch literal assignment
    # against the returned codebook
    full = base.select("vec_id", "embedding").unionByName(
        _negated(base))
    want = similarity.assign_cells_literal(
        full, similarity.codebook_literal_expr(new_rows))
    assert (sorted(map(tuple, cells.collect()))
            == sorted(map(tuple, want.collect())))
