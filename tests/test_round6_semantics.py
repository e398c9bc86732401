"""Independent semantic checks for the round-6 operators — not oracle
replays (the DuckDB oracles share the algorithm); these verify the
operators against brute force or algebraic invariants."""

import itertools

from oracle_cassandra_migrator_spark.queries import QUERIES

from tests.conftest import SF_SMALL


def test_triangle_count_matches_bruteforce(spark):
    """Degree-oriented counting must agree with O(V^3) brute force on
    the collected nation graph — an INDEPENDENT algorithm, not the
    oracle's replay of the same orientation."""
    from oracle_cassandra_migrator_spark.queries.round6 import (
        graph_triangle_count)
    from oracle_cassandra_migrator_spark.queries import extensions as ext

    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        from oracle_cassandra_migrator_spark.sources.testdata import (
            read_table)
        read_table(spark, SF_SMALL, t).createOrReplaceTempView(t)
    edges = spark.sql(ext._PAGERANK_EDGES_SQL).collect()
    und = {frozenset((r["src"], r["dst"])) for r in edges
           if r["src"] != r["dst"]}
    nodes = sorted({n for e in und for n in e})
    expected = {n: 0 for n in nodes}
    n_tri = 0
    for a, b, c in itertools.combinations(nodes, 3):
        if ({frozenset((a, b)), frozenset((b, c)), frozenset((a, c))}
                <= und):
            n_tri += 1
            expected[a] += 1
            expected[b] += 1
            expected[c] += 1
    got = {r["node"]: r["n_triangles"]
           for r in graph_triangle_count(spark, SF_SMALL).collect()}
    assert {k: v for k, v in got.items() if k in expected} == expected
    assert sum(got.values()) == 3 * n_tri


def test_transition_matrix_probabilities_sum_to_unity(spark):
    """Per prev_type, the ppm probabilities must sum to 1e6 within
    rounding slack (|next types| half-ulps), and every count must be
    positive."""
    rows = QUERIES["events_type_transition_matrix"](
        spark, SF_SMALL).collect()
    by_prev = {}
    for r in rows:
        by_prev.setdefault(r["prev_type"], []).append(r)
    assert len(by_prev) >= 2
    for prev, group in by_prev.items():
        total_ppm = sum(r["prob_ppm"] for r in group)
        assert abs(total_ppm - 1_000_000) <= len(group), (prev, total_ppm)
        assert all(r["n_transitions"] > 0 for r in group)


def test_null_safe_join_keeps_null_group_and_plain_eq_drops_it(spark):
    """The semantic contract in data: the NULL group exists, its
    plain-equality count is 0, and every non-NULL group matches fully;
    group totals must cover all of orders."""
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    rows = QUERIES["join_null_safe_eq"](spark, SF_SMALL).collect()
    by_key = {r["status_key"]: r for r in rows}
    assert None in by_key
    assert by_key[None]["n_plain_eq"] == 0
    assert by_key[None]["n_orders"] > 0
    for k, r in by_key.items():
        if k is not None:
            assert r["n_plain_eq"] == r["n_orders"], k
    n_orders = read_table(spark, SF_SMALL, "orders").count()
    assert sum(r["n_orders"] for r in rows) == n_orders


def test_word_pmi_pairs_bounded_by_unigrams(spark):
    """Every returned bigram count is bounded by both unigram counts
    (containment), and the PMI ordering is consistent with the
    returned rounded values."""
    from pyspark.sql import functions as F
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    rows = QUERIES["text_word_pmi"](spark, SF_SMALL).collect()
    assert len(rows) == 20
    pmis = [r["pmi"] for r in rows]
    assert pmis == sorted(pmis, reverse=True)
    docs = read_table(spark, SF_SMALL, "documents")
    uni = {r["w"]: r["n"] for r in docs.select(
        F.explode(F.expr(fast_words_expr("text"))).alias("w"))
        .groupBy("w").count().withColumnRenamed("count", "n").collect()}
    for r in rows:
        assert r["n_pair"] >= 5
        assert r["n_pair"] <= uni[r["w1"]]
        assert r["n_pair"] <= uni[r["w2"]]


def test_pq_recall_headroom_after_retrain():
    """r6 raised PQ training to 16 centroids / 2 Lloyd iterations
    (VERDICT r5 #4). Pin the measured effect per corpus: at sf0.01
    recall@10 doubled (200000 -> 400000 ppm, both ANN serving paths);
    at sf0.001 it held at 200000 (that corpus's near-uniform vectors
    don't reward finer books). Floors, not equalities, so a better
    codebook never fails the gate."""
    from oracle_cassandra_migrator_spark.session import build_session

    spark = build_session(app_name="pq-recall-test")
    for name in ("sim_ann_pq_recall", "sim_ann_ivfpq_recall"):
        row = QUERIES[name](spark, SF_SMALL).collect()[0]
        assert row.recall_ppm >= 200000, (name, row)
        row = QUERIES[name](
            spark, "/root/testdata/sf0.01").collect()[0]
        assert row.recall_ppm >= 400000, (name, row)


def test_mmr_matches_python_greedy_reference(spark):
    """Independent check of the MMR selection: recompute the greedy
    loop in plain Python over the collected pool (numpy-free exact
    float arithmetic on the same 6-dp-rounded cosines) and compare
    every pick and score."""
    from oracle_cassandra_migrator_spark.queries.round6 import (
        _MMR_K, _MMR_POOL, sim_mmr_diversified_topk)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    vecs = {r.vec_id: [float(x) for x in r.embedding]
            for r in emb.collect()}
    q = vecs[0]

    import math

    def r6(x):
        # engines round HALF_UP = away from zero (Spark round, and
        # DuckDB agrees on these values — the oracle test proves it);
        # python round() is banker's, so use the floor convention,
        # mirrored for negatives
        s = -1.0 if x < 0 else 1.0
        return s * math.floor(abs(x) * 1e6 + 0.5) / 1e6

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b))
        return r6(num / den)

    rel = {i: cos(v, q) for i, v in vecs.items() if i != 0}
    pool = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_POOL]
    picks, sel = [], []
    for t in range(1, _MMR_K + 1):
        if not sel:
            best = min(pool, key=lambda i: (-rel[i], i))
            picks.append((t, best, rel[best], rel[best]))
        else:
            cand = [i for i in pool if i not in sel]
            scores = {
                i: r6(0.7 * rel[i]
                      - 0.3 * max(cos(vecs[i], vecs[s]) for s in sel))
                for i in cand}
            best = min(cand, key=lambda i: (-scores[i], i))
            picks.append((t, best, rel[best], scores[best]))
        sel.append(best)
    got = [(r.pick_rank, r.vec_id, r.rel, r.mmr)
           for r in sim_mmr_diversified_topk(spark, SF_SMALL).collect()]
    assert got == picks
    # the picks must actually diversify: not simply the top-k by rel
    plain = sorted(rel, key=lambda i: (-rel[i], i))[:_MMR_K]
    assert [p[1] for p in picks] != plain
