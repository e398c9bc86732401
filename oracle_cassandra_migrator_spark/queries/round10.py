"""Round-10 additions: incremental ANN index maintenance as catalog
surface (VERDICT r9 item 4 — ``operators/similarity``'s frozen-codebook
append path), and the declarative ``dedup_near`` pipeline step
(VERDICT r9 item 3) certified end-to-end through the driver gate.

No reference counterpart (the 450-line reference has no ANN or dedup);
extends SURVEY.md §2.12.
"""

from __future__ import annotations

from oracle_cassandra_migrator_spark.queries.extensions import (
    _ivf_trained_oracle,
    _minhash_prune_oracle,
)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# ---------------------------------------------------------------------------
# sim_ann_incremental_topk — frozen-codebook append maintenance
# ---------------------------------------------------------------------------


@query(
    "sim_ann_incremental_topk",
    oracle=_ivf_trained_oracle(sample_mod=2, init_limit=64),
)
def sim_ann_incremental_topk(spark, sf_dir):
    """IVF probe over a MAINTAINED index: the codebook trains on the
    even-id half of the corpus only (the "day 1" index build), the
    odd-id half arrives later and is encoded by
    ``assign_appended_batch`` against the FROZEN driver-collected
    codebook literal — a zero-shuffle per-row projection that never
    touches the already-indexed rows — then the union is probed with
    the factored ``topk_within_cells``. The oracle replays
    train-on-half / assign-everything, which is exactly the
    maintenance invariant: appending against a frozen codebook is
    row-identical to re-assigning the full corpus against it (also
    property-pinned, with the drift-gated retrain arm, in
    tests/test_ann_maintenance.py)."""
    from oracle_cassandra_migrator_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    base = emb.where("vec_id % 2 = 0")
    appended = emb.where("vec_id % 2 = 1")
    cents = similarity.kmeans_codebook(
        base, modulus=43, iters=2, init_limit=64)
    rows = cents.collect()
    base_cells = similarity.assign_cells_literal(
        base, similarity.codebook_literal_expr(rows))
    cells = base_cells.unionByName(
        similarity.assign_appended_batch(appended, rows))
    return similarity.topk_within_cells(cells, k=10, query_id=0)


# ---------------------------------------------------------------------------
# pipeline_dedup_near_filter — the declarative dedup_near step, e2e
# ---------------------------------------------------------------------------


@query(
    "pipeline_dedup_near_filter",
    oracle=f"""
    WITH pr AS ({_minhash_prune_oracle()})
    SELECT d.doc_id, d.lang, d.n_chars
    FROM documents d JOIN pr ON d.doc_id = pr.doc_id
    WHERE pr.is_kept
    """,
)
def pipeline_dedup_near_filter(spark, sf_dir):
    """The flagship curation operation as ONE declarative pipeline
    step, driver-certified end-to-end: ``dedup_near`` (mode=filter)
    compiles MinHash-LSH pairs -> connected components -> keep-min-id
    into the transform DSL and returns the surviving input rows. The
    oracle is the keep-side of the ``dedup_minhash_prune`` decisions
    relation joined back to the documents — so the spec path, the
    operator path, and the recursive-CTE replay must all agree.
    Step-vs-operator equality is additionally pinned in
    tests/test_compiler.py; the phased-pipeline wiring (spec file ->
    sink) in tests/test_pipeline.py over
    examples/neardedup_curation_pipeline.json."""
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    docs = read_table(spark, sf_dir, "documents")
    kept = compile_transform(spark, {"documents": docs}, [
        {"op": "dedup_near", "input": "documents", "text": "text",
         "id": "doc_id", "threshold": 0.5, "n": 3, "mode": "filter"},
    ])
    return kept.select("doc_id", "lang", "n_chars")
