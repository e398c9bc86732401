"""Round-12 additions: the multimodal decode stage of a curation
pipeline as a declarative compiler step (VERDICT r11 item 3),
certified end-to-end through the driver gate by one chained spec —
decode + quarantine + resize geometry -> media quality gate ->
near-dedup filter -> per-format eval cut.

No reference counterpart (the 450-line reference moves relational
rows only); extends SURVEY.md §2.12.
"""

from __future__ import annotations

from oracle_cassandra_migrator_spark.queries.extensions import (
    _MM_DECODED_SQL,
    _minhash_prune_oracle,
)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# ---------------------------------------------------------------------------
# pipeline_media_stage — decode_media -> filter -> dedup_near -> sample
# ---------------------------------------------------------------------------

# Audio containers (wav, flac, ogg, mp3) carry no canvas — they gate
# on duration; everything else gates on decoded dimensions.
_MEDIA_GATE_SQL = (
    "(mm_format IN ('wav', 'flac', 'ogg', 'mp3') AND duration_ms >= 10)"
    " OR "
    "(mm_format NOT IN ('wav', 'flac', 'ogg', 'mp3') "
    "AND width >= 3 AND height >= 3)")


def _gated_prune_sql() -> str:
    """The minhash prune replay with its corpus retargeted at the
    ``gated_docs`` CTE: the dedup step sees its INPUT (the media-gated
    survivors), not the raw corpus, so the oracle must shingle/band/
    cluster exactly that subset. A DuckDB CTE named ``documents``
    cannot shadow the base view here (the outer gated CTE would be
    inlined into the shadowed scope — circular), so the two
    ``FROM documents`` references (_SHINGLE_CTE's and the decisions
    SELECT's) are retargeted textually; any drift in that shape breaks
    this query's hash match, which the driver gate would surface."""
    sql = _minhash_prune_oracle()
    assert sql.count("FROM documents") == 2, sql
    return sql.replace("FROM documents", "FROM gated_docs")


def _media_stage_oracle() -> str:
    """DuckDB replay of the chained spec: the doc_id-arithmetic decode
    replay (`_MM_DECODED_SQL` — any header-layout bug on the Spark
    side breaks the hash match), the fit-into-box resize geometry, the
    media quality gate, the keep side of the minhash decisions
    relation, then the per-format bottom-10 by salted hash."""
    return f"""
    WITH dec AS ({_MM_DECODED_SQL}),
    geo AS (
      SELECT doc_id, mm_format, width, height, duration_ms,
             CASE WHEN width IS NULL OR height IS NULL THEN NULL
                  ELSE CAST(width * 224 // greatest(width, height, 1)
                       AS INT) END AS resized_w,
             CASE WHEN width IS NULL OR height IS NULL THEN NULL
                  ELSE CAST(height * 224 // greatest(width, height, 1)
                       AS INT) END AS resized_h
      FROM dec),
    gate AS (SELECT * FROM geo WHERE {_MEDIA_GATE_SQL}),
    gated_docs AS (SELECT d.* FROM documents d
                   JOIN gate g ON d.doc_id = g.doc_id),
    pr AS (SELECT * FROM ({_gated_prune_sql()}) q),
    keep AS (SELECT g.* FROM gate g
             JOIN pr ON g.doc_id = pr.doc_id WHERE pr.is_kept),
    r AS (SELECT *,
                 row_number() OVER (
                   PARTITION BY mm_format
                   ORDER BY md5(concat('sample:',
                                       CAST(doc_id AS VARCHAR))),
                            doc_id) AS rnk
          FROM keep)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, mm_format,
           width, height, resized_w, resized_h
    FROM r WHERE rnk <= 10
    """


@query("pipeline_media_stage", oracle=_media_stage_oracle())
def pipeline_media_stage(spark, sf_dir):
    """A multimodal curation pipeline that never exits the spec DSL
    (VERDICT r11 item 3): ``decode_media`` (real header parse +
    quarantine drop + 224-box resize geometry, the carried ``text``
    column riding the same Arrow batch) -> media quality gate ->
    ``dedup_near`` (mode=filter, over the carried text) ->
    ``sample_fixed_n`` (per-format eval cut). Step-vs-operator
    equality for decode_media is pinned in tests/test_compiler.py; the
    phased-pipeline wiring over examples/media_curation_pipeline.json
    in tests/test_pipeline.py."""
    from oracle_cassandra_migrator_spark.operators.multimodal import (
        synthesized_payloads)
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    docs = read_table(spark, sf_dir, "documents")
    media = synthesized_payloads(docs, extra_cols=("text",))
    out = compile_transform(spark, {"media_docs": media}, [
        {"op": "decode_media", "input": "media_docs",
         "quarantine": "drop", "resize_box": 224},
        {"op": "filter", "expr": _MEDIA_GATE_SQL},
        {"op": "dedup_near", "text": "text", "id": "doc_id",
         "threshold": 0.5, "n": 3, "mode": "filter"},
        {"op": "sample_fixed_n", "id": "doc_id", "k": 10,
         "by": "mm_format"},
    ])
    return out.select("doc_id", "mm_format", "width", "height",
                      "resized_w", "resized_h")

# ---------------------------------------------------------------------------
# pipeline_embed_stage — embed_neardup -> sample_fixed_n, never exiting the
# spec DSL (the embedding-family twin of pipeline_media_stage)
# ---------------------------------------------------------------------------


def _embed_stage_oracle(dim: int = 64, n_planes: int = 3,
                        threshold: float = 0.4, k: int = 25) -> str:
    """DuckDB replay of the chained spec: the deterministic md5-parity
    sign-LSH pairs (the dedup_embedding_lsh_blocked oracle
    parameterized at this step's knobs), hash-to-min reachability to
    the kept representatives, then the bottom-k-of-salted-hash eval
    cut and the rounded L2 norm."""
    from oracle_cassandra_migrator_spark.queries.extensions import (
        _cosine_lsh_blocked_oracle)

    return f"""
    WITH RECURSIVE
    p AS (SELECT * FROM ({_cosine_lsh_blocked_oracle(
        dim, n_planes, threshold)}) q),
    edges AS (SELECT id_a AS a, id_b AS b FROM p
              UNION ALL SELECT id_b, id_a FROM p),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a),
    keep AS (SELECT e.vec_id, e.embedding
             FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
             WHERE coalesce(c.component, e.vec_id) = e.vec_id),
    r AS (SELECT *,
                 row_number() OVER (
                   ORDER BY md5(concat('eval:',
                                       CAST(vec_id AS VARCHAR))),
                            vec_id) AS rnk
          FROM keep)
    SELECT CAST(vec_id AS BIGINT) AS vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[],
                                       embedding::DOUBLE[])), 6)
             AS l2_norm
    FROM r WHERE rnk <= {k}
    """


@query("pipeline_embed_stage", oracle=_embed_stage_oracle())
def pipeline_embed_stage(spark, sf_dir):
    """An embedding curation pipeline that never exits the spec DSL
    (r12 — the semantic twin of pipeline_media_stage):
    ``embed_neardup`` (sign-LSH blocked cosine pairs -> hash-to-min
    components -> keep-representative filter) -> ``sample_fixed_n``
    (bottom-k-of-salted-hash eval cut) -> a JVM-side L2-norm
    projection. Step-vs-operator equality for embed_neardup is pinned
    in tests/test_compiler.py; the oracle replays hyperplanes,
    reachability, and the salted cut end-to-end.

    Scale shape: one bucket equi-join for pairs (never all-pairs),
    label-only component shuffles, TakeOrderedAndProject for the cut
    — no corpus-sized shuffle anywhere."""
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    emb = read_table(spark, sf_dir, "embeddings")
    out = compile_transform(spark, {"emb": emb}, [
        {"op": "embed_neardup", "input": "emb", "id": "vec_id",
         "vec": "embedding", "threshold": 0.4, "dim": 64,
         "n_planes": 3, "mode": "filter"},
        {"op": "sample_fixed_n", "id": "vec_id", "k": 25,
         "salt": "eval"},
        {"op": "select", "exprs": [
            "CAST(vec_id AS BIGINT) AS vec_id",
            "round(sqrt(aggregate(transform(embedding, "
            "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
            "CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)), 6) "
            "AS l2_norm"]},
    ])
    return out
