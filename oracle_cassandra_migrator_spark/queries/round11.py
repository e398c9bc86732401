"""Round-11 additions: the sampling/mixing stage of a curation
pipeline as declarative compiler steps (VERDICT r10 item 5), certified
end-to-end through the driver gate by one chained spec — near-dedup
filter -> quality gate -> temperature rebalancing -> fixed-n eval cut.

No reference counterpart (the 450-line reference has no sampling);
extends SURVEY.md §2.12.
"""

from __future__ import annotations

from oracle_cassandra_migrator_spark.operators.sampling import (
    hash_bucket_sql,
)
from oracle_cassandra_migrator_spark.queries.extensions import (
    _minhash_prune_oracle,
)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# ---------------------------------------------------------------------------
# pipeline_sample_stage — dedup_near -> quality filter -> sample steps
# ---------------------------------------------------------------------------

_DENOM = 1_000_000


def _sample_stage_oracle() -> str:
    """DuckDB replay of the full chained spec: the keep side of the
    minhash decisions relation, the n_chars quality gate, temperature
    thresholds computed ON THE GATED SET (the step sees its input, not
    the raw corpus), then the per-lang bottom-15 by salted hash."""
    bucket = hash_bucket_sql("b.doc_id", _DENOM)
    return f"""
    WITH pr AS ({_minhash_prune_oracle()}),
    base AS (
      SELECT d.doc_id, d.lang FROM documents d
      JOIN pr ON d.doc_id = pr.doc_id
      WHERE pr.is_kept AND d.n_chars >= 120),
    c AS (SELECT lang, count(*) AS n_docs FROM base GROUP BY 1),
    m AS (SELECT min(n_docs) AS n_min FROM c),
    thr AS (SELECT lang,
                   CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs)
                        * {_DENOM}) AS BIGINT) AS threshold_ppm
            FROM c, m),
    temp AS (SELECT b.doc_id, b.lang FROM base b
             JOIN thr ON b.lang = thr.lang
             WHERE ({bucket}) < thr.threshold_ppm),
    r AS (SELECT doc_id, lang,
                 row_number() OVER (
                   PARTITION BY lang
                   ORDER BY md5(concat('sample:',
                                       CAST(doc_id AS VARCHAR))),
                            doc_id) AS rnk
          FROM temp)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang
    FROM r WHERE rnk <= 15
    """


@query("pipeline_sample_stage", oracle=_sample_stage_oracle())
def pipeline_sample_stage(spark, sf_dir):
    """A curation pipeline whose sample/mix stage stays INSIDE the
    spec DSL (VERDICT r10 item 5): ``dedup_near`` (mode=filter) ->
    quality gate -> ``sample_temperature`` (T=2 language rebalancing
    over the gated survivors) -> ``sample_fixed_n`` (per-lang eval
    cut). Every sampling step is a deterministic md5-hash filter —
    same survivors at any parallelism, thresholds from a tiny
    broadcast per-stratum aggregate, zero corpus shuffle — so the
    oracle replays the whole chain exactly. Step-vs-operator equality
    is pinned per step in tests/test_compiler.py; the phased-pipeline
    wiring over examples/sampling_curation_pipeline.json in
    tests/test_pipeline.py."""
    from oracle_cassandra_migrator_spark.plans.compiler import (
        compile_transform)

    docs = read_table(spark, sf_dir, "documents")
    out = compile_transform(spark, {"documents": docs}, [
        {"op": "dedup_near", "input": "documents", "text": "text",
         "id": "doc_id", "threshold": 0.5, "n": 3, "mode": "filter"},
        {"op": "filter", "expr": "n_chars >= 120"},
        {"op": "sample_temperature", "id": "doc_id", "stratum": "lang"},
        {"op": "sample_fixed_n", "id": "doc_id", "k": 15, "by": "lang"},
    ])
    return out.select("doc_id", "lang")
