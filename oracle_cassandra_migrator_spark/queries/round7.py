"""Round-7 additions: DSIR importance resampling — the
data-selection quadrant (score documents against a target
distribution, resample by weight) the curation catalog was missing.

No reference counterpart (the 450-line reference has no analytics);
extends SURVEY.md §2.12 alongside the dedup / mixture / sampling
families. Oracles replay the full train -> score -> resample chain in
SQL (the bigram-LM pattern): the hashed-unigram histograms, each
floor(ln(...)*1e6+0.5) smoothing term, the integer ratio subtraction,
and the Gumbel-key arithmetic are all reproduced CTE-for-CTE, so the
driver hash certifies the whole pipeline, not just the final shape.
"""

from __future__ import annotations

from oracle_cassandra_migrator_spark.operators import importance
from oracle_cassandra_migrator_spark.queries.extensions import (
    NORM_SQL)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

B = importance.DSIR_BUCKETS
MOD = importance.DSIR_SAMPLE_MOD

_DSIR_BUCKET_SQL = "('0x' || substring(md5(w), 1, 15))::BIGINT % " + str(B)

# train + score, shared by both queries. The absolute sample cap is
# deliberately absent here: at every driver SF the bottom-k cap does
# not bind (sample << 100k docs), so the bare % MOD sample trains the
# bit-identical model — same reasoning as the bigram-LM oracle.
_DSIR_SCORED_SQL = f"""
    norm AS (SELECT doc_id, lang,
                    string_split({NORM_SQL}, ' ') AS ws
             FROM documents),
    sample_w AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS is_t,
                        unnest(ws) AS w
                 FROM norm WHERE doc_id % {MOD} = 0),
    hist AS (SELECT {_DSIR_BUCKET_SQL} AS b,
                    CAST(SUM(is_t) AS BIGINT) AS ct,
                    CAST(COUNT(*) AS BIGINT) AS cs
             FROM sample_w GROUP BY 1),
    tot AS (SELECT CAST(SUM(ct) AS DOUBLE) AS tt,
                   CAST(SUM(cs) AS DOUBLE) AS ts FROM hist),
    dense AS (SELECT g.b,
                CAST(floor(ln((COALESCE(h.ct, 0) + 0.5) / (t.tt + {B / 2}))
                     * 1e6 + 0.5) AS BIGINT)
              - CAST(floor(ln((COALESCE(h.cs, 0) + 0.5) / (t.ts + {B / 2}))
                     * 1e6 + 0.5) AS BIGINT) AS ratio_micro
              FROM (SELECT unnest(generate_series(0, {B - 1})) AS b) g
              LEFT JOIN hist h USING (b) CROSS JOIN tot t),
    doc_w AS (SELECT doc_id, unnest(ws) AS w FROM norm),
    scored AS (SELECT d.doc_id,
                      CAST(COUNT(*) AS BIGINT) AS n_words,
                      CAST(SUM(x.ratio_micro) AS BIGINT) AS logw_micro
               FROM (SELECT doc_id, {_DSIR_BUCKET_SQL} AS b FROM doc_w) d
               JOIN dense x USING (b)
               GROUP BY d.doc_id)
"""


@query(
    "sample_importance_dsir",
    oracle=f"""
    WITH {_DSIR_SCORED_SQL}
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n_words, logw_micro
    FROM scored
    """,
)
def sample_importance_dsir(spark, sf_dir):
    """Per-document DSIR log importance weight: hashed bag-of-words
    likelihood ratio of the ``lang = 'en'`` target slice vs the whole
    corpus, trained on a bounded sample, scored in one scan against
    the 128-long integer ratio LITERAL (no training DAG in the scoring
    plan, no shuffle beyond the scan). The operator behind
    target-domain data selection at pretraining scale."""
    docs = read_table(spark, sf_dir, "documents")
    ratios = importance.train_dsir_ratios(
        docs, "text", "doc_id", "lang = 'en'")
    return importance.dsir_logweight(docs, ratios, "text", "doc_id")


@query(
    "sample_importance_dsir_topk",
    oracle=f"""
    WITH {_DSIR_SCORED_SQL},
    keyed AS (SELECT doc_id, n_words, logw_micro,
                     logw_micro + CAST(floor(-ln(-ln(
                         ((('0x' || substring(md5('dsir:' ||
                             CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT)
                          + 0.5) / {importance.HASH_DENOM!r}))
                         * 1e6 + 0.5) AS BIGINT) AS sample_key
              FROM scored)
    SELECT CAST(doc_id AS BIGINT) AS doc_id, n_words, logw_micro,
           sample_key
    FROM keyed
    ORDER BY sample_key DESC, doc_id
    LIMIT 100
    """,
)
def sample_importance_dsir_topk(spark, sf_dir):
    """DSIR's resampling step: Gumbel-top-k over the importance
    weights — a deterministic weighted sample WITHOUT replacement
    whose inclusion probabilities follow the weights (Gumbel-max
    trick; same engine-exact integer-micro keys as the A-ES
    reservoir). Plans as TakeOrderedAndProject: per-task top-k heaps,
    one |tasks| x k merge, never a corpus sort."""
    docs = read_table(spark, sf_dir, "documents")
    ratios = importance.train_dsir_ratios(
        docs, "text", "doc_id", "lang = 'en'")
    scored = importance.dsir_logweight(docs, ratios, "text", "doc_id")
    return importance.dsir_resample_topk(scored, 100, "doc_id")
