"""Round-9 additions: the dedup strategy router as catalog surface
(VERDICT r8 item 1 — SCALE.md's measured routing rule became engine
behavior in ``operators/dedup.allpairs_jaccard_pairs``), plus the
config-selectable bucketed layout demo.

No reference counterpart (the 450-line reference has no dedup);
extends SURVEY.md §2.12.
"""

from __future__ import annotations

from oracle_cassandra_migrator_spark.queries.extensions import (
    _JACCARD_SQL,
    _SHINGLE_CTE,
)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# ---------------------------------------------------------------------------
# dedup_jaccard_auto_routed — the strategy guard's routed arm
# ---------------------------------------------------------------------------


@query(
    "dedup_jaccard_auto_routed",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard
    FROM ({_JACCARD_SQL}) WHERE jaccard_raw >= 0.5
    """,
)
def dedup_jaccard_auto_routed(spark, sf_dir):
    """Exact Jaccard pairs through the STRATEGY ROUTER at a moderate
    threshold: ``allpairs_jaccard_pairs(threshold=0.5)`` with the
    default ``strategy="auto"`` and the measured 0.8 routing bar, so
    the engine plans the inverted-index join rather than the
    pair-density-bound prefix-filter candidate pipeline (SCALE.md r8:
    463 s / ~45 GB spill vs ~30 s at the 100x probe, same output —
    both arms are exact). The oracle is the plain exact-Jaccard
    relation, which is precisely the router's contract: routing
    changes the physical plan, never the result (the twin-equality is
    also pinned in pytest on random corpora)."""
    from oracle_cassandra_migrator_spark.operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    return dedup.allpairs_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5)
