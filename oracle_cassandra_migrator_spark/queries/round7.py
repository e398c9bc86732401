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


# ---------------------------------------------------------------------------
# eval_cohens_kappa_lang_guess — annotation agreement as a catalog query
# ---------------------------------------------------------------------------

def _guess_sql() -> str:
    """The text_lang_guess oracle's CASE, reused verbatim so the two
    raters are the labeled lang and the same heuristic both engines
    already agree on."""
    from oracle_cassandra_migrator_spark.queries.extensions import (
        _lang_count_sql)

    profiles = {
        "en": ["the", "and", "of", "to", "is"],
        "de": ["der", "die", "und", "ist", "das"],
        "es": ["el", "la", "que", "de", "es"],
        "fr": ["le", "la", "et", "est", "les"],
    }
    counts = {k: _lang_count_sql(v) for k, v in profiles.items()}
    g = "greatest(" + ", ".join(counts.values()) + ")"
    whens = " ".join(
        f"WHEN {c} = {g} THEN '{lang}'" for lang, c in counts.items())
    return f"CASE WHEN {g} = 0 THEN 'und' {whens} ELSE 'und' END"


@query(
    "eval_cohens_kappa_lang_guess",
    oracle=f"""
    WITH pairs AS (SELECT lang AS ra, {_guess_sql()} AS rb FROM documents),
    cells AS (SELECT ra, rb, CAST(count(*) AS BIGINT) AS n
              FROM pairs GROUP BY 1, 2),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                   CAST(SUM(CASE WHEN ra = rb THEN n ELSE 0 END)
                        AS BIGINT) AS agree
            FROM cells),
    r AS (SELECT ra AS cat, SUM(n) AS rn FROM cells GROUP BY 1),
    c AS (SELECT rb AS cat, SUM(n) AS cn FROM cells GROUP BY 1),
    pen AS (SELECT CAST(SUM(COALESCE(r.rn, 0) * COALESCE(c.cn, 0))
                        AS BIGINT) AS pe_num
            FROM r FULL JOIN c USING (cat))
    SELECT t.n_total, t.agree,
           CAST(floor(CAST(t.agree AS DOUBLE) * 1e6 / t.n_total + 0.5)
                AS BIGINT) AS po_ppm,
           CAST(floor(CAST(p.pe_num AS DOUBLE) * 1e6
                / (CAST(t.n_total AS DOUBLE) * t.n_total) + 0.5)
                AS BIGINT) AS pe_ppm,
           CASE WHEN CAST(t.n_total AS DECIMAL(38,0)) * t.n_total
                     = p.pe_num THEN NULL
                ELSE CAST(floor(
                    CAST(t.agree * CAST(t.n_total AS DECIMAL(38,0))
                         - p.pe_num AS DOUBLE) * 1e6
                    / CAST(CAST(t.n_total AS DECIMAL(38,0)) * t.n_total
                           - p.pe_num AS DOUBLE) + 0.5) AS BIGINT) END
             AS kappa_ppm
    FROM tot t CROSS JOIN pen p
    """,
)
def eval_cohens_kappa_lang_guess(spark, sf_dir):
    """Cohen's kappa between the labeled language and the stopword
    heuristic — chance-corrected agreement, the annotation-audit twin
    of text_lang_confusion (raw accuracy flatters any rater that just
    predicts the majority class; kappa subtracts the marginal-implied
    chance agreement). Corpus collapses to the |langs|x|langs|
    contingency aggregate; marginals and the pe term are joins over
    that tiny frame; every numerator stays integer (DECIMAL(38,0) for
    the n^2-scaled terms, overflow-safe at any corpus size) with the
    one final ppm division floating. Degenerate pe = 1 surfaces NULL
    rather than raising (catalog queries treat it as data)."""
    from pyspark.sql import functions as F

    from oracle_cassandra_migrator_spark.operators.text import (
        lang_guess_expr)

    docs = read_table(spark, sf_dir, "documents")
    cells = (docs.selectExpr(
        "lang AS ra", f"{lang_guess_expr('text')} AS rb")
        .groupBy("ra", "rb")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")))
    tot = cells.agg(
        F.expr("CAST(SUM(n) AS BIGINT)").alias("n_total"),
        F.expr("CAST(SUM(CASE WHEN ra = rb THEN n ELSE 0 END) AS BIGINT)")
        .alias("agree"))
    r = cells.groupBy(F.col("ra").alias("cat")).agg(
        F.expr("SUM(n)").alias("rn"))
    c = cells.groupBy(F.col("rb").alias("cat")).agg(
        F.expr("SUM(n)").alias("cn"))
    pen = (r.join(c, "cat", "full")
           .agg(F.expr("CAST(SUM(COALESCE(rn, 0) * COALESCE(cn, 0))"
                       " AS BIGINT)").alias("pe_num")))
    return tot.crossJoin(pen).selectExpr(
        "n_total", "agree",
        "CAST(floor(CAST(agree AS DOUBLE) * 1e6 / n_total + 0.5)"
        " AS BIGINT) AS po_ppm",
        "CAST(floor(CAST(pe_num AS DOUBLE) * 1e6"
        " / (CAST(n_total AS DOUBLE) * n_total) + 0.5)"
        " AS BIGINT) AS pe_ppm",
        "CASE WHEN CAST(n_total AS DECIMAL(38,0)) * n_total = pe_num"
        " THEN NULL ELSE CAST(floor("
        "CAST(agree * CAST(n_total AS DECIMAL(38,0)) - pe_num AS DOUBLE)"
        " * 1e6 / CAST(CAST(n_total AS DECIMAL(38,0)) * n_total - pe_num"
        " AS DOUBLE) + 0.5) AS BIGINT) END AS kappa_ppm",
    )


# ---------------------------------------------------------------------------
# privacy_k_anonymity_audit — quasi-identifier group-size compliance
# ---------------------------------------------------------------------------

K_ANON = 50


@query(
    "privacy_k_anonymity_audit",
    oracle=f"""
    SELECT lang, source, CAST(count(*) AS BIGINT) AS group_size
    FROM documents
    GROUP BY lang, source
    HAVING count(*) < {K_ANON}
    """,
)
def privacy_k_anonymity_audit(spark, sf_dir):
    """k-anonymity audit over the (lang, source) quasi-identifier
    pair: every equivalence class smaller than k=50 — the groups whose
    members a release would expose to re-identification. Training-data
    compliance gate (strip or generalize the flagged groups before
    release). One map-side-combined aggregation + a post-agg filter;
    the output is bounded by |quasi-identifier combinations|, never
    corpus-sized, at any scale."""
    from pyspark.sql import functions as F

    return (read_table(spark, sf_dir, "documents")
            .groupBy("lang", "source")
            .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("group_size"))
            .where(f"group_size < {K_ANON}"))


# ---------------------------------------------------------------------------
# audit_referential_integrity — FK orphan counts across the star schema
# ---------------------------------------------------------------------------

_FKS = [
    ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
    ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation->region", "nation", "n_regionkey", "region", "r_regionkey"),
]


def _ri_arm_sql(rel, child, fk, parent, pk):
    return f"""
    SELECT '{rel}' AS relation,
           CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_orphan_rows,
           CAST(COUNT(*) AS BIGINT) AS n_orphan_keys
    FROM (SELECT {fk} AS k, count(*) AS n FROM {child} GROUP BY 1) c
    WHERE NOT EXISTS (SELECT 1 FROM {parent} p WHERE p.{pk} = c.k)"""


@query(
    "audit_referential_integrity",
    oracle="\n    UNION ALL\n".join(
        _ri_arm_sql(*fk) for fk in _FKS),
)
def audit_referential_integrity(spark, sf_dir):
    """Referential-integrity audit of every FK edge in the star
    schema: orphaned child rows (and distinct orphan keys) per
    relation — the ingest gate that catches a partial load or a key
    remap before any join silently drops rows. Scale shape per edge:
    the child collapses to its |distinct FK| aggregate FIRST
    (map-side partials carry the corpus), the anti join then runs
    keyed-aggregate-vs-parent (dims broadcast; the orders edge
    shuffles |orders| keys, not lineitem rows), and each arm ends in
    a 1-row sum. The 7-arm union is 7 independent small plans."""
    from pyspark.sql import functions as F

    out = None
    for rel, child, fk, parent, pk in _FKS:
        agg = (read_table(spark, sf_dir, child)
               .groupBy(F.col(fk).alias("k"))
               .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n")))
        par = read_table(spark, sf_dir, parent).select(
            F.col(pk).alias("k"))
        arm = (agg.join(par, "k", "left_anti")
               .agg(F.expr("CAST(COALESCE(SUM(n), 0) AS BIGINT)")
                    .alias("n_orphan_rows"),
                    F.expr("CAST(COUNT(*) AS BIGINT)")
                    .alias("n_orphan_keys"))
               .select(F.lit(rel).alias("relation"),
                       "n_orphan_rows", "n_orphan_keys"))
        out = arm if out is None else out.unionAll(arm)
    return out


# ---------------------------------------------------------------------------
# stream_neardedup_admission_batch — the streaming near-dup gate's twin
# ---------------------------------------------------------------------------

def _neardedup_admission_oracle() -> str:
    """Two-batch admission replayed entirely in SQL: full-corpus
    signatures + band keys (the dedup_minhash_lsh CTEs), the
    est >= ceil(t*K) signature-estimate pair set restricted per batch,
    and the three drop rules (intra-batch-0, intra-batch-1, batch-1 vs
    ADMITTED-state) as NOT-IN subqueries. ``max_band_size`` is omitted
    from the replay: both caps (state probe AND, since r8, the
    within-batch self-join) are 1000 per band and cannot bind at any
    driver SF (< 1000 admitted docs total). Zero-shingle docs (< n
    words) are admitted unconditionally (r8, ADVICE r7): their
    sentinel signatures never estimate-match anything, so the replay
    just unions them into each batch's admit set — a no-op at driver
    SFs, where no such doc exists, keeping the r07 green row valid."""
    import math

    from oracle_cassandra_migrator_spark.operators import dedup
    from oracle_cassandra_migrator_spark.queries.extensions import (
        _minhash_cand_cte)
    from oracle_cassandra_migrator_spark.streaming.neardedup import K

    need = math.ceil(0.5 * K - 1e-9)
    matches = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(K))
    # reuse the shared CTE chain up to `bands`; its trailing capped
    # `keep`/`cand` CTEs are unused here (the pair set below is built
    # uncapped, matching admit_batch's within-batch join)
    return f"""
    WITH {_minhash_cand_cte(dedup.LSH_BANDS, dedup.LSH_ROWS, 10 ** 9)},
    szs AS (SELECT doc_id, CAST(len(shingles) AS INT) AS n_sh
            FROM sh),
    pair_est AS (
        SELECT DISTINCT x.doc_id AS ida, y.doc_id AS idb
        FROM bands x
        JOIN bands y ON x.band_idx = y.band_idx
                    AND x.band_key = y.band_key
                    AND x.doc_id < y.doc_id
        JOIN mh a ON a.doc_id = x.doc_id
        JOIN mh b ON b.doc_id = y.doc_id
        WHERE ({matches}) >= {need}),
    drop0 AS (SELECT DISTINCT idb FROM pair_est
              WHERE ida % 2 = 0 AND idb % 2 = 0),
    admit0 AS (SELECT doc_id FROM mh WHERE doc_id % 2 = 0
               AND doc_id NOT IN (SELECT idb FROM drop0)
               UNION ALL
               SELECT doc_id FROM szs
               WHERE n_sh = 0 AND doc_id % 2 = 0),
    drop1 AS (SELECT DISTINCT idb FROM pair_est
              WHERE ida % 2 = 1 AND idb % 2 = 1),
    dropvs AS (SELECT DISTINCT
                   CASE WHEN ida % 2 = 1 THEN ida ELSE idb END AS d
               FROM pair_est
               WHERE (ida % 2 = 0 AND idb % 2 = 1
                      AND ida IN (SELECT doc_id FROM admit0))
                  OR (idb % 2 = 0 AND ida % 2 = 1
                      AND idb IN (SELECT doc_id FROM admit0))),
    admit1 AS (SELECT doc_id FROM mh WHERE doc_id % 2 = 1
               AND doc_id NOT IN (SELECT idb FROM drop1)
               AND doc_id NOT IN (SELECT d FROM dropvs)
               UNION ALL
               SELECT doc_id FROM szs
               WHERE n_sh = 0 AND doc_id % 2 = 1)
    SELECT CAST(a.doc_id AS BIGINT) AS doc_id,
           CAST(0 AS INT) AS batch, s.n_sh
    FROM admit0 a JOIN szs s ON s.doc_id = a.doc_id
    UNION ALL
    SELECT CAST(a.doc_id AS BIGINT), CAST(1 AS INT), s.n_sh
    FROM admit1 a JOIN szs s ON s.doc_id = a.doc_id
    """


@query("stream_neardedup_admission_batch",
       oracle=_neardedup_admission_oracle())
def stream_neardedup_admission_batch(spark, sf_dir):
    """The streaming NEAR-dup gate's batch twin (exact-dedup twin:
    ``stream_dedup_admission_batch``): the corpus splits into two
    arrival batches (doc_id parity), batch 0 admits min-id-wins under
    the MinHash signature estimate, batch 1 is additionally screened
    against batch 0's ADMITTED state — precisely
    ``streaming.neardedup.admit_batch`` composed twice, which is also
    what ``foreach_batch_near_dedup`` executes per micro-batch
    (stream==this pinned in tests/test_neardedup_stream.py). The
    driver row therefore hash-certifies the admission semantics the
    stream runs, while the stream itself stays pytest-only."""
    from oracle_cassandra_migrator_spark.streaming import neardedup

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    lo = docs.where("doc_id % 2 = 0")
    hi = docs.where("doc_id % 2 = 1")
    s1, _ = neardedup.admit_batch(lo, None, None, "text", "doc_id")
    # materialize the batch-0 ADMITTED state exactly as the stream
    # holds it (foreach_batch_near_dedup persists state as parquet
    # between micro-batches): batch 1's probe consumes it several
    # times — the exact-id semi+anti (r10) plus both signature joins —
    # and without materialization each reference would replay the
    # whole batch-0 admission DAG inside one plan (the r10 lockfile
    # blowup). localCheckpoint, NOT cache: a cache() here is never
    # unpersisted and pins batch-0 state in the session's CacheManager
    # for its lifetime across repeated catalog invocations (review
    # r10); a localCheckpoint block is reclaimed by the ContextCleaner
    # once the result frame is dropped. Bands derive FROM the
    # checkpointed sigs (admit_batch's own discipline), so they are a
    # cheap projection, not a second materialization.
    s1 = s1.localCheckpoint(eager=True)
    b1 = neardedup.band_rows(s1, "doc_id")
    s2, _ = neardedup.admit_batch(hi, s1, b1, "text", "doc_id")
    return (
        s1.selectExpr("CAST(doc_id AS BIGINT) AS doc_id",
                      "CAST(0 AS INT) AS batch",
                      "CAST(n_sh AS INT) AS n_sh")
        .unionAll(
            s2.selectExpr("CAST(doc_id AS BIGINT) AS doc_id",
                          "CAST(1 AS INT) AS batch",
                          "CAST(n_sh AS INT) AS n_sh"))
    )


# ---------------------------------------------------------------------------
# embedding_covariance_matrix — exact second-moment matrix at scale
# ---------------------------------------------------------------------------

EMB_DIM = 64
_QX_SPARK = ("transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE)"
             " AS DECIMAL(27,6)) * 1000000 AS BIGINT))")
_QX_SQL = ("list_transform(embedding, x -> CAST(CAST(CAST(x AS DOUBLE)"
           " AS DECIMAL(27,6)) * 1000000 AS BIGINT))")


@query(
    "embedding_covariance_matrix",
    oracle=f"""
    WITH q AS (SELECT {_QX_SQL} AS qx
               FROM embeddings),
    cells AS (SELECT i.i, j.j,
                     CAST(count(*) AS BIGINT) AS n,
                     SUM(CAST(qx[i.i] AS HUGEINT) * qx[j.j]) AS sxy,
                     SUM(CAST(qx[i.i] AS HUGEINT)) AS sx,
                     SUM(CAST(qx[j.j] AS HUGEINT)) AS sy,
                     SUM(CAST(qx[i.i] AS HUGEINT) * qx[i.i]) AS sxx,
                     SUM(CAST(qx[j.j] AS HUGEINT) * qx[j.j]) AS syy
              FROM q
              CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM}))
                          AS i) i
              CROSS JOIN (SELECT unnest(generate_series(1, {EMB_DIM}))
                          AS j) j
              WHERE j.j >= i.i
              GROUP BY 1, 2),
    d AS (SELECT i, j, n,
                 n * sxy - sx * sy AS cov_num,
                 n * sxx - sx * sx AS var_i_num,
                 n * syy - sy * sy AS var_j_num
          FROM cells)
    SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n,
           CAST(floor(CAST(cov_num AS DOUBLE)
                / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT)
             AS cov_micro2,
           CASE WHEN var_i_num <= 0 OR var_j_num <= 0 THEN NULL
                ELSE CAST(floor(CAST(cov_num AS DOUBLE)
                     / sqrt(CAST(var_i_num AS DOUBLE)
                            * CAST(var_j_num AS DOUBLE)) * 1e6 + 0.5)
                     AS BIGINT) END AS corr_ppm
    FROM d
    """,
)
def embedding_covariance_matrix(spark, sf_dir):
    """Exact upper-triangular covariance + correlation matrix of the
    embedding columns — the second-moment primitive behind whitening,
    PCA reduction, and redundant-dimension audits of an embedding
    store. Components quantize to micro ints via the repo's
    DECIMAL(27,6) convention; per-cell (n, Σxy, Σx, Σy, Σx², Σy²)
    accumulate as exact DECIMAL(38,0)/HUGEINT integers, so
    cov_num = n·Σxy − Σx·Σy is exact at any corpus size and only the
    two final divisions float (cov in micro², correlation in ppm;
    zero-variance dims surface NULL correlation).

    Scale shape: each row expands JVM-side to its dim·(dim+1)/2
    (i, j, products) structs and the aggregation map-side-combines, so
    the shuffle carries |cells| = {EMB_DIM}·{EMB_DIM + 1}/2 rows per
    partition — never the corpus. The collected matrix is
    codebook-sized: the natural input to a driver-side eigensolver
    whose components re-enter downstream plans as literals (the
    codebook convention)."""
    from pyspark.sql import functions as F

    emb = read_table(spark, sf_dir, "embeddings")
    pairs = (
        f"flatten(transform(sequence(1, {EMB_DIM}), i -> "
        f"transform(sequence(i, {EMB_DIM}), j -> "
        f"struct(i AS i, j AS j, "
        f"element_at(qx, i) AS xi, element_at(qx, j) AS xj))))"
    )
    dec = "CAST({0} AS DECIMAL(38,0))"
    return (
        emb.selectExpr(f"{_QX_SPARK} AS qx")
        .selectExpr(f"explode({pairs}) AS p")
        .selectExpr("p.i AS i", "p.j AS j", "p.xi AS xi", "p.xj AS xj")
        .groupBy("i", "j")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n"),
             F.expr(f"SUM({dec.format('xi')} * xj)").alias("sxy"),
             F.expr(f"SUM({dec.format('xi')})").alias("sx"),
             F.expr(f"SUM({dec.format('xj')})").alias("sy"),
             F.expr(f"SUM({dec.format('xi')} * xi)").alias("sxx"),
             F.expr(f"SUM({dec.format('xj')} * xj)").alias("syy"))
        .selectExpr(
            "CAST(i AS INT) AS i", "CAST(j AS INT) AS j", "n",
            "n * sxy - sx * sy AS cov_num",
            "n * sxx - sx * sx AS var_i_num",
            "n * syy - sy * sy AS var_j_num")
        .selectExpr(
            "i", "j", "n",
            "CAST(floor(CAST(cov_num AS DOUBLE)"
            " / (CAST(n AS DOUBLE) * n) + 0.5) AS BIGINT) AS cov_micro2",
            "CASE WHEN var_i_num <= 0 OR var_j_num <= 0 THEN NULL"
            " ELSE CAST(floor(CAST(cov_num AS DOUBLE)"
            " / sqrt(CAST(var_i_num AS DOUBLE) * CAST(var_j_num AS DOUBLE))"
            " * 1e6 + 0.5) AS BIGINT) END AS corr_ppm")
    )
