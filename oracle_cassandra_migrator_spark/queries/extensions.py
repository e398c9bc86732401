"""North-star extension queries (SURVEY.md §2.12 + BASELINE.json):
dedup, similarity search, text analysis, multimodal plumbing, and the
event-stream batch analyses. Each Spark implementation lives in
``operators/``; the oracle replicates the exact same deterministic
algorithm (md5-based hashing throughout) in DuckDB SQL.
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.operators import (
    curation,
    dedup,
    multimodal,
    similarity,
)
from oracle_cassandra_migrator_spark.operators.text import (
    lang_guess_expr,
    bigram_logprob_map_expr,
    bigram_logprob_scores,
    bigram_model,
    bottomk_fingerprint_expr,
    feature_vector_expr,
    hashed_words_expr,
    normalize_expr,
    prefix_fingerprint_expr,
    quality_columns,
    token_count_expr,
)
from oracle_cassandra_migrator_spark.queries.registry import query
from oracle_cassandra_migrator_spark.queries.relational import dsum
from oracle_cassandra_migrator_spark.sources.testdata import read_table

# --- shared DuckDB SQL fragments (mirror operators/text.py exactly) ---

NORM_SQL = r"trim(regexp_replace(lower(text), '\s+', ' ', 'g'))"
WORDS_SQL = f"string_split({NORM_SQL}, ' ')"
SHINGLES3_SQL = (
    "list_distinct(list_transform(generate_series(1, greatest(len(w) - 2, 0)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))"
)
# shingle-path words: split+filter (mirrors text.fast_words_expr —
# identical word list to WORDS_SQL, one regex pass instead of two)
FAST_WORDS_SQL = (
    r"list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')"
)
# MATERIALIZED: DuckDB inlines CTEs per reference site, and ``sh`` is
# read 2-3x by every consumer (candidate generation + both sides of
# the verification join) — inlined, the regex word split re-runs per
# reference (measured 6.8s -> 3.8s on the containment oracle alone).
_SHINGLE_CTE = f"""
    norm AS MATERIALIZED (
        SELECT doc_id, {FAST_WORDS_SQL} AS w FROM documents),
    sh AS MATERIALIZED (
        SELECT doc_id, {SHINGLES3_SQL} AS shingles FROM norm)
"""
# Thresholds compare the UNROUNDED ratio (``jaccard_raw``): the
# rounded ``jaccard`` is output-display parity only. Filtering on the
# rounded value would admit pairs with true J in [t - 5e-7, t), which
# the prefix-filtering theorem (dedup_allpairs_prefix) does not
# guarantee as candidates — a latent cross-strategy equality break
# (ADVICE r5).
_JACCARD_RAW_SQL = (
    "CAST(len(list_intersect(x.shingles, y.shingles)) AS DOUBLE)"
    " / (len(x.shingles) + len(y.shingles)"
    " - len(list_intersect(x.shingles, y.shingles)))"
)
_JACCARD_SQL = f"""
    SELECT c.doc_a, c.doc_b,
           round({_JACCARD_RAW_SQL}, 6) AS jaccard,
           {_JACCARD_RAW_SQL} AS jaccard_raw
    FROM cand c
    JOIN sh x ON x.doc_id = c.doc_a
    JOIN sh y ON y.doc_id = c.doc_b
"""


# ---------------------------------------------------------------------------
# Deduplication
# ---------------------------------------------------------------------------

@query(
    "dedup_exact_documents",
    oracle=f"""
    SELECT md5({NORM_SQL}) AS fingerprint,
           CAST(min(doc_id) AS BIGINT) AS representative_id,
           CAST(count(*) AS BIGINT) AS n_copies
    FROM documents
    GROUP BY 1
    """,
)
def dedup_exact_documents(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return dedup.exact_dedup(docs, "text", "doc_id")


@query(
    "dedup_ngram_jaccard",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard
    FROM ({_JACCARD_SQL}) WHERE jaccard_raw >= 0.5
    """,
)
def dedup_ngram_jaccard(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return dedup.ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def _minhash_cand_cte(bands: int, rows: int, max_band_size: int) -> str:
    """Shared WITH body for the MinHash oracles: shingles -> signatures
    -> banded keys -> capped candidate pairs (``cand``)."""
    k = bands * rows
    mins = ",\n           ".join(
        f"{dedup.minhash_term_sql(i)} AS m{i}" for i in range(k))
    band_selects = "\n    UNION ALL ".join(
        f"SELECT doc_id, {b} AS band_idx, "
        f"md5(concat_ws(':', {', '.join(f'm{b * rows + r}' for r in range(rows))}))"
        f" AS band_key FROM mh"
        for b in range(bands)
    )
    return f"""{_SHINGLE_CTE},
    ex AS (SELECT doc_id, unnest(shingles) AS tok FROM sh),
    mh AS (SELECT doc_id,
           {mins}
           FROM ex GROUP BY doc_id),
    bands AS ({band_selects}),
    keep AS (SELECT band_idx, band_key FROM bands
             GROUP BY band_idx, band_key
             HAVING count(*) <= {max_band_size}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM bands a
             JOIN keep k ON a.band_idx = k.band_idx
                        AND a.band_key = k.band_key
             JOIN bands b ON a.band_idx = b.band_idx
                         AND a.band_key = b.band_key
                         AND a.doc_id < b.doc_id)"""


def _minhash_oracle(bands: int = dedup.LSH_BANDS, rows: int = dedup.LSH_ROWS,
                    max_band_size: int = dedup.LSH_MAX_BAND_SIZE) -> str:
    return f"""
    WITH {_minhash_cand_cte(bands, rows, max_band_size)}
    SELECT doc_a, doc_b, jaccard
    FROM ({_JACCARD_SQL}) WHERE jaccard_raw >= 0.5
    """


@query("dedup_minhash_lsh", oracle=_minhash_oracle())
def dedup_minhash_lsh(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return dedup.minhash_lsh_pairs(docs, "text", "doc_id", n=3, threshold=0.5)


def _minhash_audit_oracle(
        bands: int = dedup.LSH_BANDS, rows: int = dedup.LSH_ROWS,
        max_band_size: int = dedup.LSH_MAX_BAND_SIZE) -> str:
    k = bands * rows
    matches = " + ".join(
        f"CASE WHEN a.m{i} = b.m{i} THEN 1 ELSE 0 END" for i in range(k))
    return f"""
    WITH {_minhash_cand_cte(bands, rows, max_band_size)},
    est AS (SELECT c.doc_a, c.doc_b,
                   round(CAST(({matches}) AS DOUBLE) / {k}, 6) AS est_jaccard
            FROM cand c
            JOIN mh a ON a.doc_id = c.doc_a
            JOIN mh b ON b.doc_id = c.doc_b),
    tru AS ({_JACCARD_SQL})
    SELECT e.doc_a, e.doc_b, e.est_jaccard,
           t.jaccard AS true_jaccard,
           round(abs(e.est_jaccard - t.jaccard), 6) AS abs_err
    FROM est e JOIN tru t ON e.doc_a = t.doc_a AND e.doc_b = t.doc_b
    """


def _minhash_prune_oracle(
        bands: int = dedup.LSH_BANDS, rows: int = dedup.LSH_ROWS,
        max_band_size: int = dedup.LSH_MAX_BAND_SIZE) -> str:
    return f"""
    WITH RECURSIVE {_minhash_cand_cte(bands, rows, max_band_size)},
    p AS (SELECT doc_a, doc_b FROM ({_JACCARD_SQL}) WHERE jaccard_raw >= 0.5),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM p
              UNION ALL SELECT doc_b, doc_a FROM p),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster_rep,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_kept
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@query("dedup_minhash_prune", oracle=_minhash_prune_oracle())
def dedup_minhash_prune(spark, sf_dir):
    """MinHash-LSH pairs -> DECISIONS: the banded, capped,
    exact-Jaccard-verified near-dup pairs feed hash-to-min connected
    components, and every document gets (cluster_rep, is_kept) — keep
    the min-id representative per transitive cluster, drop the rest,
    singletons keep themselves. Mirrors dedup_semantic_prune for the
    LEXICAL family, so both dedup tracks now run end-to-end
    (pairs AND keep/drop) — what a crawl-scale curation pipeline
    actually consumes.

    Scale shape: identical to dedup_minhash_lsh up to the pair list
    (band-key shuffles only, no shingle arrays in any exchange), then
    components over the PAIR graph alone (labels, never documents,
    shuffle per round; lineage checkpoint-truncated), then one left
    join back to the corpus on doc_id. The oracle replays banding,
    capping, verification, and a recursive reachability CTE."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.minhash_lsh_pairs(docs, "text", "doc_id",
                                    n=3, threshold=0.5)
    comp = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    return dedup.dedup_decisions(docs, comp, "doc_id")


@query("dedup_minhash_estimate_audit", oracle=_minhash_audit_oracle())
def dedup_minhash_estimate_audit(spark, sf_dir):
    """MinHash estimator audit: for every LSH candidate pair, the
    signature-estimated Jaccard (share of equal minhash components)
    next to the exact shingle Jaccard and the absolute error — the
    tuning check a production dedup runs on (bands, rows). Same banded
    candidate generation as dedup_minhash_lsh plus two narrow
    signature joins (see dedup.minhash_estimate_audit)."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.minhash_estimate_audit(docs, "text", "doc_id", n=3)


def _cluster_histogram_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    prune = ORACLES["dedup_minhash_prune"]
    return f"""
    WITH pr AS (SELECT * FROM ({prune})),
    sizes AS (SELECT cluster_rep, CAST(count(*) AS BIGINT) AS cluster_size
              FROM pr GROUP BY cluster_rep)
    SELECT cluster_size,
           CAST(count(*) AS BIGINT) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_docs
    FROM sizes GROUP BY cluster_size
    """


@query("dedup_cluster_size_histogram", oracle=_cluster_histogram_oracle())
def dedup_cluster_size_histogram(spark, sf_dir):
    """Duplication-rate report: the distribution of near-dup cluster
    sizes from the MinHash decisions table (cluster_size 1 =
    singletons/unique docs). n_docs per row sums to the corpus, so
    (1 - n_clusters_total/corpus) IS the duplicate fraction — the
    one-line answer "how duplicated is this crawl?". Two tiny
    aggregations on top of the decisions table; everything upstream is
    the plan-gated MinHash pipeline."""
    pr = dedup_minhash_prune(spark, sf_dir)
    sizes = pr.groupBy("cluster_rep").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("cluster_size"))
    return sizes.groupBy("cluster_size").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_clusters"),
        F.expr("CAST(cluster_size * count(*) AS BIGINT)").alias("n_docs"))


@query(
    "corpus_trigram_diversity",
    oracle=f"""
    WITH {_SHINGLE_CTE},
    ex AS (SELECT d.lang, t.tok
           FROM sh JOIN documents d USING (doc_id),
                UNNEST(sh.shingles) AS t(tok))
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_trigram_mentions,
           CAST(count(DISTINCT tok) AS BIGINT) AS n_unique_trigrams,
           round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6)
             AS diversity
    FROM ex GROUP BY lang
    """,
)
def corpus_trigram_diversity(spark, sf_dir):
    """Corpus diversity report: per language, how many of the word
    trigrams documents mention are unique corpus-wide (type/token
    ratio over per-doc-distinct shingles). Low diversity = heavy
    cross-document repetition — the aggregate signal that a slice of
    the crawl is boilerplate even when no single pair crosses a dedup
    threshold. One explode + one (lang, distinct tok) aggregation —
    the same expand/partial/final plan Spark gives COUNT(DISTINCT) at
    any scale."""
    docs = read_table(spark, sf_dir, "documents")
    sh = dedup.with_shingles(docs.select("doc_id", "lang", "text"),
                             "text", 3)
    ex = sh.select("lang", F.explode("shingles").alias("tok"))
    return ex.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_trigram_mentions"),
        F.expr("CAST(count(DISTINCT tok) AS BIGINT)")
        .alias("n_unique_trigrams"),
        F.expr("round(CAST(count(DISTINCT tok) AS DOUBLE) / count(*), 6)")
        .alias("diversity"))


# DuckDB replica of operators.dedup.simhash_expr: per-doc 32-bit
# SimHash from distinct-word md5 parities. Shared by the bucket and
# hamming-distance oracles.
_SIMHASH_CTES = """words AS (SELECT doc_id,
           list_distinct(string_split(trim(regexp_replace(lower(text),
               '\\s+', ' ', 'g')), ' ')) AS w
           FROM documents),
    h AS (SELECT doc_id,
          list_transform(w, x ->
              ('0x' || substring(md5(x), 1, 15))::BIGINT) AS hs
          FROM words),
    sh AS (SELECT doc_id,
           list_reduce(list_transform(generate_series(0, 31), i ->
               CASE WHEN len(list_filter(hs, v -> (v // (2**i)::BIGINT) % 2 = 1)) * 2
                         > len(hs)
                    THEN (2**i)::BIGINT ELSE CAST(0 AS BIGINT) END),
               (a, b) -> a + b) AS simhash
           FROM h)"""


@query(
    "dedup_simhash_buckets",
    oracle=f"""
    WITH {_SIMHASH_CTES}
    SELECT simhash,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS representative_id
    FROM sh GROUP BY simhash HAVING count(*) > 1
    """,
)
def dedup_simhash_buckets(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    return dedup.simhash_buckets(docs, "text", "doc_id")


def _simhash_pair_parts(max_distance: int = 2,
                        bits: int = 32) -> tuple[str, str]:
    """(cte_list, pairs_select) shared by the hamming-pairs oracle and
    the prune oracle — composed, never string-spliced, so a reformat
    of one cannot silently break the other at import time."""
    widths = dedup.pigeonhole_widths(bits, max_distance + 1)
    selects, shift = [], 0
    for i, w in enumerate(widths):
        selects.append(
            f"SELECT doc_id, simhash, {i} AS block_idx, "
            f"CAST(simhash // {2 ** shift} % {2 ** w} AS BIGINT) AS block_val"
            f" FROM sh")
        shift += w
    blocks = "\n    UNION ALL ".join(selects)
    ctes = f"""{_SIMHASH_CTES},
    blocks AS ({blocks}),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
                    a.simhash AS sh_a, b.simhash AS sh_b
             FROM blocks a
             JOIN blocks b ON a.block_idx = b.block_idx
                          AND a.block_val = b.block_val
                          AND a.doc_id < b.doc_id)"""
    pairs = f"""SELECT doc_a, doc_b,
           CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming
    FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= {max_distance}"""
    return ctes, pairs


def _simhash_hamming_oracle(max_distance: int = 2, bits: int = 32) -> str:
    ctes, pairs = _simhash_pair_parts(max_distance, bits)
    return f"""
    WITH {ctes}
    {pairs}
    """


@query("dedup_simhash_hamming", oracle=_simhash_hamming_oracle())
def dedup_simhash_hamming(spark, sf_dir):
    """SimHash near-dup pairs within hamming distance 2 via the
    pigeonhole multi-index (d+1 blocks; agreement on any block is the
    candidate condition) — the fuzzy upgrade of the equal-bucket
    variant, still never all-pairs."""
    docs = read_table(spark, sf_dir, "documents")
    return dedup.simhash_hamming_pairs(
        docs, "text", "doc_id", max_distance=2)


@query(
    "dedup_embedding_cosine_baseline",
    oracle="""
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                 / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                 6) AS cosine
    FROM embeddings a
    JOIN embeddings b ON a.vec_id < b.vec_id
    WHERE round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])
                / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))
                   * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))),
                6) >= 0.45
    """,
)
def dedup_embedding_cosine_baseline(spark, sf_dir):
    """Exact all-pairs cosine dedup — O(n^2) by construction, kept as
    the correctness baseline and for small/pre-blocked inputs only.
    The scale path is dedup_embedding_lsh_blocked below: identical
    verification cosine, candidates restricted to sign-LSH buckets."""
    emb = read_table(spark, sf_dir, "embeddings")
    # max_rows=None (ADVICE r9): this catalog entry IS the whitelisted
    # deliberately-quadratic baseline — SCALE.md's recorded 100x probe
    # sweep runs it at 200k embeddings, above the refuse valve that
    # cosine_pairs applies to ad-hoc callers by default.
    return similarity.cosine_pairs(emb, threshold=0.45, max_rows=None)


def _plane_literal_sql(plane_idx: int, dim: int = 64) -> str:
    """The same md5-parity Rademacher hyperplane as
    similarity.hyperplane_expr, precomputed into a SQL array literal."""
    import hashlib

    signs = []
    for j in range(dim):
        h = int(hashlib.md5(f"p{plane_idx}:{j}".encode()).hexdigest()[:15], 16)
        signs.append("1.0" if h % 2 == 0 else "-1.0")
    return "[" + ", ".join(signs) + "]::DOUBLE[]"


def _cosine_lsh_blocked_oracle(dim: int = 64, n_planes: int = 4,
                               threshold: float = 0.45) -> str:
    bits = " || ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_literal_sql(i, dim)})"
        f" >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_planes)
    )
    cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    return f"""
    WITH h AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings)
    SELECT a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
    FROM h a JOIN h b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    WHERE {cos} >= {threshold}
    """


@query("dedup_embedding_lsh_blocked", oracle=_cosine_lsh_blocked_oracle())
def dedup_embedding_lsh_blocked(spark, sf_dir):
    """The scale path for embedding near-dup detection: sign-LSH
    blocking turns the O(n^2) cross join of dedup_embedding_cosine_baseline into
    a per-bucket equi-join; candidates are cosine-verified exactly.
    The md5-derived hyperplanes make bucketing deterministic, so the
    DuckDB oracle replicates the whole scheme bit-for-bit."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.cosine_pairs_lsh_blocked(
        emb, threshold=0.45, dim=64, n_planes=4)


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

@query(
    "sim_topk_bruteforce",
    oracle="""
    SELECT e.vec_id,
           round(list_dot_product(e.embedding::DOUBLE[], q.q::DOUBLE[])
                 / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q::DOUBLE[], q.q::DOUBLE[]))), 6)
             AS cosine
    FROM embeddings e
    CROSS JOIN (SELECT embedding AS q FROM embeddings WHERE vec_id = 0) q
    WHERE e.vec_id <> 0
    ORDER BY cosine DESC, e.vec_id
    LIMIT 10
    """,
)
def sim_topk_bruteforce(spark, sf_dir):
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select(F.col("embedding").alias("q"))
    return similarity.cosine_topk(emb.where("vec_id <> 0"), q, k=10)


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

@query(
    "text_token_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens,
           CAST(length({NORM_SQL}) AS BIGINT) AS n_norm_chars,
           round(CAST(length(replace({NORM_SQL}, ' ', '')) AS DOUBLE)
                 / len({WORDS_SQL}), 6) AS avg_token_len,
           CAST(len(list_distinct({WORDS_SQL})) AS BIGINT) AS n_unique_tokens
    FROM documents
    """,
)
def text_token_stats(spark, sf_dir):
    norm = normalize_expr("text")
    words = f"split({norm}, ' ')"
    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"{token_count_expr('text')} AS n_tokens",
        f"CAST(length({norm}) AS BIGINT) AS n_norm_chars",
        f"round(CAST(length(replace({norm}, ' ', '')) AS DOUBLE)"
        f" / size({words}), 6) AS avg_token_len",
        f"CAST(size(array_distinct({words})) AS BIGINT) AS n_unique_tokens",
    )


@query(
    "text_quality_scores",
    oracle=f"""
    SELECT doc_id,
           CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens,
           round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS alpha_ratio,
           round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                 / length(text), 6) AS digit_ratio,
           round(CAST(len(list_filter({WORDS_SQL}, x -> list_contains(
                     ['the','a','an','of','and','to','in','is','on','for'], x)))
                 AS DOUBLE) / len({WORDS_SQL}), 6) AS stopword_ratio,
           round(0.5 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                        / length(text))
                 + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                          / length(text))
                 + 0.2 * least(CAST(len(list_filter({WORDS_SQL}, x -> list_contains(
                       ['the','a','an','of','and','to','in','is','on','for'], x)))
                       AS DOUBLE) / len({WORDS_SQL}) * 5.0, 1.0), 6) AS quality_score
    FROM documents
    """,
)
def text_quality_scores(spark, sf_dir):
    docs = read_table(spark, sf_dir, "documents")
    cols = quality_columns("text")
    return docs.select(
        "doc_id",
        cols["n_tokens"].alias("n_tokens"),
        cols["alpha_ratio"].alias("alpha_ratio"),
        cols["digit_ratio"].alias("digit_ratio"),
        cols["stopword_ratio"].alias("stopword_ratio"),
        cols["quality_score"].alias("quality_score"),
    )


def _lang_count_sql(stopwords: list[str]) -> str:
    lit = ", ".join(f"'{s}'" for s in stopwords)
    return (
        f"CAST(len(list_filter({WORDS_SQL}, x -> list_contains([{lit}], x)))"
        f" AS BIGINT)"
    )


@query(
    "text_lang_guess",
    oracle=f"""
    SELECT doc_id, lang AS labeled_lang,
           CASE WHEN greatest({_lang_count_sql(['the','and','of','to','is'])},
                              {_lang_count_sql(['der','die','und','ist','das'])},
                              {_lang_count_sql(['el','la','que','de','es'])},
                              {_lang_count_sql(['le','la','et','est','les'])}) = 0
                THEN 'und'
                WHEN {_lang_count_sql(['the','and','of','to','is'])} =
                     greatest({_lang_count_sql(['the','and','of','to','is'])},
                              {_lang_count_sql(['der','die','und','ist','das'])},
                              {_lang_count_sql(['el','la','que','de','es'])},
                              {_lang_count_sql(['le','la','et','est','les'])}) THEN 'en'
                WHEN {_lang_count_sql(['der','die','und','ist','das'])} =
                     greatest({_lang_count_sql(['the','and','of','to','is'])},
                              {_lang_count_sql(['der','die','und','ist','das'])},
                              {_lang_count_sql(['el','la','que','de','es'])},
                              {_lang_count_sql(['le','la','et','est','les'])}) THEN 'de'
                WHEN {_lang_count_sql(['el','la','que','de','es'])} =
                     greatest({_lang_count_sql(['the','and','of','to','is'])},
                              {_lang_count_sql(['der','die','und','ist','das'])},
                              {_lang_count_sql(['el','la','que','de','es'])},
                              {_lang_count_sql(['le','la','et','est','les'])}) THEN 'es'
                WHEN {_lang_count_sql(['le','la','et','est','les'])} =
                     greatest({_lang_count_sql(['the','and','of','to','is'])},
                              {_lang_count_sql(['der','die','und','ist','das'])},
                              {_lang_count_sql(['el','la','que','de','es'])},
                              {_lang_count_sql(['le','la','et','est','les'])}) THEN 'fr'
                ELSE 'und' END AS guessed_lang
    FROM documents
    """,
)
def text_lang_guess(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", "lang AS labeled_lang",
        f"{lang_guess_expr('text')} AS guessed_lang",
    )


@query(
    "text_fingerprint_bottomk",
    oracle=f"""
    SELECT doc_id,
           array_to_string(
               list_sort(list_transform(list_distinct({WORDS_SQL}),
                                        x -> md5(x)))[1:3], '') AS fingerprint
    FROM documents
    """,
)
def text_fingerprint_bottomk(spark, sf_dir):
    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", f"{bottomk_fingerprint_expr('text', 3)} AS fingerprint")


# ---------------------------------------------------------------------------
# Multimodal plumbing
# ---------------------------------------------------------------------------

# doc_id arithmetic mirrored by operators/multimodal.payload_for_doc:
# codec by doc_id % 12, geometry from doc_id — the oracle replays the
# ARITHMETIC while Spark round-trips real container bytes through the
# builders and the header parsers; a header-layout bug (wrong offset,
# wrong endianness, bad row padding) breaks n_bytes or a dimension and
# flips the driver hash. WebP (codec 6, r11) carries its own
# sub-cycle: variant (doc_id // 5) % 3 picks VP8/VP8L/VP8X and alpha
# (doc_id // 12) % 2 sets the VP8L hint / VP8X flag (sub-variant
# selectors derive from the CYCLE INDEX doc_id // 12 — a doc_id % k
# selector for k sharing a factor with 12 is CONSTANT within a codec
# slot, review r12); wk is the filler
# length min(255, ww*wh) the RIFF byte-length formulas depend on
# (odd chunk sizes gain one pad byte — word alignment). MP4 (codec 7,
# r12): mw/mh = the video trak's tkhd canvas, mtracks = trak count
# (maps to the channels slot), mdur over the fixed 600 timescale
# gives duration_ms, and the exact box arithmetic (ftyp 24 + moov
# header 8 + mvhd 108 + 100/trak + mdat 8 + mdat filler) gives
# n_bytes. FLAC (codec 8, r12): fc channels / frate sample rate /
# fsamples total samples live in STREAMINFO's packed 64-bit field,
# fpad is the trailing PADDING block's length — n_bytes is the exact
# magic + two-block arithmetic 46 + fpad. TIFF (codec 9, r12):
# tw/th/tc from the IFD's ImageWidth/ImageLength/SamplesPerPixel
# entries (byte order alternates II/LE and MM/BE on (doc_id // 24) % 2
# — invisible to the oracle, which sees only the decoded values),
# tdata strip bytes after the fixed 98-byte header+IFD. Ogg (codec
# 10, r12): ov = (doc_id // 12) % 2 picks Vorbis (30-byte id header,
# duration on the stream's own rate clock) vs Opus (19-byte OpusHead,
# duration on the FIXED 48 kHz granule clock MINUS the 312-sample
# pre-skip, RFC 7845); oc channels / orate from the identification
# packet, og = the EOS page's granule position;
# n_bytes is the exact two-page arithmetic 86 (vorbis) / 75 (opus).
# MP3 (codec 11, r12): p3c channels (mono/stereo mode bits) / p3rate
# from the MPEG-1 table index / p3f back-to-back 128 kbit/s Layer III
# frames of floor(144 * 128000 / rate) bytes each; 1152 samples per
# frame gives duration_ms = p3f * 1152 * 1000 // p3rate.
_MM_SQL = """
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           doc_id % 12 AS codec,
           1 + doc_id % 19 AS bw, 1 + (doc_id * 7) % 13 AS bh,
           1 + doc_id % 23 AS pw, 1 + (doc_id * 5) % 11 AS ph,
           1 + (doc_id // 12) % 2 AS wc,
           CASE (doc_id // 3) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS wrate,
           1 + doc_id % 500 AS wframes,
           1 + doc_id % 17 AS ngw, 1 + (doc_id * 3) % 7 AS ngh,
           1 + doc_id % 29 AS gw, 1 + (doc_id * 11) % 9 AS gh,
           1 + doc_id % 31 AS jw, 1 + (doc_id * 13) % 15 AS jh,
           1 + 2 * ((doc_id // 12) % 2) AS jc,
           1 + doc_id % 37 AS ww, 1 + (doc_id * 19) % 23 AS wh,
           least(255, (1 + doc_id % 37) * (1 + (doc_id * 19) % 23))
             AS wk,
           (doc_id // 5) % 3 AS wv, (doc_id // 12) % 2 AS walpha,
           1 + doc_id % 43 AS mw, 1 + (doc_id * 29) % 31 AS mh,
           1 + (doc_id // 12) % 3 AS mtracks, 1 + doc_id % 900 AS mdur,
           doc_id % 50 AS mdat,
           1 + (doc_id // 12) % 2 AS fc,
           CASE (doc_id // 7) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS frate,
           1 + doc_id % 2000 AS fsamples,
           doc_id % 64 AS fpad,
           1 + doc_id % 41 AS tw, 1 + (doc_id * 23) % 27 AS th,
           1 + (doc_id // 12) % 4 AS tc, doc_id % 97 AS tdata,
           (doc_id // 12) % 2 AS ov, 1 + (doc_id // 24) % 2 AS oc,
           CASE (doc_id // 11) % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                ELSE 44100 END AS orate,
           1 + doc_id % 3000 AS og,
           1 + (doc_id // 12) % 2 AS p3c,
           CASE (doc_id // 13) % 3 WHEN 0 THEN 44100 WHEN 1 THEN 48000
                ELSE 32000 END AS p3rate,
           1 + doc_id % 40 AS p3f
    FROM documents
"""

_MM_DECODED_SQL = f"""
    WITH g AS ({_MM_SQL})
    SELECT doc_id,
           CAST(CASE codec
                WHEN 0 THEN 54 + ((3 * bw + 3) // 4) * 4 * bh
                WHEN 1 THEN 9 + length(CAST(pw AS VARCHAR))
                         + length(CAST(ph AS VARCHAR)) + 3 * pw * ph
                WHEN 2 THEN 44 + wframes * wc * 2
                WHEN 3 THEN 57 + 3 * ngw * ngh
                WHEN 4 THEN 27 + least(255, gw * gh)
                WHEN 5 THEN 36 + 3 * jc + least(255, jw * jh)
                WHEN 6 THEN CASE wv WHEN 0 THEN 30 + wk + (wk % 2)
                     WHEN 1 THEN 25 + wk + (1 - wk % 2)
                     ELSE 43 + wk + (1 - wk % 2) END
                WHEN 7 THEN 148 + 100 * mtracks + mdat
                WHEN 8 THEN 46 + fpad
                WHEN 9 THEN 98 + tdata
                WHEN 10 THEN CASE ov WHEN 0 THEN 86 ELSE 75 END
                ELSE p3f * (144 * 128000 // p3rate)
                END AS BIGINT) AS n_bytes,
           CASE codec WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
                WHEN 2 THEN 'wav' WHEN 3 THEN 'png'
                WHEN 4 THEN 'gif' WHEN 5 THEN 'jpeg'
                WHEN 6 THEN 'webp' WHEN 7 THEN 'mp4'
                WHEN 8 THEN 'flac' WHEN 9 THEN 'tiff'
                WHEN 10 THEN 'ogg' ELSE 'mp3' END AS mm_format,
           CAST(CASE codec WHEN 0 THEN bw WHEN 1 THEN pw
                WHEN 3 THEN ngw WHEN 4 THEN gw WHEN 5 THEN jw
                WHEN 6 THEN ww WHEN 7 THEN mw WHEN 9 THEN tw
                END AS INT) AS width,
           CAST(CASE codec WHEN 0 THEN bh WHEN 1 THEN ph
                WHEN 3 THEN ngh WHEN 4 THEN gh WHEN 5 THEN jh
                WHEN 6 THEN wh WHEN 7 THEN mh WHEN 9 THEN th
                END AS INT) AS height,
           CAST(CASE codec WHEN 2 THEN wc WHEN 3 THEN 3
                WHEN 5 THEN jc
                WHEN 6 THEN CASE WHEN wv = 0 THEN 3
                            ELSE 3 + walpha END
                WHEN 7 THEN mtracks
                WHEN 8 THEN fc
                WHEN 9 THEN tc WHEN 10 THEN oc
                WHEN 11 THEN p3c
                END AS INT) AS channels,
           CAST(CASE codec WHEN 2 THEN wrate
                WHEN 8 THEN frate WHEN 10 THEN orate
                WHEN 11 THEN p3rate
                END AS INT) AS sample_rate,
           CAST(CASE codec WHEN 2 THEN wframes * 1000 // wrate
                WHEN 7 THEN mdur * 1000 // 600
                WHEN 8 THEN fsamples * 1000 // frate
                WHEN 10 THEN CASE ov WHEN 0 THEN og * 1000 // orate
                             ELSE greatest(og - 312, 0) * 1000 // 48000 END
                WHEN 11 THEN p3f * 1152 * 1000 // p3rate
                END AS BIGINT) AS duration_ms
    FROM g
"""


@query("multimodal_decode_stats", oracle=_MM_DECODED_SQL)
def multimodal_decode_stats(spark, sf_dir):
    """Real container decode over Arrow-batched binary payloads: one
    BMP / P6-PPM / RIFF-WAV / PNG / GIF / JPEG / WebP / MP4 / FLAC /
    TIFF / Ogg / MP3 file per document (codec cycles doc_id % 12, built by
    ``payload_for_doc``), headers parsed byte-for-byte by
    ``decode_header`` — width/height for images (plus color-type
    channels for PNG, frame components for JPEG, VP8/VP8L/VP8X canvas
    dims for WebP, the endian-aware IFD entry walk for TIFF),
    channels/sample-rate/duration for audio (WAV's RIFF fmt chunk;
    FLAC's packed STREAMINFO bit fields; Ogg's BOS identification
    packet — Vorbis or OpusHead — plus the EOS page's granule position
    on the codec clock; MP3's Layer III frame walk against the real
    bitrate/rate tables), and the ISO-BMFF box-tree walk (ftyp -> moov
    -> mvhd/trak/tkhd) to canvas dims, track count, and duration for
    MP4 — all from the actual bytes (PNG's IHDR CRC-32 is verified;
    JPEG's marker segments are walked to SOF0/SOF2). The oracle
    replays the generator arithmetic, so the match certifies the full
    encode -> parse round trip."""
    docs = read_table(spark, sf_dir, "documents")
    return multimodal.decode_binary_metadata(
        multimodal.synthesized_payloads(docs))


# ---------------------------------------------------------------------------
# Event-stream batch analyses (streaming equivalents live in streaming/)
# ---------------------------------------------------------------------------

@query(
    "events_sessionize",
    oracle="""
    WITH g AS (
      SELECT user_id, ts, event_id,
             CASE WHEN date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) IS NULL
                   OR date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) > 1800000000
                  THEN 1 ELSE 0 END AS new_session
      FROM events),
    s AS (
      SELECT user_id, ts, event_id,
             CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS session_num
      FROM g)
    SELECT user_id, session_num,
           CAST(count(*) AS BIGINT) AS n_events,
           date_diff('microsecond', min(ts), max(ts)) AS duration_us
    FROM s GROUP BY user_id, session_num
    """,
)
def events_sessionize(spark, sf_dir):
    """Gaps-and-islands sessionization (30 min inactivity gap): one
    window pass per user partition, then one aggregation — the batch
    analog of streaming session windows."""
    return run_sessionize(read_table(spark, sf_dir, "events"))


def run_sessionize(events):
    """Sessionize body over a caller-supplied events frame — the seam
    for the user_id-bucketed layout (sources/bucketed.py): a bucketed
    scan satisfies the window's ClusteredDistribution(user_id), so the
    plan keeps the per-user sort but drops the corpus Exchange
    (plan-pinned in tests/test_bucketed_headliners.py)."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wsum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        events
        .withColumn("gap_us",
                    F.expr("TIMESTAMPDIFF(MICROSECOND, lag(ts) OVER "
                           "(PARTITION BY user_id ORDER BY ts, event_id), ts)"))
        .withColumn("new_session",
                    F.expr("CASE WHEN gap_us IS NULL OR gap_us > 1800000000 "
                           "THEN 1 ELSE 0 END"))
        .withColumn("session_num",
                    F.sum("new_session").over(wsum).cast("bigint"))
        .groupBy("user_id", "session_num")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr("TIMESTAMPDIFF(MICROSECOND, MIN(ts), MAX(ts))")
            .alias("duration_us"),
        )
    )


@query(
    "events_daily_type_counts",
    oracle=f"""
    SELECT CAST(CAST(date_trunc('day', ts) AS DATE) AS VARCHAR) AS event_day,
           event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           {dsum('value', 'total_value')}
    FROM events
    GROUP BY 1, 2
    """,
)
def events_daily_type_counts(spark, sf_dir):
    """Tumbling daily windows in batch; the Structured Streaming twin
    (window + watermark) is in streaming/windows.py."""
    return (
        read_table(spark, sf_dir, "events")
        .groupBy(
            F.expr("CAST(CAST(date_trunc('day', ts) AS DATE) AS STRING)").alias("event_day"),
            "event_type",
        )
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_events"),
            F.expr(dsum("value", "total_value")),
        )
    )


# ---------------------------------------------------------------------------
# Pandas-UDF surface (SURVEY.md §2.10)
# ---------------------------------------------------------------------------

@query(
    "udf_user_gap_median",
    oracle="""
    WITH g AS (
      SELECT user_id,
             date_diff('microsecond',
                       lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                       ts) AS gap_us
      FROM events)
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(median(gap_us) AS DOUBLE) AS median_gap_us
    FROM g GROUP BY user_id
    """,
)
def udf_user_gap_median(spark, sf_dir):
    from oracle_cassandra_migrator_spark.operators.udfs import user_gap_median

    return user_gap_median(read_table(spark, sf_dir, "events"))


@query(
    "udf_embedding_norms",
    oracle="""
    SELECT vec_id,
           round(sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])), 6)
             AS l2_norm
    FROM embeddings
    """,
)
def udf_embedding_norms(spark, sf_dir):
    from oracle_cassandra_migrator_spark.operators.udfs import embedding_norms

    return embedding_norms(read_table(spark, sf_dir, "embeddings"))


# ---------------------------------------------------------------------------
# Skew-safe aggregation (salting) + exact-oracle ANN + BPE-ish tokens
# ---------------------------------------------------------------------------

@query(
    "skew_salted_revenue_by_status",
    oracle=f"""
    SELECT o_orderstatus AS order_status,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           {dsum('o_totalprice', 'total_price')}
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def skew_salted_revenue_by_status(spark, sf_dir):
    """Two-stage salted aggregation: identical result to a direct
    groupBy (partials are exact decimals/counts), but a hot status key
    fans out over 16 salt partitions first — the skew-safe plan."""
    from oracle_cassandra_migrator_spark.operators.skew import salted_aggregate

    return salted_aggregate(
        read_table(spark, sf_dir, "orders")
        .selectExpr("o_orderstatus AS order_status", "o_totalprice"),
        key_cols=["order_status"],
        partial_aggs=[
            "COUNT(*) AS c",
            "SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS s",
        ],
        final_aggs=[
            "CAST(SUM(c) AS BIGINT) AS n_orders",
            "CAST(SUM(s) AS DOUBLE) AS total_price",
        ],
        n_salts=16,
    )


def _ann_lsh_oracle(dim: int = 64, n_planes: int = 6, k: int = 10) -> str:
    bits = " || ".join(
        f"(CASE WHEN list_dot_product(embedding::DOUBLE[], {_plane_literal_sql(i, dim)})"
        f" >= 0 THEN '1' ELSE '0' END)"
        for i in range(n_planes)
    )
    return f"""
    WITH b AS (SELECT vec_id, embedding, {bits} AS bucket FROM embeddings),
    qb AS (SELECT bucket AS qbucket, embedding AS q FROM b WHERE vec_id = 0)
    SELECT b.vec_id, b.bucket,
           round(list_dot_product(b.embedding::DOUBLE[], qb.q::DOUBLE[])
                 / (sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(qb.q::DOUBLE[], qb.q::DOUBLE[]))), 6)
             AS cosine
    FROM b JOIN qb ON b.bucket = qb.qbucket
    ORDER BY cosine DESC, b.vec_id
    LIMIT {k}
    """


@query("sim_ann_lsh_exact", oracle=_ann_lsh_oracle())
def sim_ann_lsh_exact(spark, sf_dir):
    """The LSH-bucketed ANN path with a full value oracle: hyperplanes
    are md5-derived so the bucketing is deterministic and the DuckDB
    oracle replicates it bit-for-bit (plane literals precomputed)."""
    emb = read_table(spark, sf_dir, "embeddings")
    q = emb.where("vec_id = 0").select(F.col("embedding").alias("q"))
    return similarity.lsh_bucketed_topk(emb, q, dim=64, k=10, n_planes=6)


# same regex, two literal syntaxes: Spark SQL strings process backslash
# escapes (so \s must be doubled); DuckDB strings do not.
BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"
BPE_ISH_RE_SPARK = r"[a-z]+|[0-9]+|[^a-z0-9\\s]"


@query(
    "text_bpe_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(lower(text), '{BPE_ISH_RE}')) AS BIGINT)
             AS n_bpe_tokens,
           CAST(len(list_distinct(regexp_extract_all(lower(text), '{BPE_ISH_RE}')))
             AS BIGINT) AS n_unique_bpe_tokens
    FROM documents
    """,
)
def text_bpe_token_counts(spark, sf_dir):
    """BPE-style pre-tokenization (letter runs / digit runs / single
    punctuation) via regexp_extract_all — the standard cheap token-count
    proxy for LLM-corpus accounting."""
    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"CAST(size(regexp_extract_all(lower(text), '{BPE_ISH_RE_SPARK}', 0)) AS BIGINT)"
        " AS n_bpe_tokens",
        f"CAST(size(array_distinct(regexp_extract_all(lower(text), '{BPE_ISH_RE_SPARK}', 0)))"
        " AS BIGINT) AS n_unique_bpe_tokens",
    )


@query(
    "sim_ivf_topk",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings WHERE vec_id % 43 = 0),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_dot_product(e.embedding::DOUBLE[],
                                               c.cvec::DOUBLE[]), 6) DESC,
                        c.cid) AS rn
      FROM embeddings e CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, embedding, CAST(cid AS BIGINT) AS cell_id
      FROM assign WHERE rn = 1),
    q AS (SELECT cell_id AS qcell, embedding AS qv FROM cells WHERE vec_id = 0)
    SELECT c.vec_id, c.cell_id,
           round(list_dot_product(c.embedding::DOUBLE[], q.qv::DOUBLE[])
                 / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)
             AS cosine
    FROM cells c JOIN q ON c.cell_id = q.qcell
    ORDER BY cosine DESC, c.vec_id
    LIMIT 10
    """,
)
def sim_ivf_topk(spark, sf_dir):
    """IVF coarse-quantized ANN (the codebook here is a deterministic
    id-sample so the DuckDB oracle can replicate assignment exactly;
    sim_ivf_trained_topk below runs the same search over a k-means
    codebook)."""
    return similarity.ivf_topk(read_table(spark, sf_dir, "embeddings"))


@query(
    "sim_ivf_multiprobe_topk",
    oracle="""
    WITH cents AS (
      SELECT vec_id AS cid, embedding AS cvec
      FROM embeddings WHERE vec_id % 43 = 0),
    assign AS (
      SELECT e.vec_id, e.embedding, c.cid,
             row_number() OVER (
               PARTITION BY e.vec_id
               ORDER BY round(list_dot_product(e.embedding::DOUBLE[],
                                               c.cvec::DOUBLE[]), 6) DESC,
                        c.cid) AS rn
      FROM embeddings e CROSS JOIN cents c),
    cells AS (
      SELECT vec_id, embedding, CAST(cid AS BIGINT) AS cell_id
      FROM assign WHERE rn = 1),
    qv AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0),
    aff AS (SELECT c.cid,
                   round(list_dot_product(q.q::DOUBLE[], c.cvec::DOUBLE[]), 6)
                     AS aff
            FROM cents c CROSS JOIN qv q),
    probes AS (SELECT CAST(cid AS BIGINT) AS qcell FROM aff
               ORDER BY aff DESC, cid LIMIT 2)
    SELECT c.vec_id, c.cell_id,
           round(list_dot_product(c.embedding::DOUBLE[], q.q::DOUBLE[])
                 / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))
                    * sqrt(list_dot_product(q.q::DOUBLE[], q.q::DOUBLE[]))), 6)
             AS cosine
    FROM cells c JOIN probes p ON c.cell_id = p.qcell CROSS JOIN qv q
    ORDER BY cosine DESC, c.vec_id
    LIMIT 10
    """,
)
def sim_ivf_multiprobe_topk(spark, sf_dir):
    """Multi-probe IVF ANN (n_probe=2): search the query's two nearest
    cells — the standard recall knob of an IVF index; a true neighbor
    sitting just across the cell boundary is recovered by the
    runner-up probe at ~2x the single-cell probe cost, still
    corpus/|cells| x 2 rows instead of the whole corpus (see
    similarity.ivf_multiprobe_topk)."""
    return similarity.ivf_multiprobe_topk(
        read_table(spark, sf_dir, "embeddings"), n_probe=2)


def _ann_recall_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    bf = ORACLES["sim_topk_bruteforce"]
    ivf = ORACLES["sim_ivf_topk"]
    return f"""
    WITH bf AS (SELECT vec_id FROM ({bf})),
    ivf AS (SELECT vec_id FROM ({ivf})),
    hits AS (SELECT CAST(count(*) AS BIGINT) AS n_hits
             FROM bf JOIN ivf USING (vec_id))
    SELECT 10 AS k, n_hits,
           CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm
    FROM hits
    """


@query("sim_ann_recall_audit", oracle=_ann_recall_oracle())
def sim_ann_recall_audit(spark, sf_dir):
    """ANN quality audit: recall@10 of the single-probe IVF search
    against the exact brute-force top-10 — the similarity-family
    mirror of dedup_minhash_estimate_audit (measure the approximation,
    don't trust it). This is the number an indexing pipeline watches
    when tuning |cells| / n_probe. Both branches are the existing
    plan-gated operators (TakeOrderedAndProject each); the audit adds
    one <=k-row join and a 1-row aggregate, so its cost IS the cost of
    running both searches."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    ivf = sim_ivf_topk(spark, sf_dir).select("vec_id")
    return (
        bf.join(ivf, "vec_id")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_hits"))
        .selectExpr(
            "10 AS k", "n_hits",
            "CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm")
    )


def _ann_recall_curve_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    bf = ORACLES["sim_topk_bruteforce"]
    probes = {1: ORACLES["sim_ivf_topk"], 2: ORACLES["sim_ivf_multiprobe_topk"]}
    arms = "\n    UNION ALL ".join(
        f"SELECT {np} AS n_probe, CAST(count(*) AS BIGINT) AS n_hits"
        f" FROM bf JOIN (SELECT vec_id FROM ({sql})) a USING (vec_id)"
        for np, sql in probes.items())
    return f"""
    WITH bf AS (SELECT vec_id FROM ({bf}))
    SELECT n_probe, 10 AS k, n_hits,
           CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm
    FROM ({arms})
    """


@query("sim_ann_recall_curve", oracle=_ann_recall_curve_oracle())
def sim_ann_recall_curve(spark, sf_dir):
    """The IVF tuning CURVE: recall@10 vs n_probe (1 = single-cell,
    2 = multi-probe) against the exact brute-force top-10 — one row
    per operating point, the table an indexing team reads to pick the
    recall/cost trade-off. Each arm is an existing plan-gated
    retriever; the curve is a union of <=k-row joins."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    arms = []
    for n_probe, qfn in ((1, sim_ivf_topk), (2, sim_ivf_multiprobe_topk)):
        hits = bf.join(qfn(spark, sf_dir).select("vec_id"), "vec_id")
        arms.append(hits.agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_hits"))
            .selectExpr(f"{n_probe} AS n_probe", "n_hits"))
    curve = arms[0].unionByName(arms[1])
    return curve.selectExpr(
        "n_probe", "10 AS k", "n_hits",
        "CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm")


def _ivf_cells_parts(modulus: int = 43, iters: int = 2,
                     sample_mod: int | None = None,
                     init_limit: int | None = None,
                     src: str = "embeddings",
                     prefix: str = "") -> list[str]:
    """WITH-clause parts replaying the k-means training loop (exact
    decimal means, round(6)) and ending at ``{prefix}cells`` = (vec_id,
    embedding, cell_id) — shared by the trained-IVF probe oracle, the
    SemDeDup pair oracle, and (via ``src``/``prefix``, once per
    subspace) the product-quantization oracle.

    With ``sample_mod``/``init_limit`` the training loop (init,
    assignment, means) runs over the ``vec_id % sample_mod = 0`` sample
    with a fixed-size smallest-id init — mirroring the bounded-sample
    training in ``dedup_semantic_cells`` — while the final ``cells``
    assignment still covers the full corpus. ``src`` is the relation
    (or earlier CTE) holding (vec_id, embedding); ``prefix`` namespaces
    every CTE this block defines."""
    def assign(cents: str, name: str, asrc: str) -> str:
        return f"""{name} AS (
      SELECT vec_id, embedding, cell_id FROM (
        SELECT e.vec_id, e.embedding, c.cid AS cell_id,
               row_number() OVER (
                 PARTITION BY e.vec_id
                 ORDER BY round(list_dot_product(e.embedding::DOUBLE[],
                                                 c.cvec), 6) DESC,
                          c.cid) AS rn
        FROM {asrc} e CROSS JOIN {cents} c) WHERE rn = 1)"""

    p = prefix
    parts = []
    train_src = src
    init_where = f"vec_id % {modulus} = 0"
    if sample_mod is not None:
        train_src = f"{p}train_sample"
        parts.append(
            f"{p}train_sample AS (SELECT * FROM {src}"
            f" WHERE vec_id % {sample_mod} = 0)")
        init_where = (f"vec_id % {sample_mod} = 0"
                      f" AND vec_id % {modulus} = 0")
    init = (f"{p}cents0 AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cvec"
            f" FROM {src} WHERE {init_where}")
    if init_limit is not None:
        init += f" ORDER BY vec_id LIMIT {init_limit}"
    parts.append(init + ")")
    for i in range(iters):
        parts.append(assign(f"{p}cents{i}", f"{p}a{i}", train_src))
        parts.append(f"""{p}m{i} AS (
      SELECT cell_id, t.i AS dim_idx,
             round(CAST(SUM(CAST(embedding[t.i] AS DECIMAL(27,6))) AS DOUBLE)
                   / COUNT(*), 6) AS m
      FROM {p}a{i}, UNNEST(generate_series(1, len(embedding))) AS t(i)
      GROUP BY cell_id, t.i)""")
        parts.append(
            f"{p}cents{i + 1} AS (SELECT cell_id AS cid,"
            f" list(m ORDER BY dim_idx) AS cvec FROM {p}m{i} GROUP BY cell_id)")
    parts.append(assign(f"{p}cents{iters}", f"{p}cells", src))
    return parts


def _ivf_trained_oracle(modulus: int = 43, iters: int = 2, k: int = 10,
                        query_id: int = 0,
                        sample_mod: int | None = None,
                        init_limit: int | None = None) -> str:
    parts = _ivf_cells_parts(modulus, iters, sample_mod=sample_mod,
                             init_limit=init_limit)
    cos = (
        "round(list_dot_product(c.embedding::DOUBLE[], q.qv::DOUBLE[])"
        " / (sqrt(list_dot_product(c.embedding::DOUBLE[], c.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(q.qv::DOUBLE[], q.qv::DOUBLE[]))), 6)"
    )
    parts.append(
        f"q AS (SELECT cell_id AS qcell, embedding AS qv FROM cells"
        f" WHERE vec_id = {query_id})")
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT c.vec_id, CAST(c.cell_id AS BIGINT) AS cell_id, {cos} AS cosine
    FROM cells c JOIN q ON c.cell_id = q.qcell
    ORDER BY cosine DESC, c.vec_id
    LIMIT {k}
    """


@query("sim_ivf_trained_topk", oracle=_ivf_trained_oracle())
def sim_ivf_trained_topk(spark, sf_dir):
    """IVF ANN over a *trained* codebook: two Lloyd k-means iterations
    (deterministic id-sample init, exact-decimal means, round(6)) give
    tighter cells than the raw id-sample, then the same zero-shuffle
    assignment + single-cell probe as sim_ivf_topk. The whole training
    loop is replayed by the DuckDB oracle, so assignment parity is
    checked end-to-end.

    Note: this query deliberately keeps training INLINE to demonstrate
    and value-check the DataFrame Lloyd loop itself. In production the
    codebook is trained once and reused across probes — exactly the
    bounded-sample + driver-collected literal path dedup_semantic_cells
    runs (similarity.codebook_literal_expr), which keeps repeated
    probes free of the training stages."""
    emb = read_table(spark, sf_dir, "embeddings")
    # init_limit=64: absolute codebook bound (non-binding at driver
    # SFs — %43 of <= 2000 vectors < 64 — so the oracle's uncapped
    # replay matches; binding at probe/100TB scale where the corpus
    # assignment is O(corpus x |codebook|)). See sim_cluster_quality_nmi.
    cents = similarity.kmeans_codebook(emb, modulus=43, iters=2,
                                       init_limit=64)
    return similarity.ivf_topk(emb, k=10, query_id=0, centroids=cents)


# ---------------------------------------------------------------------------
# UDTF chunking + composite corpus-curation pipeline
# ---------------------------------------------------------------------------

@query(
    "udtf_chunk_documents",
    oracle=r"""
    WITH w AS (SELECT doc_id,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '')
                 AS words
               FROM documents)
    SELECT doc_id,
           CAST(i - 1 AS INT) AS chunk_idx,
           array_to_string(words[(i-1)*50 + 1 : least(i*50, len(words))], ' ')
             AS chunk_text,
           CAST(least(i*50, len(words)) - (i-1)*50 AS INT) AS n_tokens
    FROM w, UNNEST(generate_series(1, CAST(ceil(len(words) / 50.0) AS BIGINT)))
           AS t(i)
    """,
)
def udtf_chunk_documents(spark, sf_dir):
    from oracle_cassandra_migrator_spark.operators.chunking import (
        chunk_documents,
    )

    return chunk_documents(
        spark, read_table(spark, sf_dir, "documents"), size=50)


@query(
    "pipeline_corpus_curation",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang, text,
             round(0.5 * (CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
                          / length(text))
                   + 0.3 * (1.0 - CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
                            / length(text))
                   + 0.2 * least(CAST(len(list_filter({WORDS_SQL}, x -> list_contains(
                         ['the','a','an','of','and','to','in','is','on','for'], x)))
                         AS DOUBLE) / len({WORDS_SQL}) * 5.0, 1.0), 6) AS quality_score,
             CAST(len({WORDS_SQL}) AS BIGINT) AS n_tokens
      FROM documents),
    kept AS (SELECT * FROM scored WHERE quality_score >= 0.75),
    dedup AS (
      SELECT *, row_number() OVER (
          PARTITION BY md5({NORM_SQL}) ORDER BY doc_id) AS rn
      FROM kept)
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)
                / COUNT(*) AS DOUBLE) AS avg_quality
    FROM dedup WHERE rn = 1
    GROUP BY lang
    """,
)
def pipeline_corpus_curation(spark, sf_dir):
    """Composite curation pipeline — the canonical LLM-data flow in one
    plan: quality-score -> threshold filter -> exact-dedup (keep lowest
    doc_id per fingerprint) -> per-language corpus accounting. Single
    pass + one window + one aggregation; no driver-side loops."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fingerprint_expr,
        quality_columns,
    )

    docs = read_table(spark, sf_dir, "documents")
    cols = quality_columns("text")
    scored = docs.select(
        "doc_id", "lang", "text",
        cols["quality_score"].alias("quality_score"),
        cols["n_tokens"].alias("n_tokens"),
    ).where("quality_score >= 0.75")
    deduped = (
        scored.withColumn("fp", F.expr(fingerprint_expr("text")))
        .withColumn(
            "rn",
            F.expr("row_number() OVER (PARTITION BY fp ORDER BY doc_id)"))
        .where("rn = 1")
    )
    return deduped.groupBy("lang").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(n_tokens) AS BIGINT)").alias("total_tokens"),
        F.expr("CAST(CAST(SUM(CAST(quality_score AS DECIMAL(18,6))) AS DOUBLE)"
               " / COUNT(*) AS DOUBLE)").alias("avg_quality"),
    )


# ---------------------------------------------------------------------------
# Array functions + lateral explode (complex-type relational surface)
# ---------------------------------------------------------------------------

@query(
    "scalar_array_functions",
    oracle=f"""
    SELECT doc_id,
           CAST(len({WORDS_SQL}) AS INT) AS n_words,
           array_to_string(({WORDS_SQL})[1:3], ' ') AS first3,
           list_contains({WORDS_SQL}, 'the') AS has_the,
           array_to_string(list_sort(list_distinct(({WORDS_SQL})[1:5])), ',')
             AS first5_sorted,
           ({WORDS_SQL})[len({WORDS_SQL})] AS last_word
    FROM documents
    """,
)
def scalar_array_functions(spark, sf_dir):
    from oracle_cassandra_migrator_spark.operators.text import words_expr

    words = f"({words_expr('text')})"
    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id",
        f"CAST(size({words}) AS INT) AS n_words",
        f"array_join(slice({words}, 1, 3), ' ') AS first3",
        f"array_contains({words}, 'the') AS has_the",
        f"array_join(array_sort(array_distinct(slice({words}, 1, 5))), ',')"
        " AS first5_sorted",
        f"element_at({words}, -1) AS last_word",
    )


@query(
    "lateral_explode_tokens",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INT) AS pos,
           words[i] AS token
    FROM (SELECT doc_id, {WORDS_SQL} AS words FROM documents WHERE doc_id < 20),
         UNNEST(generate_series(1, len(words))) AS t(i)
    """,
)
def lateral_explode_tokens(spark, sf_dir):
    """posexplode: one doc row -> one row per token with its 1-based
    position (the built-in JVM-side counterpart of the chunking UDTF)."""
    from oracle_cassandra_migrator_spark.operators.text import words_expr

    return (
        read_table(spark, sf_dir, "documents")
        .where("doc_id < 20")
        .selectExpr("doc_id", f"posexplode({words_expr('text')}) AS (p, token)")
        .selectExpr("doc_id", "CAST(p + 1 AS INT) AS pos", "token")
    )


@query(
    "pii_masking",
    oracle="""
    SELECT c_custkey AS customer_id,
           CASE WHEN length(c_name) <= 4 THEN c_name
                ELSE concat(repeat('*', length(c_name) - 4),
                            substr(c_name, length(c_name) - 4 + 1)) END
             AS masked_name,
           sha256(concat('ocm:', c_name)) AS name_token,
           CAST(NULL AS DOUBLE) AS c_acctbal
    FROM customer
    """,
)
def pii_masking(spark, sf_dir):
    """Masking pass over migration output: redacted display form,
    deterministic sha256 surrogate (joinable without exposure), and
    full suppression — the step the reference's raw-PII pipeline lacks
    (json:59-82 copies card numbers verbatim)."""
    from oracle_cassandra_migrator_spark.operators.masking import (
        mask_columns,
        surrogate_key_expr,
    )

    customer = read_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("customer_id"),
        "c_name", "c_acctbal",
    ).withColumn("name_token", F.expr(surrogate_key_expr("c_name")))
    return mask_columns(
        customer,
        {"c_name": {"strategy": "mask_last", "keep": 4},
         "c_acctbal": {"strategy": "null"}},
    ).withColumnRenamed("c_name", "masked_name")


@query(
    "events_funnel_counts",
    oracle="""
    WITH firsts AS (
      SELECT user_id,
             min(CASE WHEN event_type = 'signup' THEN ts END) AS t_signup,
             min(CASE WHEN event_type = 'click' THEN ts END) AS t_click,
             min(CASE WHEN event_type = 'purchase' THEN ts END) AS t_purchase
      FROM events GROUP BY user_id)
    SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(count_if(t_signup IS NOT NULL) AS BIGINT) AS n_signed_up,
           CAST(count_if(t_signup IS NOT NULL AND t_click > t_signup)
                AS BIGINT) AS n_clicked_after_signup,
           CAST(count_if(t_signup IS NOT NULL AND t_click > t_signup
                         AND t_purchase > t_click) AS BIGINT)
             AS n_full_funnel
    FROM firsts
    """,
)
def events_funnel_counts(spark, sf_dir):
    """Conversion funnel (signup -> click -> purchase in causal order):
    one conditional-min aggregation per user, then global counts — two
    shuffles total regardless of event volume."""
    return (
        read_table(spark, sf_dir, "events")
        .groupBy("user_id")
        .agg(
            F.expr("min(CASE WHEN event_type = 'signup' THEN ts END)")
            .alias("t_signup"),
            F.expr("min(CASE WHEN event_type = 'click' THEN ts END)")
            .alias("t_click"),
            F.expr("min(CASE WHEN event_type = 'purchase' THEN ts END)")
            .alias("t_purchase"),
        )
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_users"),
            F.expr("CAST(count_if(t_signup IS NOT NULL) AS BIGINT)")
            .alias("n_signed_up"),
            F.expr("CAST(count_if(t_signup IS NOT NULL AND t_click > t_signup)"
                   " AS BIGINT)").alias("n_clicked_after_signup"),
            F.expr("CAST(count_if(t_signup IS NOT NULL AND t_click > t_signup"
                   " AND t_purchase > t_click) AS BIGINT)")
            .alias("n_full_funnel"),
        )
    )


@query(
    "multimodal_resize_stats",
    oracle=f"""
    WITH decoded AS (
      SELECT doc_id, width, height FROM ({_MM_DECODED_SQL}))
    SELECT doc_id, width, height,
           CAST(width * 224 // greatest(greatest(width, height), 1) AS INT)
             AS resized_w,
           CAST(height * 224 // greatest(greatest(width, height), 1) AS INT)
             AS resized_h
    FROM decoded
    """,
)
def multimodal_resize_stats(spark, sf_dir):
    """Fit-into-224 geometry over the REAL decoded dimensions; audio
    rows (NULL dims) pass through as NULL — quarantine-don't-fail."""
    docs = read_table(spark, sf_dir, "documents")
    decoded = multimodal.decode_binary_metadata(
        multimodal.synthesized_payloads(docs))
    return multimodal.resize_metadata(decoded, box=224)


@query(
    "multimodal_frame_sample",
    oracle="""
    WITH n AS (SELECT doc_id, text, length(text) AS len FROM documents)
    SELECT doc_id,
           CAST(i AS INT) AS frame_idx,
           md5(substring(text, i * 256 + 1, 64)) AS frame_sig
    FROM n, UNNEST(generate_series(0,
             CAST(ceil(len / 256.0) AS BIGINT) - 1)) AS t(i)
    """,
)
def multimodal_frame_sample(spark, sf_dir):
    from oracle_cassandra_migrator_spark.operators.multimodal import (
        frame_sample,
    )

    return frame_sample(read_table(spark, sf_dir, "documents"),
                        frame_len=64, stride=256)


# ---------------------------------------------------------------------------
# Deterministic corpus splitting / sequence packing (operators/sampling.py)
# ---------------------------------------------------------------------------

_NTOK_SQL = f"len(string_split({NORM_SQL}, ' '))"
_BUCKET_SQL = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))" \
              "::BIGINT % 100"


@query(
    "split_train_val_test",
    oracle=f"""
    SELECT CASE WHEN b < 80 THEN 'train'
                WHEN b < 90 THEN 'val'
                ELSE 'test' END AS split,
           lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS tokens_total
    FROM (SELECT lang, {_BUCKET_SQL} AS b, {_NTOK_SQL} AS ntok
          FROM documents)
    GROUP BY 1, 2
    """,
)
def split_train_val_test(spark, sf_dir):
    """Deterministic 80/10/10 train/val/test split: the assignment is a
    pure projection on md5(doc_id) — zero shuffle at any scale — and the
    query then audits per-(split, lang) document and token counts."""
    from oracle_cassandra_migrator_spark.operators import sampling

    docs = sampling.train_val_test(
        read_table(spark, sf_dir, "documents"), "doc_id")
    return (
        docs.withColumn("ntok", F.expr(token_count_expr("text")))
        .groupBy("split", "lang")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
             F.expr("CAST(SUM(ntok) AS BIGINT)").alias("tokens_total"))
    )


_STRATA_RATES = {"en": 0.3, "zh": 0.8, "es": 1.0, "de": 1.0, "fr": 0.5}


def _stratified_oracle() -> str:
    from oracle_cassandra_migrator_spark.operators.sampling import (
        hash_bucket_sql,
    )

    denom = 1_000_000
    whens = " ".join(
        f"WHEN lang = '{k}' THEN {int(v * denom)}"
        for k, v in sorted(_STRATA_RATES.items()))
    return f"""
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(min(doc_id) AS BIGINT) AS min_doc_id
    FROM documents
    WHERE ({hash_bucket_sql('doc_id', denom)}) < (CASE {whens} ELSE 0 END)
    GROUP BY lang
    """


@query("sample_stratified_by_lang", oracle=_stratified_oracle())
def sample_stratified_by_lang(spark, sf_dir):
    """Corpus rebalancing: deterministic per-language downsampling (cap
    the dominant 'en' at 30%, keep low-resource languages whole) via a
    pure id-hash filter — no RNG, no shuffle, same survivors at every
    parallelism. The query audits per-language survivor counts."""
    from oracle_cassandra_migrator_spark.operators import sampling

    docs = sampling.sample_stratified(
        read_table(spark, sf_dir, "documents"), "doc_id", "lang",
        rates=_STRATA_RATES)
    return docs.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(min(doc_id) AS BIGINT)").alias("min_doc_id"))


@query(
    "pack_token_budget_bins",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang, {_NTOK_SQL} AS ntok FROM documents),
    c AS (SELECT lang, doc_id, ntok,
          SUM(ntok) OVER (PARTITION BY lang
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS cum
          FROM t)
    SELECT lang, CAST(floor((cum - ntok) / 4096.0) AS BIGINT) AS bin,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS bin_tokens
    FROM c GROUP BY 1, 2
    """,
)
def pack_token_budget_bins(spark, sf_dir):
    """LLM sample packing, SQL-expressible form: deterministic order
    inside each lang group, running token total, bin = floor(start
    offset / 4096). The window makes each group the sequential unit —
    the 100 TB path shards groups by a hash bucket first
    (operators/sampling.py docstring)."""
    from oracle_cassandra_migrator_spark.operators import sampling

    docs = read_table(spark, sf_dir, "documents").withColumn(
        "ntok", F.expr(token_count_expr("text")))
    packed = sampling.pack_token_bins(
        docs, id_col="doc_id", token_col="ntok",
        group_col="lang", capacity=4096)
    return (
        packed.groupBy("lang", "bin")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
             F.expr("CAST(SUM(ntok) AS BIGINT)").alias("bin_tokens"))
    )


@query(
    "dedup_cluster_components",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_CTE},
    ex AS MATERIALIZED (SELECT doc_id, unnest(shingles) AS tok FROM sh),
    cand AS MATERIALIZED (
             SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM ex a JOIN ex b ON a.tok = b.tok AND a.doc_id < b.doc_id),
    pairs AS MATERIALIZED (
              SELECT doc_a, doc_b FROM ({_JACCARD_SQL})
              WHERE jaccard_raw >= 0.5),
    edges AS MATERIALIZED (
              SELECT doc_a AS a, doc_b AS b FROM pairs
              UNION ALL SELECT doc_b, doc_a FROM pairs),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(component AS BIGINT) AS cluster_rep
    FROM comp
    """,
)
def dedup_cluster_components(spark, sf_dir):
    """Transitive near-dup cluster resolution: exact-Jaccard pairs ->
    connected components -> (doc, representative). The iterative
    hash-to-min loop (operators/dedup.py) is the genuinely non-SQL
    engine capability here; the oracle replicates it with a recursive
    reachability CTE, so even the iterative path is value-checked."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.ngram_jaccard_pairs(docs, "text", "doc_id",
                                      n=3, threshold=0.5)
    comp = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    return comp.selectExpr("CAST(node AS BIGINT) AS doc_id",
                           "CAST(component AS BIGINT) AS cluster_rep")


@query(
    "events_cohort_retention",
    oracle="""
    WITH w AS (SELECT DISTINCT user_id,
                      CAST(date_trunc('week', ts) AS DATE) AS wk
               FROM events),
    c AS (SELECT user_id, min(wk) AS cohort_wk FROM w GROUP BY user_id)
    SELECT CAST(c.cohort_wk AS VARCHAR) AS cohort_week,
           CAST(date_diff('day', c.cohort_wk, w.wk) / 7 AS INT)
             AS week_offset,
           CAST(COUNT(DISTINCT w.user_id) AS BIGINT) AS n_active
    FROM w JOIN c ON w.user_id = c.user_id
    GROUP BY 1, 2
    """,
)
def events_cohort_retention(spark, sf_dir):
    """Cohort retention: users grouped by first-activity week, counted
    per week offset. Two keyed shuffles (user-week distinct, then the
    cohort join co-partitioned on user_id) and a final small agg —
    the distinct user-week table is the only large intermediate and
    it is already partially aggregated map-side."""
    events = read_table(spark, sf_dir, "events")
    w = (events.selectExpr(
            "user_id", "CAST(date_trunc('week', ts) AS DATE) AS wk")
         .distinct())
    c = w.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    return (
        w.join(c, "user_id")
        .groupBy(
            F.expr("CAST(cohort_wk AS STRING)").alias("cohort_week"),
            F.expr("CAST(datediff(wk, cohort_wk) / 7 AS INT)")
            .alias("week_offset"))
        .agg(F.expr("CAST(COUNT(DISTINCT user_id) AS BIGINT)")
             .alias("n_active"))
    )


_SCALED = "CAST(round(CAST({v} AS DOUBLE) * 10000000) AS BIGINT)"


@query(
    "embedding_label_centroids",
    oracle=f"""
    SELECT label, CAST(i - 1 AS INT) AS dim_idx,
           round(CAST(SUM({_SCALED.format(v='embedding[i]')}) AS DOUBLE)
                 / (10000000.0 * COUNT(*)), 6) AS centroid_val,
           CAST(COUNT(*) AS BIGINT) AS n_vectors
    FROM embeddings,
         UNNEST(generate_series(1, len(embedding))) AS t(i)
    GROUP BY 1, 2
    """,
)
def embedding_label_centroids(spark, sf_dir):
    """Element-wise mean vector per label — the codebook/class-centroid
    primitive (one k-means step) for embedding pipelines. posexplode ->
    two-key groupBy keeps it a single shuffle of (label, dim, scalar)
    triples; float sums across rows are order-dependent, so elements
    are fixed-point-scaled to BIGINT first (order-free exact sum on
    both engines), divided back out at the end."""
    emb = read_table(spark, sf_dir, "embeddings")
    scaled = _SCALED.format(v="v")
    return (
        emb.select("label", F.posexplode("embedding").alias("dim_idx", "v"))
        .groupBy("label", "dim_idx")
        .agg(F.expr(f"round(CAST(SUM({scaled}) AS DOUBLE)"
                    " / (10000000.0 * COUNT(*)), 6)").alias("centroid_val"),
             F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_vectors"))
    )


# ---------------------------------------------------------------------------
# Incremental merge (upsert / SCD2) — the ongoing-sync capability the
# reference's full-reload model lacks
# ---------------------------------------------------------------------------

@query(
    "merge_upsert_orders",
    oracle="""
    WITH cur AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
    upd AS (SELECT o_orderkey, 'U' AS o_orderstatus, o_totalprice * 2
              AS o_totalprice FROM cur WHERE o_orderkey % 97 = 0),
    ins AS (SELECT o_orderkey + 100000000 AS o_orderkey,
                   'N' AS o_orderstatus, o_totalprice
            FROM cur WHERE o_orderkey % 101 = 0),
    changes AS (SELECT * FROM upd UNION ALL SELECT * FROM ins),
    merged AS (
      SELECT * FROM changes
      UNION ALL
      SELECT c.* FROM cur c
      WHERE NOT EXISTS (SELECT 1 FROM changes u
                        WHERE u.o_orderkey = c.o_orderkey))
    SELECT o_orderstatus,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE)
             AS total_price
    FROM merged GROUP BY o_orderstatus
    """,
)
def merge_upsert_orders(spark, sf_dir):
    """Incremental sync onto a snapshot: a change batch (doubled-price
    updates keyed % 97, synthetic inserts keyed % 101) merges by
    anti-join + union — updates win, unmatched snapshot rows survive,
    inserts append. The audit aggregates the merged table; 'U'/'N'
    rows prove update and insert paths, the rest proves survivors."""
    from oracle_cassandra_migrator_spark.operators.merge import merge_upsert

    cur = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderstatus", "o_totalprice")
    upd = cur.where("o_orderkey % 97 = 0").selectExpr(
        "o_orderkey", "'U' AS o_orderstatus",
        "o_totalprice * 2 AS o_totalprice")
    ins = cur.where("o_orderkey % 101 = 0").selectExpr(
        "o_orderkey + 100000000 AS o_orderkey", "'N' AS o_orderstatus",
        "o_totalprice")
    merged = merge_upsert(cur, upd.unionByName(ins), ["o_orderkey"])
    return merged.groupBy("o_orderstatus").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_orders"),
        F.expr(dsum("o_totalprice", "total_price")))


@query(
    "scd2_customer_segments",
    oracle="""
    WITH hist AS (SELECT c_custkey, c_mktsegment,
                         '1990-01-01' AS valid_from,
                         CAST(NULL AS VARCHAR) AS valid_to
                  FROM customer),
    upd AS (SELECT c_custkey, 'PROMO' AS c_mktsegment,
                   '2020-06-01' AS eff
            FROM customer WHERE c_custkey % 53 = 0),
    closed AS (SELECT h.c_custkey, h.c_mktsegment, h.valid_from,
                      u.eff AS valid_to
               FROM hist h JOIN upd u ON h.c_custkey = u.c_custkey),
    untouched AS (SELECT h.* FROM hist h
                  WHERE NOT EXISTS (SELECT 1 FROM upd u
                                    WHERE u.c_custkey = h.c_custkey)),
    newv AS (SELECT c_custkey, c_mktsegment, eff AS valid_from,
                    CAST(NULL AS VARCHAR) AS valid_to FROM upd),
    merged AS (SELECT * FROM closed UNION ALL
               SELECT * FROM untouched UNION ALL
               SELECT * FROM newv)
    SELECT c_mktsegment,
           CAST(valid_to IS NULL AS BOOLEAN) AS is_open,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(min(c_custkey) AS BIGINT) AS min_key
    FROM merged GROUP BY 1, 2
    """,
)
def scd2_customer_segments(spark, sf_dir):
    """Type-2 slowly-changing-dimension merge: customers keyed % 53
    move to segment PROMO effective 2020-06-01 — their open history row
    is closed (valid_to set) and a new open PROMO version appends;
    everyone else passes through. The audit counts rows per
    (segment, open-flag), proving close/append/pass-through paths."""
    from oracle_cassandra_migrator_spark.operators.merge import scd2_apply

    cust = read_table(spark, sf_dir, "customer")
    hist = cust.selectExpr(
        "c_custkey", "c_mktsegment", "'1990-01-01' AS valid_from",
        "CAST(NULL AS STRING) AS valid_to")
    upd = cust.where("c_custkey % 53 = 0").selectExpr(
        "c_custkey", "'PROMO' AS c_mktsegment", "'2020-06-01' AS eff")
    merged = scd2_apply(hist, upd, ["c_custkey"], effective_col="eff")
    return merged.groupBy("c_mktsegment",
                          F.expr("valid_to IS NULL").alias("is_open")).agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(min(c_custkey) AS BIGINT)").alias("min_key"))


# ---------------------------------------------------------------------------
# Corpus curation II: repetition filters, contamination, per-domain caps,
# incremental snapshot dedup, embedding quantization, vocabulary top-k.
# ---------------------------------------------------------------------------

# Non-distinct 3-gram list (multiplicity matters for repetition).
_ALL_SHINGLES3_SQL = (
    "list_transform(generate_series(1, greatest(len(w) - 2, 0)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2])"
)
_ALL_SHINGLES4_SQL = (
    "list_transform(generate_series(1, greatest(len(w) - 3, 0)), "
    "i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])"
)


@query(
    "text_repetition_stats",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {FAST_WORDS_SQL} AS w FROM documents),
    tc AS (SELECT doc_id, max(cnt) AS top_cnt FROM (
             SELECT doc_id, tok, count(*) AS cnt
             FROM (SELECT doc_id, unnest(w) AS tok FROM norm)
             GROUP BY 1, 2)
           GROUP BY 1),
    feat AS (SELECT n.doc_id,
             CAST(len(n.w) AS BIGINT) AS n_words,
             round(CASE WHEN len(n.w) > 0
                   THEN 1.0 - CAST(len(list_distinct(n.w)) AS DOUBLE) / len(n.w)
                   ELSE 0.0 END, 6) AS dup_word_fraction,
             round(CASE WHEN len(n.w) > 0
                   THEN CAST(t.top_cnt AS DOUBLE) / len(n.w)
                   ELSE 0.0 END, 6) AS top_word_fraction,
             round(CASE WHEN len(n.s3) > 0
                   THEN 1.0 - CAST(len(list_distinct(n.s3)) AS DOUBLE) / len(n.s3)
                   ELSE 0.0 END, 6) AS dup_3gram_fraction
             FROM (SELECT doc_id, w, {_ALL_SHINGLES3_SQL} AS s3 FROM norm) n
             JOIN tc t USING (doc_id))
    SELECT *, (top_word_fraction > {curation.TOP_WORD_FRAC_MAX}
               OR dup_3gram_fraction > {curation.DUP_3GRAM_FRAC_MAX})
              AS is_repetitive
    FROM feat
    """,
)
def text_repetition_stats(spark, sf_dir):
    """Gopher-style repetition features per document (duplicate-word,
    top-word, duplicate-3-gram fractions) + keep/drop flag. Strictly
    per-row: the max-word-frequency is a local sort+fold, never an
    explode/groupBy shuffle of the corpus."""
    docs = read_table(spark, sf_dir, "documents")
    return curation.repetition_stats(docs, "text", "doc_id")


@query(
    "contamination_ngram_overlap",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {FAST_WORDS_SQL} AS w FROM documents),
    sh AS (SELECT doc_id, list_distinct({_ALL_SHINGLES4_SQL}) AS s FROM norm),
    bench AS (SELECT DISTINCT unnest(s) AS tok FROM sh WHERE doc_id % 97 = 0),
    corpus AS (SELECT doc_id, len(s) AS n4, unnest(s) AS tok
               FROM sh WHERE doc_id % 97 <> 0)
    SELECT c.doc_id,
           CAST(c.n4 AS BIGINT) AS n_4grams,
           CAST(count(*) AS BIGINT) AS shared_4grams,
           round(CAST(count(*) AS DOUBLE) / c.n4, 6) AS contaminated_share
    FROM corpus c JOIN bench b USING (tok)
    GROUP BY c.doc_id, c.n4
    """,
)
def contamination_ngram_overlap(spark, sf_dir):
    """Benchmark-contamination sweep: corpus docs sharing any distinct
    4-gram with the benchmark split (doc_id % 97 = 0 stands in for an
    eval suite). The benchmark n-gram set broadcasts; the corpus side
    partial-aggregates map-side before one doc_id-keyed shuffle."""
    docs = read_table(spark, sf_dir, "documents")
    return curation.contamination_overlap(
        docs, "text", "doc_id", bench_filter="doc_id % 97 = 0", n=4)


@query(
    "cap_docs_per_source",
    oracle="""
    SELECT source, doc_id, n_chars, keep_rank FROM (
      SELECT source, doc_id, n_chars,
             row_number() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS keep_rank
      FROM documents)
    WHERE keep_rank <= 10
    """,
)
def cap_docs_per_source(spark, sf_dir):
    """Per-domain document cap (keep the 10 longest per source,
    deterministic tiebreak): the anti-monoculture step of crawl
    curation. Runs the SALTED variant — per-(source, salt) prune, then
    a re-rank over the bounded survivors — so a head domain holding
    half the crawl still fans out over n_salts tasks; output (rank
    included) is provably identical to the plain window, which is what
    the oracle replays."""
    docs = read_table(spark, sf_dir, "documents")
    capped = curation.cap_per_group_salted(
        docs, "source",
        [F.col("n_chars").desc(), F.col("doc_id")], n=10,
        salt_on=["doc_id"])
    return capped.select(
        "source", "doc_id", "n_chars",
        F.col("keep_rank").cast("long").alias("keep_rank"))


@query(
    "dedup_incremental_snapshot",
    oracle=f"""
    WITH base AS (SELECT DISTINCT md5({NORM_SQL}) AS fingerprint
                  FROM documents WHERE doc_id % 5 <> 0),
    newd AS (SELECT md5({NORM_SQL}) AS fingerprint, doc_id
             FROM documents WHERE doc_id % 5 = 0)
    SELECT n.fingerprint,
           CAST(min(n.doc_id) AS BIGINT) AS representative_id,
           CAST(count(*) AS BIGINT) AS n_new_copies
    FROM newd n
    WHERE NOT EXISTS (SELECT 1 FROM base b WHERE b.fingerprint = n.fingerprint)
    GROUP BY 1
    """,
)
def dedup_incremental_snapshot(spark, sf_dir):
    """Snapshot-over-snapshot incremental dedup: docs in the new crawl
    (doc_id % 5 = 0) whose fingerprint never appeared in the base
    crawl, deduplicated within the new slice. Fingerprint-keyed anti
    join — bucketed base layout + runtime bloom filter at scale."""
    docs = read_table(spark, sf_dir, "documents")
    return curation.incremental_fingerprint_dedup(
        docs.where("doc_id % 5 != 0"), docs.where("doc_id % 5 = 0"),
        "text", "doc_id")


@query(
    "embedding_quantize_int8",
    oracle="""
    WITH d AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    s AS (SELECT *, greatest(list_max(list_transform(e, x -> abs(x))), 1e-12)
                    / 127.0 AS scale FROM d),
    q AS (SELECT *, list_transform(e, x ->
            greatest(CAST(-127.0 AS DOUBLE), least(CAST(127.0 AS DOUBLE),
                     floor(x / scale + 0.5)))) AS qv FROM s),
    m AS (SELECT label,
            round(list_sum(list_transform(generate_series(1, len(e)),
                  i -> (e[i] - qv[i] * scale) * (e[i] - qv[i] * scale)))
                  / len(e) * 1e6, 6) AS mse_1e6,
            round(scale * 1e3, 10) AS scale_1e3,
            len(list_filter(qv, x -> abs(x) = 127.0)) AS n_sat
          FROM q)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(CAST(mse_1e6 AS DECIMAL(24,10))) AS DOUBLE)
                 / count(*), 6) AS avg_mse_1e6,
           round(CAST(sum(CAST(scale_1e3 AS DECIMAL(24,10))) AS DOUBLE)
                 / count(*), 6) AS avg_scale_1e3,
           CAST(sum(n_sat) AS BIGINT) AS n_saturated
    FROM m GROUP BY label
    """,
)
def embedding_quantize_int8(spark, sf_dir):
    """Symmetric int8 embedding quantization with per-label error
    accounting (see operators/similarity.py:quantize_int8_stats)."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.quantize_int8_stats(emb)


@query(
    "text_vocab_topk",
    oracle=f"""
    SELECT tok, CAST(count(*) AS BIGINT) AS n_occurrences
    FROM (SELECT unnest({FAST_WORDS_SQL}) AS tok FROM documents)
    GROUP BY tok
    ORDER BY n_occurrences DESC, tok
    LIMIT 20
    """,
)
def text_vocab_topk(spark, sf_dir):
    """Corpus vocabulary top-k by occurrence (tokenizer-training /
    frequency-analysis primitive). Map-side partial counts + one
    token-keyed shuffle + TakeOrderedAndProject."""
    docs = read_table(spark, sf_dir, "documents")
    from oracle_cassandra_migrator_spark.operators.text import fast_words_expr
    return (
        docs.select(F.explode(F.expr(fast_words_expr("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.count("*").cast("bigint").alias("n_occurrences"))
        .orderBy(F.col("n_occurrences").desc(), "tok")
        .limit(20)
    )


def _random_projection_oracle(dim: int = 64, out_dim: int = 16) -> str:
    from oracle_cassandra_migrator_spark.operators.similarity import (
        hyperplane_signs)

    ys = []
    for j in range(out_dim):
        lit = "[" + ", ".join(
            "1.0" if v > 0 else "-1.0"
            for v in hyperplane_signs(100 + j, dim)) + "]"
        ys.append(
            f"list_sum(list_transform(generate_series(1, {dim}), "
            f"i -> e[i] * ({lit})[i])) / sqrt(CAST({out_dim} AS DOUBLE)) AS y{j}")
    y_cols = ",\n           ".join(ys)
    norm_y = "sqrt(" + " + ".join(
        f"(y{j} * y{j})" for j in range(out_dim)) + ")"
    return f"""
    WITH d AS (SELECT vec_id, label,
                      list_transform(embedding, x -> CAST(x AS DOUBLE)) AS e
               FROM embeddings),
    p AS (SELECT vec_id, label,
           greatest(sqrt(list_sum(list_transform(e, x -> x * x))), 1e-12)
             AS norm_x,
           {y_cols}
          FROM d),
    r AS (SELECT label, round(({norm_y}) / norm_x, 6) AS ratio FROM p)
    SELECT label,
           CAST(count(*) AS BIGINT) AS n_vecs,
           round(CAST(sum(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE)
                 / count(*), 6) AS avg_norm_ratio,
           min(ratio) AS min_norm_ratio,
           max(ratio) AS max_norm_ratio
    FROM r GROUP BY label
    """


@query("embedding_random_projection", oracle=_random_projection_oracle())
def embedding_random_projection(spark, sf_dir):
    """JL random projection 64->16 with per-label norm-distortion audit
    (see operators/similarity.py:random_projection_stats). The oracle
    replays the projection with the same precomputed Rademacher
    literals, so the check is exact."""
    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.random_projection_stats(emb, dim=64, out_dim=16)


def _temperature_resample_oracle(denominator: int = 1_000_000) -> str:
    from oracle_cassandra_migrator_spark.operators.sampling import (
        hash_bucket_sql)

    bucket = hash_bucket_sql("d.doc_id", denominator)
    return f"""
    WITH c AS (SELECT lang, count(*) AS n_docs FROM documents GROUP BY 1),
    m AS (SELECT min(n_docs) AS n_min FROM c),
    r AS (SELECT lang, n_docs,
                 CAST(floor(sqrt(CAST(n_min AS DOUBLE) / n_docs)
                      * {denominator}) AS BIGINT) AS threshold_ppm
          FROM c, m),
    k AS (SELECT d.lang, count(*) AS n_kept
          FROM documents d JOIN r ON d.lang = r.lang
          WHERE {bucket} < r.threshold_ppm
          GROUP BY 1)
    SELECT r.lang,
           CAST(r.n_docs AS BIGINT) AS n_docs,
           r.threshold_ppm,
           CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
    FROM r LEFT JOIN k USING (lang)
    """


@query(
    "sample_fixed_n_by_hash",
    oracle="""
    SELECT CAST(doc_id AS BIGINT) AS doc_id, lang, source,
           md5(concat('sample:', CAST(doc_id AS VARCHAR))) AS sort_key
    FROM documents
    ORDER BY sort_key
    LIMIT 100
    """,
)
def sample_fixed_n_by_hash(spark, sf_dir):
    """Deterministic fixed-size uniform sample — the bottom-k-by-hash
    reservoir: rank every doc by md5 of a salted id and keep the 100
    smallest. Hashes are uniform, so this IS a uniform random sample,
    yet it's reproducible across runs/engines and needs no RNG state.
    Spark plans it as TakeOrderedAndProject: each task keeps its local
    bottom-100, the driver merges |tasks| x 100 rows — no global sort,
    no shuffle of the corpus, the standard way to cut a fixed-size
    eval/holdout set from 100 TB."""
    return (
        read_table(spark, sf_dir, "documents")
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id", "lang", "source",
            "md5(concat('sample:', CAST(doc_id AS STRING))) AS sort_key")
        .orderBy("sort_key")
        .limit(100)
    )


@query(
    "corpus_mix_weights",
    oracle=f"""
    WITH t AS (SELECT source, {_NTOK_SQL} AS ntok FROM documents),
    per AS (SELECT source,
                   CAST(COUNT(*) AS BIGINT) AS n_docs,
                   CAST(SUM(ntok) AS BIGINT) AS total_tokens
            FROM t GROUP BY source),
    tot AS (SELECT SUM(total_tokens) AS corpus_tokens,
                   COUNT(*) AS n_sources FROM per)
    SELECT p.source, p.n_docs, p.total_tokens,
           CAST(floor(p.total_tokens * 1e6 / t.corpus_tokens + 0.5)
                AS BIGINT) AS current_ppm,
           CAST(floor(1e6 / t.n_sources + 0.5) AS BIGINT) AS target_ppm,
           CAST(floor((t.corpus_tokens / t.n_sources)
                      * 1e6 / p.total_tokens + 0.5)
                AS BIGINT) AS resample_weight_ppm
    FROM per p CROSS JOIN tot t
    """,
)
def corpus_mix_weights(spark, sf_dir):
    """Training-mixture reweighting table: per source, its current
    token share and the per-doc resampling weight (in integer ppm;
    1e6 = keep as-is, <1e6 downsample, >1e6 repeat/upsample) that
    moves the mixture to a UNIFORM target across sources — the
    executable form of domain-mixture planning (cf. DoReMi's reweigh-
    by-domain step, with uniform in place of learned weights). ONE
    corpus pass: a map-side-combined per-source aggregation, then the
    corpus totals come from an unpartitioned window OVER THE
    |sources|-ROW AGGREGATE (aggregate-before-window — the
    single-partition window sees a handful of rows, never the corpus),
    so there is no second scan and no broadcast join at all."""
    docs = read_table(spark, sf_dir, "documents").select(
        "source", F.expr(token_count_expr("text")).alias("ntok"))
    per = docs.groupBy("source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(ntok) AS BIGINT)").alias("total_tokens"))
    w = Window.partitionBy()
    return (
        per.withColumn("corpus_tokens", F.sum("total_tokens").over(w))
        .withColumn("n_sources", F.count("*").over(w))
        .selectExpr(
            "source", "n_docs", "total_tokens",
            "CAST(floor(total_tokens * 1e6 / corpus_tokens + 0.5)"
            " AS BIGINT) AS current_ppm",
            "CAST(floor(1e6 / n_sources + 0.5) AS BIGINT) AS target_ppm",
            "CAST(floor((corpus_tokens / n_sources) * 1e6 / total_tokens"
            " + 0.5) AS BIGINT) AS resample_weight_ppm")
    )


@query("sample_temperature_by_lang", oracle=_temperature_resample_oracle())
def sample_temperature_by_lang(spark, sf_dir):
    """Temperature (T=2) language rebalancing audit — head languages
    downsampled at sqrt(n_min/n_l), smallest kept whole (see
    operators/sampling.py:temperature_resample_audit)."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        temperature_resample_audit)

    docs = read_table(spark, sf_dir, "documents")
    return temperature_resample_audit(docs, "doc_id", "lang")


@query(
    "text_char_entropy",
    oracle="""
    WITH ch AS (SELECT doc_id,
                       list_transform(generate_series(1, length(text)),
                                      i -> substring(text, i, 1)) AS cs
                FROM documents),
    cnt AS (SELECT doc_id, tok, count(*) AS c
            FROM (SELECT doc_id, unnest(cs) AS tok FROM ch) GROUP BY 1, 2),
    e AS (SELECT doc_id,
                 list_sum(list_transform(list(c ORDER BY tok),
                          x -> x * ln(x))) AS s
          FROM cnt GROUP BY 1)
    SELECT d.doc_id,
           round(CASE WHEN length(d.text) > 0
                 THEN ln(CAST(length(d.text) AS DOUBLE)) - e.s / length(d.text)
                 ELSE 0.0 END, 6) AS char_entropy
    FROM documents d JOIN e USING (doc_id)
    """,
)
def text_char_entropy(spark, sf_dir):
    """Per-document character-distribution Shannon entropy (CCNet-style
    gibberish/boilerplate proxy). Per-row sort + run-length fold in one
    codegen'd expression — zero shuffle (see text.char_entropy_expr);
    the oracle accumulates c*ln(c) in the same sorted-char order."""
    from oracle_cassandra_migrator_spark.operators.text import char_entropy_expr

    return read_table(spark, sf_dir, "documents").selectExpr(
        "doc_id", char_entropy_expr("text") + " AS char_entropy")


# ---------------------------------------------------------------------------
# Lexical retrieval (tf-idf / BM25) + SemDeDup cluster-blocked dedup
# ---------------------------------------------------------------------------

@query(
    "text_tfidf_topk",
    oracle=f"""
    WITH w AS (SELECT doc_id, unnest({FAST_WORDS_SQL}) AS tok FROM documents),
    tf AS (SELECT doc_id, tok, CAST(count(*) AS BIGINT) AS tf
           FROM w GROUP BY 1, 2),
    dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    n AS (SELECT CAST(count(*) AS DOUBLE) AS n_docs FROM documents),
    s AS (SELECT tf.doc_id, tf.tok, tf.tf,
                 round(tf.tf * ln(n.n_docs / dfq.df), 6) AS tfidf
          FROM tf JOIN dfq USING (tok) CROSS JOIN n)
    SELECT doc_id, tok, tf, tfidf, CAST(rk AS BIGINT) AS rk
    FROM (SELECT *, row_number() OVER (PARTITION BY doc_id
                    ORDER BY tfidf DESC, tok) AS rk FROM s)
    WHERE rk <= 3
    """,
)
def text_tfidf_topk(spark, sf_dir):
    """Top-3 characteristic terms per document by tf-idf — keyword
    extraction / sparse-retrieval weighting. One corpus shuffle (the
    doc-term count), vocab-sized df table broadcast back, per-doc
    window on the high-cardinality doc id (see text.tfidf_topk_terms)."""
    from oracle_cassandra_migrator_spark.operators.text import tfidf_topk_terms

    return tfidf_topk_terms(read_table(spark, sf_dir, "documents"), k=3)


BM25_TERMS = ["merge", "window", "stream"]


@query(
    "search_bm25_topk",
    oracle=f"""
    WITH w AS (SELECT doc_id, {FAST_WORDS_SQL} AS w FROM documents),
    stats AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                     round(CAST(SUM(len(w)) AS DOUBLE) / count(*), 6) AS avgdl
              FROM w),
    toks AS (SELECT doc_id, CAST(len(w) AS BIGINT) AS dl, unnest(w) AS tok
             FROM w),
    tf AS (SELECT doc_id, dl, tok, CAST(count(*) AS BIGINT) AS tf
           FROM toks WHERE tok IN ('merge', 'window', 'stream')
           GROUP BY 1, 2, 3),
    dfq AS (SELECT tok, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
    s AS (SELECT tf.doc_id,
                 round(ln((n_docs - df + 0.5e0) / (df + 0.5e0) + 1.0e0)
                       * ((tf * (1.2e0 + 1.0e0))
                          / (tf + 1.2e0 * (1.0e0 - 0.75e0
                                           + 0.75e0 * dl / avgdl))), 9)
                   AS term_score
          FROM tf JOIN dfq USING (tok) CROSS JOIN stats)
    SELECT doc_id,
           CAST(count(*) AS BIGINT) AS n_terms_matched,
           round(CAST(SUM(CAST(term_score AS DECIMAL(20,9))) AS DOUBLE), 6)
             AS bm25
    FROM s GROUP BY doc_id
    ORDER BY bm25 DESC, doc_id
    LIMIT 10
    """,
)
def search_bm25_topk(spark, sf_dir):
    """Okapi BM25 top-10 for the literal query {{merge, window, stream}}
    — the sparse-retrieval complement of the sim_* ANN path. The token
    explode filters to the query terms before any shuffle; df and the
    (N, avgdl) scalar broadcast (see text.bm25_topk)."""
    from oracle_cassandra_migrator_spark.operators.text import bm25_topk

    return bm25_topk(read_table(spark, sf_dir, "documents"), BM25_TERMS, k=10)


@query(
    "profile_documents_table",
    oracle="""
    SELECT 'doc_id' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(doc_id) AS BIGINT) AS n_nulls, CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct FROM documents
    UNION ALL SELECT 'text' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(text) AS BIGINT) AS n_nulls, CAST(count(DISTINCT text) AS BIGINT) AS n_distinct FROM documents
    UNION ALL SELECT 'lang' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(lang) AS BIGINT) AS n_nulls, CAST(count(DISTINCT lang) AS BIGINT) AS n_distinct FROM documents
    UNION ALL SELECT 'source' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(source) AS BIGINT) AS n_nulls, CAST(count(DISTINCT source) AS BIGINT) AS n_distinct FROM documents
    UNION ALL SELECT 'n_chars' AS column_name, CAST(count(*) AS BIGINT) AS n_rows, CAST(count(*) - count(n_chars) AS BIGINT) AS n_nulls, CAST(count(DISTINCT n_chars) AS BIGINT) AS n_distinct FROM documents
    """,
)
def profile_documents_table(spark, sf_dir):
    """Table profiler (the ANALYZE/data-quality pass a pipeline runs
    before trusting a new drop): per column, exact null count and
    exact distinct cardinality, long format. One aggregation statement
    — Catalyst plans the multi-distinct via Expand (each row fans out
    per distinct-column group, partial-aggregated map-side), which is
    the standard exact-profiling plan; swap count(DISTINCT) for
    approx_count_distinct at 100 TB for a sketch-sized shuffle (the
    bounded-error contract is driver-checked on
    agg_approx_count_distinct)."""
    docs = read_table(spark, sf_dir, "documents")
    wide = docs.agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_rows"),
        F.expr("CAST(count(*) - count(doc_id) AS BIGINT)").alias("nn_doc_id"),
            F.expr("CAST(count(DISTINCT doc_id) AS BIGINT)").alias("nd_doc_id"),
            F.expr("CAST(count(*) - count(text) AS BIGINT)").alias("nn_text"),
            F.expr("CAST(count(DISTINCT text) AS BIGINT)").alias("nd_text"),
            F.expr("CAST(count(*) - count(lang) AS BIGINT)").alias("nn_lang"),
            F.expr("CAST(count(DISTINCT lang) AS BIGINT)").alias("nd_lang"),
            F.expr("CAST(count(*) - count(source) AS BIGINT)").alias("nn_source"),
            F.expr("CAST(count(DISTINCT source) AS BIGINT)").alias("nd_source"),
            F.expr("CAST(count(*) - count(n_chars) AS BIGINT)").alias("nn_n_chars"),
            F.expr("CAST(count(DISTINCT n_chars) AS BIGINT)").alias("nd_n_chars"))
    return wide.selectExpr(
        "stack(5, 'doc_id', nn_doc_id, nd_doc_id, 'text', nn_text, nd_text, 'lang', nn_lang, nd_lang, 'source', nn_source, nd_source, 'n_chars', nn_n_chars, nd_n_chars) AS (column_name, n_nulls, n_distinct)",
        "n_rows",
    ).select("column_name", "n_rows", "n_nulls", "n_distinct")


def _rrf_fusion_oracle(k_rrf: int = 60) -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    bm = ORACLES["search_bm25_topk"]
    cos = ORACLES["sim_topk_bruteforce"]
    return f"""
    WITH bm AS (SELECT doc_id,
                       row_number() OVER (ORDER BY bm25 DESC, doc_id)
                         AS r_bm25
                FROM ({bm})),
    cs AS (SELECT vec_id,
                  row_number() OVER (ORDER BY cosine DESC, vec_id)
                    AS r_cos
           FROM ({cos}))
    SELECT CAST(coalesce(bm.doc_id, cs.vec_id) AS BIGINT) AS doc_id,
           CAST(bm.r_bm25 AS INT) AS r_bm25,
           CAST(cs.r_cos AS INT) AS r_cos,
           round(coalesce(1.0 / ({k_rrf} + bm.r_bm25), 0)
                 + coalesce(1.0 / ({k_rrf} + cs.r_cos), 0), 6) AS rrf
    FROM bm FULL OUTER JOIN cs ON bm.doc_id = cs.vec_id
    ORDER BY rrf DESC, doc_id
    """


@query("search_hybrid_rrf", oracle=_rrf_fusion_oracle())
def search_hybrid_rrf(spark, sf_dir):
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al.
    2009): the BM25 sparse top-10 and the dense cosine top-10 merge on
    score 1/(60+rank_bm25) + 1/(60+rank_cos) — the standard
    training-free fusion every hybrid search stack ships. Both inputs
    are the existing plan-gated TakeOrderedAndProject retrievers; the
    fusion itself touches <= 2k rows (rank windows over k-row lists, a
    k-row full outer join), so its scale profile IS the retrievers'.
    vec_id is the embedding of the same-id document in this corpus."""
    bm = search_bm25_topk(spark, sf_dir).select("doc_id", "bm25")
    cs = sim_topk_bruteforce(spark, sf_dir).select("vec_id", "cosine")
    wb = Window.orderBy(F.desc("bm25"), F.asc("doc_id"))
    wc = Window.orderBy(F.desc("cosine"), F.asc("vec_id"))
    bm = bm.withColumn("r_bm25", F.row_number().over(wb)).drop("bm25")
    cs = cs.withColumn("r_cos", F.row_number().over(wc)).drop("cosine")
    return (
        bm.join(cs, bm.doc_id == cs.vec_id, "full_outer")
        .selectExpr(
            "CAST(coalesce(doc_id, vec_id) AS BIGINT) AS doc_id",
            "CAST(r_bm25 AS INT) AS r_bm25",
            "CAST(r_cos AS INT) AS r_cos",
            "round(coalesce(CAST(1.0 AS DOUBLE) / (60 + r_bm25), 0)"
            " + coalesce(CAST(1.0 AS DOUBLE) / (60 + r_cos), 0), 6) AS rrf")
        .orderBy(F.desc("rrf"), F.asc("doc_id"))
    )


@query(
    "events_hot_users_report",
    oracle="""
    WITH per AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
                 FROM events GROUP BY user_id),
    tot AS (SELECT count(*) AS total_events FROM events)
    SELECT p.user_id, p.n_events,
           CAST(floor(p.n_events * 1e6 / t.total_events + 0.5) AS BIGINT)
             AS share_ppm
    FROM per p CROSS JOIN tot t
    ORDER BY p.n_events DESC, p.user_id
    LIMIT 20
    """,
)
def events_hot_users_report(spark, sf_dir):
    """Hot-key diagnostic: the 20 heaviest event producers with their
    integer-ppm share of total volume — the report an operator runs
    BEFORE picking a partition key or salting strategy (operators/
    skew.py holds the mitigations this report motivates). One
    map-side-combined per-user aggregation; the grand total is a
    ZERO-COLUMN count(*) scan (empty ReadSchema — parquet answers it
    from row-group metadata, no data pages), broadcast as one row; the
    top-20 is a TakeOrderedAndProject — no global sort, no window over
    raw events, and never a single-partition pass over the |users|-row
    aggregate."""
    events = read_table(spark, sf_dir, "events")
    per = events.groupBy("user_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_events"))
    tot = events.agg(F.count("*").alias("total_events"))
    return (
        per.crossJoin(F.broadcast(tot))
        .selectExpr(
            "user_id", "n_events",
            "CAST(floor(n_events * 1e6 / total_events + 0.5) AS BIGINT)"
            " AS share_ppm")
        .orderBy(F.desc("n_events"), F.asc("user_id"))
        .limit(20)
    )


SEMANTIC_CELLS_SAMPLE_MOD = 7
SEMANTIC_CELLS_INIT_LIMIT = 64


def _semantic_cells_oracle(modulus: int = 43, iters: int = 2,
                           threshold: float = 0.4) -> str:
    parts = ",\n    ".join(_ivf_cells_parts(
        modulus, iters,
        sample_mod=SEMANTIC_CELLS_SAMPLE_MOD,
        init_limit=SEMANTIC_CELLS_INIT_LIMIT))
    cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    return f"""
    WITH {parts},
    p AS (SELECT CAST(a.cell_id AS BIGINT) AS cell_id,
                 a.vec_id AS id_a, b.vec_id AS id_b, {cos} AS cosine
          FROM cells a JOIN cells b
            ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id)
    SELECT cell_id, id_a, id_b, cosine FROM p WHERE cosine >= {threshold}
    """


@query("dedup_semantic_cells", oracle=_semantic_cells_oracle())
def dedup_semantic_cells(spark, sf_dir):
    """SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs
    blocked by trained k-means cell — candidates share a cell (one
    cell_id equi-join), never the all-pairs cross join; every candidate
    verified against the true cosine. The oracle replays the sampled
    2-iteration training loop so assignment parity is checked
    end-to-end.

    Training is deliberately OUT of the query plan: the codebook is
    trained on a bounded deterministic sample (``vec_id % 7 = 0``,
    fixed-size smallest-id init) in its own small job, collected
    driver-side (<= 64 rows), and re-enters the dedup plan as an array
    LITERAL (similarity.codebook_literal_expr). The dedup plan itself
    is therefore scan -> per-row cell assignment -> one cell_id
    equi-join — exactly one corpus shuffle at any scale, instead of the
    4+ corpus-touching training stages an inline Lloyd loop would drag
    into every run."""
    emb = read_table(spark, sf_dir, "embeddings")
    sample = emb.where(f"vec_id % {SEMANTIC_CELLS_SAMPLE_MOD} = 0")
    cents = similarity.kmeans_codebook(
        sample, modulus=43, iters=2,
        init_limit=SEMANTIC_CELLS_INIT_LIMIT)
    codebook = similarity.codebook_literal_expr(cents.collect())
    cells = similarity.assign_cells_literal(emb, codebook)
    return similarity.cosine_pairs_within_cells(cells, threshold=0.4)


def _semantic_prune_oracle(threshold: float = 0.45) -> str:
    parts = ",\n    ".join(_ivf_cells_parts(
        43, 2,
        sample_mod=SEMANTIC_CELLS_SAMPLE_MOD,
        init_limit=SEMANTIC_CELLS_INIT_LIMIT))
    cos = (
        "round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[])"
        " / (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[]))"
        " * sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 6)"
    )
    return f"""
    WITH RECURSIVE {parts},
    p AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM cells a JOIN cells b
            ON a.cell_id = b.cell_id AND a.vec_id < b.vec_id
          WHERE {cos} >= {threshold}),
    edges AS (SELECT id_a AS a, id_b AS b FROM p
              UNION ALL SELECT id_b, id_a FROM p),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT e.vec_id,
           CAST(coalesce(c.component, e.vec_id) AS BIGINT) AS cluster_rep,
           coalesce(c.component, e.vec_id) = e.vec_id AS is_kept
    FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.node
    """


@query("dedup_semantic_prune", oracle=_semantic_prune_oracle())
def dedup_semantic_prune(spark, sf_dir):
    """SemDeDup pairs -> DECISIONS (Abbas et al. 2023 keep-one-per-
    epsilon-ball): the cell-blocked cosine pairs feed hash-to-min
    connected components, and every corpus vector gets (cluster_rep,
    is_kept) — the min-id representative of its transitive near-dup
    cluster survives, the rest drop, singletons keep themselves. This
    completes the pairs -> decisions story the exact-dedup path already
    has (dedup_cluster_components) for the semantic family.

    Scale shape: literal-codebook assignment (zero shuffle) + one
    cell_id pair shuffle + components over the PAIR graph only (tiny
    next to the corpus; each round shuffles labels, never vectors) +
    one final left join back to the corpus on vec_id. The oracle
    replays training, pairs, and a recursive reachability CTE, so even
    the iterative component loop is value-checked end-to-end."""
    emb = read_table(spark, sf_dir, "embeddings")
    sample = emb.where(f"vec_id % {SEMANTIC_CELLS_SAMPLE_MOD} = 0")
    cents = similarity.kmeans_codebook(
        sample, modulus=43, iters=2,
        init_limit=SEMANTIC_CELLS_INIT_LIMIT)
    codebook = similarity.codebook_literal_expr(cents.collect())
    cells = similarity.assign_cells_literal(emb, codebook)
    pairs = similarity.cosine_pairs_within_cells(cells, threshold=0.45)
    comp = dedup.connected_components(pairs, src="id_a", dst="id_b")
    return dedup.dedup_decisions(emb, comp, "vec_id")


@query(
    "events_rolling_weekly_counts",
    oracle="""
    WITH d AS (SELECT event_type,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2),
    o AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS day_ord
          FROM d)
    SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
           CAST(SUM(n_events) OVER (
             PARTITION BY event_type ORDER BY day_ord
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS BIGINT)
             AS rolling_7d
    FROM o
    """,
)
def events_rolling_weekly_counts(spark, sf_dir):
    """Rolling CALENDAR 7-day event volume per type — the aggregate-
    BEFORE-window scale pattern: the corpus collapses to
    |event_type x day| rows in one map-side-combined shuffle, and only
    that tiny daily table flows through the ordered window frame. This
    is the recipe the window_rank_breadth docstring points to for any
    low-cardinality partition window at 100 TB (never run an ordered
    window over raw corpus rows when the measure is aggregable).

    The frame is a RANGE over a day ordinal (days since epoch), so the
    window is calendar-bounded: days with zero events don't stretch the
    7-day span the way a ROWS frame over present-days-only would
    (ADVICE r4)."""
    events = read_table(spark, sf_dir, "events")
    daily = (
        events.selectExpr(
            "event_type", "CAST(date_trunc('DAY', ts) AS DATE) AS day")
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_events"))
        .withColumn("day_ord", F.expr("datediff(day, DATE '1970-01-01')"))
    )
    w = (Window.partitionBy("event_type").orderBy("day_ord")
         .rangeBetween(-6, Window.currentRow))
    return (
        daily.withColumn(
            "rolling_7d", F.sum("n_events").over(w).cast("bigint"))
        # STRING day: raw DATE outputs hit the pandas object-vs-
        # datetime64 trap in the driver's compare (NOTES dtype parity)
        .withColumn("day", F.col("day").cast("string"))
        .drop("day_ord")
    )


@query(
    "events_daily_gapfill",
    oracle="""
    WITH d AS (SELECT event_type,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2),
    b AS (SELECT event_type, min(day) AS d0, max(day) AS d1 FROM d
          GROUP BY event_type),
    cal AS (SELECT b.event_type, CAST(g.day AS DATE) AS day
            FROM b, UNNEST(generate_series(b.d0, b.d1, INTERVAL 1 DAY))
                 AS g(day)),
    f AS (SELECT c.event_type, c.day,
                 coalesce(d.n_events, 0) AS n_events
          FROM cal c LEFT JOIN d
            ON c.event_type = d.event_type AND c.day = d.day),
    w AS (SELECT *,
                 max(CASE WHEN n_events > 0 THEN day END) OVER (
                   PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_active
          FROM f)
    SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
           CAST(datediff('day', last_active, day) AS INT)
             AS days_since_active
    FROM w
    """,
)
def events_daily_gapfill(spark, sf_dir):
    """Calendar gap-filling with forward-fill — the hypertable
    time_bucket_gapfill staple: every (event_type, calendar day)
    between the type's first and last active day gets a row, absent
    days 0-filled, plus days_since_active (a forward-fill of the last
    day that had events). ONE corpus pass — see
    operators/timeseries.daily_gapfill for the plan shape
    (aggregate-before-window throughout)."""
    from oracle_cassandra_migrator_spark.operators.timeseries import (
        daily_gapfill)

    events = read_table(spark, sf_dir, "events")
    return daily_gapfill(events, "event_type", "ts")


@query(
    "text_vocab_coverage",
    oracle=f"""
    WITH c AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt
               FROM (SELECT unnest({WORDS_SQL}) AS tok FROM documents)
               GROUP BY tok),
    top AS (SELECT cnt FROM c ORDER BY cnt DESC, tok LIMIT 1000),
    agg AS (SELECT (SELECT CAST(sum(cnt) AS BIGINT) FROM c) AS n_mentions,
                   (SELECT CAST(count(*) AS BIGINT) FROM c) AS n_vocab,
                   (SELECT CAST(sum(cnt) AS BIGINT) FROM top)
                     AS n_top_mentions)
    SELECT n_mentions, n_vocab, n_top_mentions,
           CAST(floor(n_top_mentions * 1e6 / n_mentions + 0.5) AS BIGINT)
             AS coverage_ppm
    FROM agg
    """,
)
def text_vocab_coverage(spark, sf_dir):
    """Tokenizer-planning report: what share of all token mentions a
    top-1000 word vocabulary covers (the number that decides vocab
    size / OOV budget before training a tokenizer). The corpus is
    exploded and counted ONCE into the |vocab|-row counts table, which
    is persisted across its three consumers (top-k TakeOrdered, corpus
    totals, top sum) — same one-pass-many-consumers pattern as the
    MinHash shingle table; every post-counts step touches aggregated
    rows only. Top-1000 boundary ties break on (count desc, tok) — a
    total order both engines replay."""
    from pyspark import StorageLevel

    docs = read_table(spark, sf_dir, "documents")
    from oracle_cassandra_migrator_spark.operators.text import words_expr

    counts = (
        docs.select(F.explode(F.expr(words_expr("text"))).alias("tok"))
        .groupBy("tok")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("cnt"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    top = counts.orderBy(F.desc("cnt"), F.asc("tok")).limit(1000)
    stats = counts.agg(
        F.expr("CAST(sum(cnt) AS BIGINT)").alias("n_mentions"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_vocab"))
    cov = top.agg(
        F.expr("CAST(sum(cnt) AS BIGINT)").alias("n_top_mentions"))
    return (
        stats.crossJoin(F.broadcast(cov))
        .selectExpr(
            "n_mentions", "n_vocab", "n_top_mentions",
            "CAST(floor(n_top_mentions * 1e6 / n_mentions + 0.5)"
            " AS BIGINT) AS coverage_ppm")
    )


@query(
    "events_dau_wau_stickiness",
    oracle="""
    WITH ud AS (SELECT DISTINCT user_id,
                       CAST(date_trunc('day', ts) AS DATE) AS day
                FROM events),
    dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud
            GROUP BY day),
    cover AS (SELECT ud.user_id, CAST(g.d AS DATE) AS day
              FROM ud, UNNEST(generate_series(ud.day, ud.day + 6,
                                              INTERVAL 1 DAY)) AS g(d)),
    wau AS (SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS wau
            FROM cover GROUP BY day)
    SELECT CAST(d.day AS VARCHAR) AS day, d.dau, w.wau,
           CAST(floor(d.dau * 1e6 / w.wau + 0.5) AS BIGINT)
             AS stickiness_ppm
    FROM dau d JOIN wau w USING (day)
    """,
)
def events_dau_wau_stickiness(spark, sf_dir):
    """DAU / trailing-7-day WAU / stickiness per day — the product
    metric every event pipeline reports. Exact WAU without a
    distinct-over-window (which Spark cannot do) via the COVER-DAY
    trick: each (user, active day) row covers the 7 calendar days
    whose trailing window contains it, so WAU is a plain
    count(DISTINCT) per cover day. Shuffles: one user-day distinct,
    one 7x-fanned distinct — both on high-cardinality keys,
    map-side-combined; no ordered window anywhere. Days with no
    activity are absent from DAU and drop out of the join (gap-fill
    them with events_daily_gapfill if needed)."""
    events = read_table(spark, sf_dir, "events")
    ud = events.selectExpr(
        "user_id", "CAST(date_trunc('DAY', ts) AS DATE) AS day").distinct()
    dau = ud.groupBy("day").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("dau"))
    cover = ud.select(
        "user_id",
        F.explode(F.expr(
            "sequence(day, date_add(day, 6), interval 1 day)")).alias("day"))
    wau = cover.groupBy("day").agg(
        F.expr("CAST(count(DISTINCT user_id) AS BIGINT)").alias("wau"))
    return (
        dau.join(wau, "day")
        .selectExpr(
            "CAST(day AS STRING) AS day", "dau", "wau",
            "CAST(floor(dau * 1e6 / wau + 0.5) AS BIGINT)"
            " AS stickiness_ppm")
    )


def _jaccard_histogram_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    pairs = ORACLES["dedup_minhash_lsh"]
    return f"""
    WITH p AS (SELECT * FROM ({pairs}))
    SELECT CAST(floor(jaccard * 10) / 10 AS DOUBLE) AS jaccard_bin,
           CAST(count(*) AS BIGINT) AS n_pairs
    FROM p GROUP BY 1
    """


@query("dedup_jaccard_histogram", oracle=_jaccard_histogram_oracle())
def dedup_jaccard_histogram(spark, sf_dir):
    """Threshold-sweep table for near-dedup tuning: verified candidate
    pairs bucketed by Jaccard decile, so the cumulative tail answers
    "how many pairs would threshold t keep?" without re-running the
    pipeline per t. One tiny aggregation over the plan-gated MinHash
    pair list."""
    pairs = dedup_minhash_lsh(spark, sf_dir)
    return (
        pairs.groupBy(
            F.expr("CAST(floor(jaccard * 10) / 10 AS DOUBLE)")
            .alias("jaccard_bin"))
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_pairs"))
    )


@query(
    "join_interval_bucketed_prices",
    oracle="""
    WITH iv AS (SELECT p_size AS size_band,
                       min(p_retailprice) AS lo,
                       max(p_retailprice) AS hi,
                       CAST(count(*) AS BIGINT) AS n_parts
                FROM part GROUP BY p_size),
    j AS (SELECT iv.size_band, li.l_extendedprice AS price
          FROM lineitem li JOIN iv
            ON li.l_extendedprice >= iv.lo AND li.l_extendedprice <= iv.hi)
    SELECT size_band,
           CAST(count(*) AS BIGINT) AS n_items,
           round(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)
             AS total_price
    FROM j GROUP BY size_band
    """,
)
def join_interval_bucketed_prices(spark, sf_dir):
    """Interval (range) join via the bucket-grid equi-key rewrite
    (operators/intervals.py): lineitem prices join the per-p_size
    [min, max] retail-price bands they fall inside — arbitrary,
    overlapping intervals, so a row can match many bands. The naive
    plan is a BroadcastNestedLoopJoin that cannot scale past a small
    interval table; this plan explodes each interval into the fixed-
    width buckets it covers and HASH-joins on the bucket key, then
    exact-filters the bounds (plan-gated: no nested loop). The same
    rewrite the IVF/LSH cell joins use, applied to 1-D ranges."""
    from oracle_cassandra_migrator_spark.operators.intervals import (
        bucketed_interval_join)

    part = read_table(spark, sf_dir, "part")
    iv = part.groupBy(F.col("p_size").alias("size_band")).agg(
        F.min("p_retailprice").alias("lo"),
        F.max("p_retailprice").alias("hi"),
        F.expr("CAST(count(*) AS BIGINT)").alias("n_parts"))
    li = read_table(spark, sf_dir, "lineitem").select(
        F.col("l_extendedprice").alias("price"))
    joined = bucketed_interval_join(li, iv, "price", "lo", "hi", 100.0)
    return joined.groupBy("size_band").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_items"),
        F.expr("round(CAST(SUM(CAST(price AS DECIMAL(18,2))) AS DOUBLE), 2)")
        .alias("total_price"))


@query(
    "dedup_prefix_boilerplate",
    oracle=f"""
    WITH p AS (SELECT doc_id,
                      md5(array_to_string(({WORDS_SQL})[1:20], ' '))
                        AS prefix_fp
               FROM documents)
    SELECT prefix_fp,
           CAST(min(doc_id) AS BIGINT) AS representative_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM p GROUP BY prefix_fp HAVING count(*) > 1
    """,
)
def dedup_prefix_boilerplate(spark, sf_dir):
    """Boilerplate-header groups: docs opening with the same 20
    normalized words (cookie banners, license headers, scraper chrome)
    even when bodies differ — the curation signal whole-doc exact
    dedup misses. Per-row fingerprint + one hash groupBy, the same
    linear cost shape as dedup_exact_documents."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id",
            F.expr(prefix_fingerprint_expr("text", 20)).alias("prefix_fp"))
        .groupBy("prefix_fp")
        .agg(
            F.min("doc_id").cast("bigint").alias("representative_id"),
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"))
        .where("n_docs > 1")
    )


BIGRAM_SAMPLE_MOD = 11


@query(
    "text_bigram_logprob",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {NORM_SQL} AS s FROM documents),
    bg AS (SELECT doc_id,
                  unnest(list_transform(
                      generate_series(1, greatest(length(s) - 1, 0)),
                      i -> substring(s, i, 2))) AS bg
           FROM norm),
    model AS (SELECT bg, CAST(count(*) AS BIGINT) AS cnt
              FROM bg WHERE doc_id % {BIGRAM_SAMPLE_MOD} = 0 GROUP BY bg),
    tot AS (SELECT CAST(SUM(cnt) AS DOUBLE) AS total FROM model),
    micro AS (SELECT m.bg,
                     CAST(floor(ln(m.cnt / t.total) * 1e6 + 0.5) AS BIGINT)
                       AS mlp
              FROM model m CROSS JOIN tot t),
    agg AS (SELECT b.doc_id,
                   CAST(count(*) AS BIGINT) AS n_bigrams,
                   SUM(COALESCE(mi.mlp,
                       (SELECT CAST(floor(ln(0.5 / total) * 1e6 + 0.5)
                               AS BIGINT) FROM tot))) AS ssum
            FROM bg b LEFT JOIN micro mi USING (bg)
            GROUP BY b.doc_id)
    SELECT n.doc_id,
           COALESCE(a.n_bigrams, 0) AS n_bigrams,
           round(CAST(COALESCE(a.ssum, 0) AS DOUBLE) / 1e6
                 / greatest(COALESCE(a.n_bigrams, 0), 1), 6) AS avg_logprob
    FROM norm n LEFT JOIN agg a USING (doc_id)
    """,
)
def text_bigram_logprob(spark, sf_dir):
    """Char-bigram language-model score — the cheap perplexity-filter
    stand-in (low average log-prob flags gibberish / non-language
    text). The model trains on a bounded deterministic sample
    (doc_id % 11 = 0) in its own small job, collects driver-side
    (charset^2-bounded, <= ~900 bigrams) and re-enters the scoring
    plan as a map LITERAL; scoring is then entirely per-row — map
    lookups folded in exact integer micro-units (floor(x*1e6 + 0.5),
    order-free) — with ZERO shuffle. Unseen bigrams score at the
    half-count floor. Same train-out-of-plan pattern as the SemDeDup
    codebook literal."""
    docs = read_table(spark, sf_dir, "documents")
    rows, total = bigram_model(
        docs, "text", "doc_id", sample_mod=BIGRAM_SAMPLE_MOD)
    map_expr, floor_micro = bigram_logprob_map_expr(rows, total)
    return bigram_logprob_scores(docs, "text", "doc_id",
                                 map_expr, floor_micro)


@query(
    "text_feature_hashing",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS w FROM documents),
    hw AS (SELECT doc_id,
                  list_transform(w, x -> struct_pack(
                      idx := ('0x' || substring(md5(x), 1, 15))::BIGINT % 16,
                      sgn := CASE WHEN ('0x' || substring(md5(x), 16, 1))::BIGINT
                                       % 2 = 0 THEN 1 ELSE -1 END)) AS hw
           FROM w)
    SELECT doc_id,
           CAST(len(hw) AS BIGINT) AS n_words,
           array_to_string(list_transform(generate_series(0, 15), j ->
               CAST(len(list_filter(hw, h -> h.idx = j AND h.sgn = 1))
                    - len(list_filter(hw, h -> h.idx = j AND h.sgn = -1))
                 AS BIGINT)), ',') AS features
    FROM hw
    """,
)
def text_feature_hashing(spark, sf_dir):
    """Signed feature hashing (HashingTF with sign bits, Weinberger et
    al. 2009): every document becomes a fixed 16-dim signed-count
    vector from md5-derived (index, sign) per word — the classic
    fixed-width featurization for linear classifiers / quality models
    over unbounded vocabularies. Exact integers end to end (no float
    parity risk), strictly per-row, zero shuffle. The vector is
    emitted comma-joined (catalog convention for array outputs — see
    scalar_array_functions) so the driver's canonicalizer can sort
    it."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.expr(hashed_words_expr("text", 16)).alias("hw"))
        .selectExpr(
            "doc_id",
            "CAST(size(hw) AS BIGINT) AS n_words",
            f"array_join(transform({feature_vector_expr('hw', 16)},"
            " v -> CAST(v AS STRING)), ',') AS features")
    )


_QUALITY_WEIGHTS = [-8, -7, -6, -5, -4, -3, -2, -1, 0, 1, 2, 3, 4, 5, 6, 7]  # ((j * 2654435761) % 17) - 8 — fixed literal


@query(
    "text_quality_linear_score",
    oracle=f"""
    WITH w AS (SELECT doc_id, {WORDS_SQL} AS w FROM documents),
    hw AS (SELECT doc_id,
                  list_transform(w, x -> struct_pack(
                      idx := ('0x' || substring(md5(x), 1, 15))::BIGINT % 16,
                      sgn := CASE WHEN ('0x' || substring(md5(x), 16, 1))::BIGINT
                                       % 2 = 0 THEN 1 ELSE -1 END)) AS hw
           FROM w),
    fvt AS (SELECT doc_id, CAST(len(hw) AS BIGINT) AS n_words,
                  list_transform(generate_series(0, 15), j ->
                      CAST(len(list_filter(hw, h -> h.idx = j AND h.sgn = 1))
                           - len(list_filter(hw, h -> h.idx = j AND h.sgn = -1))
                        AS BIGINT)) AS fv
           FROM hw)
    SELECT doc_id, n_words,
           CAST((-8) * fv[1] + (-7) * fv[2] + (-6) * fv[3] + (-5) * fv[4] + (-4) * fv[5] + (-3) * fv[6] + (-2) * fv[7] + (-1) * fv[8] + (0) * fv[9] + (1) * fv[10] + (2) * fv[11] + (3) * fv[12] + (4) * fv[13] + (5) * fv[14] + (6) * fv[15] + (7) * fv[16] AS BIGINT) AS quality_score,
           ((-8) * fv[1] + (-7) * fv[2] + (-6) * fv[3] + (-5) * fv[4] + (-4) * fv[5] + (-3) * fv[6] + (-2) * fv[7] + (-1) * fv[8] + (0) * fv[9] + (1) * fv[10] + (2) * fv[11] + (3) * fv[12] + (4) * fv[13] + (5) * fv[14] + (6) * fv[15] + (7) * fv[16]) >= 0 AS is_quality
    FROM fvt
    """,
)
def text_quality_linear_score(spark, sf_dir):
    """Linear quality scorer over the signed-hash featurization — the
    downstream consumer that proves text_feature_hashing feeds a real
    model: score = <w, phi(doc)> with a FIXED literal int weight vector
    (a stand-in for trained fasttext-style quality weights; exact
    integers, so both engines agree bit-for-bit). Strictly per-row on
    top of the per-row featurizer: one scan, zero shuffle — at 100 TB
    this is the classifier pass of a quality-filter stage, trivially
    data-parallel."""
    docs = read_table(spark, sf_dir, "documents")
    return (
        docs.select(
            "doc_id", F.expr(hashed_words_expr("text", 16)).alias("hw"))
        .selectExpr(
            "doc_id",
            "CAST(size(hw) AS BIGINT) AS n_words",
            f"{feature_vector_expr('hw', 16)} AS fv")
        .selectExpr(
            "doc_id", "n_words",
            "CAST((-8) * element_at(fv, 1) + (-7) * element_at(fv, 2) + (-6) * element_at(fv, 3) + (-5) * element_at(fv, 4) + (-4) * element_at(fv, 5) + (-3) * element_at(fv, 6) + (-2) * element_at(fv, 7) + (-1) * element_at(fv, 8) + (0) * element_at(fv, 9) + (1) * element_at(fv, 10) + (2) * element_at(fv, 11) + (3) * element_at(fv, 12) + (4) * element_at(fv, 13) + (5) * element_at(fv, 14) + (6) * element_at(fv, 15) + (7) * element_at(fv, 16) AS BIGINT) AS quality_score",
            "((-8) * element_at(fv, 1) + (-7) * element_at(fv, 2) + (-6) * element_at(fv, 3) + (-5) * element_at(fv, 4) + (-4) * element_at(fv, 5) + (-3) * element_at(fv, 6) + (-2) * element_at(fv, 7) + (-1) * element_at(fv, 8) + (0) * element_at(fv, 9) + (1) * element_at(fv, 10) + (2) * element_at(fv, 11) + (3) * element_at(fv, 12) + (4) * element_at(fv, 13) + (5) * element_at(fv, 14) + (6) * element_at(fv, 15) + (7) * element_at(fv, 16)) >= 0 AS is_quality")
    )


@query(
    "corpus_mix_report",
    oracle=f"""
    WITH t AS (SELECT lang, source, n_chars, {_NTOK_SQL} AS ntok
               FROM documents),
    tot AS (SELECT SUM(ntok) AS corpus_tokens FROM t)
    SELECT COALESCE(lang, 'ALL') AS lang,
           COALESCE(source, 'ALL') AS source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ntok) AS BIGINT) AS total_tokens,
           round(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE)
                 / COUNT(*), 6) AS avg_chars,
           CAST(floor(SUM(ntok) * 1e6 / (SELECT corpus_tokens FROM tot)
                      + 0.5) AS BIGINT) AS token_ppm
    FROM t GROUP BY ROLLUP (lang, source)
    """,
)
def corpus_mix_report(spark, sf_dir):
    """Training-mix planning report: docs/tokens/avg-length per
    (lang, source) with rollup subtotals and each stratum's share of
    corpus tokens in integer ppm (floor(x + 0.5) — neither engine's
    round() builtin, which disagree on halves). One rollup aggregation
    over per-row token counts plus a broadcast 1-row corpus total —
    partial aggregation is map-side, so the shuffle carries only
    |lang x source| rows at any corpus size."""
    docs = read_table(spark, sf_dir, "documents").select(
        "lang", "source", "n_chars",
        F.expr(token_count_expr("text")).alias("ntok"))
    rolled = docs.rollup("lang", "source").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(SUM(ntok) AS BIGINT)").alias("total_tokens"),
        F.expr("round(CAST(SUM(CAST(n_chars AS DECIMAL(18,0))) AS DOUBLE)"
               " / COUNT(*), 6)").alias("avg_chars"),
    )
    total = docs.agg(F.sum("ntok").alias("corpus_tokens"))
    return (
        rolled.crossJoin(F.broadcast(total))
        .selectExpr(
            "COALESCE(lang, 'ALL') AS lang",
            "COALESCE(source, 'ALL') AS source",
            "n_docs", "total_tokens", "avg_chars",
            "CAST(floor(total_tokens * 1e6 / corpus_tokens + 0.5)"
            " AS BIGINT) AS token_ppm")
    )


# ---------------------------------------------------------------------------
# Two-pass global quantile bucketing (SCALE.md's ntile replacement)
# ---------------------------------------------------------------------------

_QUARTILE_DOCLEN_BOUNDS_SQL = "[quantile_disc(n_chars, 0.25), quantile_disc(n_chars, 0.5), quantile_disc(n_chars, 0.75)]"


@query(
    "quantile_bucket_doclen_by_lang",
    oracle=f"""
    WITH b AS (SELECT lang, {_QUARTILE_DOCLEN_BOUNDS_SQL} AS bounds
               FROM documents GROUP BY lang),
    a AS (SELECT d.lang, d.n_chars,
                 CAST(1 + len(list_filter(b.bounds, x -> d.n_chars > x))
                   AS INT) AS bucket
          FROM documents d JOIN b ON d.lang = b.lang)
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(n_chars) AS min_n_chars,
           MAX(n_chars) AS max_n_chars
    FROM a GROUP BY lang, bucket
    """,
)
def quantile_bucket_doclen_by_lang(spark, sf_dir):
    """Per-language document-length quartiles via the GROUPED two-pass
    quantile recipe: one boundary row per language (|langs| x 3 values
    — broadcast-sized at any corpus), map-side broadcast join + per-row
    bucket, then the (lang, bucket) profile. This is how a curation
    pipeline length-stratifies WITHIN each language without any global
    sort or per-language ordered window; swap exact=False for the
    approx_percentile sketch at 100 TB."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        grouped_bucket_profile)

    docs = read_table(spark, sf_dir, "documents").select("lang", "n_chars")
    return grouped_bucket_profile(docs, "n_chars", 4, "lang", exact=True)


_DECILE_PS = [i / 10 for i in range(1, 10)]
_DECILE_BOUNDS_SQL = (
    "[" + ", ".join(
        f"quantile_disc(l_extendedprice, {p})" for p in _DECILE_PS) + "]"
)


@query(
    "quantile_bucket_prices",
    oracle=f"""
    WITH b AS (SELECT {_DECILE_BOUNDS_SQL} AS bounds FROM lineitem),
    a AS (SELECT l_extendedprice AS price,
                 CAST(1 + len(list_filter((SELECT bounds FROM b),
                                          x -> l_extendedprice > x))
                   AS INT) AS bucket
          FROM lineitem)
    SELECT bucket,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           MIN(price) AS min_l_extendedprice,
           MAX(price) AS max_l_extendedprice
    FROM a GROUP BY bucket
    """,
)
def quantile_bucket_prices(spark, sf_dir):
    """Global decile bucketing of lineitem prices via the two-pass
    quantile recipe (operators/quantiles.py): exact percentile_disc
    boundaries collapse to ONE broadcast row, then every row gets its
    bucket map-side — no global sort, no single ordered reducer. This
    is the scale path that window_rank_breadth's ntile coverage query
    deliberately does not take; at 100 TB swap exact=False for the
    approx_percentile sketch (same plan shape). Ties land in the lower
    bucket (strict >), making assignment a pure value function both
    engines replay identically."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        quantile_bucket_profile)

    li = read_table(spark, sf_dir, "lineitem").select("l_extendedprice")
    return quantile_bucket_profile(li, "l_extendedprice", 10, exact=True)


def _curation_v2_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    prune = ORACLES["dedup_minhash_prune"]
    qual = ORACLES["text_quality_linear_score"]
    return f"""
    WITH pr AS (SELECT * FROM ({prune})),
    ql AS (SELECT * FROM ({qual})),
    b AS (SELECT lang,
                 quantile_disc(n_chars, 0.25) AS q1,
                 quantile_disc(n_chars, 0.75) AS q3
          FROM documents GROUP BY lang),
    j AS (SELECT d.doc_id, d.lang,
                 pr.is_kept AS dedup_ok,
                 ql.is_quality AS quality_ok,
                 d.n_chars > b.q1 AND d.n_chars <= b.q3 AS length_ok
          FROM documents d
          JOIN pr ON pr.doc_id = d.doc_id
          JOIN ql ON ql.doc_id = d.doc_id
          JOIN b ON b.lang = d.lang)
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(CASE WHEN dedup_ok AND quality_ok AND length_ok
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(sum(CASE WHEN NOT dedup_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flag_duplicate,
           CAST(sum(CASE WHEN NOT quality_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flag_quality,
           CAST(sum(CASE WHEN NOT length_ok THEN 1 ELSE 0 END) AS BIGINT)
             AS n_flag_length
    FROM j GROUP BY lang
    """


@query("pipeline_curation_v2", oracle=_curation_v2_oracle())
def pipeline_curation_v2(spark, sf_dir):
    """End-to-end curation decision report composing FOUR operator
    families in one plan: MinHash keep/drop decisions
    (dedup_minhash_prune), the linear quality scorer over hashed
    features (text_quality_linear_score), and per-language length
    gates at the grouped quartile boundaries (operators/quantiles) —
    per language, how many docs survive all three and how many each
    filter flags (flags are independent counts, not exclusive
    buckets). This is the report a training-data pipeline emits per
    crawl drop. Every stage keeps its own plan-gated scale shape; the
    composition adds doc_id equi-joins and a broadcast of the
    |langs|-row boundary table."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        grouped_quantile_boundaries)

    docs = read_table(spark, sf_dir, "documents")
    pr = dedup_minhash_prune(spark, sf_dir).select(
        "doc_id", F.col("is_kept").alias("dedup_ok"))
    ql = text_quality_linear_score(spark, sf_dir).select(
        "doc_id", F.col("is_quality").alias("quality_ok"))
    b = grouped_quantile_boundaries(
        docs.select("lang", "n_chars"), "n_chars", 4, "lang", exact=True
    ).selectExpr("lang", "bounds[0] AS q1", "bounds[2] AS q3")
    j = (
        docs.select("doc_id", "lang", "n_chars")
        .join(pr, "doc_id")
        .join(ql, "doc_id")
        .join(F.broadcast(b), "lang")
        .selectExpr(
            "lang", "dedup_ok", "quality_ok",
            "n_chars > q1 AND n_chars <= q3 AS length_ok")
    )
    return j.groupBy("lang").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_docs"),
        F.expr("CAST(sum(CASE WHEN dedup_ok AND quality_ok AND length_ok"
               " THEN 1 ELSE 0 END) AS BIGINT)").alias("n_kept"),
        F.expr("CAST(sum(CASE WHEN NOT dedup_ok THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_flag_duplicate"),
        F.expr("CAST(sum(CASE WHEN NOT quality_ok THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_flag_quality"),
        F.expr("CAST(sum(CASE WHEN NOT length_ok THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_flag_length"),
    )


# ---------------------------------------------------------------------------
# Round-5 continuation: skew-safe salted JOIN, span-level dedup (C4-style),
# PageRank over the nation trade graph, product-quantization ANN.
# ---------------------------------------------------------------------------

@query(
    "skew_salted_join_supplier_revenue",
    oracle=f"""
    SELECT n.n_name AS nation,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM lineitem l
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def skew_salted_join_supplier_revenue(spark, sf_dir):
    """Skew-safe JOIN via small-side replication: lineitem keyed by
    l_suppkey is the classic hot-key join (few suppliers, each with a
    large share of the fact table), so the supplier dimension is
    exploded across 8 salt values and the fact side scatters by a
    uniform hash — each hot supplier's rows spread over 8 tasks
    instead of pinning one. Result provably identical to the plain
    join (each fact row carries exactly one salt; operators/skew.py);
    the oracle IS the plain join + groupBy."""
    from oracle_cassandra_migrator_spark.operators.skew import (
        salted_broadcast_join,
    )

    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "l_suppkey", "l_extendedprice", "l_discount")
    supp = read_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation").selectExpr(
        "n_nationkey", "n_name")
    dim = supp.join(
        F.broadcast(nat), supp["s_nationkey"] == nat["n_nationkey"]
    ).selectExpr("s_suppkey", "n_name AS nation")
    j = salted_broadcast_join(li, dim, "l_suppkey", "s_suppkey", n_salts=8)
    return j.groupBy("nation").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
        F.expr(
            "CAST(SUM(CAST(l_extendedprice * (1 - l_discount)"
            " AS DECIMAL(18,4))) AS DOUBLE)").alias("revenue"),
    )


@query(
    "dedup_duplicate_segments",
    oracle=f"""
    WITH w AS (SELECT doc_id, {FAST_WORDS_SQL} AS words FROM documents),
    seg AS (SELECT DISTINCT doc_id,
                   md5(array_to_string(words[(i-1)*10 + 1 : i*10], ' ')) AS seg
            FROM w, UNNEST(generate_series(1,
                   CAST(floor(len(words) / 10) AS BIGINT))) AS t(i)),
    cnt AS (SELECT seg, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM seg GROUP BY seg)
    SELECT s.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_segments,
           CAST(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_dup_segments,
           CAST(floor(SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) * 1e6
                      / COUNT(*) + 0.5) AS BIGINT) AS dup_ppm
    FROM seg s JOIN cnt c USING (seg)
    GROUP BY s.doc_id
    """,
)
def dedup_duplicate_segments(spark, sf_dir):
    """Span-level dedup signal (the C4/CCNet recipe applied at segment
    granularity): chop each document into consecutive 10-word windows,
    fingerprint each window, and report per document how many of its
    segments appear in at least one OTHER place in the corpus — the
    boilerplate-share metric that whole-document dedup misses (shared
    cookie banners, license headers, template chrome).

    Scale shape: one per-row segmentation (whole-stage-codegen'd
    expressions, the lambda-bound words trick from operators/text.py),
    one explode to row-shaped (doc_id, seg_hash) pairs, one groupBy on
    the 32-char hash (map-side partials), one equi-join back — the
    standard inverted-index topology; nothing quadratic, no arrays in
    any shuffle. Docs shorter than 10 words have no segments and drop
    out (sequence(1, 0) is DESCENDING in Spark — the CASE guard is
    load-bearing, see NOTES.md)."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr,
    )

    segs = (
        "element_at(transform(array(" + fast_words_expr("text") + "), w -> "
        "CASE WHEN size(w) >= 10 THEN "
        "array_distinct(transform(sequence(1, CAST(floor(size(w) / 10) AS INT)), "
        "i -> md5(concat_ws(' ', slice(w, (i - 1) * 10 + 1, 10))))) "
        "ELSE CAST(array() AS ARRAY<STRING>) END), 1)"
    )
    docs = read_table(spark, sf_dir, "documents")
    pairs = docs.select(
        "doc_id", F.explode(F.expr(segs)).alias("seg"))
    cnt = pairs.groupBy("seg").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"))
    return (
        pairs.join(cnt, "seg")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_segments"),
            F.expr("CAST(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)"
                   " AS BIGINT)").alias("n_dup_segments"),
            F.expr("CAST(floor(SUM(CASE WHEN n_docs >= 2 THEN 1 ELSE 0 END)"
                   " * 1e6 / COUNT(*) + 0.5) AS BIGINT)").alias("dup_ppm"),
        )
    )


_PAGERANK_EDGES_SQL = """SELECT cn.n_name AS src, sn.n_name AS dst,
           CAST(COUNT(*) AS BIGINT) AS w
    FROM orders o
    JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation cn ON c.c_nationkey = cn.n_nationkey
    JOIN nation sn ON s.s_nationkey = sn.n_nationkey
    GROUP BY cn.n_name, sn.n_name"""


def _pagerank_nations_oracle() -> str:
    from oracle_cassandra_migrator_spark.operators.graph import (
        pagerank_oracle_sql,
    )

    return pagerank_oracle_sql(
        _PAGERANK_EDGES_SQL,
        "SELECT n_name AS node FROM nation",
        iters=3, n_nodes_literal=25)


@query("graph_pagerank_nations", oracle=_pagerank_nations_oracle())
def graph_pagerank_nations(spark, sf_dir):
    """Weighted PageRank over the nation-level trade graph (edge
    customer-nation -> supplier-nation, weight = lineitem count) for
    3 fixed iterations — the iterative-graph-op counterpart to
    dedup_cluster_components, SQL-replayed end-to-end by unrolled
    CTEs in the oracle (operators/graph.py).

    Scale shape: the edge build is the usual fact-table join with all
    four dimensions broadcast, collapsing to a |nations|^2-row edge
    table; each PageRank round is one edge-keyed aggregation with the
    25-row rank state broadcast into the join — the per-iteration cost
    at 100 TB is bounded by the edge table, never the rank state."""
    from oracle_cassandra_migrator_spark.operators.graph import pagerank

    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_custkey")
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_suppkey")
    cust = read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey")
    supp = read_table(spark, sf_dir, "supplier").selectExpr(
        "s_suppkey", "s_nationkey")
    nat = read_table(spark, sf_dir, "nation")
    cn = nat.selectExpr("n_nationkey AS ck", "n_name AS src")
    sn = nat.selectExpr("n_nationkey AS sk", "n_name AS dst")
    edges = (
        orders.join(li, orders["o_orderkey"] == li["l_orderkey"])
        .join(F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(supp), li["l_suppkey"] == supp["s_suppkey"])
        .join(F.broadcast(cn), cust["c_nationkey"] == cn["ck"])
        .join(F.broadcast(sn), supp["s_nationkey"] == sn["sk"])
        .groupBy("src", "dst")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("w"))
    )
    nodes = nat.selectExpr("n_name AS node")
    return pagerank(edges, nodes, iters=3)


PQ_N_SUB = 4
PQ_SUB_DIM = 16
# training runs on the vec_id % 7 sample (train-out-of-plan: the Lloyd
# passes must not scan the corpus); init = sample AND % 4 (= % 28),
# capped at 16 centroids per subspace (the smallest SF has 18 init
# candidates). r6 raised 8->16 centroids and 1->2 Lloyd iterations for
# recall headroom (VERDICT r5 #4): recall@10 at sf0.01 measured
# 200000 ppm before the change — the after number is pinned in
# test_round6_semantics.py; serving-plan shape is unchanged (codebooks
# are literals, the lockfile proves no new exchanges).
PQ_MODULUS = 4
PQ_ITERS = 2
PQ_INIT_LIMIT = 16
PQ_SAMPLE_MOD = 7


def _pq_subspace_parts() -> list[str]:
    """CTE parts shared verbatim by the PQ and IVF+PQ oracles: per
    subspace the sliced view, the sampled-Lloyd replay, and the
    per-vector ADC term p{s}_d; then the joined pq_scores CTE. A
    one-sided edit to the PQ encode/ADC replay is impossible — both
    oracles read this single source (requires a ``qrow`` CTE in
    scope)."""
    parts = []
    d_names = []
    for s in range(PQ_N_SUB):
        off = s * PQ_SUB_DIM + 1
        hi = off + PQ_SUB_DIM - 1
        parts.append(
            f"pq_sub{s} AS (SELECT vec_id, embedding[{off}:{hi}]"
            f" AS embedding FROM embeddings)")
        parts += _ivf_cells_parts(
            PQ_MODULUS, PQ_ITERS, init_limit=PQ_INIT_LIMIT,
            sample_mod=PQ_SAMPLE_MOD,
            src=f"pq_sub{s}", prefix=f"p{s}_")
        parts.append(
            f"p{s}_d AS (SELECT c.vec_id,"
            f" round(list_dot_product(qr.q[{off}:{hi}]::DOUBLE[], b.cvec), 6)"
            f" AS d FROM p{s}_cells c"
            f" JOIN p{s}_cents{PQ_ITERS} b ON c.cell_id = b.cid"
            f" CROSS JOIN qrow qr)")
        d_names.append(f"p{s}_d")
    joins = d_names[0] + " d0"
    for i in range(1, PQ_N_SUB):
        joins += f" JOIN {d_names[i]} d{i} USING (vec_id)"
    score = " + ".join(f"d{i}.d" for i in range(PQ_N_SUB))
    parts.append(
        f"pq_scores AS (SELECT d0.vec_id, round({score}, 6) AS pq_score"
        f" FROM {joins})")
    return parts


_PQ_COSINE_SQL = (
    "round(list_dot_product(e.embedding::DOUBLE[], qr.q::DOUBLE[])"
    " / (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[]))"
    " * sqrt(list_dot_product(qr.q::DOUBLE[], qr.q::DOUBLE[]))), 6)"
)


def _pq_oracle(k: int = 10, query_id: int = 0) -> str:
    """Replay PQ end-to-end: per-subspace sampled Lloyd training
    (_ivf_cells_parts once per subspace over a sliced view), encode =
    the per-subspace cell assignment, ADC estimate = sum of
    dot(query-sub, centroid-of-code), exact cosine alongside."""
    parts = [
        f"qrow AS (SELECT embedding AS q FROM embeddings"
        f" WHERE vec_id = {query_id})"]
    parts += _pq_subspace_parts()
    cos = _PQ_COSINE_SQL
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT s.vec_id, s.pq_score, {cos} AS cosine
    FROM pq_scores s JOIN embeddings e ON s.vec_id = e.vec_id
    CROSS JOIN qrow qr
    WHERE s.vec_id <> {query_id}
    ORDER BY s.pq_score DESC, s.vec_id
    LIMIT {k}
    """


@query("sim_ann_pq_topk", oracle=_pq_oracle())
def sim_ann_pq_topk(spark, sf_dir):
    """Product-quantization ANN (Jegou et al. 2011, MIPS flavor): the
    64-dim vector splits into 4x 16-dim subspaces, each quantized by
    its own sampled-Lloyd codebook (<= 16 centroids); a corpus vector
    compresses to 4 small codes and the query affinity is estimated as
    the sum of per-subspace dot(query-sub, centroid-of-code) — the
    asymmetric-distance trick that scans compressed codes instead of
    raw vectors. Exact cosine rides along per returned row so the
    estimation error is visible. Completes the ANN family:
    sign-LSH buckets, IVF cells (single/multi-probe/trained), and now
    code-compressed PQ.

    Training is the bounded train-out-of-plan pattern (4 driver-side
    codebooks, <= 16 rows each, re-entering as literals); the serving
    plan is scan -> per-row encode/estimate -> TakeOrderedAndProject —
    zero corpus shuffles (plan-gated). The oracle replays all four
    training loops and the ADC estimate end-to-end."""
    emb = read_table(spark, sf_dir, "embeddings")
    books = similarity.pq_train_codebooks(
        emb, n_sub=PQ_N_SUB, sub_dim=PQ_SUB_DIM, modulus=PQ_MODULUS,
        iters=PQ_ITERS, init_limit=PQ_INIT_LIMIT,
        sample_mod=PQ_SAMPLE_MOD)
    return similarity.pq_topk(
        emb, books, sub_dim=PQ_SUB_DIM, k=10, query_id=0)


def _pq_recall_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    bf = ORACLES["sim_topk_bruteforce"]
    pq = _pq_oracle()
    return f"""
    WITH bf AS (SELECT vec_id FROM ({bf})),
    pq AS (SELECT vec_id FROM ({pq}))
    SELECT CAST(count(*) AS BIGINT) AS n_hits, 10 AS k,
           CAST(floor(count(*) * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm
    FROM bf JOIN pq USING (vec_id)
    """


@query("sim_ann_pq_recall", oracle=_pq_recall_oracle())
def sim_ann_pq_recall(spark, sf_dir):
    """Recall@10 of the PQ retriever against the exact brute-force
    top-10 — the third row of the ANN quality story (IVF single-probe
    and multi-probe audits exist); one <= 10-row join per arm."""
    bf = sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    pq = sim_ann_pq_topk(spark, sf_dir).select("vec_id")
    return bf.join(pq, "vec_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_hits")
    ).selectExpr(
        "n_hits", "10 AS k",
        "CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm")


@query(
    "udaf_trimmed_mean_price",
    oracle="""
    WITH c AS (SELECT o_orderstatus AS order_status,
                      CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
               FROM orders),
    r AS (SELECT order_status, cents,
                 row_number() OVER (PARTITION BY order_status
                                    ORDER BY cents) AS rn,
                 COUNT(*) OVER (PARTITION BY order_status) AS n
          FROM c)
    SELECT order_status,
           CAST(COUNT(*) AS BIGINT) AS n_kept,
           round(CAST(SUM(cents) AS DOUBLE) / COUNT(*) / 100, 6)
             AS trimmed_mean
    FROM r
    WHERE rn > CAST(floor(n / 10) AS BIGINT)
      AND rn <= n - CAST(floor(n / 10) AS BIGINT)
    GROUP BY order_status
    """,
)
def udaf_trimmed_mean_price(spark, sf_dir):
    """The UDAF surface (SURVEY.md §2.10's missing quadrant): a
    GROUPED_AGG pandas_udf — a Series -> scalar aggregate usable
    inside groupBy().agg() alongside built-ins — computing the
    10%-trimmed mean order price per status. Order statistics aren't
    decomposable, so this is genuinely beyond built-in SUM/AVG
    composition; the oracle replays the trim via row_number trimming.
    Exactness: prices become integer cents before the UDAF (exact
    int64 sum; one float division; trim-by-value means tie choice
    can't change the kept multiset)."""
    from oracle_cassandra_migrator_spark.operators.udfs import (
        trimmed_mean_cents,
    )

    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderstatus AS order_status",
        "CAST(floor(o_totalprice * 100 + 0.5d) AS BIGINT) AS cents")
    # Spark disallows mixing a GROUPED_AGG pandas UDF with non-pandas
    # aggregates in one agg() (INVALID_PANDAS_UDF_PLACEMENT) — the
    # group count comes from its own aggregation, joined back over the
    # |statuses|-row results.
    tm = orders.groupBy("order_status").agg(
        trimmed_mean_cents("cents").alias("tm"))
    n = orders.groupBy("order_status").agg(F.expr("COUNT(*)").alias("n"))
    return (
        tm.join(n, "order_status")
        .selectExpr(
            "order_status",
            "CAST(n - 2 * CAST(floor(n / 10) AS BIGINT) AS BIGINT) AS n_kept",
            "round(tm, 6) AS trimmed_mean")
    )


@query(
    "embedding_dim_stats",
    oracle="""
    WITH ex AS (SELECT CAST(t.i AS INT) AS dim_idx,
                       CAST(embedding[t.i] AS DOUBLE) AS x
                FROM embeddings,
                     UNNEST(generate_series(1, len(embedding))) AS t(i))
    SELECT dim_idx,
           CAST(COUNT(*) AS BIGINT) AS n_vals,
           round(CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)
                 / COUNT(*), 6) AS mean_val,
           round(CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE) / COUNT(*)
                 - (CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*))
                 * (CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)),
                 6) AS var_val,
           round(MIN(x), 6) AS min_val,
           round(MAX(x), 6) AS max_val
    FROM ex GROUP BY dim_idx
    """,
)
def embedding_dim_stats(spark, sf_dir):
    """Per-dimension profile of the embedding corpus (count, mean,
    variance, min/max per coordinate) — the drift/normalization check
    run before training quantizers or projections on an embedding
    table; completes the profiler family (profile_documents_table)
    for the vector column.

    Scale shape: one posexplode to (dim, x) rows — a 64x row
    multiplication of narrow rows, aggregated map-side to |dims|
    partials per partition before the one |dims|-row exchange; exact
    decimal sums make the moments partition-order-independent."""
    emb = read_table(spark, sf_dir, "embeddings")
    ex = emb.select(
        F.posexplode(F.expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .alias("pos", "x")
    ).selectExpr("CAST(pos + 1 AS INT) AS dim_idx", "x")
    return ex.groupBy("dim_idx").agg(
        F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_vals"),
        F.expr("round(CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)"
               " / COUNT(*), 6)").alias("mean_val"),
        F.expr(
            "round(CAST(SUM(CAST(x * x AS DECIMAL(27,12))) AS DOUBLE)"
            " / COUNT(*)"
            " - (CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*))"
            " * (CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE) / COUNT(*)),"
            " 6)").alias("var_val"),
        F.expr("round(MIN(x), 6)").alias("min_val"),
        F.expr("round(MAX(x), 6)").alias("max_val"),
    )


def _lang_confusion_oracle() -> str:
    from oracle_cassandra_migrator_spark.queries.registry import ORACLES

    return f"""
    WITH g AS ({ORACLES["text_lang_guess"]})
    SELECT labeled_lang, guessed_lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(floor(COUNT(*) * 1e6
                      / SUM(COUNT(*)) OVER (PARTITION BY labeled_lang)
                      + 0.5) AS BIGINT) AS row_share_ppm
    FROM g GROUP BY labeled_lang, guessed_lang
    """


@query("text_lang_confusion", oracle=_lang_confusion_oracle())
def text_lang_confusion(spark, sf_dir):
    """Confusion matrix of the stopword language-ID heuristic against
    the labeled lang column — the evaluation table a curation team
    reads before trusting an auto-labeler (per true language, where do
    its documents get routed, as counts and row-share ppm). The
    window-over-aggregate shape: shares are computed over the
    |langs|^2-row grouped result, never the corpus."""
    g = text_lang_guess(spark, sf_dir)
    return (
        g.groupBy("labeled_lang", "guessed_lang")
        .agg(F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_docs"))
        .withColumn(
            "row_share_ppm",
            F.expr("CAST(floor(n_docs * 1e6 / SUM(n_docs) OVER"
                   " (PARTITION BY labeled_lang) + 0.5) AS BIGINT)"))
    )


@query(
    "text_trigram_novelty",
    oracle=f"""
    WITH norm AS (SELECT doc_id, {FAST_WORDS_SQL} AS w FROM documents),
    sh AS (SELECT doc_id, {SHINGLES3_SQL} AS shingles FROM norm),
    ex AS (SELECT doc_id, md5(s) AS h
           FROM (SELECT doc_id, UNNEST(shingles) AS s FROM sh)),
    firsts AS (SELECT h, min(doc_id) AS first_doc FROM ex GROUP BY h)
    SELECT e.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_trigrams,
           CAST(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                AS BIGINT) AS n_novel,
           CAST(floor(SUM(CASE WHEN f.first_doc = e.doc_id THEN 1 ELSE 0 END)
                      * 1e6 / COUNT(*) + 0.5) AS BIGINT) AS novelty_ppm
    FROM ex e JOIN firsts f ON e.h = f.h
    GROUP BY e.doc_id
    """,
)
def text_trigram_novelty(spark, sf_dir):
    """Crawl-order novelty: per document, the share of its distinct
    trigrams never seen in any lower-id document — the freshness
    signal a curation pipeline uses to down-weight late near-copies
    and detect a crawl that has stopped finding new content (novelty
    decays toward the boilerplate floor).

    Scale shape: shingles explode to (doc_id, md5) rows — 32-char
    hashes, never shingle strings/arrays, cross the exchanges — one
    min-aggregation per trigram (map-side partials), one equi-join
    back, one per-doc aggregation: the inverted-index topology shared
    with dedup_duplicate_segments."""
    from oracle_cassandra_migrator_spark.operators.text import with_shingles

    docs = read_table(spark, sf_dir, "documents")
    ex = (
        with_shingles(docs.select("doc_id", "text"), "text", 3)
        .select("doc_id", F.explode("shingles").alias("s"))
        .selectExpr("doc_id", "md5(s) AS h")
    )
    firsts = ex.groupBy("h").agg(F.min("doc_id").alias("first_doc"))
    return (
        ex.join(firsts, "h")
        .groupBy("doc_id")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_trigrams"),
            F.expr("CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END)"
                   " AS BIGINT)").alias("n_novel"),
            F.expr("CAST(floor(SUM(CASE WHEN first_doc = doc_id THEN 1"
                   " ELSE 0 END) * 1e6 / COUNT(*) + 0.5) AS BIGINT)")
            .alias("novelty_ppm"),
        )
    )


@query(
    "events_anomaly_zscore",
    oracle="""
    WITH d AS (SELECT event_type,
                      CAST(date_trunc('day', ts) AS DATE) AS day,
                      CAST(count(*) AS BIGINT) AS n_events
               FROM events GROUP BY 1, 2),
    o AS (SELECT *, datediff('day', DATE '1970-01-01', day) AS day_ord
          FROM d),
    w AS (SELECT event_type, day, n_events,
                 COUNT(n_events) OVER win AS cnt,
                 SUM(n_events) OVER win AS s1,
                 SUM(n_events * n_events) OVER win AS s2
          FROM o
          WINDOW win AS (PARTITION BY event_type ORDER BY day_ord
                         RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING))
    SELECT event_type, CAST(day AS VARCHAR) AS day, n_events,
           CASE WHEN cnt > 0
                THEN round(CAST(s1 AS DOUBLE) / cnt, 6) END AS mean7,
           CASE WHEN cnt >= 3
                 AND CAST(s2 AS DOUBLE) / cnt
                     - (CAST(s1 AS DOUBLE) / cnt)
                     * (CAST(s1 AS DOUBLE) / cnt) > 0
                THEN round((n_events - CAST(s1 AS DOUBLE) / cnt)
                           / sqrt(CAST(s2 AS DOUBLE) / cnt
                                  - (CAST(s1 AS DOUBLE) / cnt)
                                  * (CAST(s1 AS DOUBLE) / cnt)), 6)
                END AS zscore,
           coalesce(abs(CASE WHEN cnt >= 3
                 AND CAST(s2 AS DOUBLE) / cnt
                     - (CAST(s1 AS DOUBLE) / cnt)
                     * (CAST(s1 AS DOUBLE) / cnt) > 0
                THEN round((n_events - CAST(s1 AS DOUBLE) / cnt)
                           / sqrt(CAST(s2 AS DOUBLE) / cnt
                                  - (CAST(s1 AS DOUBLE) / cnt)
                                  * (CAST(s1 AS DOUBLE) / cnt)), 6)
                END) > 2.0, FALSE) AS is_anomaly
    FROM w
    """,
)
def events_anomaly_zscore(spark, sf_dir):
    """Daily volume anomaly detection per event type: z-score of each
    day's count against the trailing calendar week (RANGE 7..1
    PRECEDING over a day ordinal, so quiet days shrink the baseline
    instead of stretching it), flagged at |z| > 2 — the freshness/
    pipeline-health monitor over an event stream.

    Scale shape: aggregate-BEFORE-window again — the corpus collapses
    to |type x day| rows first; the window carries exact integer
    moments (sum, sum of squares of BIGINT counts), so mean/variance
    are partition-order-independent and the oracle matches
    bit-for-bit. Days with under 3 trailing observations or zero
    variance yield NULL z (no flag)."""
    events = read_table(spark, sf_dir, "events")
    daily = (
        events.selectExpr(
            "event_type", "CAST(date_trunc('DAY', ts) AS DATE) AS day")
        .groupBy("event_type", "day")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_events"))
        .withColumn("day_ord", F.expr("datediff(day, DATE '1970-01-01')"))
    )
    w = (Window.partitionBy("event_type").orderBy("day_ord")
         .rangeBetween(-7, -1))
    mean = "CAST(s1 AS DOUBLE) / cnt"
    var = f"CAST(s2 AS DOUBLE) / cnt - ({mean}) * ({mean})"
    z = (f"CASE WHEN cnt >= 3 AND {var} > 0 THEN "
         f"round((n_events - {mean}) / sqrt({var}), 6) END")
    return (
        daily
        .withColumn("cnt", F.count("n_events").over(w))
        .withColumn("s1", F.sum("n_events").over(w))
        .withColumn("s2", F.sum(F.expr("n_events * n_events")).over(w))
        .selectExpr(
            "event_type", "CAST(day AS STRING) AS day", "n_events",
            f"CASE WHEN cnt > 0 THEN round({mean}, 6) END AS mean7",
            f"{z} AS zscore",
            f"coalesce(abs({z}) > 2.0, FALSE) AS is_anomaly")
    )


@query(
    "join_shuffle_hash_hint",
    oracle=f"""
    SELECT o.o_orderpriority AS order_priority,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           {dsum('l.l_extendedprice', 'total_price')}
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def join_shuffle_hash_hint(spark, sf_dir):
    """Explicit join-strategy control: the lineitem-orders equi-join is
    forced to a shuffled hash join via the SHUFFLE_HASH hint (plan-
    gated) instead of the default sort-merge. When one side fits a
    per-partition hash table but not a broadcast — the classic
    fact-to-large-dim shape at 100 TB — hash beats merge by skipping
    both sort passes; AQE can pick this conversion itself, and the hint
    is the deterministic override an engine user reaches for. Same
    rows either way: the oracle is the plain join."""
    li = read_table(spark, sf_dir, "lineitem").selectExpr(
        "l_orderkey", "l_extendedprice")
    orders = read_table(spark, sf_dir, "orders").selectExpr(
        "o_orderkey", "o_orderpriority AS order_priority")
    return (
        li.join(orders.hint("SHUFFLE_HASH"),
                li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("order_priority")
        .agg(
            F.expr("CAST(COUNT(*) AS BIGINT)").alias("n_items"),
            F.expr("CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)))"
                   " AS DOUBLE)").alias("total_price"),
        )
    )


@query(
    "agg_hll_sketch_rollup",
    oracle="""
    SELECT n.n_regionkey AS region_key,
           CAST(COUNT(DISTINCT c.c_custkey) AS BIGINT) AS exact_customers,
           TRUE AS estimate_ok
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_regionkey
    """,
)
def agg_hll_sketch_rollup(spark, sf_dir):
    """MERGEABLE distinct-count sketches — the architecture that makes
    hierarchical distinct counting linear at 100 TB: build one
    DataSketches HLL per (region, nation) partial, then roll up to
    region by sketch UNION (hll_union_agg) instead of re-scanning raw
    keys. Exactness contract per the agg_approx_count_distinct
    convention: sketch bytes differ across engines, so the compared
    columns are the exact count (customers are disjoint across
    nations, so the per-nation exact distincts SUM to the region
    exact) and ``estimate_ok`` — the union-sketch estimate within 5%
    of truth. If merging ever corrupted the sketch the boolean flips
    and the driver hash fails."""
    cust = read_table(spark, sf_dir, "customer").selectExpr(
        "c_custkey", "c_nationkey")
    nat = read_table(spark, sf_dir, "nation").selectExpr(
        "n_nationkey", "n_regionkey")
    base = cust.join(F.broadcast(nat),
                     cust["c_nationkey"] == nat["n_nationkey"])
    per_nation = base.groupBy("n_regionkey", "c_nationkey").agg(
        F.expr("hll_sketch_agg(c_custkey)").alias("sk"),
        F.expr("COUNT(DISTINCT c_custkey)").alias("n_exact"))
    return (
        per_nation.groupBy("n_regionkey")
        .agg(
            F.expr("hll_sketch_estimate(hll_union_agg(sk))").alias("est"),
            F.expr("SUM(n_exact)").alias("exact_customers"))
        .selectExpr(
            "n_regionkey AS region_key",
            "CAST(exact_customers AS BIGINT) AS exact_customers",
            "abs(est - exact_customers) <= 0.05 * exact_customers"
            " AS estimate_ok")
    )


_LATERAL_TOP2_SQL = """
    SELECT c.c_custkey AS customer_id, t.o_orderkey AS order_key,
           t.o_totalprice AS total_price
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
"""


@query("lateral_subquery_top_orders", oracle=_LATERAL_TOP2_SQL)
def lateral_subquery_top_orders(spark, sf_dir):
    """Correlated LATERAL subquery (SQL:1999 lateral derived table,
    Spark >= 3.2): each customer's top-2 orders by price via a
    per-row subquery with its own ORDER BY ... LIMIT — the remaining
    lateral shape after LATERAL VIEW explode
    (lateral_explode_tokens). ONE SQL text runs on both engines.
    Catalyst rewrites the correlation into a ranked join rather than
    executing N subqueries; the equivalent windowed top-k
    (window_rank_top_orders) is the explicit form of the same plan."""
    for t in ("customer", "orders"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_LATERAL_TOP2_SQL)


def _zorder_oracle(bits: int = 8) -> str:
    terms = []
    for j, (col, lo, hi) in enumerate(
            (("o_custkey", "lo0", "hi0"), ("o_totalprice", "lo1", "hi1"))):
        scaled = (f"CAST(least(greatest(floor((CAST({col} AS DOUBLE) - {lo})"
                  f" / ({hi} - {lo}) * {2 ** bits}), 0), {2 ** bits - 1})"
                  f" AS BIGINT)")
        for i in range(bits):
            terms.append(f"((({scaled} >> {i}) & 1) << {i * 2 + j})")
    z = " + ".join(terms)
    return f"""
    WITH b AS (SELECT CAST(min(o_custkey) AS DOUBLE) AS lo0,
                      CAST(max(o_custkey) AS DOUBLE) AS hi0,
                      CAST(min(o_totalprice) AS DOUBLE) AS lo1,
                      CAST(max(o_totalprice) AS DOUBLE) AS hi1
               FROM orders)
    SELECT o_orderkey, CAST({z} AS BIGINT) AS zval
    FROM orders CROSS JOIN b
    """


@query("layout_zorder_values", oracle=_zorder_oracle())
def layout_zorder_values(spark, sf_dir):
    """The Z-order (Morton) key itself as a driver-checked value: per
    order, the interleaved-bit code over (o_custkey, o_totalprice)
    that operators/layout.py sorts by before a clustered write — the
    layout trick behind multi-column row-group pruning on plain
    parquet (Delta OSS OPTIMIZE ZORDER BY runs the same idea). The
    pruning property itself is proven in
    test_zorder_layout_narrows_file_stats_on_both_columns; this query
    pins the bit arithmetic bit-for-bit against DuckDB.

    Plan shape: one 2x2 min/max aggregation (driver-collected bounds,
    the same bounded-literal pattern as every trained codebook), then
    a pure per-row projection over the corpus — zero corpus
    shuffles."""
    from oracle_cassandra_migrator_spark.operators.layout import (
        zorder_value_expr)

    orders = read_table(spark, sf_dir, "orders")
    row = orders.agg(
        F.expr("CAST(min(o_custkey) AS DOUBLE)").alias("lo0"),
        F.expr("CAST(max(o_custkey) AS DOUBLE)").alias("hi0"),
        F.expr("CAST(min(o_totalprice) AS DOUBLE)").alias("lo1"),
        F.expr("CAST(max(o_totalprice) AS DOUBLE)").alias("hi1"),
    ).collect()[0]
    bounds = {"o_custkey": (row["lo0"], row["hi0"]),
              "o_totalprice": (row["lo1"], row["hi1"])}
    z = zorder_value_expr(["o_custkey", "o_totalprice"], bounds, bits=8)
    return orders.selectExpr("o_orderkey", f"{z} AS zval")


IVFPQ_SAMPLE_MOD = 7
IVFPQ_INIT_LIMIT = 16
IVFPQ_MODULUS = 43
IVFPQ_N_PROBE = 2


def _ivfpq_oracle(k: int = 10, query_id: int = 0) -> str:
    """Coarse-IVF replay (bounded-sample training, prefix c_) + the
    four PQ subspace replays (prefix p{s}_), composed: PQ-ADC scores
    are computed only for vectors whose coarse cell is in the query's
    top-n_probe list."""
    parts = [
        f"qrow AS (SELECT embedding AS q FROM embeddings"
        f" WHERE vec_id = {query_id})"]
    parts += _ivf_cells_parts(
        IVFPQ_MODULUS, 1, sample_mod=IVFPQ_SAMPLE_MOD,
        init_limit=IVFPQ_INIT_LIMIT, prefix="c_")
    parts.append(
        f"probes AS (SELECT cid FROM ("
        f"SELECT c.cid, row_number() OVER ("
        f"ORDER BY round(list_dot_product(qr.q::DOUBLE[], c.cvec), 6) DESC,"
        f" c.cid) AS rn FROM c_cents1 c CROSS JOIN qrow qr)"
        f" WHERE rn <= {IVFPQ_N_PROBE})")
    parts += _pq_subspace_parts()
    cos = _PQ_COSINE_SQL
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined}
    SELECT s.vec_id, CAST(cc.cell_id AS BIGINT) AS cell_id, s.pq_score,
           {cos} AS cosine
    FROM pq_scores s
    JOIN c_cells cc ON s.vec_id = cc.vec_id
    JOIN probes pr ON cc.cell_id = pr.cid
    JOIN embeddings e ON s.vec_id = e.vec_id
    CROSS JOIN qrow qr
    WHERE s.vec_id <> {query_id}
    ORDER BY s.pq_score DESC, s.vec_id
    LIMIT {k}
    """


@query("sim_ann_ivfpq_topk", oracle=_ivfpq_oracle())
def sim_ann_ivfpq_topk(spark, sf_dir):
    """IVF+PQ — the composite behind every production-scale ANN index
    (FAISS's IVFADC, Jegou et al. 2011): a coarse quantizer prunes the
    corpus to the query's top-n_probe cells, and the compressed-code
    ADC estimate ranks only the survivors; exact cosine rides along
    for the returned k. At 100 TB the coarse cell is the partition
    key (probe reads corpus/|cells| x n_probe) and the PQ codes are
    the only thing the candidate sweep touches.

    Every trained artifact is the bounded train-out-of-plan pattern:
    the coarse codebook (sampled Lloyd, <=16 rows) and the four PQ
    codebooks (<=16 rows each) collect driver-side and re-enter as
    literals, so the serving plan is scan -> per-row coarse-assign +
    encode + estimate -> broadcast probe-list semi-join -> top-k: the
    ONLY corpus-touching exchange-free pipeline with one broadcast
    (plan-gated). The oracle replays all five training loops."""
    emb = read_table(spark, sf_dir, "embeddings")
    sample = emb.where(f"vec_id % {IVFPQ_SAMPLE_MOD} = 0")
    coarse = similarity.kmeans_codebook(
        sample, modulus=IVFPQ_MODULUS, iters=1,
        init_limit=IVFPQ_INIT_LIMIT)
    cb = similarity.codebook_literal_expr(coarse.collect())
    books = similarity.pq_train_codebooks(
        emb, n_sub=PQ_N_SUB, sub_dim=PQ_SUB_DIM, modulus=PQ_MODULUS,
        iters=PQ_ITERS, init_limit=PQ_INIT_LIMIT,
        sample_mod=PQ_SAMPLE_MOD)
    cells = similarity.assign_cells_literal(emb, cb)
    q = emb.where("vec_id = 0").select(F.col("embedding").alias("q"))
    qv = "transform(q, x -> CAST(x AS DOUBLE))"
    probes = (
        q.withColumn("cents", F.expr(cb))
        .select(F.explode(F.expr(
            f"transform(slice(reverse(array_sort(transform(cents, c -> "
            f"struct(round({similarity.dot_expr(qv, 'c.cvec')}, 6) AS aff, "
            f"-c.cid AS neg_cid)))), 1, {IVFPQ_N_PROBE}), s -> -s.neg_cid)"
        )).alias("pcid"))
    )
    survivors = (
        cells.join(F.broadcast(probes), cells["cell_id"] == probes["pcid"])
        .where("vec_id != 0")
        .select("vec_id", "embedding",
                F.col("cell_id").cast("bigint").alias("cell_id"))
    )
    return similarity.pq_topk(
        survivors, books, sub_dim=PQ_SUB_DIM, k=10,
        query=q, extra_cols=("cell_id",))


def _simhash_prune_oracle(max_distance: int = 2, bits: int = 32) -> str:
    ctes, pairs = _simhash_pair_parts(max_distance, bits)
    return f"""
    WITH RECURSIVE {ctes},
    p AS ({pairs}),
    edges AS (SELECT doc_a AS a, doc_b AS b FROM p
              UNION ALL SELECT doc_b, doc_a FROM p),
    reach(a, b) AS (
      SELECT a, b FROM edges
      UNION
      SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a),
    comp AS (SELECT a AS node, least(a, min(b)) AS component
             FROM reach GROUP BY a)
    SELECT d.doc_id,
           CAST(coalesce(c.component, d.doc_id) AS BIGINT) AS cluster_rep,
           coalesce(c.component, d.doc_id) = d.doc_id AS is_kept
    FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    """


@query("dedup_simhash_prune", oracle=_simhash_prune_oracle(max_distance=1))
def dedup_simhash_prune(spark, sf_dir):
    """SimHash pairs -> DECISIONS: the pigeonhole hamming-distance
    pairs feed hash-to-min connected components and every document
    gets (cluster_rep, is_kept) — completing the pairs->decisions
    story for ALL THREE dedup families (lexical MinHash
    dedup_minhash_prune, semantic dedup_semantic_prune, and now the
    bit-signature SimHash track). Same scale shape as the siblings:
    components run over the PAIR graph only, one final left join back
    to the corpus; the oracle replays pairs + a recursive
    reachability CTE.

    The DECISION gate runs at hamming distance <= 1 while the pairs
    query reports distance <= 2: auto-drop wants the tighter
    threshold (a 32-bit simhash at distance 2 is a weak near-dup
    signal on short docs), and on this synthetic corpus the d=2
    graph is pathologically dense (1.1M pairs at sf0.1 — word-soup
    docs collide in majority-bit space), which makes the oracle's
    transitive closure quadratic. d<=2 pairs remain available from
    dedup_simhash_hamming for review pipelines."""
    docs = read_table(spark, sf_dir, "documents")
    pairs = dedup.simhash_hamming_pairs(
        docs, "text", "doc_id", max_distance=1)
    comp = dedup.connected_components(pairs, src="doc_a", dst="doc_b")
    return dedup.dedup_decisions(docs, comp, "doc_id")


@query(
    "sample_fixed_n_per_group",
    oracle="""
    SELECT doc_id, lang, rnk FROM (
      SELECT CAST(doc_id AS BIGINT) AS doc_id, lang,
             CAST(row_number() OVER (
               PARTITION BY lang
               ORDER BY md5(concat('grpsample:', CAST(doc_id AS VARCHAR))),
                        doc_id) AS INT) AS rnk
      FROM documents)
    WHERE rnk <= 20
    """,
)
def sample_fixed_n_per_group(spark, sf_dir):
    """Stratified FIXED-N sampling: exactly min(n, group size) docs
    per language via bottom-n-by-salted-hash — the eval-set builder
    (n per stratum, reproducible across runs, no fractional-rate
    guesswork). Complements sample_fixed_n_by_hash (global) and
    sample_stratified_by_lang (fractional).

    At scale this is the salted-cap shape: the per-group bottom-n is
    a windowed rank over a uniform hash — for a hot group, swap in
    operators/curation.cap_per_group_salted, whose two-stage prune
    provably preserves the same survivors."""
    return (
        read_table(spark, sf_dir, "documents")
        .selectExpr(
            "CAST(doc_id AS BIGINT) AS doc_id", "lang",
            "md5(concat('grpsample:', CAST(doc_id AS STRING))) AS sk")
        .withColumn(
            "rnk",
            F.expr("CAST(row_number() OVER (PARTITION BY lang"
                   " ORDER BY sk, doc_id) AS INT)"))
        .where("rnk <= 20")
        .select("doc_id", "lang", "rnk")
    )


@query(
    "agg_mode_order_priority",
    oracle="""
    SELECT order_status, order_priority AS modal_priority,
           CAST(n AS BIGINT) AS n_orders
    FROM (
      SELECT o_orderstatus AS order_status,
             o_orderpriority AS order_priority,
             count(*) AS n,
             row_number() OVER (
               PARTITION BY o_orderstatus
               ORDER BY count(*) DESC, o_orderpriority) AS rn
      FROM orders GROUP BY 1, 2)
    WHERE rn = 1
    """,
)
def agg_mode_order_priority(spark, sf_dir):
    """Deterministic MODE: the most frequent order priority per
    status, ties to the lexicographically smallest value. The builtin
    mode() aggregate is tie-nondeterministic on both engines, so the
    portable form is count + row_number — two narrow aggregations
    over |status x priority| groups, map-side partials first."""
    return (
        read_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderstatus").alias("order_status"),
                 F.col("o_orderpriority").alias("order_priority"))
        .agg(F.count("*").alias("n"))
        .withColumn("rn", F.expr(
            "row_number() OVER (PARTITION BY order_status"
            " ORDER BY n DESC, order_priority)"))
        .where("rn = 1")
        .selectExpr("order_status", "order_priority AS modal_priority",
                    "CAST(n AS BIGINT) AS n_orders")
    )


@query(
    "quantile_assign_prices",
    oracle="""
    WITH b AS (SELECT [quantile_disc(o_totalprice, 0.25),
                       quantile_disc(o_totalprice, 0.5),
                       quantile_disc(o_totalprice, 0.75)] AS bounds
               FROM orders)
    SELECT o_orderkey,
           CAST(1 + len(list_filter(bounds, x -> o_totalprice > x)) AS INT)
             AS bucket
    FROM orders CROSS JOIN b
    """,
)
def quantile_assign_prices(spark, sf_dir):
    """Per-ROW output of the two-pass quantile bucketing (the profile
    variant quantile_bucket_prices checks counts; this one verifies
    every row's assignment): exact quartile boundaries in one tiny
    aggregate, broadcast as a single array row, bucket = 1 + #bounds
    strictly below the value — a map-side projection, no global sort
    (the ntile-at-scale contract, row-level-checked)."""
    from oracle_cassandra_migrator_spark.operators.quantiles import (
        assign_buckets, quantile_boundaries)

    orders = read_table(spark, sf_dir, "orders")
    bounds = quantile_boundaries(
        orders.select("o_totalprice"), "o_totalprice", 4, exact=True)
    return assign_buckets(
        orders.select("o_orderkey", "o_totalprice"), bounds, "o_totalprice"
    ).select("o_orderkey", "bucket")


def _dedup_funnel_oracle() -> str:
    minhash = _minhash_prune_oracle()
    simhash = _simhash_prune_oracle(max_distance=1)
    return f"""
    SELECT 'a_total' AS stage, CAST(count(*) AS BIGINT) AS n_kept
    FROM documents
    UNION ALL
    SELECT 'b_exact', CAST(count(DISTINCT md5({NORM_SQL})) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'c_prefix',
           CAST(count(DISTINCT md5(array_to_string(({WORDS_SQL})[1:20], ' ')))
                AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'd_minhash', CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END)
                             AS BIGINT)
    FROM ({minhash})
    UNION ALL
    SELECT 'e_simhash', CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END)
                             AS BIGINT)
    FROM ({simhash})
    """


@query("corpus_dedup_funnel", oracle=_dedup_funnel_oracle())
def corpus_dedup_funnel(spark, sf_dir):
    """The dedup story in ONE report: for each strategy, how many
    documents it would keep — raw corpus, exact-fingerprint survivors,
    prefix-boilerplate survivors, MinHash transitive-cluster keeps,
    SimHash (d<=1) keeps. Each row is an INDEPENDENT decision count
    (not a sequential pipeline), which is the comparison a curation
    team reads to pick and order stages. Stage keys are prefixed
    a_..e_ so every engine/driver sort agrees.

    Costs what its parts cost: two count-distincts over per-row
    fingerprints plus the two prune pipelines; the union glues five
    1-row aggregates."""
    docs = read_table(spark, sf_dir, "documents")
    from oracle_cassandra_migrator_spark.operators.text import (
        fingerprint_expr, prefix_fingerprint_expr)

    total = docs.agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_kept")) \
        .selectExpr("'a_total' AS stage", "n_kept")
    exact = docs.agg(F.expr(
        f"CAST(count(DISTINCT {fingerprint_expr('text')}) AS BIGINT)"
    ).alias("n_kept")).selectExpr("'b_exact' AS stage", "n_kept")
    prefix = docs.agg(F.expr(
        f"CAST(count(DISTINCT {prefix_fingerprint_expr('text', 20)})"
        " AS BIGINT)").alias("n_kept")) \
        .selectExpr("'c_prefix' AS stage", "n_kept")
    mh = dedup_minhash_prune(spark, sf_dir).agg(F.expr(
        "CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)"
    ).alias("n_kept")).selectExpr("'d_minhash' AS stage", "n_kept")
    sh = dedup_simhash_prune(spark, sf_dir).agg(F.expr(
        "CAST(sum(CASE WHEN is_kept THEN 1 ELSE 0 END) AS BIGINT)"
    ).alias("n_kept")).selectExpr("'e_simhash' AS stage", "n_kept")
    return total.unionByName(exact).unionByName(prefix) \
        .unionByName(mh).unionByName(sh)


@query(
    "scd2_asof_snapshot",
    oracle="""
    WITH hist AS (SELECT c_custkey, c_mktsegment,
                         '1990-01-01' AS valid_from,
                         CAST(NULL AS VARCHAR) AS valid_to
                  FROM customer),
    upd AS (SELECT c_custkey, 'PROMO' AS c_mktsegment,
                   '2020-06-01' AS eff
            FROM customer WHERE c_custkey % 53 = 0),
    closed AS (SELECT h.c_custkey, h.c_mktsegment, h.valid_from,
                      u.eff AS valid_to
               FROM hist h JOIN upd u ON h.c_custkey = u.c_custkey),
    untouched AS (SELECT h.* FROM hist h
                  WHERE NOT EXISTS (SELECT 1 FROM upd u
                                    WHERE u.c_custkey = h.c_custkey)),
    newv AS (SELECT c_custkey, c_mktsegment, eff AS valid_from,
                    CAST(NULL AS VARCHAR) AS valid_to FROM upd),
    merged AS (SELECT * FROM closed UNION ALL
               SELECT * FROM untouched UNION ALL
               SELECT * FROM newv),
    probe AS (SELECT '2020-01-01' AS asof_date
              UNION ALL SELECT '2021-01-01')
    SELECT a.asof_date, m.c_mktsegment,
           CAST(count(*) AS BIGINT) AS n_customers,
           CAST(min(m.c_custkey) AS BIGINT) AS min_key
    FROM merged m CROSS JOIN probe a
    WHERE m.valid_from <= a.asof_date
      AND (m.valid_to IS NULL OR m.valid_to > a.asof_date)
    GROUP BY 1, 2
    """,
)
def scd2_asof_snapshot(spark, sf_dir):
    """Point-in-time (AS OF) reconstruction over the Type-2 dimension
    scd2_customer_segments builds: the version valid at each probe
    date is the row with valid_from <= asof < valid_to — queried at
    one date BEFORE the 2020-06-01 segment change (nobody in PROMO)
    and one AFTER (the %53 customers moved). This is the temporal
    query a warehouse runs against SCD2 history; ISO-8601 date
    strings compare lexicographically, so the predicate is a plain
    string range on both engines. The two probe dates broadcast; the
    snapshot filter is map-side over the history table."""
    from oracle_cassandra_migrator_spark.operators.merge import scd2_apply

    cust = read_table(spark, sf_dir, "customer")
    hist = cust.selectExpr(
        "c_custkey", "c_mktsegment", "'1990-01-01' AS valid_from",
        "CAST(NULL AS STRING) AS valid_to")
    upd = cust.where("c_custkey % 53 = 0").selectExpr(
        "c_custkey", "'PROMO' AS c_mktsegment", "'2020-06-01' AS eff")
    merged = scd2_apply(hist, upd, ["c_custkey"], effective_col="eff")
    asof = spark.createDataFrame(
        [("2020-01-01",), ("2021-01-01",)], "asof_date string")
    return (
        merged.crossJoin(F.broadcast(asof))
        .where("valid_from <= asof_date"
               " AND (valid_to IS NULL OR valid_to > asof_date)")
        .groupBy("asof_date", "c_mktsegment")
        .agg(F.expr("CAST(count(*) AS BIGINT)").alias("n_customers"),
             F.expr("CAST(min(c_custkey) AS BIGINT)").alias("min_key"))
    )


@query(
    "events_first_touch_attribution",
    oracle="""
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS pts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts AS cts
          FROM events WHERE event_type = 'click'),
    j AS (SELECT p.purchase_id, c.click_id, p.pts, c.cts,
                 row_number() OVER (PARTITION BY p.purchase_id
                                    ORDER BY c.cts, c.click_id) AS rn
          FROM p JOIN c ON p.user_id = c.user_id
                       AND c.cts <= p.pts
                       AND c.cts >= p.pts - INTERVAL 1 HOUR)
    SELECT purchase_id, click_id AS first_click_id,
           CAST(date_diff('microsecond', cts, pts) AS BIGINT) AS gap_us
    FROM j WHERE rn = 1
    """,
)
def events_first_touch_attribution(spark, sf_dir):
    """FIRST-touch attribution: each purchase credits the EARLIEST
    click by the same user within the preceding hour — the pick-rule
    complement of asof_join_purchase_click (which takes the LATEST
    preceding event). The earliest-in-window pick is a plain
    min(struct(ts, id)) aggregation over the interval join — no
    window function, so the per-purchase reduction happens map-side
    before one purchase-keyed exchange; the oracle uses the
    equivalent row_number formulation."""
    ev = read_table(spark, sf_dir, "events")
    p = ev.where("event_type = 'purchase'").selectExpr(
        "event_id AS purchase_id", "user_id", "ts AS pts")
    c = ev.where("event_type = 'click'").selectExpr(
        "event_id AS click_id", "user_id AS user_id_c", "ts AS cts")
    j = p.join(c, F.expr(
        "user_id = user_id_c AND cts <= pts"
        " AND cts >= pts - INTERVAL 1 HOUR"))
    return (
        j.groupBy("purchase_id")
        .agg(F.expr("min(struct(cts, click_id, pts))").alias("first"))
        .selectExpr(
            "purchase_id",
            "first.click_id AS first_click_id",
            "CAST(TIMESTAMPDIFF(MICROSECOND, first.cts, first.pts)"
            " AS BIGINT) AS gap_us")
    )
