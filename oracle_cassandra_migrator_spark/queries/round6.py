"""Round-6 catalog additions: the IVF+PQ recall audit, event-sequence
Markov transitions, null-safe-equality join coverage, word-level PMI
co-occurrence, and degree-oriented triangle counting.

Reference parity: the reference pipeline (oracle_to_cassandra_migration.py)
establishes the query surface this catalog generalizes; these five close
the remaining analytics families (retrieval-quality audit, sequence
mining, null-semantics joins, corpus co-occurrence statistics, and a
second graph kernel beside PageRank/connected-components).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from oracle_cassandra_migrator_spark.queries.registry import ORACLES, query
from oracle_cassandra_migrator_spark.queries import extensions as _ext
from oracle_cassandra_migrator_spark.sources.testdata import read_table


# ---------------------------------------------------------------------------
# sim_ann_ivfpq_recall — completes the ANN recall-audit family
# ---------------------------------------------------------------------------


def _ivfpq_recall_oracle() -> str:
    bf = ORACLES["sim_topk_bruteforce"]
    iv = _ext._ivfpq_oracle()
    return f"""
    WITH bf AS (SELECT vec_id FROM ({bf})),
    iv AS (SELECT vec_id FROM ({iv}))
    SELECT CAST(count(*) AS BIGINT) AS n_hits, 10 AS k,
           CAST(floor(count(*) * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm
    FROM bf JOIN iv USING (vec_id)
    """


@query("sim_ann_ivfpq_recall", oracle=_ivfpq_recall_oracle())
def sim_ann_ivfpq_recall(spark, sf_dir):
    """Recall@10 of the composite IVF+PQ retriever against the exact
    brute-force top-10 — the final row of the ANN quality story (LSH,
    IVF single/multi-probe, and PQ audits already exist). The coarse
    probe step caps recall at whatever mass the top-n_probe cells hold,
    so this number is the one a 100 TB operator actually tunes n_probe
    against. One <= 10-row join per arm; the oracle replays all five
    training loops end-to-end via the shared CTE helpers."""
    bf = _ext.sim_topk_bruteforce(spark, sf_dir).select("vec_id")
    iv = _ext.sim_ann_ivfpq_topk(spark, sf_dir).select("vec_id")
    return bf.join(iv, "vec_id").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_hits")
    ).selectExpr(
        "n_hits", "10 AS k",
        "CAST(floor(n_hits * 1e6 / 10 + 0.5) AS BIGINT) AS recall_ppm")


# ---------------------------------------------------------------------------
# events_type_transition_matrix — first-order Markov transitions
# ---------------------------------------------------------------------------


@query(
    "events_type_transition_matrix",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    c AS (SELECT event_type AS prev_type, next_type,
                 CAST(count(*) AS BIGINT) AS n_transitions
          FROM seq WHERE next_type IS NOT NULL
          GROUP BY event_type, next_type)
    SELECT prev_type, next_type, n_transitions,
           CAST(floor(n_transitions * 1e6
                      / CAST(SUM(n_transitions) OVER (PARTITION BY prev_type)
                             AS DOUBLE) + 0.5) AS BIGINT) AS prob_ppm
    FROM c
    """,
)
def events_type_transition_matrix(spark, sf_dir):
    """First-order Markov transition matrix over per-user event
    sequences: P(next_type | prev_type) — the sequence-mining
    primitive behind next-action prediction and journey analysis.

    Scale shape: ONE user-keyed shuffle for the ordered lead() (rows
    stay row-shaped, per-user partitions are small), then the corpus
    collapses to |type|^2 transition counts via map-side partial
    aggregation; the per-row probability normalization is a window
    OVER the tiny aggregate (aggregate-before-window, same gate shape
    as events_rolling_weekly_counts) — never over raw events.
    Probabilities are integer ppm (floor + 0.5) so the driver hash is
    exact. Tie order inside a user is (ts, event_id) — a total order,
    so lead() is deterministic in both engines."""
    ev = read_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type"))
    c = (
        seq.where("next_type IS NOT NULL")
        .groupBy(F.col("event_type").alias("prev_type"), "next_type")
        .agg(F.count("*").cast("bigint").alias("n_transitions"))
    )
    wp = Window.partitionBy("prev_type")
    total = F.sum("n_transitions").over(wp).cast("double")
    return c.select(
        "prev_type", "next_type", "n_transitions",
        F.floor(F.col("n_transitions") * F.lit(1e6) / total + F.lit(0.5))
        .cast("bigint").alias("prob_ppm"))


# ---------------------------------------------------------------------------
# join_null_safe_eq — <=> as a hash-joinable equi key
# ---------------------------------------------------------------------------


@query(
    "join_null_safe_eq",
    oracle="""
    WITH a AS (SELECT o_orderkey, nullif(o_orderstatus, 'O') AS status_key
               FROM orders),
    d AS (SELECT DISTINCT status_key FROM a)
    SELECT d.status_key, CAST(count(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN a.status_key = d.status_key
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_plain_eq
    FROM a JOIN d ON a.status_key IS NOT DISTINCT FROM d.status_key
    GROUP BY d.status_key
    """,
)
def join_null_safe_eq(spark, sf_dir):
    """Null-safe equality join (Spark ``<=>`` == ANSI IS NOT DISTINCT
    FROM): the missing null-semantics quadrant of the join family —
    plain ``=`` silently drops NULL keys, ``<=>`` matches NULL to NULL.
    The load-bearing property for scale: Spark plans ``<=>`` as a HASH
    join key (coalesced-key equi join), NOT a nested loop — a fact-to-
    dimension join on a nullable key stays O(n) (plan-gated: the plan
    is a BroadcastHashJoin with no BroadcastNestedLoopJoin).

    The n_plain_eq column makes the semantic difference visible in the
    data: it is 0 for the NULL group (plain equality never matches
    NULL) and equals n_orders for every non-NULL group."""
    orders = read_table(spark, sf_dir, "orders")
    a = orders.selectExpr(
        "o_orderkey", "nullif(o_orderstatus, 'O') AS status_key"
    ).alias("fact")
    d = a.select("status_key").distinct().alias("dim")
    return (
        a.join(F.broadcast(d), F.expr("fact.status_key <=> dim.status_key"))
        .groupBy(F.expr("dim.status_key").alias("status_key"))
        .agg(
            F.count("*").cast("bigint").alias("n_orders"),
            F.expr("CAST(SUM(CASE WHEN fact.status_key = dim.status_key"
                   " THEN 1 ELSE 0 END) AS BIGINT)").alias("n_plain_eq"),
        )
    )


# ---------------------------------------------------------------------------
# text_word_pmi — adjacent-word pointwise mutual information
# ---------------------------------------------------------------------------


def _bigram_pairs_expr() -> str:
    """All adjacent word pairs per document (positions, not distinct —
    PMI wants occurrence counts), with the word array bound ONCE via
    the lambda trick (see operators/text.py:shingles_once_expr: a plain
    column gets re-inlined by CollapseProject)."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    w = fast_words_expr("text")
    return (
        f"element_at(transform(array({w}), w -> "
        "CASE WHEN size(w) >= 2 THEN "
        "transform(sequence(1, size(w) - 1), i -> "
        "named_struct('w1', element_at(w, i), 'w2', element_at(w, i + 1))) "
        "ELSE CAST(array() AS ARRAY<STRUCT<w1: STRING, w2: STRING>>) "
        "END), 1)"
    )


def _word_pmi_oracle(min_pair: int = 5, k: int = 20) -> str:
    ws = _ext.FAST_WORDS_SQL
    return f"""
    WITH d AS (SELECT {ws} AS ws FROM documents),
    w AS (SELECT unnest(ws) AS w FROM d),
    uni AS (SELECT w, CAST(count(*) AS BIGINT) AS n FROM w GROUP BY w),
    tw AS (SELECT CAST(count(*) AS DOUBLE) AS tw FROM w),
    bg AS (SELECT ws[t.i] AS w1, ws[t.i + 1] AS w2
           FROM d, UNNEST(generate_series(1, len(ws) - 1)) AS t(i)),
    pc AS (SELECT w1, w2, CAST(count(*) AS BIGINT) AS n_pair
           FROM bg GROUP BY w1, w2),
    tp AS (SELECT CAST(count(*) AS DOUBLE) AS tp FROM bg)
    SELECT p.w1, p.w2, p.n_pair,
           round(log2((CAST(p.n_pair AS DOUBLE) / tp.tp)
                      / ((CAST(u1.n AS DOUBLE) / tw.tw)
                         * (CAST(u2.n AS DOUBLE) / tw.tw))), 6) AS pmi
    FROM pc p JOIN uni u1 ON p.w1 = u1.w JOIN uni u2 ON p.w2 = u2.w
    CROSS JOIN tw CROSS JOIN tp
    WHERE p.n_pair >= {min_pair}
    ORDER BY pmi DESC, p.w1, p.w2
    LIMIT {k}
    """


@query("text_word_pmi", oracle=_word_pmi_oracle())
def text_word_pmi(spark, sf_dir):
    """Adjacent-word pointwise mutual information (Church & Hanks
    1990): pmi(w1,w2) = log2(p(w1,w2) / (p(w1)p(w2))) over bigram
    positions — the collocation/phrase-discovery statistic used to
    mine multi-word expressions before tokenizer training. Min-count
    filter (n_pair >= 5) applies the standard sparse-PMI correction;
    top-20 by rounded pmi with a (w1,w2) total-order tiebreak.

    Scale shape: one per-row split + explode into row-shaped tokens /
    pairs, two map-side-partial groupBys (vocab- and bigram-keyed),
    corpus totals as ONE-ROW broadcast joins (the bounded-literal
    pattern), and the unigram table re-enters via broadcast — a vocab
    table is O(distinct words), which fits executor memory at any
    corpus size long before the pair table does. Final ranking is
    TakeOrderedAndProject over the min-count survivors."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    docs = read_table(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(F.expr(fast_words_expr("text"))).alias("w"))
    words = words.persist()
    uni = words.groupBy("w").agg(F.count("*").cast("bigint").alias("n"))
    tw = words.agg(F.count("*").cast("double").alias("tw"))
    pairs = docs.select(
        F.explode(F.expr(_bigram_pairs_expr())).alias("p")
    ).select("p.w1", "p.w2")
    pairs = pairs.persist()
    pc = (
        pairs.groupBy("w1", "w2")
        .agg(F.count("*").cast("bigint").alias("n_pair"))
        .where("n_pair >= 5")
    )
    tp = pairs.agg(F.count("*").cast("double").alias("tp"))
    u1 = uni.selectExpr("w AS w1", "n AS n1")
    u2 = uni.selectExpr("w AS w2", "n AS n2")
    return (
        pc.join(F.broadcast(u1), "w1")
        .join(F.broadcast(u2), "w2")
        .crossJoin(F.broadcast(tw))
        .crossJoin(F.broadcast(tp))
        .selectExpr(
            "w1", "w2", "n_pair",
            "round(log2((CAST(n_pair AS DOUBLE) / tp)"
            " / ((CAST(n1 AS DOUBLE) / tw) * (CAST(n2 AS DOUBLE) / tw))), 6)"
            " AS pmi")
        .orderBy(F.col("pmi").desc(), "w1", "w2")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# graph_triangle_count — degree-oriented triangle counting
# ---------------------------------------------------------------------------

_TRIANGLE_SQL = f"""
    WITH e0 AS ({_ext._PAGERANK_EDGES_SQL}),
    und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
            FROM e0 WHERE src <> dst),
    deg AS (SELECT n, CAST(count(*) AS BIGINT) AS d
            FROM (SELECT a AS n FROM und
                  UNION ALL SELECT b AS n FROM und) t
            GROUP BY n),
    rk AS (SELECT n, CAST(row_number() OVER (ORDER BY d, n) AS BIGINT) AS r
           FROM deg),
    ore AS (SELECT CASE WHEN ra.r < rb.r THEN u.a ELSE u.b END AS u,
                   CASE WHEN ra.r < rb.r THEN u.b ELSE u.a END AS v,
                   CASE WHEN ra.r < rb.r THEN rb.r ELSE ra.r END AS rv
            FROM und u
            JOIN rk ra ON u.a = ra.n
            JOIN rk rb ON u.b = rb.n),
    tri AS (SELECT e1.u AS x, e1.v AS y, e2.v AS z
            FROM ore e1
            JOIN ore e2 ON e1.u = e2.u AND e1.rv < e2.rv
            JOIN ore e3 ON e3.u = e1.v AND e3.v = e2.v),
    pn AS (SELECT x AS node FROM tri
           UNION ALL SELECT y FROM tri
           UNION ALL SELECT z FROM tri),
    cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n_triangles
            FROM pn GROUP BY node)
    SELECT n.n_name AS node,
           CAST(coalesce(c.n_triangles, 0) AS BIGINT) AS n_triangles
    FROM nation n LEFT JOIN cnt c ON n.n_name = c.node
"""


@query("graph_triangle_count", oracle=_TRIANGLE_SQL)
def graph_triangle_count(spark, sf_dir):
    """Per-node triangle counts over the nation trade graph (edges =
    nation pairs that traded, from the PageRank edge view) — the
    clustering-coefficient kernel, second graph operator beside
    PageRank and connected components.

    Algorithm: degree-ORIENTED counting (the MapReduce-era standard,
    Suri & Vassilvitskii 2011): rank nodes by (degree, name), orient
    every undirected edge low->high, wedge-join out-edges at their
    common low endpoint, and close each wedge with one more equi-join.
    Orientation bounds per-node out-degree by O(sqrt(|E|)) on any
    graph, so the wedge stage — the only superlinear step — is
    sum-of-C(outdeg,2) minimized; every join is an equi-join on a node
    key and each triangle is produced exactly once (its minimum-rank
    vertex owns it). The node ranking is |V|-sized (a global sort over
    nodes, not edges; node tables are dwarfed by edge tables on any
    real graph). The final LEFT JOIN back to the node list surfaces
    zero-triangle nodes explicitly.

    Plan shape: the oriented edge list is built ONCE and persisted —
    as pure SQL the triangle CTEs re-inline the 6-way edge build at
    every reference (Spark does not materialize CTEs; measured 113
    exchanges vs ~15 here). deg and the per-triangle node explode use
    explode(array(..)) instead of self-UNION so each input is scanned
    once. The oracle runs the same algorithm as one DuckDB SQL text
    (DuckDB does materialize CTEs)."""
    from oracle_cassandra_migrator_spark.operators.graph import (
        triangle_counts)

    for t in ("orders", "lineitem", "customer", "supplier", "nation"):
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    und = (
        spark.sql(_ext._PAGERANK_EDGES_SQL)
        .where("src <> dst")
        .selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
        .distinct()
    )
    nation = read_table(spark, sf_dir, "nation").selectExpr("n_name AS node")
    return triangle_counts(und, nation)


# ---------------------------------------------------------------------------
# Second wave (registered AFTER the r5 verification window: the driver
# caps each round's correctness pass at ~50 entries and the r5 window
# is exactly full, so these four sort to the front of the NEXT round's
# window; since the r6 fold-in the ordering is the staleness sort
# in queries/__init__.py::_verification_order)
# ---------------------------------------------------------------------------


def _bloom_prefilter_oracle() -> str:
    from oracle_cassandra_migrator_spark.operators import sketches

    ctes = sketches.bloom_sql_ctes(
        f"SELECT DISTINCT md5({_ext.NORM_SQL}) AS fp FROM documents "
        f"WHERE doc_id % 5 <> 0")
    return f"""
    WITH {ctes},
    allp AS (SELECT doc_id, md5({_ext.NORM_SQL}) AS fp FROM documents),
    probed AS (SELECT doc_id, fp,
                      {sketches.bloom_hit_sql('fp')} AS bloom_hit
               FROM allp),
    flags AS (SELECT doc_id, bloom_hit,
                     CASE WHEN bloom_hit
                               AND fp IN (SELECT fp FROM bkeys)
                          THEN 1 ELSE 0 END AS in_base
              FROM probed)
    SELECT CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_hit,
           CAST(sum(in_base) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN bloom_hit AND in_base = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM flags
    """


@query("dedup_bloom_prefilter", oracle=_bloom_prefilter_oracle())
def dedup_bloom_prefilter(spark, sf_dir):
    """Bloom-filter pre-join pruning, audited end to end — the
    runtime-filter recipe dedup_incremental_snapshot's docstring
    promises, built explicitly: base-snapshot fingerprints (doc_id % 5
    != 0) fold into a 16384-bit Bloom filter (a <= 256-row bit_or
    aggregate); the FULL corpus then probes it as a ZERO-SHUFFLE
    map-literal projection (the bounded train-out-of-plan pattern —
    < 4 KiB collected), and only bloom HITS pay the exact membership
    join. Probing the corpus both sides of the split makes the audit
    row non-vacuous in both directions on this corpus (which has no
    cross-snapshot exact dups): the 400 base docs prove no false
    negatives (n_members counts every one of them — a miss there is a
    correctness bug, pytest-pinned), and the 100 held-out docs measure
    the false-positive cost (n_false_pos = wasted exact-join rows;
    ~0.03% expected at this fill ratio).

    At 100 TB: the build is mergeable and fixed-size per executor
    (scale M_BITS with base cardinality — the aggregate shape is
    unchanged); the probe prunes the exact-join input from |probe| to
    |hits|, so the expensive fingerprint join touches only probable
    members. Spark's runtime row-group bloom pruning can't express a
    cross-snapshot filter — this is the explicit, durable form."""
    from oracle_cassandra_migrator_spark.operators import sketches
    from oracle_cassandra_migrator_spark.operators.text import (
        fingerprint_expr)

    docs = read_table(spark, sf_dir, "documents")
    fp = fingerprint_expr("text")
    base_fp = (docs.where("doc_id % 5 != 0")
               .select(F.expr(fp).alias("fingerprint")).distinct())
    bloom_map = sketches.bloom_literal_map(sketches.bloom_build(
        base_fp, "fingerprint"))
    probed = (docs
              .select("doc_id", F.expr(fp).alias("fingerprint"))
              .withColumn("bloom_hit", F.expr(
                  sketches.bloom_probe_expr(bloom_map, "fingerprint"))))
    marked = base_fp.selectExpr("fingerprint AS base_fp",
                                "1 AS in_base_raw")
    # ONE corpus pass: a hits/misses union re-scanned documents and
    # re-ran every md5 twice (review finding). The broadcast left join
    # keys on fingerprint with bloom_hit as a residual condition, so
    # misses never probe the hash relation and in_base is 0 for them
    # by construction — bloom has no false negatives, so a miss can
    # never be a member.
    joined = probed.join(
        F.broadcast(marked),
        F.expr("fingerprint = base_fp AND bloom_hit"), "left")
    flags = joined.select(
        "doc_id", "bloom_hit",
        F.expr("CASE WHEN bloom_hit THEN coalesce(in_base_raw, 0)"
               " ELSE 0 END").alias("in_base"))
    return flags.agg(
        F.count("*").cast("bigint").alias("n_probed"),
        F.expr("CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_bloom_hit"),
        F.expr("CAST(sum(in_base) AS BIGINT)").alias("n_members"),
        F.expr("CAST(sum(CASE WHEN bloom_hit AND in_base = 0 "
               "THEN 1 ELSE 0 END) AS BIGINT)").alias("n_false_pos"))


def _cms_oracle(k: int = 20) -> str:
    from oracle_cassandra_migrator_spark.operators import sketches

    sks = ",\n    ".join(
        f"sk{d} AS (SELECT {sketches.cms_slot_sql(d, 'tok')} AS slot, "
        f"sum(cnt) AS c FROM tc GROUP BY 1)"
        for d in range(sketches.CMS_DEPTH))
    joins = "\n           ".join(
        f"LEFT JOIN sk{d} s{d} ON s{d}.slot = "
        f"{sketches.cms_slot_sql(d, 't.tok')}"
        for d in range(sketches.CMS_DEPTH))
    mins = ", ".join(
        f"coalesce(s{d}.c, 0)" for d in range(sketches.CMS_DEPTH))
    return f"""
    WITH d AS (SELECT {_ext.FAST_WORDS_SQL} AS w FROM documents),
    ex AS (SELECT unnest(w) AS tok FROM d),
    tc AS (SELECT tok, CAST(count(*) AS BIGINT) AS cnt FROM ex GROUP BY tok),
    {sks},
    est AS (SELECT t.tok, t.cnt, least({mins}) AS est
            FROM tc t
            {joins})
    SELECT tok AS token, cnt AS exact_cnt, CAST(est AS BIGINT) AS est_cnt,
           CAST(est - cnt AS BIGINT) AS overcount
    FROM est ORDER BY est_cnt DESC, token LIMIT {k}
    """


@query("sketch_cms_heavy_hitters", oracle=_cms_oracle())
def sketch_cms_heavy_hitters(spark, sf_dir):
    """Count-Min heavy hitters over the document token stream, audited
    against exact counts: build the 3x1024 sketch, point-estimate
    every distinct token (min over depths), rank top-20 by estimate.
    est_cnt >= exact_cnt ALWAYS (same md5 hash family on build and
    probe — no false negatives on frequency), and ``overcount`` makes
    the collision bias a visible, testable column.

    Scale shape: token counts are one map-side-partial groupBy; the
    sketch is a <= 3072-row aggregate OF the counts (sums commute, so
    sketching pre-aggregated counts == hashing every occurrence); the
    estimate side is CMS_DEPTH broadcast hash joins against the
    fixed-size sketch; the final ranking is TakeOrderedAndProject. The
    sketch is mergeable — at 100 TB each shard/day builds its own and
    a tiny slot-wise sum merges them, which is the entire point of
    carrying a sketch instead of the vocab itself."""
    from oracle_cassandra_migrator_spark.operators import sketches
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    docs = read_table(spark, sf_dir, "documents")
    tc = (docs.select(F.explode(F.expr(fast_words_expr("text"))).alias("tok"))
          .groupBy("tok").agg(F.count("*").cast("bigint").alias("cnt"))
          .persist())
    sketch = sketches.cms_sketch(tc, "tok", "cnt")
    est = sketches.cms_estimate(tc, sketch, "tok")
    return (est.selectExpr(
                "tok AS token", "cnt AS exact_cnt",
                "CAST(est_cnt AS BIGINT) AS est_cnt",
                "CAST(est_cnt - cnt AS BIGINT) AS overcount")
            .orderBy(F.col("est_cnt").desc(), "token")
            .limit(20))


def _reservoir_oracle(k: int = 5) -> str:
    from oracle_cassandra_migrator_spark.operators.sampling import (
        reservoir_key_sql)

    return f"""
    WITH d AS (SELECT lang, doc_id,
                      greatest(1, CAST(len({_ext.WORDS_SQL}) AS BIGINT))
                          AS w_tokens
               FROM documents),
    ks AS (SELECT lang, doc_id, w_tokens,
                  {reservoir_key_sql('doc_id', 'CAST(w_tokens AS DOUBLE)')}
                      AS res_key
           FROM d),
    r AS (SELECT *, row_number() OVER (PARTITION BY lang
                                       ORDER BY res_key, doc_id) AS rn
          FROM ks)
    SELECT lang, CAST(rn AS BIGINT) AS keep_rank, doc_id, w_tokens, res_key
    FROM r WHERE rn <= {k}
    """


@query("sample_weighted_reservoir", oracle=_reservoir_oracle())
def sample_weighted_reservoir(spark, sf_dir):
    """Weighted reservoir sample (k=5 per language) via the A-ES
    exponential-key method (Efraimidis & Spirakis 2006): each doc gets
    key = -ln(u)/w with md5-deterministic u and w = its token count;
    the k smallest keys per stratum are a without-replacement sample
    where longer documents are proportionally likelier — the standard
    way to sample training docs by token mass rather than doc count.

    Deterministic end to end (same sample on any cluster size / rerun
    — no RNG state to coordinate), and skew-safe: the per-stratum
    top-k runs through cap_per_group_salted, so one dominant language
    fans out over 16 salts with a provably identical result (the
    salted-cap property test). Keys are rounded to 9 dp before ranking
    so both engines agree on order even at libm's last ulp; ties break
    on doc_id."""
    from oracle_cassandra_migrator_spark.operators import curation
    from oracle_cassandra_migrator_spark.operators.sampling import (
        reservoir_key_expr)
    from oracle_cassandra_migrator_spark.operators.text import (
        token_count_expr)

    docs = read_table(spark, sf_dir, "documents")
    keyed = docs.selectExpr(
        "lang", "doc_id",
        f"greatest(CAST(1 AS BIGINT), {token_count_expr('text')})"
        " AS w_tokens",
    ).withColumn("res_key", F.expr(
        reservoir_key_expr("doc_id", "CAST(w_tokens AS DOUBLE)")))
    capped = curation.cap_per_group_salted(
        keyed, "lang", [F.col("res_key"), F.col("doc_id")], n=5,
        salt_on=["doc_id"], rank_col="keep_rank")
    return capped.selectExpr(
        "lang", "CAST(keep_rank AS BIGINT) AS keep_rank",
        "doc_id", "w_tokens", "res_key")


def _allpairs_oracle(threshold: float = 0.5) -> str:
    # Shingles are hashed to 60-bit BIGINTs exactly as the Spark side
    # does (operators/dedup.py BASE_HASH idiom) so the prefix order —
    # and therefore the candidate set — is bit-identical by
    # construction, collisions included.
    return f"""
    WITH {_ext._SHINGLE_CTE},
    ex0 AS (SELECT doc_id, len(shingles) AS n_sh, unnest(shingles) AS tok
            FROM sh WHERE len(shingles) > 0),
    ex AS (SELECT doc_id, n_sh,
                  ('0x' || substring(md5(tok), 1, 15))::BIGINT AS tok
           FROM ex0),
    withdf AS (SELECT doc_id, n_sh, tok,
                      count(*) OVER (PARTITION BY tok) AS df FROM ex),
    ranked AS (SELECT doc_id, n_sh, tok,
                      row_number() OVER (PARTITION BY doc_id
                                         ORDER BY df, tok) AS rn
               FROM withdf),
    pre AS (SELECT * FROM ranked
            WHERE rn <= n_sh - ceil({threshold} * n_sh) + 1),
    cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
             FROM pre a JOIN pre b
               ON a.tok = b.tok AND a.doc_id < b.doc_id)
    SELECT doc_a, doc_b, jaccard
    FROM ({_ext._JACCARD_SQL}) WHERE jaccard_raw >= {threshold}
    """


@query("dedup_allpairs_prefix", oracle=_allpairs_oracle())
def dedup_allpairs_prefix(spark, sf_dir):
    """EXACT near-duplicate pairs via prefix filtering (AllPairs /
    PPJoin, Bayardo et al. 2007) — same contract as
    dedup_ngram_jaccard (identical output, asserted in pytest) but a
    fundamentally different candidate generator: docs join only on
    their |x| - ceil(t|x|) + 1 globally-RAREST shingles, which the
    prefix-filtering theorem proves sufficient for zero false
    negatives at J >= t. Where MinHash-LSH trades recall for speed and
    the inverted index joins on every shingle, this is the exact
    algorithm whose join blocks shrink as tokens get more selective —
    the right default for corpus-scale exact dedup when the threshold
    is high. See operators/dedup.py:allpairs_jaccard_pairs for the
    shuffle-by-shuffle scale analysis.

    The routing bar is lowered to 0.5 HERE deliberately: this query's
    contract is the prefix-filter plan itself (its oracle replays the
    candidate pipeline stage by stage and the plan gates assert the
    doc_id window), and at driver SFs the curated corpus is far below
    the pair-density regime the default bar protects against. Callers
    without that knowledge get the measured 0.8 default —
    dedup_jaccard_auto_routed exercises that path."""
    from oracle_cassandra_migrator_spark.operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    return dedup.allpairs_jaccard_pairs(
        docs, "text", "doc_id", n=3, threshold=0.5, route_threshold=0.5)


def _bpe_oracle(k: int = 5) -> str:
    """Unrolled-CTE DuckDB replay of the k-iteration BPE train loop.
    The greedy left-to-right merge is expressed relationally: match
    positions, detect runs of consecutive matches (only possible when
    left == right), merge even run offsets, drop consumed positions,
    rebuild each word's token list ordered by position. Equivalent to
    the Spark side's aggregate() fold (operators/text.py:
    bpe_merge_expr)."""
    rules = "\n    UNION ALL ".join(
        f"SELECT CAST({i} AS BIGINT) AS merge_idx, a AS left_tok, "
        f"b AS right_tok, a || b AS merged, n AS pair_count FROM m{i}"
        for i in range(1, k + 1))
    return "WITH " + _bpe_ctes(k) + "\n    " + rules


def _bpe_ctes(k: int = 5) -> str:
    """The unrolled train-loop CTE body shared by the rules oracle and
    the encode-stats oracle; ``v{k}`` is the post-merge vocab.

    Every CTE is MATERIALIZED: DuckDB's default inlines CTEs into each
    reference site, and since every iteration references the previous
    vocab twice (pair counting + position explode), the inlined tree —
    and its execution — doubles per iteration, 2^k plans deep by v{k}.
    Measured on the encode-stats oracle at sf0.001: 81.9s inlined vs
    0.12s materialized, identical result (the r12 suite-wall item)."""
    parts = [f"""
    w0 AS MATERIALIZED (
        SELECT unnest({_ext.FAST_WORDS_SQL}) AS word FROM documents),
    v0 AS MATERIALIZED (
        SELECT word, count(*) AS cnt,
               regexp_extract_all(word, '.') AS toks
        FROM w0 GROUP BY word)"""]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f"""
    pc{i} AS MATERIALIZED (
              SELECT toks[t.j] AS a, toks[t.j + 1] AS b,
                     CAST(sum(cnt) AS BIGINT) AS n
              FROM v{p}, UNNEST(generate_series(1, len(toks) - 1)) AS t(j)
              GROUP BY 1, 2),
    m{i} AS MATERIALIZED (
        SELECT a, b, n FROM pc{i} ORDER BY n DESC, a, b LIMIT 1),
    p{i} AS MATERIALIZED (
             SELECT word, cnt, t.j AS j, toks[t.j] AS tok
             FROM v{p}, UNNEST(generate_series(1, len(toks))) AS t(j)),
    q{i} AS MATERIALIZED (
             SELECT *, lead(tok) OVER (PARTITION BY word ORDER BY j) AS nxt
             FROM p{i}),
    f{i} AS MATERIALIZED (
             SELECT *, coalesce(tok = (SELECT a FROM m{i})
                                AND nxt = (SELECT b FROM m{i}),
                                false) AS mt
             FROM q{i}),
    g{i} AS MATERIALIZED (
             SELECT *, CASE WHEN mt THEN
                         j - row_number() OVER (PARTITION BY word, mt
                                                ORDER BY j) END AS grp
             FROM f{i}),
    h{i} AS MATERIALIZED (
             SELECT *, CASE WHEN mt THEN
                         (j - min(j) OVER (PARTITION BY word, grp)) % 2 = 0
                       ELSE false END AS mg
             FROM g{i}),
    r{i} AS MATERIALIZED (
             SELECT *, coalesce(lag(mg) OVER (PARTITION BY word ORDER BY j),
                                false) AS consumed
             FROM h{i}),
    v{i} AS MATERIALIZED (
             SELECT word, cnt,
                    list(CASE WHEN mg THEN (SELECT a || b FROM m{i})
                         ELSE tok END ORDER BY j) AS toks
             FROM r{i} WHERE NOT consumed GROUP BY word, cnt)""")
    return ",".join(parts)


@query("text_bpe_merge_rules", oracle=_bpe_oracle())
def text_bpe_merge_rules(spark, sf_dir):
    """BPE tokenizer training: the first 5 merge rules learned from
    the corpus, with the pair count each rule was chosen at
    (deterministic argmax: count DESC, pair ASC). The train loop runs
    the way production BPE trainers do — one corpus pass builds the
    word-frequency table, then every iteration is vocab-sized: pair
    counting is an explode + map-side-partial groupBy over O(|vocab|)
    rows, the winner is a 1-row driver collect (train-out-of-plan),
    and the merge applies as a zero-shuffle per-row fold. The oracle
    replays all 5 iterations as unrolled CTEs with the relational
    form of the same greedy merge, so counts and tie-breaks match
    bit-for-bit. See operators/text.py:bpe_merge_rules."""
    from oracle_cassandra_migrator_spark.operators.text import (
        bpe_merge_rules)

    docs = read_table(spark, sf_dir, "documents")
    return bpe_merge_rules(spark, docs, "text", k=5)


# Post-contingency cluster-quality math, shared VERBATIM by the Spark
# query (over a `ct` temp view) and the DuckDB oracle (over a `ct`
# CTE) — one source of truth for the purity/MI/NMI arithmetic. All
# floating terms go through floor(x * 1e6 + 0.5) * 1000 integer
# nano-units BEFORE summing, so the cross-row additions are exact and
# order-independent on both engines. The half-up floor quantizes at
# MICRO granularity (ADVICE r5): a 1-ulp JVM-vs-libm log2 difference
# sits 1000x further from a micro boundary than from a nano one, so
# the per-term integers agree even when the engines' doubles differ
# in the last ulp. (floor(x+0.5), never round(): Spark rounds HALF_UP,
# DuckDB HALF_EVEN.)
_CLUSTER_NMI_TAIL = """
    t AS (
      SELECT cell_id, label, n_cl,
             SUM(n_cl) OVER () AS n_total,
             SUM(n_cl) OVER (PARTITION BY cell_id) AS n_c,
             SUM(n_cl) OVER (PARTITION BY label) AS n_l,
             MAX(n_cl) OVER (PARTITION BY cell_id) AS mx_c,
             ROW_NUMBER() OVER (PARTITION BY cell_id ORDER BY label) AS rn_c,
             ROW_NUMBER() OVER (PARTITION BY label ORDER BY cell_id) AS rn_l
      FROM ct),
    terms AS (
      SELECT
        CAST(floor((CAST(n_cl AS DOUBLE) / n_total)
             * log2((CAST(n_cl AS DOUBLE) * n_total)
                    / (CAST(n_c AS DOUBLE) * n_l))
             * 1e6 + 0.5) AS BIGINT) * 1000 AS mi_nano,
        CASE WHEN rn_c = 1 THEN
          CAST(floor(-(CAST(n_c AS DOUBLE) / n_total)
               * log2(CAST(n_c AS DOUBLE) / n_total) * 1e6 + 0.5) AS BIGINT)
          * 1000
          ELSE 0 END AS hc_nano,
        CASE WHEN rn_l = 1 THEN
          CAST(floor(-(CAST(n_l AS DOUBLE) / n_total)
               * log2(CAST(n_l AS DOUBLE) / n_total) * 1e6 + 0.5) AS BIGINT)
          * 1000
          ELSE 0 END AS hl_nano,
        CASE WHEN rn_c = 1 THEN mx_c ELSE 0 END AS pure_n,
        CASE WHEN rn_c = 1 THEN 1 ELSE 0 END AS is_cell,
        CASE WHEN rn_l = 1 THEN 1 ELSE 0 END AS is_label,
        n_total
      FROM t)
    SELECT CAST(max(n_total) AS BIGINT) AS n_vecs,
           CAST(sum(is_cell) AS BIGINT) AS n_cells,
           CAST(sum(is_label) AS BIGINT) AS n_labels,
           CAST(floor(CAST(sum(pure_n) AS DOUBLE) * 1e6 / max(n_total)
                      + 0.5) AS BIGINT) AS purity_ppm,
           round(CAST(sum(mi_nano) AS DOUBLE) / 1e9, 6) AS mutual_info_bits,
           CASE WHEN sum(hc_nano) = 0 OR sum(hl_nano) = 0
                THEN CAST(0.0 AS DOUBLE)
                ELSE round(CAST(sum(mi_nano) AS DOUBLE)
                           / sqrt(CAST(sum(hc_nano) AS DOUBLE)
                                  * sum(hl_nano)), 6) END AS nmi
    FROM terms
"""


def _cluster_nmi_oracle() -> str:
    parts = _ext._ivf_cells_parts(43, 2)
    joined = ",\n    ".join(parts)
    return f"""
    WITH {joined},
    ct AS (SELECT c.cell_id, e.label, CAST(count(*) AS BIGINT) AS n_cl
           FROM cells c JOIN embeddings e ON c.vec_id = e.vec_id
           GROUP BY c.cell_id, e.label),
    {_CLUSTER_NMI_TAIL}
    """


@query("sim_cluster_quality_nmi", oracle=_cluster_nmi_oracle())
def sim_cluster_quality_nmi(spark, sf_dir):
    """Cluster-quality audit of the trained IVF codebook against the
    embeddings' ground-truth labels: purity (fraction of vectors in
    their cell's majority label) and normalized mutual information —
    the standard external clustering metrics, closing the loop the
    recall audits opened (recall measures retrieval quality; this
    measures whether the cells themselves carve the space along real
    structure, which is what IVF pruning quality rests on).

    Scale shape: training + assignment are the existing bounded
    patterns (broadcast codebook, zero-shuffle argmax); the corpus
    then collapses to the |cells| x |labels| contingency table via one
    keyed join + map-side-partial groupBy, and ALL metric math runs
    over that tiny table (windows over the aggregate, never the
    corpus). The arithmetic is the engine-shared _CLUSTER_NMI_TAIL:
    nano-unit integer terms summed exactly, so the driver hash
    matches."""
    from oracle_cassandra_migrator_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    # init_limit=64 bounds the CODEBOOK absolutely (train_cap bounds
    # the Lloyd iterations, but the % 43 init is still a fraction of
    # the train set — measured 29x wall at the 30x probe because the
    # full-corpus assignment is O(corpus x |codebook|)). 64 does not
    # bind at any driver SF (%43 of <= 2000 vectors < 64), so the
    # oracle's uncapped replay stays bit-identical where it is run.
    cents = similarity.kmeans_codebook(emb, modulus=43, iters=2,
                                       init_limit=64)
    cells = similarity._assign_cells(emb, cents, "embedding", "vec_id")
    ct = (cells.join(emb.select("vec_id", "label"), "vec_id")
          .groupBy("cell_id", "label")
          .agg(F.count("*").cast("bigint").alias("n_cl")))
    ct.createOrReplaceTempView("ct")
    return spark.sql("WITH " + _CLUSTER_NMI_TAIL)


@query(
    "events_daily_ewma",
    oracle="""
    WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS d,
                          CAST(count(*) AS BIGINT) AS n
                   FROM events GROUP BY 1, 2),
    j AS (SELECT *, date_diff('day',
                              min(d) OVER (PARTITION BY event_type),
                              d) AS jd
          FROM daily),
    t AS (SELECT *, SUM(CASE WHEN jd = 0 THEN n
                             ELSE n * (1::BIGINT << CAST(jd - 1 AS INT)) END)
                    OVER (PARTITION BY event_type ORDER BY d
                          ROWS UNBOUNDED PRECEDING) AS tacc
          FROM j)
    SELECT event_type, CAST(d AS VARCHAR) AS day, n AS n_events,
           round(CAST(tacc AS DOUBLE)
                 / CAST((1::BIGINT << CAST(jd AS INT)) AS DOUBLE), 6) AS ewma
    FROM t
    """,
)
def events_daily_ewma(spark, sf_dir):
    """Exponentially-weighted moving average of daily event counts per
    type (alpha = 1/2, s_0 = x_0) — the smoothing/trend primitive
    behind anomaly baselines, computed WITHOUT recursion: with a
    half-life alpha the closed form s_d = (x_0 + sum_{j>=1} 2^(j-1)
    x_j) / 2^d is a windowed prefix sum of INTEGER terms divided by a
    power of two, so every intermediate is an exact IEEE double and
    the two engines agree bit-for-bit (no pow(), no ordered float
    accumulation). Weights come from shiftleft, not pow.

    Scale shape: aggregate-BEFORE-window — the corpus collapses to
    |type| x |day| rows before any ordered frame (the
    events_anomaly_zscore gate shape). The exact closed form needs
    day-index < 53 to stay in the double mantissa; beyond that span a
    production pipeline chunks by epoch or maintains the recursion
    incrementally per batch (the streaming form), which is why the
    operator documents rather than hides the bound."""
    ev = read_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type",
                        F.expr("CAST(ts AS DATE)").alias("d"))
             .agg(F.count("*").cast("bigint").alias("n")))
    # Hard guard on the closed form's validity bound: past day index
    # 52 the 2^j weights leave the double mantissa and the result
    # would be silently wrong — fail loudly instead (the fix at that
    # span is the streaming recursion, stateful.ewma_stream).
    j = daily.withColumn("jd", F.expr(
        "datediff(d, min(d) OVER (PARTITION BY event_type))")
    ).withColumn("jd", F.expr(
        "CASE WHEN jd > 52 THEN CAST(raise_error("
        "'events_daily_ewma: day span exceeds the exact closed form; "
        "use streaming.stateful.ewma_stream') AS INT) ELSE jd END"))
    t = j.withColumn("tacc", F.expr(
        "SUM(CASE WHEN jd = 0 THEN n "
        "ELSE n * shiftleft(CAST(1 AS BIGINT), CAST(jd - 1 AS INT)) END) "
        "OVER (PARTITION BY event_type ORDER BY d "
        "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"))
    return t.selectExpr(
        "event_type", "CAST(d AS STRING) AS day",
        "n AS n_events",
        "round(CAST(tacc AS DOUBLE) / "
        "CAST(shiftleft(CAST(1 AS BIGINT), CAST(jd AS INT)) AS DOUBLE), 6)"
        " AS ewma")


@query(
    "corpus_drift_report",
    oracle=f"""
    WITH d AS (SELECT doc_id % 5 = 0 AS is_new, {_ext.FAST_WORDS_SQL} AS w
               FROM documents),
    ex AS (SELECT is_new, unnest(w) AS tok FROM d),
    tc AS (SELECT tok,
                  CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT)
                      AS n_base,
                  CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT)
                      AS n_new
           FROM ex GROUP BY tok),
    t AS (SELECT *,
                 SUM(n_base) OVER () AS t_base,
                 SUM(n_new) OVER () AS t_new
          FROM tc),
    r AS (SELECT tok AS token, n_base, n_new,
                 CAST(floor(CAST(n_base AS DOUBLE) * 1e6 / t_base + 0.5)
                      AS BIGINT) AS rate_base_ppm,
                 CAST(floor(CAST(n_new AS DOUBLE) * 1e6 / t_new + 0.5)
                      AS BIGINT) AS rate_new_ppm
          FROM t)
    SELECT token, n_base, n_new, rate_base_ppm, rate_new_ppm,
           abs(rate_base_ppm - rate_new_ppm) AS drift_ppm
    FROM r
    ORDER BY drift_ppm DESC, token
    LIMIT 20
    """,
)
def corpus_drift_report(spark, sf_dir):
    """Snapshot-over-snapshot distribution drift: token rates (ppm) in
    the base slice (doc_id % 5 != 0) vs the new slice, top-20 tokens by
    absolute rate drift — the data-quality gate an incremental corpus
    pipeline runs before accepting a crawl (a scraper regression or
    boilerplate flood shows up here before it poisons training).

    Scale shape: ONE pass — both slices' counts come out of a single
    conditional-sum groupBy on the token (map-side partials), never
    two scans joined; corpus totals are windows OVER the vocab-sized
    aggregate; the ranking is TakeOrderedAndProject. Rates are
    floor(+0.5) integer ppm so the driver hash is exact."""
    from oracle_cassandra_migrator_spark.operators.text import (
        fast_words_expr)

    docs = read_table(spark, sf_dir, "documents")
    ex = docs.select(
        F.expr("doc_id % 5 = 0").alias("is_new"),
        F.explode(F.expr(fast_words_expr("text"))).alias("tok"))
    tc = (ex.groupBy("tok")
          .agg(F.expr("CAST(sum(CASE WHEN is_new THEN 0 ELSE 1 END)"
                      " AS BIGINT)").alias("n_base"),
               F.expr("CAST(sum(CASE WHEN is_new THEN 1 ELSE 0 END)"
                      " AS BIGINT)").alias("n_new")))
    t = (tc.withColumn("t_base", F.expr("SUM(n_base) OVER ()"))
         .withColumn("t_new", F.expr("SUM(n_new) OVER ()")))
    r = t.selectExpr(
        "tok AS token", "n_base", "n_new",
        "CAST(floor(CAST(n_base AS DOUBLE) * 1e6 / t_base + 0.5)"
        " AS BIGINT) AS rate_base_ppm",
        "CAST(floor(CAST(n_new AS DOUBLE) * 1e6 / t_new + 0.5)"
        " AS BIGINT) AS rate_new_ppm")
    return (r.withColumn(
                "drift_ppm",
                F.expr("abs(rate_base_ppm - rate_new_ppm)"))
            .orderBy(F.col("drift_ppm").desc(), "token")
            .limit(20))


@query(
    "sketch_theta_set_algebra",
    oracle="""
    WITH pu AS (SELECT user_id,
                       max(event_type = 'purchase') AS has_a,
                       max(event_type = 'click') AS has_b
                FROM events
                WHERE CAST(ts AS DATE) < DATE '2024-01-06'
                GROUP BY user_id)
    SELECT CAST(sum(CASE WHEN has_a THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(sum(CASE WHEN has_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(sum(CASE WHEN has_a AND has_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both,
           CAST(sum(CASE WHEN has_a OR has_b THEN 1 ELSE 0 END) AS BIGINT)
               AS n_union,
           CAST(sum(CASE WHEN has_a AND NOT has_b THEN 1 ELSE 0 END)
                AS BIGINT) AS n_only_a,
           TRUE AS inter_ok, TRUE AS union_ok, TRUE AS diff_ok
    FROM pu
    """,
)
def sketch_theta_set_algebra(spark, sf_dir):
    """Theta-sketch set algebra (Spark 4.1 DataSketches builtins) as a
    checked bounded-error contract: early-window purchasers (set A) vs
    clickers (set B), with |A∩B|, |A∪B|, |A\\B| estimated via
    theta_intersection / theta_union / theta_difference — the
    capability HLL fundamentally lacks (HLL unions only; see
    agg_hll_sketch_rollup). Exact counts are the hash-compared
    columns; the booleans pin each theta estimate within 2% of truth
    (below the sketch's 4096 nominal entries theta runs in exact mode,
    so there is wide headroom — a silent estimator regression flips
    the hash).

    Scale shape: ONE user-keyed aggregation collapses events to
    per-user flags; exact counts and all six sketches come out of a
    single second aggregation over that — no joins, no corpus rescans.
    At 100 TB the sketches become the only carried state: fixed-size,
    mergeable across shards/days, and intersectable AFTER the fact —
    the audience-overlap query pattern."""
    ev = read_table(spark, sf_dir, "events")
    pu = (ev.where("CAST(ts AS DATE) < DATE '2024-01-06'")
          .groupBy("user_id")
          .agg(F.expr("max(event_type = 'purchase')").alias("has_a"),
               F.expr("max(event_type = 'click')").alias("has_b")))
    agg = pu.agg(
        F.expr("CAST(sum(CASE WHEN has_a THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_a"),
        F.expr("CAST(sum(CASE WHEN has_b THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_b"),
        F.expr("CAST(sum(CASE WHEN has_a AND has_b THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_both"),
        F.expr("CAST(sum(CASE WHEN has_a OR has_b THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_union"),
        F.expr("CAST(sum(CASE WHEN has_a AND NOT has_b THEN 1 ELSE 0 END)"
               " AS BIGINT)").alias("n_only_a"),
        F.expr("theta_sketch_agg(CASE WHEN has_a THEN user_id END)")
            .alias("ska"),
        F.expr("theta_sketch_agg(CASE WHEN has_b THEN user_id END)")
            .alias("skb"),
    )
    ok = ("abs(theta_sketch_estimate({expr}) - {exact})"
          " <= 0.02 * {exact} + 1")
    return agg.selectExpr(
        "n_a", "n_b", "n_both", "n_union", "n_only_a",
        ok.format(expr="theta_intersection(ska, skb)", exact="n_both")
        + " AS inter_ok",
        ok.format(expr="theta_union(ska, skb)", exact="n_union")
        + " AS union_ok",
        ok.format(expr="theta_difference(ska, skb)", exact="n_only_a")
        + " AS diff_ok",
    )


@query(
    "sketch_kll_price_quantiles",
    oracle="""
    SELECT round(quantile_cont(l_extendedprice::DOUBLE, 0.50), 4) AS p50,
           round(quantile_cont(l_extendedprice::DOUBLE, 0.90), 4) AS p90,
           TRUE AS kll_p50_ok, TRUE AS kll_p90_ok
    FROM lineitem
    """,
)
def sketch_kll_price_quantiles(spark, sf_dir):
    """KLL quantile sketch (Spark 4.1 DataSketches builtins) as a
    checked bounded-error contract: exact interpolated p50/p90 of
    lineitem prices are the hash-compared values (percentile ==
    DuckDB quantile_cont, the convention agg_approx_percentiles
    proved); the booleans pin each KLL estimate inside the exact
    quantile envelope at rank +/- 2% — KLL's guarantee is ~1.7% rank
    error at the default k=200, so a regression flips the hash.

    Why carry KLL next to approx_percentile: KLL sketches are
    MERGEABLE FIRST-CLASS VALUES (kll_merge_agg_double) — per-shard /
    per-day sketches roll up like the HLL and theta families, which
    approx_percentile's internal-only sketch cannot do. That is the
    quantile story at 100 TB: one fixed-size sketch per partition,
    merged hierarchically, queried at any rank after the fact.

    This catalog arm audits against the exact sort-based percentile
    (``exact=True``) so the oracle replays it; the sort-free scale arm
    is ``kll_quantile_report(..., exact=False)`` — approx_percentile
    envelope, one scan + fixed-size state — benched at the 30x/100x
    probes in SCALE.md (r8)."""
    from oracle_cassandra_migrator_spark.operators.sketches import (
        kll_quantile_report)

    li = read_table(spark, sf_dir, "lineitem")
    return kll_quantile_report(
        li, "CAST(l_extendedprice AS DOUBLE)", exact=True)


@query(
    "events_props_variant_stats",
    oracle="""
    WITH m AS (SELECT event_type,
                      CASE WHEN event_id % 97 = 0
                           THEN substring(props, 1, 3) ELSE props END AS p
               FROM events),
    v AS (SELECT event_type,
                 CASE WHEN json_valid(p)
                      THEN CAST(json_extract_string(p, '$.k') AS BIGINT)
                 END AS k,
                 CASE WHEN json_valid(p) THEN 0 ELSE 1 END AS bad
          FROM m)
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(bad) AS BIGINT) AS n_malformed,
           CAST(sum(k) AS BIGINT) AS sum_k,
           CAST(max(k) AS BIGINT) AS max_k
    FROM v GROUP BY event_type
    """,
)
def events_props_variant_stats(spark, sf_dir):
    """The VARIANT type (Spark 4 semi-structured columnar encoding) in
    the driver-checked catalog, not just pytest: props parse through
    try_parse_json into VARIANT, fields extract via typed
    variant_get, and deliberately-mangled rows (event_id % 97 — a
    truncated prefix) exercise the malformed path: try_parse_json
    nulls them instead of failing the job, and they are counted
    explicitly. The DuckDB oracle mirrors with json_valid +
    json_extract_string.

    Scale shape: parse + extract are per-row (VARIANT's shredded
    binary encoding is exactly what makes repeated path access cheap
    at scale vs re-parsing JSON text); the only shuffle is the final
    |type|-group aggregate with map-side partials."""
    ev = read_table(spark, sf_dir, "events")
    m = ev.selectExpr(
        "event_type",
        "CASE WHEN event_id % 97 = 0 THEN substring(props, 1, 3)"
        " ELSE props END AS p")
    v = m.selectExpr(
        "event_type",
        "variant_get(try_parse_json(p), '$.k', 'bigint') AS k",
        "CASE WHEN try_parse_json(p) IS NULL THEN 1 ELSE 0 END AS bad")
    return v.groupBy("event_type").agg(
        F.expr("CAST(count(*) AS BIGINT)").alias("n_events"),
        F.expr("CAST(sum(bad) AS BIGINT)").alias("n_malformed"),
        F.expr("CAST(sum(k) AS BIGINT)").alias("sum_k"),
        F.expr("CAST(max(k) AS BIGINT)").alias("max_k"))


def _minshingle_oracle(threshold: float = 0.5, width: int = 2) -> str:
    leads = "\n           UNION ALL ".join(
        f"SELECT doc_a, n{k} AS doc_b FROM nb WHERE n{k} IS NOT NULL"
        for k in range(1, width + 1))
    lead_cols = ",\n              ".join(
        f"lead(doc_id, {k}) OVER (PARTITION BY blk ORDER BY doc_id) AS n{k}"
        for k in range(1, width + 1))
    return f"""
    WITH {_ext._SHINGLE_CTE},
    b AS (SELECT doc_id,
                 list_aggregate(list_transform(shingles,
                     s -> ('0x' || substring(md5(s), 1, 15))::BIGINT),
                     'min') AS blk
          FROM sh WHERE len(shingles) > 0),
    nb AS (SELECT doc_id AS doc_a,
              {lead_cols}
           FROM b),
    cand AS (SELECT DISTINCT doc_a, doc_b FROM (
           {leads}))
    SELECT doc_a, doc_b, jaccard
    FROM ({_ext._JACCARD_SQL}) WHERE jaccard_raw >= {threshold}
    """


@query("dedup_minshingle_neighbors", oracle=_minshingle_oracle())
def dedup_minshingle_neighbors(spark, sf_dir):
    """Fourth candidate-generation family beside the inverted index
    (exact, joins every shingle), MinHash-LSH (approximate, banded
    signatures), and AllPairs (exact, rarest-prefix joins):
    sorted-neighborhood blocking on the min hashed shingle — zero
    self-joins, one window, O(n * width) candidates. The cheapest
    blocking pass a crawl pipeline runs FIRST, catching the bulk of
    near-identical docs before the heavier strategies see the
    residue. See operators/dedup.py:minshingle_neighbor_pairs."""
    from oracle_cassandra_migrator_spark.operators import dedup

    docs = read_table(spark, sf_dir, "documents")
    return dedup.minshingle_neighbor_pairs(
        docs, "text", "doc_id", n=3, width=2, threshold=0.5)


def _dedup_recall_oracle() -> str:
    strat = {
        "a_exact_inverted": ORACLES["dedup_ngram_jaccard"],
        "b_allpairs_prefix": ORACLES["dedup_allpairs_prefix"],
        "c_minhash_lsh": ORACLES["dedup_minhash_lsh"],
        "d_minshingle_neighbors": ORACLES["dedup_minshingle_neighbors"],
    }
    legs = "\n    UNION ALL ".join(
        f"""SELECT '{k}' AS strategy,
               CAST((SELECT count(*) FROM ({sql}) s) AS BIGINT) AS n_pairs,
               CAST((SELECT count(*) FROM ({sql}) s
                     JOIN ex0 USING (doc_a, doc_b)) AS BIGINT) AS n_hits"""
        for k, sql in strat.items())
    return f"""
    WITH ex0 AS (SELECT doc_a, doc_b
                 FROM ({ORACLES["dedup_ngram_jaccard"]}) e),
    legs AS ({legs})
    SELECT strategy, n_pairs, n_hits,
           CAST(floor(n_hits * 1e6
                      / (SELECT count(*) FROM ex0) + 0.5) AS BIGINT)
               AS recall_ppm
    FROM legs
    """


@query("dedup_strategy_recall_report", oracle=_dedup_recall_oracle())
def dedup_strategy_recall_report(spark, sf_dir):
    """The candidate-generation capstone: one row per strategy —
    inverted index (exact reference), AllPairs prefix filtering
    (exact, must hit 1e6 ppm), MinHash-LSH (banded approximate), and
    min-shingle sorted-neighborhood (cheapest, lowest recall) — with
    pair counts and recall vs the exact truth in integer ppm. This is
    the table a curation team reads when choosing how much exactness
    to pay for at which corpus scale; the per-strategy costs are in
    SCALE.md's measured-scaling section.

    Composition query: each leg IS the corresponding catalog query
    (same functions, same oracles composed as CTEs), so a drift in
    any strategy shows up here as a recall change the driver hashes.
    The recall normalizer rides a window over the 4-row union — no
    cross join."""
    from pyspark.sql.window import Window

    exact = (_ext.dedup_ngram_jaccard(spark, sf_dir)
             .select("doc_a", "doc_b").persist())
    legs = {
        "a_exact_inverted": exact,
        "b_allpairs_prefix": dedup_allpairs_prefix(spark, sf_dir),
        "c_minhash_lsh": _ext.dedup_minhash_lsh(spark, sf_dir),
        "d_minshingle_neighbors": dedup_minshingle_neighbors(
            spark, sf_dir),
    }
    rows = None
    for k, df in legs.items():
        pairs = df.select("doc_a", "doc_b")
        leg = pairs.join(exact, ["doc_a", "doc_b"], "left_semi").agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_hits"),
        ).crossJoin(pairs.agg(
            F.expr("CAST(count(*) AS BIGINT)").alias("n_pairs"))
        ).selectExpr(f"'{k}' AS strategy", "n_pairs", "n_hits")
        rows = leg if rows is None else rows.unionByName(leg)
    w = Window.orderBy(F.lit(1)).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing)
    total = F.max(F.expr(
        "CASE WHEN strategy = 'a_exact_inverted' THEN n_pairs END")).over(w)
    return rows.withColumn("__tot", total).selectExpr(
        "strategy", "n_pairs", "n_hits",
        "CAST(floor(n_hits * 1e6 / __tot + 0.5) AS BIGINT) AS recall_ppm")


# ---------------------------------------------------------------------------
# stream_dedup_admission_batch — the streaming bloom dedup's batch twin
# ---------------------------------------------------------------------------

# Shards and fingerprints mirror streaming/stateful.bloom_dedup_stream
# exactly (8 shards, md5 hashing): the stream's admission decision —
# first arrival of a fingerprint wins, in event order — IS
# SQL-expressible even though the stream itself is not, so the batch
# twin gets a full driver row while the streaming form stays pytest
# (stream==batch admission parity pinned in test_streaming.py).
_ADMISSION_FP = "md5(concat(CAST(user_id AS STRING), ':', event_type))"
_ADMISSION_N_SHARDS = 8


@query(
    "stream_dedup_admission_batch",
    oracle=f"""
    WITH f AS (SELECT event_id,
                      md5(user_id::VARCHAR || ':' || event_type)
                          AS fingerprint
               FROM events),
    r AS (SELECT *,
                 row_number() OVER (PARTITION BY fingerprint
                                    ORDER BY event_id) AS rn,
                 count(*) OVER (PARTITION BY fingerprint) AS n
          FROM f)
    SELECT CAST(('0x' || substring(md5(fingerprint), 1, 8))::BIGINT
                % {_ADMISSION_N_SHARDS} AS INT) AS shard,
           fingerprint,
           CAST(event_id AS BIGINT) AS admitted_event_id,
           CAST(n - 1 AS BIGINT) AS n_suppressed
    FROM r WHERE rn = 1
    """,
)
def stream_dedup_admission_batch(spark, sf_dir):
    """First-seen admission over event order — the exact-semantics
    batch twin of ``streaming.stateful.bloom_dedup_stream`` (VERDICT
    r5 #6): per fingerprint md5(user:type), the earliest event_id is
    admitted and every later arrival is suppressed; ``shard`` is the
    stream operator's state-shard hash verbatim, so a row here names
    which stream shard would have owned the decision. The stream's
    only divergence from this table is its bounded-state approximation
    (a bloom false positive suppresses a first arrival); equality on
    this corpus is pinned in test_streaming.py.

    Scale shape: one map-side-combined groupBy on the fingerprint
    (min/count — no window over the raw stream of rows); the oracle
    uses the row_number formulation to prove the pick-first semantics
    independently. At 100 TB this is the standard first-touch
    collapse: shuffle O(|distinct fingerprints|) after partial
    aggregation, never the event log."""
    ev = read_table(spark, sf_dir, "events")
    return (
        ev.selectExpr("event_id", f"{_ADMISSION_FP} AS fingerprint")
        .groupBy("fingerprint")
        .agg(F.expr("CAST(min(event_id) AS BIGINT)")
             .alias("admitted_event_id"),
             F.expr("CAST(count(*) - 1 AS BIGINT)").alias("n_suppressed"))
        .selectExpr(
            f"CAST(CAST(conv(substring(md5(fingerprint), 1, 8), 16, 10)"
            f" AS BIGINT) % {_ADMISSION_N_SHARDS} AS INT) AS shard",
            "fingerprint", "admitted_event_id", "n_suppressed")
    )


# ---------------------------------------------------------------------------
# dedup_bloom_ranged_audit — driver row for the per-range bloom path
# ---------------------------------------------------------------------------

_RANGED_BLOOM_N = 4


def _bloom_ranged_oracle() -> str:
    from oracle_cassandra_migrator_spark.operators import sketches

    ctes = sketches.bloom_sql_ctes_ranged(
        f"SELECT DISTINCT md5({_ext.NORM_SQL}) AS fp FROM documents "
        f"WHERE doc_id % 5 <> 0", _RANGED_BLOOM_N)
    return f"""
    WITH {ctes},
    allp AS (SELECT doc_id, md5({_ext.NORM_SQL}) AS fp FROM documents),
    probed AS (SELECT doc_id, fp,
                      {sketches.bloom_hit_sql_ranged('fp', _RANGED_BLOOM_N)}
                          AS bloom_hit
               FROM allp),
    flags AS (SELECT doc_id, bloom_hit,
                     CASE WHEN bloom_hit
                               AND fp IN (SELECT fp FROM bkeys)
                          THEN 1 ELSE 0 END AS in_base
              FROM probed)
    SELECT CAST({_RANGED_BLOOM_N} AS INT) AS n_ranges,
           CAST(count(*) AS BIGINT) AS n_probed,
           CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_hit,
           CAST(sum(in_base) AS BIGINT) AS n_members,
           CAST(sum(CASE WHEN bloom_hit AND in_base = 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM flags
    """


@query("dedup_bloom_ranged_audit", oracle=_bloom_ranged_oracle())
def dedup_bloom_ranged_audit(spark, sf_dir):
    """The per-range bloom scale path (operators/sketches.py
    ``bloom_build_ranged``/``bloom_probe_ranged``), audited end to end
    exactly like ``dedup_bloom_prefilter`` audits the single-literal
    path: base fingerprints (doc_id % 5 != 0) hash-partition into 4
    ranges with one fixed-geometry filter each, kept DISTRIBUTED as a
    (range_id, wmap) table the probe equi-joins by range — no driver
    collect, no whole-filter broadcast. The audit proves the two
    contract halves at driver strength: n_members counts every base
    doc (zero false negatives across ranges), n_false_pos measures
    the per-range FP cost (lower fill per filter than the
    single-bloom audit at identical total geometry spend).

    At 100 TB this is the post-broadcast regime: capacity scales
    linearly with n_ranges at constant per-range FP rate, each probe
    task co-partitions with only its ranges' words, and the build
    stays a map-side-combined bit_or whose exchange moves
    O(tasks x 256 x n_ranges_per_task) rows."""
    from oracle_cassandra_migrator_spark.operators import sketches
    from oracle_cassandra_migrator_spark.operators.text import (
        fingerprint_expr)

    docs = read_table(spark, sf_dir, "documents")
    fp = fingerprint_expr("text")
    base_fp = (docs.where("doc_id % 5 != 0")
               .select(F.expr(fp).alias("fingerprint")).distinct())
    blooms = sketches.bloom_build_ranged(
        base_fp, "fingerprint", _RANGED_BLOOM_N)
    probed = sketches.bloom_probe_ranged(
        docs.select("doc_id", F.expr(fp).alias("fingerprint")),
        blooms, "fingerprint", _RANGED_BLOOM_N, hit_col="bloom_hit")
    marked = base_fp.selectExpr("fingerprint AS base_fp",
                                "1 AS in_base_raw")
    joined = probed.join(
        F.broadcast(marked),
        F.expr("fingerprint = base_fp AND bloom_hit"), "left")
    flags = joined.select(
        "doc_id", "bloom_hit",
        F.expr("CASE WHEN bloom_hit THEN coalesce(in_base_raw, 0)"
               " ELSE 0 END").alias("in_base"))
    return flags.agg(
        F.expr(f"CAST({_RANGED_BLOOM_N} AS INT)").alias("n_ranges"),
        F.count("*").cast("bigint").alias("n_probed"),
        F.expr("CAST(sum(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT)")
            .alias("n_bloom_hit"),
        F.expr("CAST(sum(in_base) AS BIGINT)").alias("n_members"),
        F.expr("CAST(sum(CASE WHEN bloom_hit AND in_base = 0 "
               "THEN 1 ELSE 0 END) AS BIGINT)").alias("n_false_pos"))


# ---------------------------------------------------------------------------
# join_fuzzy_customer_names — blocked edit-distance record linkage
# ---------------------------------------------------------------------------

# Deterministic "dirty" probe set: every customer name with ONE digit
# deleted from the varying window (digit positions 5-9 of the 9-digit
# suffix; positions 1-4 are constant zeros at these SFs, deleting one
# would make every probe collide). Deletion position = md5(name) mod 5.
_FUZZY_POS = ("(5 + CAST(conv(substring(md5(c_name), 1, 15), 16, 10)"
              " AS BIGINT) % 5)")
_FUZZY_POS_SQL = ("(5 + ('0x' || substring(md5(c_name), 1, 15))::BIGINT"
                  " % 5)")


def _fuzzy_oracle() -> str:
    return f"""
    WITH clean AS (SELECT c_custkey, c_name,
                          substring(c_name, 10, 9) AS dig
                   FROM customer),
    dirty AS (SELECT c_custkey AS dirty_id, c_name AS orig_name,
                     substring(c_name, 1, 9 + {_FUZZY_POS_SQL} - 1)
                     || substring(c_name, 9 + {_FUZZY_POS_SQL} + 1)
                         AS dirty_name
              FROM clean),
    dkeys AS (SELECT dirty_id, dirty_name, 'A' AS tag,
                     substring(dirty_name, 14, 2) AS k FROM dirty
              UNION ALL
              SELECT dirty_id, dirty_name, 'B',
                     substring(dirty_name, 16, 2) FROM dirty),
    ckeys AS (SELECT c_custkey, c_name, 'A' AS tag,
                     substring(c_name, 14, 2) AS k FROM clean
              UNION ALL
              SELECT c_custkey, c_name, 'B',
                     substring(c_name, 17, 2) FROM clean),
    cand AS (SELECT DISTINCT d.dirty_id, d.dirty_name,
                    c.c_custkey, c.c_name
             FROM dkeys d JOIN ckeys c ON d.tag = c.tag AND d.k = c.k),
    ver AS (SELECT dirty_id, dirty_name, c_custkey, c_name,
                   levenshtein(dirty_name, c_name) AS lev_dist
            FROM cand),
    best AS (SELECT *, row_number() OVER (
                 PARTITION BY dirty_id
                 ORDER BY lev_dist, c_name) AS rn
             FROM ver WHERE lev_dist <= 1)
    SELECT CAST(dirty_id AS BIGINT) AS dirty_id, dirty_name,
           CAST(c_custkey AS BIGINT) AS matched_custkey,
           CAST(lev_dist AS BIGINT) AS lev_dist,
           (c_custkey = dirty_id) AS is_correct
    FROM best WHERE rn = 1
    """


@query("join_fuzzy_customer_names", oracle=_fuzzy_oracle())
def join_fuzzy_customer_names(spark, sf_dir):
    """Blocked edit-distance similarity join (record linkage): a
    deterministic dirty probe set — every customer name with one digit
    deleted — links back to the clean names via TWO blocking keys,
    then exact levenshtein verifies candidates and the best match
    (min distance, name tiebreak) wins per probe. ``is_correct``
    makes linkage accuracy a driver-hashed column: ambiguous probes
    (several names within distance 1) resolve to the tiebreak winner,
    which is not always the source row.

    Zero false negatives BY CONSTRUCTION, the property naive q-gram
    blocking loses on zero-padded ids (every name shares the high
    digits, so selective grams don't exist): the deletion lands in the
    5-char varying window, key A = window chars 1-2 survives deletions
    at window offsets 3-5, key B = window's last 2 chars survives
    offsets 1-3 — every single-deletion keeps at least one key intact,
    so the true pair is always a candidate. Block sizes are bounded by
    key selectivity (~|rows|/10^2 per key), the candidate join is two
    equi-joins + a distinct — never all-pairs — and the verify step is
    per-candidate O(len^2) on 18-char strings. At 100 TB: exactly the
    inverted-index topology of dedup_ngram_jaccard with the same
    hot-block cap option if a key degenerates."""
    from oracle_cassandra_migrator_spark.operators.linkage import (
        fuzzy_join)

    cust = read_table(spark, sf_dir, "customer")
    clean = cust.selectExpr("c_custkey", "c_name")
    dirty = clean.selectExpr(
        "c_custkey AS dirty_id",
        f"concat(substring(c_name, 1, 9 + {_FUZZY_POS} - 1), "
        f"substring(c_name, 9 + {_FUZZY_POS} + 1)) AS dirty_name")
    best = fuzzy_join(
        dirty, clean, "dirty_name", "c_name",
        left_block_keys=["substring(dirty_name, 14, 2)",
                         "substring(dirty_name, 16, 2)"],
        right_block_keys=["substring(c_name, 14, 2)",
                          "substring(c_name, 17, 2)"],
        max_dist=1, pick_best=True, left_id="dirty_id")
    return best.selectExpr(
        "CAST(dirty_id AS BIGINT) AS dirty_id", "dirty_name",
        "CAST(c_custkey AS BIGINT) AS matched_custkey",
        "CAST(lev_dist AS BIGINT) AS lev_dist",
        "c_custkey = dirty_id AS is_correct")


# ---------------------------------------------------------------------------
# sim_mmr_diversified_topk — MMR re-ranking over the retrieval pool
# ---------------------------------------------------------------------------

_MMR_K = 5
_MMR_POOL = 20


def _mmr_cos_sql(a: str, b: str) -> str:
    return (
        f"round(list_dot_product({a}::DOUBLE[], {b}::DOUBLE[])"
        f" / (sqrt(list_dot_product({a}::DOUBLE[], {a}::DOUBLE[]))"
        f" * sqrt(list_dot_product({b}::DOUBLE[], {b}::DOUBLE[]))), 6)"
    )


def _mmr_oracle(k: int = _MMR_K, pool: int = _MMR_POOL) -> str:
    """Unrolled k-step replay of the greedy MMR selection: step CTEs
    s1..sk each pick the deterministic argmax (mmr DESC, vec_id) over
    the pool minus the running selection; redundancy is the max of
    6-dp-rounded cosines to every prior pick — the exact arithmetic
    operators/similarity.mmr_topk runs engine-side."""
    cos_pq = _mmr_cos_sql("e.embedding", "q.q")
    parts = [
        "qrow AS (SELECT embedding AS q FROM embeddings WHERE vec_id = 0)",
        f"""pool AS (SELECT e.vec_id, e.embedding, {cos_pq} AS rel
             FROM embeddings e CROSS JOIN qrow q
             WHERE e.vec_id <> 0
             ORDER BY rel DESC, e.vec_id LIMIT {pool})""",
        """s1 AS (SELECT vec_id, embedding, rel, rel AS mmr FROM pool
             ORDER BY rel DESC, vec_id LIMIT 1)""",
        "u1 AS (SELECT * FROM s1)",
    ]
    cos_ps = _mmr_cos_sql("p.embedding", "s.embedding")
    for t in range(2, k + 1):
        p = t - 1
        parts.append(f"""
    r{t} AS (SELECT p.vec_id, p.rel, max({cos_ps}) AS red
             FROM pool p CROSS JOIN u{p} s
             WHERE p.vec_id NOT IN (SELECT vec_id FROM u{p})
             GROUP BY p.vec_id, p.rel)""")
        parts.append(f"""
    s{t} AS (SELECT r.vec_id, p.embedding, r.rel,
                    round(0.7e0 * r.rel - 0.3e0 * r.red, 6) AS mmr
             FROM r{t} r JOIN pool p USING (vec_id)
             ORDER BY mmr DESC, r.vec_id LIMIT 1)""")
        parts.append(
            f"u{t} AS (SELECT * FROM u{p} UNION ALL SELECT * FROM s{t})")
    sel = "\n    UNION ALL ".join(
        f"SELECT CAST({t} AS BIGINT) AS pick_rank, vec_id, rel, mmr"
        f" FROM s{t}" for t in range(1, k + 1))
    return "WITH " + ",\n    ".join(parts) + "\n    " + sel


@query("sim_mmr_diversified_topk", oracle=_mmr_oracle())
def sim_mmr_diversified_topk(spark, sf_dir):
    """MMR-diversified retrieval (lambda=0.7, k=5 over a pool of 20):
    the re-ranker that turns a plain cosine top-k into a diverse
    answer set — each pick maximizes relevance minus redundancy with
    what is already picked. See operators/similarity.mmr_topk for the
    algorithm and the bounded-collect scale argument (candidate
    generation is the only corpus-scale stage; the greedy loop is
    k engine-side argmaxes over the persisted pool). The oracle
    unrolls all 5 greedy steps as CTEs, so the driver hash pins every
    pick, its relevance, and its marginal score."""
    from oracle_cassandra_migrator_spark.operators import similarity

    emb = read_table(spark, sf_dir, "embeddings")
    return similarity.mmr_topk(
        emb, k=_MMR_K, pool=_MMR_POOL, lam=0.7, query_id=0)
