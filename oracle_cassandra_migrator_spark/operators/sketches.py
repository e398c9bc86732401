"""Mergeable frequency/membership sketches: Bloom-filter pre-join
pruning and Count-Min frequency estimation.

Both sketches are tiny, *mergeable* aggregates — the shape that scales:
at 100 TB the build side is a map-side partial aggregation that
collapses to a fixed-size table (<= M_BITS/64 rows for the Bloom
filter, DEPTH*WIDTH rows for Count-Min) regardless of input size, and
the probe/estimate side is either a pure projection (Bloom words
re-entered as a map literal — the same bounded train-out-of-plan
pattern as the IVF/SemDeDup codebooks) or a broadcast hash join against
the sketch table. Nothing here shuffles the corpus more than once.

All hashing is md5-derived (NOTES.md exactness conventions) so every
DuckDB oracle replays the sketch bit-for-bit: position/slot i of key x
is the top-60-bit integer of md5(i || ':' || x) reduced mod the table
size. Deterministic across engines, partitionings, and reruns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Bloom geometry: 16384 bits = 256 x 64-bit words, 3 probes. For the
# catalog's snapshot sizes (~thousands of fingerprints) that is an
# ~1-2% false-positive rate — large enough to be observable in the
# audit query, small enough to prune almost all of the exact-join work.
# At 100 TB you scale M_BITS with the base-snapshot cardinality (the
# build stays a fixed-size bit_or aggregate) and either keep the
# broadcast join or, past a few GB of filter, partition both sides by
# fingerprint range and build one bloom per range.
BLOOM_M_BITS = 16_384
BLOOM_K = 3

# Count-Min geometry: depth 3 x width 1024. Estimates are biased UP
# (est >= exact always, with this exact hash family in both engines),
# and the min over 3 independent rows is what makes the bias small.
CMS_DEPTH = 3
CMS_WIDTH = 1024


def md5_mod_spark(expr: str, m: int) -> str:
    """Deterministic value in [0, m) from md5 of a string expression
    (Spark side). 15 hex chars < 2^60 so the conv() result is a
    positive BIGINT and % == pmod."""
    return (f"CAST(conv(substring(md5({expr}), 1, 15), 16, 10) AS BIGINT)"
            f" % {m}")


def md5_mod_sql(expr: str, m: int) -> str:
    """DuckDB twin of md5_mod_spark."""
    return f"(('0x' || substring(md5({expr}), 1, 15))::BIGINT % {m})"


def bloom_pos_spark(i: int, key_col: str) -> str:
    return md5_mod_spark(f"concat('{i}:', {key_col})", BLOOM_M_BITS)


def bloom_pos_sql(i: int, key_col: str) -> str:
    return md5_mod_sql(f"'{i}:' || {key_col}", BLOOM_M_BITS)


def bloom_build(keys: DataFrame, key_col: str) -> DataFrame:
    """Aggregate a key column into Bloom-filter words: one row per
    64-bit word that has at least one bit set -> (word_idx BIGINT,
    word BIGINT). A bit_or aggregation over <= BLOOM_M_BITS/64 groups:
    map-side partials collapse each task's keys to <= 256 rows, so the
    exchange moves O(n_tasks * 256) rows no matter the corpus size —
    this is what makes the filter buildable at 100 TB."""
    positions = ", ".join(
        bloom_pos_spark(i, key_col) for i in range(BLOOM_K))
    return (
        keys.select(F.explode(F.expr(f"array({positions})")).alias("pos"))
        .where(F.col("pos").isNotNull())  # NULL keys can't set bits
        .groupBy(F.expr("pos div 64").alias("word_idx"))
        .agg(F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
        ).alias("word"))
    )


def bloom_literal_map(words: DataFrame) -> str:
    """Collect the built words (bounded by construction: <= 256 rows,
    enforced here) and re-enter them as a Spark map literal, so the
    probe is a zero-shuffle projection. Same train-out-of-plan pattern
    as the IVF codebooks; on a real cluster this collect moves < 4 KiB
    to the driver."""
    rows = sorted(words.collect(), key=lambda r: r["word_idx"])
    if len(rows) > BLOOM_M_BITS // 64:
        raise ValueError(
            f"bloom_literal_map: {len(rows)} words exceed the "
            f"{BLOOM_M_BITS // 64}-word geometry — not a bloom build")
    entries = ", ".join(
        f"{int(r['word_idx'])}L, {int(r['word'])}L" for r in rows)
    return f"map({entries})"


def bloom_probe_expr(map_expr: str, key_col: str) -> str:
    """Boolean expression: all BLOOM_K bits set for this key. The
    positions array is bound once via a transform lambda (text.py's
    shingles_once trick) so the md5s are evaluated BLOOM_K times per
    row, not 2*BLOOM_K."""
    positions = ", ".join(
        bloom_pos_spark(i, key_col) for i in range(BLOOM_K))
    checks = " AND ".join(
        f"((shiftright(coalesce(element_at({map_expr}, "
        f"element_at(p, {i + 1}) div 64), 0L), "
        f"CAST(element_at(p, {i + 1}) % 64 AS INT)) & 1) = 1)"
        for i in range(BLOOM_K))
    return (f"element_at(transform(array(array({positions})), "
            f"p -> ({checks})), 1)")


def bloom_sql_ctes(base_select: str) -> str:
    """DuckDB replay of the build: CTE bodies producing ``bwords``
    (word_idx, word) from ``SELECT <key AS fp> ...``-shaped
    ``base_select``."""
    return f"""
    bkeys AS ({base_select}),
    bpos AS (SELECT ('0x' || substring(md5(u.i::VARCHAR || ':' || fp), 1, 15))::BIGINT
                    % {BLOOM_M_BITS} AS pos
             FROM bkeys CROSS JOIN
                  (SELECT unnest([{", ".join(str(i) for i in range(BLOOM_K))}]) AS i) u),
    bwords AS (SELECT pos // 64 AS word_idx,
                      bit_or(CASE WHEN pos % 64 = 63
                                  THEN (-9223372036854775808)::BIGINT
                                  ELSE 1::BIGINT << CAST(pos % 64 AS INT)
                             END) AS word
               FROM bpos GROUP BY 1)
    """


def bloom_hit_sql(key_col: str) -> str:
    """DuckDB boolean: all BLOOM_K bits of ``key_col`` set in bwords
    (correlated EXISTS per probe — the oracle favors clarity over the
    literal-map plan, the *values* are what must match)."""
    probes = []
    for i in range(BLOOM_K):
        pos = bloom_pos_sql(i, key_col)
        probes.append(
            f"EXISTS (SELECT 1 FROM bwords b WHERE b.word_idx = ({pos}) // 64"
            f" AND ((b.word >> CAST(({pos}) % 64 AS INT)) & 1) = 1)")
    return "(" + " AND ".join(probes) + ")"


def bloom_range_expr(key_col: str, n_ranges: int) -> str:
    """Deterministic hash-range id in [0, n_ranges) for the ranged
    bloom family. A distinct salt ('r:') keeps the range hash
    independent of the BLOOM_K position hashes."""
    return md5_mod_spark(f"concat('r:', {key_col})", n_ranges)


def bloom_build_ranged(keys: DataFrame, key_col: str,
                       n_ranges: int) -> DataFrame:
    """The documented past-a-few-GB scale path (see BLOOM_M_BITS
    note): hash-partition the key space into ``n_ranges`` ranges and
    build one fixed-geometry bloom per range -> (range_id BIGINT,
    wmap MAP<BIGINT, BIGINT>). Total capacity scales linearly with
    ``n_ranges`` at constant per-range FP rate, and NO driver collect
    ever happens — the filters stay distributed as an
    O(n_ranges * 256)-row table that the probe side joins by range, so
    each executor task holds only its ranges' words instead of the
    whole filter."""
    positions = ", ".join(
        bloom_pos_spark(i, key_col) for i in range(BLOOM_K))
    words = (
        keys.select(
            F.expr(bloom_range_expr(key_col, n_ranges)).alias("range_id"),
            F.explode(F.expr(f"array({positions})")).alias("pos"))
        .where(F.col("pos").isNotNull())
        .groupBy("range_id", F.expr("pos div 64").alias("word_idx"))
        .agg(F.expr(
            "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT)))"
        ).alias("word"))
    )
    return words.groupBy("range_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct("word_idx", "word"))).alias("wmap"))


def bloom_probe_ranged(df: DataFrame, blooms: DataFrame, key_expr: str,
                       n_ranges: int, hit_col: str = "__hit") -> DataFrame:
    """Annotate ``df`` with ``hit_col``: whether ``key_expr`` probes
    true in its range's bloom. One equi-join on range_id (left join: a
    range with no base keys has no bloom row and probes false), then
    the same zero-extra-pass map probe as the literal path, reading
    the ``wmap`` column instead of a literal. Co-partitioning both
    sides on range_id is exactly "partition both sides by fingerprint
    range" — no single-node filter materialization anywhere."""
    # __-prefix the working columns (the package convention) so a
    # probe-side table that already has a 'wmap' column can't collide
    probed = (
        df.withColumn("__rid",
                      F.expr(bloom_range_expr(key_expr, n_ranges)))
        .join(blooms.withColumnRenamed("range_id", "__rid")
              .withColumnRenamed("wmap", "__wmap"),
              "__rid", "left"))
    return (probed.withColumn(
        hit_col,
        F.coalesce(F.expr(bloom_probe_expr("__wmap", key_expr)),
                   F.lit(False)))
        .drop("__rid", "__wmap"))


def bloom_range_sql(key_col: str, n_ranges: int) -> str:
    """DuckDB twin of bloom_range_expr."""
    return md5_mod_sql(f"'r:' || {key_col}", n_ranges)


def bloom_sql_ctes_ranged(base_select: str, n_ranges: int) -> str:
    """DuckDB replay of bloom_build_ranged: CTE bodies producing
    ``bwords`` (range_id, word_idx, word) from a
    ``SELECT <key AS fp> ...``-shaped ``base_select``."""
    return f"""
    bkeys AS ({base_select}),
    brange AS (SELECT fp, {bloom_range_sql('fp', n_ranges)} AS range_id
               FROM bkeys),
    bpos AS (SELECT range_id,
                    ('0x' || substring(md5(u.i::VARCHAR || ':' || fp), 1, 15))::BIGINT
                    % {BLOOM_M_BITS} AS pos
             FROM brange CROSS JOIN
                  (SELECT unnest([{", ".join(str(i) for i in range(BLOOM_K))}]) AS i) u),
    bwords AS (SELECT range_id, pos // 64 AS word_idx,
                      bit_or(CASE WHEN pos % 64 = 63
                                  THEN (-9223372036854775808)::BIGINT
                                  ELSE 1::BIGINT << CAST(pos % 64 AS INT)
                             END) AS word
               FROM bpos GROUP BY 1, 2)
    """


def bloom_hit_sql_ranged(key_col: str, n_ranges: int) -> str:
    """DuckDB boolean: all BLOOM_K bits of ``key_col`` set in ITS
    range's filter (ranged twin of bloom_hit_sql)."""
    rid = bloom_range_sql(key_col, n_ranges)
    probes = []
    for i in range(BLOOM_K):
        pos = bloom_pos_sql(i, key_col)
        probes.append(
            f"EXISTS (SELECT 1 FROM bwords b"
            f" WHERE b.range_id = ({rid})"
            f" AND b.word_idx = ({pos}) // 64"
            f" AND ((b.word >> CAST(({pos}) % 64 AS INT)) & 1) = 1)")
    return "(" + " AND ".join(probes) + ")"


def cms_slot_spark(d: int, key_col: str) -> str:
    return md5_mod_spark(f"concat('{d}:', {key_col})", CMS_WIDTH)


def cms_slot_sql(d: int, key_col: str) -> str:
    return md5_mod_sql(f"'{d}:' || {key_col}", CMS_WIDTH)


def cms_sketch(key_counts: DataFrame, key_col: str,
               cnt_col: str) -> DataFrame:
    """Fold (key, count) rows into the Count-Min table: (depth, slot,
    cms_count), <= CMS_DEPTH * CMS_WIDTH rows. Building from
    pre-aggregated counts is identical to hashing every occurrence
    (sums commute) and one corpus pass cheaper. Mergeable: sketches of
    two corpus shards add slot-wise, so at scale each partition/day
    builds its own and a <= 3072-group agg merges them."""
    slots = ", ".join(
        cms_slot_spark(d, key_col) for d in range(CMS_DEPTH))
    return (
        key_counts
        .select(F.col(cnt_col),
                F.posexplode(F.expr(f"array({slots})")).alias("depth", "slot"))
        .groupBy("depth", "slot")
        .agg(F.sum(cnt_col).cast("bigint").alias("cms_count"))
    )


def cms_estimate(keys: DataFrame, sketch: DataFrame,
                 key_col: str) -> DataFrame:
    """Point-estimate every key: min over depths of its slot counter.
    CMS_DEPTH broadcast hash joins against the fixed-size sketch —
    map-side at any corpus scale. LEFT joins with a 0 default: a probe
    key whose slot received no build mass estimates 0 (an inner join
    would silently DROP unseen keys from the output instead)."""
    est = keys
    for d in range(CMS_DEPTH):
        side = (sketch.where(F.col("depth") == d)
                .select(F.col("slot").alias(f"slot_{d}"),
                        F.col("cms_count").alias(f"c_{d}")))
        est = (est.withColumn(f"slot_{d}",
                              F.expr(cms_slot_spark(d, key_col)))
               .join(F.broadcast(side), f"slot_{d}", "left")
               .withColumn(f"c_{d}", F.expr(
                   f"coalesce(c_{d}, CAST(0 AS BIGINT))")))
    mins = ", ".join(f"c_{d}" for d in range(CMS_DEPTH))
    return (est.withColumn("est_cnt", F.expr(f"least({mins})"))
            .drop(*[c for d in range(CMS_DEPTH)
                    for c in (f"slot_{d}", f"c_{d}")]))


def kll_quantile_report(df: DataFrame, val_expr: str,
                        exact: bool = True,
                        accuracy: int = 10000) -> DataFrame:
    """The KLL bounded-error quantile contract behind
    ``sketch_kll_price_quantiles``: p50/p90 of ``val_expr`` plus
    booleans pinning each KLL estimate inside a rank +/- 2% envelope.

    ``exact=True`` (the oracle-checked catalog arm) audits against the
    sort-based ``percentile`` — inherently corpus-sorting, fine for an
    audit job. ``exact=False`` is the 100 TB switch (VERDICT r7 item
    3): the envelope comes from ``approx_percentile``, a bounded-memory
    QuantileSummaries sketch with map-side partials — the whole report
    is then one scan + fixed-size aggregation state, no sort anywhere.
    Envelope semantics are unchanged (values at ranks 48/52% and
    88/92%); approx_percentile's own rank error (<= 1/accuracy) is two
    orders below the 2% envelope width, so the contract keeps teeth."""
    pcts = "array(0.50D, 0.90D)"
    lo_p = "array(0.48D, 0.88D)"
    hi_p = "array(0.52D, 0.92D)"
    if exact:
        ex, lo, hi = (f"percentile({val_expr}, {p})"
                      for p in (pcts, lo_p, hi_p))
    else:
        ex, lo, hi = (f"approx_percentile({val_expr}, {p}, {accuracy})"
                      for p in (pcts, lo_p, hi_p))
    agg = df.agg(
        F.expr(ex).alias("ex"), F.expr(lo).alias("lo"),
        F.expr(hi).alias("hi"),
        F.expr(f"kll_sketch_agg_double({val_expr})").alias("sk"),
    )
    return agg.selectExpr(
        "round(ex[0], 4) AS p50", "round(ex[1], 4) AS p90",
        "kll_sketch_get_quantile_double(sk, 0.50)"
        " BETWEEN lo[0] AND hi[0] AS kll_p50_ok",
        "kll_sketch_get_quantile_double(sk, 0.90)"
        " BETWEEN lo[1] AND hi[1] AS kll_p90_ok",
    )
