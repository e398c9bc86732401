"""Similarity search over embedding columns (array<float>).

- ``cosine_topk``: brute-force exact top-k against one query vector.
  The dot product is a JVM-side ``aggregate(zip_with(...))`` fold in
  index order (deterministic, no Python). At cluster scale this is one
  narrow map + TakeOrderedAndProject — no shuffle of the vectors.
- ``cosine_pairs``: all-pairs near-duplicate detection above a cosine
  threshold. Quadratic — correct for small/blocked inputs; the scale
  path is ``lsh_bucketed_topk``.
- ``lsh_bucketed_topk``: random-hyperplane (sign) LSH — hyperplanes are
  derived deterministically from md5, vectors hash to a sign-bit
  bucket, and search only compares within-bucket (approximate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DOUBLE_VEC = "transform({col}, x -> CAST(x AS DOUBLE))"


def dot_expr(a: str, b: str) -> str:
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        f"CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)"
    )


def cosine_expr(a: str, b: str) -> str:
    return (
        f"({dot_expr(a, b)}) / "
        f"(sqrt({dot_expr(a, a)}) * sqrt({dot_expr(b, b)}))"
    )


def cosine_topk(
    embeddings: DataFrame, query: DataFrame, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k by cosine against a single-row query DataFrame with
    column ``q`` (array). Ties broken by id for determinism."""
    e = DOUBLE_VEC.format(col=vec_col)
    q = DOUBLE_VEC.format(col="q")
    return (
        embeddings.crossJoin(F.broadcast(query))
        .withColumn("cosine", F.expr(f"round({cosine_expr(e, q)}, 6)"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "cosine")
    )


# The forced-quadratic safety valve (the AllPairs guard's embedding
# twin, r9): n^2/2 comparisons over more rows than this refuse unless
# the caller overrides. At the default, the join evaluates ~5e9 cosine
# terms — hours of cluster time that an LSH-blocked run does in
# minutes, and recall there is tunable where this is a hard wall.
COSINE_PAIRS_MAX_ROWS = 100_000


def cosine_pairs(
    embeddings: DataFrame, threshold: float,
    vec_col: str = "embedding", id_col: str = "vec_id",
    max_rows: int | None = COSINE_PAIRS_MAX_ROWS,
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold. O(n^2) compare —
    use only on small or pre-blocked inputs; see lsh_bucketed_topk.

    Scale guard (r9 — the jaccard strategy guard's embedding analog,
    but a REFUSE-only valve: unlike the exact jaccard twins, the
    LSH-blocked composition is not output-identical, so silently
    routing would change results): above ``max_rows`` input rows this
    raises with the guidance to use ``cosine_pairs_lsh_blocked`` (or
    pre-block), instead of handing a 100 TB corpus the quadratic
    cross join. ``max_rows=None`` disables (the recall-audit truth
    arms run pre-limited inputs). The one count() job it costs is
    noise next to the join it gates.

    The streamed side is repartitioned to the session parallelism
    first: single-file inputs otherwise arrive as ONE partition, and a
    nested-loop join's parallelism is exactly its streamed side's
    partition count (measured 128 s -> 7 s at sf0.1 on local[32]).
    The work is still quadratic — that is this baseline's documented
    point — but it is quadratic across all cores."""
    if max_rows is not None:
        n = embeddings.count()
        if n > max_rows:
            raise ValueError(
                f"cosine_pairs is the O(n^2) exact baseline and the "
                f"input has {n} rows (max_rows={max_rows}): use "
                "cosine_pairs_lsh_blocked (bucketed candidates, exact "
                "verification) or pre-block the input; pass "
                "max_rows=None to force the quadratic join anyway")
    par = embeddings.sparkSession.sparkContext.defaultParallelism
    a = (embeddings.select(F.col(id_col).alias("id_a"),
                           F.col(vec_col).alias("va"))
         .repartition(par, "id_a"))
    b = embeddings.select(F.col(id_col).alias("id_b"),
                          F.col(vec_col).alias("vb"))
    ea = DOUBLE_VEC.format(col="va")
    eb = DOUBLE_VEC.format(col="vb")
    return (
        a.join(b, F.expr("id_a < id_b"))
        .withColumn("cosine", F.expr(f"round({cosine_expr(ea, eb)}, 6)"))
        .where(f"cosine >= {threshold}")
        .select("id_a", "id_b", "cosine")
    )


def cosine_pairs_lsh_blocked(
    embeddings: DataFrame, threshold: float, dim: int, n_planes: int = 4,
    vec_col: str = "embedding", id_col: str = "vec_id",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-duplicate pairs blocked by sign-LSH bucket — the scale
    composition of ``cosine_pairs``: candidates are only vectors
    sharing a bucket (one equi-join on the bucket key), never the
    all-pairs cross join. Recall is the standard sign-LSH bound — two
    vectors at angle θ share all ``n_planes`` sign bits with
    probability (1 - θ/π)^n_planes — tunable by lowering ``n_planes``
    or OR-ing multiple hash tables; precision is exact since every
    candidate is verified against the true cosine.

    ``max_bucket_size`` (r12) is the embedding twin of minhash's
    ``max_band_size`` guard: a bucket holding g vectors emits
    g*(g-1)/2 candidates, so one pathological bucket (a mass-
    duplicated canonical vector, all-zero embeddings) can dominate the
    whole job. Buckets above the cap are dropped before the self-join
    — their members are mass-duplicates whose dedup belongs to an
    exact-hash pass, not pairwise cosine verification. The count is a
    window over the same bucket key the join shuffles on, so it rides
    the existing exchange. Default None preserves the uncapped
    contract of the existing catalog oracles."""
    bucket = signbit_bucket_expr(vec_col, dim, n_planes)
    hashed = embeddings.select(
        F.expr(bucket).alias("bucket"),
        F.col(id_col), F.col(vec_col))
    if max_bucket_size is not None:
        from pyspark.sql.window import Window

        hashed = (hashed.withColumn(
            "__bsz", F.count("*").over(Window.partitionBy("bucket")))
            .where(F.col("__bsz") <= int(max_bucket_size))
            .drop("__bsz"))
    a = hashed.select("bucket", F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("va"))
    b = hashed.select("bucket", F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"))
    ea = DOUBLE_VEC.format(col="va")
    eb = DOUBLE_VEC.format(col="vb")
    return (
        a.join(b, "bucket")
        .where("id_a < id_b")
        .withColumn("cosine", F.expr(f"round({cosine_expr(ea, eb)}, 6)"))
        .where(f"cosine >= {threshold}")
        .select("id_a", "id_b", "cosine")
    )


def hyperplane_signs(plane_idx: int, dim: int) -> list[float]:
    """Deterministic pseudo-random hyperplane: component j in {-1, +1}
    from the parity of the md5 of 'p<i>:<j>'. Rademacher hyperplanes
    are a standard, provably LSH-valid choice for cosine. Computed
    driver-side so the plan carries a plain array literal — an
    equivalent md5 expression tree costs seconds of codegen per plan."""
    import hashlib

    return [
        1.0 if int(hashlib.md5(f"p{plane_idx}:{j}".encode())
                   .hexdigest()[:15], 16) % 2 == 0 else -1.0
        for j in range(dim)
    ]


def hyperplane_expr(plane_idx: int, dim: int) -> str:
    values = ", ".join(
        "1.0D" if v > 0 else "-1.0D"
        for v in hyperplane_signs(plane_idx, dim))
    return f"array({values})"


def signbit_bucket_expr(vec_col: str, dim: int, n_planes: int = 8) -> str:
    """Bucket id = concatenated sign bits of <v, plane_i>."""
    bits = []
    v = DOUBLE_VEC.format(col=vec_col)
    for i in range(n_planes):
        plane = hyperplane_expr(i, dim)
        bits.append(f"CASE WHEN {dot_expr(v, plane)} >= 0 THEN '1' ELSE '0' END")
    return "concat(" + ", ".join(bits) + ")"


def lsh_bucketed_topk(
    embeddings: DataFrame, query: DataFrame, dim: int,
    k: int = 10, n_planes: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: hash all vectors and the query into sign-bit
    buckets, rank only within the query's bucket. At scale the bucket
    column is a partition/cluster key so a probe touches one partition
    instead of the full corpus."""
    bucket = signbit_bucket_expr(vec_col, dim, n_planes)
    hashed = embeddings.withColumn("bucket", F.expr(bucket))
    q_hashed = query.withColumn(
        "bucket", F.expr(signbit_bucket_expr("q", dim, n_planes)))
    e = DOUBLE_VEC.format(col=vec_col)
    q = DOUBLE_VEC.format(col="q")
    return (
        hashed.join(F.broadcast(q_hashed), "bucket")
        .withColumn("cosine", F.expr(f"round({cosine_expr(e, q)}, 6)"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "bucket", "cosine")
    )


def _argmax_cell_expr(vec_expr: str) -> str:
    """Nearest-centroid pick over a one-column codebook array ``cents``
    (array<struct<cid,cvec>>): max over struct(aff, -cid) = highest
    dot-product affinity, ties to the smallest centroid id."""
    return (
        f"array_max(transform(cents, c -> "
        f"struct(round({dot_expr(vec_expr, 'c.cvec')}, 6) AS aff, "
        f"-c.cid AS neg_cid)))"
    )


def _assign_cells(embeddings: DataFrame, centroids: DataFrame,
                  vec_col: str, id_col: str) -> DataFrame:
    """(id, vec, cell_id) for every vector: zero-shuffle map over the
    corpus against the broadcast single-row codebook array."""
    codebook = centroids.select(
        "cid", F.expr(DOUBLE_VEC.format(col="cvec")).alias("cvec")
    ).agg(F.collect_list(F.struct("cid", "cvec")).alias("cents"))
    e = DOUBLE_VEC.format(col=vec_col)
    return (
        embeddings.crossJoin(F.broadcast(codebook))
        .withColumn("cell_id", F.expr(f"-({_argmax_cell_expr(e)}).neg_cid"))
        .select(id_col, vec_col, "cell_id")
    )


IVF_CENTROID_CAP = 4096


def _default_centroids(embeddings: DataFrame, modulus: int,
                       vec_col: str, id_col: str) -> DataFrame:
    """Untrained IVF centroid sample: the ``% modulus`` id-sample,
    capped at the ``IVF_CENTROID_CAP`` smallest qualifying ids. The
    modulus alone is a corpus FRACTION — at 100 TB the codebook would
    stop being broadcastable/collectable — so the absolute cap makes
    it O(1); below the cap (every driver SF) the set is identical to
    the bare ``% modulus`` sample, so existing oracle rows stay valid.
    TakeOrderedAndProject on the filtered sample — no corpus shuffle."""
    return (embeddings.where(f"{id_col} % {modulus} = 0")
            .orderBy(id_col).limit(IVF_CENTROID_CAP)
            .select(F.col(id_col).alias("cid"),
                    F.col(vec_col).alias("cvec")))


# Default absolute bound on the Lloyd training sample (and therefore on
# the init-sample SOURCE): kmeans_codebook caps its input to the
# KMEANS_TRAIN_CAP rows with the smallest "km-train"-salted id hash
# BEFORE the `% modulus` init filter, so anything probing init
# emptiness (streaming/annmaintain._train_or_fallback) must apply the
# same cap+salt or it tests a different set than training uses.
KMEANS_TRAIN_CAP = 16384
KMEANS_TRAIN_SALT = "km-train"


def kmeans_codebook(
    embeddings: DataFrame, modulus: int = 43, iters: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
    init_limit: int | None = None,
    train_cap: int | None = KMEANS_TRAIN_CAP,
) -> DataFrame:
    """Lloyd's k-means in pure DataFrame ops: deterministic id-sample
    init, then ``iters`` rounds of (assign to nearest centroid by dot
    product, recompute element-wise means). Returns (cid, cvec) — the
    trained codebook for ``ivf_topk``.

    Per iteration: assignment is the zero-shuffle broadcast-codebook
    map; the mean update posexplodes to (cell, dim, x) and partially
    aggregates map-side, so the shuffle carries ~|cells| x dim rows per
    partition, never the corpus. Element-wise means go through exact
    DECIMAL sums then one IEEE double division and round(6), so the
    centroids — and therefore every downstream assignment — are
    bit-reproducible in ANSI SQL (the DuckDB oracle replays the same
    iterations). Cells that lose all members simply drop out of the
    next round, like classic Lloyd with empty-cluster removal.

    ``init_limit`` caps the codebook at a FIXED size (the smallest
    ``init_limit`` qualifying ids, a deterministic TakeOrdered):
    without it the ``% modulus`` init grows linearly with the corpus,
    which is fine for a per-query codebook but wrong when the codebook
    must stay broadcastable/collectable at 100 TB.

    ``train_cap`` bounds the LLOYD ITERATIONS the same way: the
    assignment + mean-update passes run over the ``train_cap`` rows
    with the smallest salted id-hash (``cap_by_salted_hash``), not the
    corpus, so per-iteration training cost is O(cap) at any corpus
    size — the 10x scale probe measured the uncapped replay at 7.3x
    for 10x rows (VERDICT r6 item 3). Below the cap the filter is the
    identity, so every driver-SF output is bit-identical to the
    uncapped training (pinned by test_round7_semantics). The caller's
    final full-corpus assignment is still one pass over everything."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        cap_by_salted_hash)

    train = embeddings
    if train_cap is not None:
        train = cap_by_salted_hash(train, id_col, train_cap,
                                   KMEANS_TRAIN_SALT)
    init = train.where(f"{id_col} % {modulus} = 0")
    if init_limit is not None:
        init = init.orderBy(id_col).limit(init_limit)
    cents = init.select(
        F.col(id_col).alias("cid"),
        F.expr(DOUBLE_VEC.format(col=vec_col)).alias("cvec"))
    for _ in range(iters):
        assigned = _assign_cells(train, cents, vec_col, id_col)
        exploded = assigned.select(
            "cell_id",
            F.posexplode(F.expr(DOUBLE_VEC.format(col=vec_col)))
            .alias("dim_idx", "x"))
        dim_means = (
            exploded.groupBy("cell_id", "dim_idx")
            .agg(F.expr(
                "round(CAST(SUM(CAST(x AS DECIMAL(27,6))) AS DOUBLE)"
                " / COUNT(*), 6)").alias("m")))
        cents = (
            dim_means.groupBy("cell_id")
            .agg(F.expr(
                "transform(array_sort(collect_list(struct(dim_idx, m))),"
                " s -> s.m)").alias("cvec"))
            .selectExpr("cell_id AS cid", "cvec"))
    return cents


def ivf_topk(
    embeddings: DataFrame, modulus: int = 43, k: int = 10,
    query_id: int = 0,
    vec_col: str = "embedding", id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """IVF-style ANN: coarse-quantize every vector to its nearest
    centroid (centroids = a deterministic id-sample of the corpus,
    standing in for a trained k-means codebook), then search only the
    query's cell. At scale the cell id is the partition key, so a probe
    reads corpus/n_cells instead of everything.

    Assignment is a zero-shuffle map over the corpus: the whole codebook
    is folded into ONE array column (a single-row ``collect_list`` over
    the tiny centroid sample, broadcast to every task), and the nearest
    cell falls out of one ``array_max(transform(...))`` expression —
    max over ``struct(aff, -cid)`` = highest affinity, ties to the
    smallest centroid id. No per-(vector, centroid) row blow-up, no
    window, no corpus-wide exchange; the only shuffle in the whole plan
    is the |codebook|-row aggregation."""
    if centroids is None:
        centroids = _default_centroids(embeddings, modulus, vec_col, id_col)
    cells = _assign_cells(embeddings, centroids, vec_col, id_col)
    return topk_within_cells(cells, k=k, query_id=query_id,
                             vec_col=vec_col, id_col=id_col)


def topk_within_cells(
    cells: DataFrame, k: int = 10, query_id: int = 0,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Single-cell IVF probe over an ALREADY-ASSIGNED index frame
    (id, vec, cell_id) — the serving half of ``ivf_topk``, factored
    out so a maintained/materialized index can be probed without
    re-running assignment. The query row broadcasts into the cell-key
    join; only the query's cell is scored."""
    e = DOUBLE_VEC.format(col=vec_col)
    q = cells.where(f"{id_col} = {query_id}").select(
        F.col("cell_id").alias("qcell"), F.col(vec_col).alias("q"))
    qv = DOUBLE_VEC.format(col="q")
    return (
        cells.join(F.broadcast(q), F.expr("cell_id = qcell"))
        .withColumn("cosine", F.expr(f"round({cosine_expr(e, qv)}, 6)"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.col("cell_id").cast("bigint").alias("cell_id"),
                "cosine")
    )


def codebook_literal_expr(rows) -> str:
    """Render a collected codebook (rows with ``cid``/``cvec``) as one
    SQL array-of-struct literal. Centroid components come out of the
    exact-DECIMAL round(6) mean path, so the ``%.6f`` decimal rendering
    parses back to the identical double. The literal is how a trained
    codebook re-enters a query plan WITHOUT dragging the training DAG
    along: the plan carries a constant, not a subquery — same trick as
    ``hyperplane_expr``. Bounded by construction (train with
    ``init_limit``), so the literal stays a few KB at any corpus
    size."""
    if not rows:
        raise ValueError(
            "codebook_literal_expr: empty codebook — the training "
            "sample selected no vectors (check the sample predicate)")
    structs = []
    for r in rows:
        vals = ", ".join(f"{float(v):.6f}D" for v in r["cvec"])
        structs.append(
            f"named_struct('cid', {int(r['cid'])}L, 'cvec', array({vals}))")
    return "array(" + ", ".join(structs) + ")"


def assign_cells_literal(
    embeddings: DataFrame, cents_expr: str,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec, cell_id) for every vector against a LITERAL codebook
    expression — a pure per-row projection: no join, no broadcast
    variable, no shuffle. The whole assignment folds into the scan's
    whole-stage-codegen span."""
    e = DOUBLE_VEC.format(col=vec_col)
    return (
        embeddings.withColumn("cents", F.expr(cents_expr))
        .withColumn("cell_id", F.expr(f"-({_argmax_cell_expr(e)}).neg_cid"))
        .select(id_col, vec_col, "cell_id")
    )


def cosine_pairs_within_cells(
    cells: DataFrame, threshold: float,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Pairs (a < b, cosine >= threshold) restricted to a shared
    ``cell_id`` — one equi-join on the cell key; every candidate is
    verified against the true cosine."""
    a = cells.select("cell_id", F.col(id_col).alias("id_a"),
                     F.col(vec_col).alias("va"))
    b = cells.select("cell_id", F.col(id_col).alias("id_b"),
                     F.col(vec_col).alias("vb"))
    ea = DOUBLE_VEC.format(col="va")
    eb = DOUBLE_VEC.format(col="vb")
    return (
        a.join(b, "cell_id")
        .where("id_a < id_b")
        .withColumn("cosine", F.expr(f"round({cosine_expr(ea, eb)}, 6)"))
        .where(f"cosine >= {threshold}")
        .select(F.col("cell_id").cast("bigint").alias("cell_id"),
                "id_a", "id_b", "cosine")
    )


def ivf_multiprobe_topk(
    embeddings: DataFrame, modulus: int = 43, k: int = 10,
    query_id: int = 0, n_probe: int = 2,
    vec_col: str = "embedding", id_col: str = "vec_id",
    centroids: DataFrame | None = None,
) -> DataFrame:
    """Multi-probe IVF ANN: search the query's ``n_probe`` nearest
    cells instead of one — the standard recall knob of every IVF index
    (a true neighbor just across a cell boundary is found by probing
    the runner-up cell; recall rises from P[same cell] to P[within
    top-n_probe cells] for ~n_probe x the probe cost, still
    corpus/|cells| x n_probe rows instead of everything).

    Corpus assignment is the same zero-shuffle broadcast-codebook
    argmax as ``ivf_topk``. The probe list is computed on the single
    query row: sort the codebook affinities descending (ties to the
    smaller centroid id), slice the top ``n_probe``, explode to probe
    rows — a few-row DataFrame that broadcasts into the final
    cell-key join."""
    e = DOUBLE_VEC.format(col=vec_col)
    if centroids is None:
        centroids = _default_centroids(embeddings, modulus, vec_col, id_col)
    cells = _assign_cells(embeddings, centroids, vec_col, id_col)
    codebook = centroids.select(
        "cid", F.expr(DOUBLE_VEC.format(col="cvec")).alias("cvec")
    ).agg(F.collect_list(F.struct("cid", "cvec")).alias("cents"))
    qe = DOUBLE_VEC.format(col=vec_col)
    probes_expr = (
        f"transform(slice(reverse(array_sort(transform(cents, c -> "
        f"struct(round({dot_expr(qe, 'c.cvec')}, 6) AS aff, "
        f"-c.cid AS neg_cid)))), 1, {n_probe}), s -> -s.neg_cid)"
    )
    q = (
        embeddings.where(f"{id_col} = {query_id}")
        .crossJoin(F.broadcast(codebook))
        .select(F.col(vec_col).alias("q"),
                F.explode(F.expr(probes_expr)).alias("qcell"))
    )
    qv = DOUBLE_VEC.format(col="q")
    return (
        cells.join(F.broadcast(q), F.expr("cell_id = qcell"))
        .withColumn("cosine", F.expr(f"round({cosine_expr(e, qv)}, 6)"))
        .orderBy(F.col("cosine").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, F.col("cell_id").cast("bigint").alias("cell_id"),
                "cosine")
    )


def cosine_pairs_cell_blocked(
    embeddings: DataFrame, centroids: DataFrame, threshold: float,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """SemDeDup-style semantic near-duplicate pairs (Abbas et al. 2023):
    block by trained k-means cell, compare only within a cell. The
    cluster-blocked composition of ``cosine_pairs`` — candidates are one
    equi-join on ``cell_id``, never the all-pairs cross join, and every
    candidate is verified against the true cosine (precision exact,
    recall = P[near-dups share a cell], tunable by codebook size).

    At 100 TB: assignment is the zero-shuffle broadcast-codebook map
    (see ``ivf_topk``); the pair join shuffles the corpus once on
    ``cell_id``. Cell sizes are ~corpus/|codebook| by construction —
    k-means balances mass, unlike hash buckets — and a runaway cell
    would be capped the same way the MinHash band guard works
    (count, filter ``n <= cap``, verify the remainder next round with
    a finer codebook)."""
    cells = _assign_cells(embeddings, centroids, vec_col, id_col)
    return cosine_pairs_within_cells(cells, threshold, vec_col, id_col)


def quantize_int8_stats(
    embeddings: DataFrame,
    vec_col: str = "embedding", id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Symmetric per-vector int8 quantization with per-label error
    accounting — the storage-shrink step before shipping an embedding
    corpus to an ANN index (4x smaller + SIMD-friendly).

    scale = max|x| / 127;  q_i = clamp(round(x_i/scale), -127, 127);
    mse = mean((x_i - q_i*scale)^2), surfaced per label as
    avg_mse_1e6 (x1e6 so 6-decimal rounding keeps real precision).

    Entirely per-row expression work (zero shuffle) followed by one
    tiny label-keyed aggregation: at 100 TB the quantized corpus is
    written straight back out; the stats aggregate map-side first.
    Rounding is floor(x + 0.5) on both engines -- Spark round() is
    HALF_UP while DuckDB's is HALF_EVEN, so neither builtin is used.
    """
    e = DOUBLE_VEC.format(col=vec_col)
    qv = (
        "transform(e, x -> greatest(CAST(-127.0 AS DOUBLE), "
        "least(CAST(127.0 AS DOUBLE), CAST(floor(x / scale + 0.5d) AS DOUBLE))))"
    )
    mse = (
        "aggregate(zip_with(e, qv, (x, q) -> (x - q * scale) * (x - q * scale)), "
        "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v, acc -> acc / size(e))"
    )
    per_vec = (
        embeddings.select(
            id_col, label_col, F.expr(e).alias("e"))
        .withColumn(
            "scale",
            F.expr("greatest(array_max(transform(e, x -> abs(x))), 1e-12d) / 127.0d"))
        .withColumn("qv", F.expr(qv))
        .withColumn("mse_1e6", F.expr(f"round(({mse}) * 1e6, 6)"))
        .withColumn(
            "n_sat",
            F.expr("CAST(size(filter(qv, q -> abs(q) = 127.0d)) AS BIGINT)"))
    )
    return (
        per_vec.groupBy(label_col)
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.expr(
                "round(CAST(SUM(CAST(mse_1e6 AS DECIMAL(24,10))) AS DOUBLE)"
                " / COUNT(*), 6)"
            ).alias("avg_mse_1e6"),
            F.expr(
                "round(CAST(SUM(CAST(round(scale * 1e3, 10) AS DECIMAL(24,10)))"
                " AS DOUBLE) / COUNT(*), 6)"
            ).alias("avg_scale_1e3"),
            F.sum("n_sat").cast("bigint").alias("n_saturated"),
        )
        .orderBy(label_col)
    )


def random_projection_exprs(vec_expr: str, dim: int, out_dim: int,
                            plane_offset: int = 100) -> list[str]:
    """Johnson-Lindenstrauss random projection: component j is
    <x, s_j>/sqrt(out_dim) against the md5-derived Rademacher sign
    vector s_j (driver-side literals, same trick as the LSH planes).
    Achlioptas 2001 shows +/-1 entries satisfy the JL guarantee."""
    scale = f"sqrt(CAST({out_dim} AS DOUBLE))"
    return [
        f"({dot_expr(vec_expr, hyperplane_expr(plane_offset + j, dim))}) / {scale}"
        for j in range(out_dim)
    ]


def random_projection_stats(
    embeddings: DataFrame, dim: int = 64, out_dim: int = 16,
    vec_col: str = "embedding", id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Per-label norm-distortion audit of the JL projection — the
    dimensionality-reduction step before ANN indexing (4x smaller
    vectors; JL keeps pairwise distances within ~1/sqrt(out_dim)).

    Entirely per-row expression work (out_dim dot products against
    broadcast literal sign vectors — no shuffle, no Python) plus one
    tiny label-keyed aggregation; at 100 TB the projected vectors are
    written back out and this audit rides along map-side."""
    e = DOUBLE_VEC.format(col=vec_col)
    ys = random_projection_exprs("e", dim, out_dim)
    norm_y = "sqrt(" + " + ".join(f"(y{j} * y{j})" for j in range(out_dim)) + ")"
    proj = (
        embeddings.select(id_col, label_col, F.expr(e).alias("e"))
        .select(
            id_col, label_col,
            F.expr(
                "greatest(sqrt(aggregate(zip_with(e, e, (x, y) -> x * y), "
                "CAST(0.0 AS DOUBLE), (acc, v) -> acc + v)), 1e-12d)"
            ).alias("norm_x"),
            *[F.expr(y).alias(f"y{j}") for j, y in enumerate(ys)],
        )
        .withColumn("ratio", F.expr(f"round(({norm_y}) / norm_x, 6)"))
    )
    return (
        proj.groupBy(label_col)
        .agg(
            F.count("*").cast("bigint").alias("n_vecs"),
            F.expr(
                "round(CAST(SUM(CAST(ratio AS DECIMAL(18,8))) AS DOUBLE)"
                " / COUNT(*), 6)"
            ).alias("avg_norm_ratio"),
            F.min("ratio").alias("min_norm_ratio"),
            F.max("ratio").alias("max_norm_ratio"),
        )
    )


def pq_train_codebooks(
    embeddings: DataFrame, n_sub: int = 4, sub_dim: int = 16,
    modulus: int = 13, iters: int = 1, init_limit: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
    sample_mod: int | None = None,
) -> list[list[dict]]:
    """Train the product-quantization codebooks: split the vector into
    ``n_sub`` contiguous subspaces and run the bounded-sample Lloyd
    loop (``kmeans_codebook``) independently on each subspace's
    sub-vectors. Returns one collected, position-renumbered codebook
    per subspace (code = 1..k in ascending original-centroid-id order,
    so ``element_at(codebook, code)`` is the decode step).

    Training is the same train-out-of-plan pattern as
    ``dedup_semantic_cells``: a bounded deterministic sample, a
    driver-side collect of <= init_limit rows per subspace, and literal
    re-entry into the serving plan — at 100 TB the codebooks are
    trained once and the serving plan never sees the training DAG."""
    if sample_mod is not None:
        # the Lloyd passes (assignment + means) run over the sample,
        # not the corpus — at 100 TB training must not be a full scan
        # per subspace. The final ENCODE step still covers every row.
        embeddings = embeddings.where(f"{id_col} % {sample_mod} = 0")
    books = []
    for s in range(n_sub):
        off = s * sub_dim + 1
        sub = embeddings.select(
            F.col(id_col),
            F.expr(f"slice({vec_col}, {off}, {sub_dim})").alias(vec_col))
        cents = kmeans_codebook(
            sub, modulus=modulus, iters=iters, init_limit=init_limit,
            vec_col=vec_col, id_col=id_col)
        rows = sorted(cents.collect(), key=lambda r: r["cid"])
        books.append([
            {"cid": i + 1, "cvec": r["cvec"]} for i, r in enumerate(rows)])
    return books


def pq_topk(
    embeddings: DataFrame, codebooks: list[list[dict]],
    sub_dim: int = 16, k: int = 10, query_id: int = 0,
    vec_col: str = "embedding", id_col: str = "vec_id",
    query: DataFrame | None = None,
    extra_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Product-quantization ANN (MIPS/ADC flavor): encode each corpus
    vector as ``n_sub`` small codes (per-subspace nearest centroid by
    dot product — the same spherical criterion the codebooks were
    trained with), estimate the query affinity as the sum of per-
    subspace dot(query-sub, centroid-of-code), and return the top-k by
    that estimate, ties to the smallest id. The exact cosine rides
    along per returned row so the estimation error is visible.

    Serving-plan shape at any scale: corpus scan -> per-row encode +
    estimate against LITERAL codebooks (whole-stage-codegen'd; the
    one-row query is a broadcast) -> TakeOrderedAndProject(k). Zero
    corpus shuffles — the same literal-codebook trick as
    ``assign_cells_literal``; with 8 codes/subspace a 64-dim corpus
    compresses 64x (4 bytes -> 4x 3 bits) for the candidate sweep."""
    e = DOUBLE_VEC.format(col=vec_col)
    q = DOUBLE_VEC.format(col="q")
    if query is None:
        # default: the query row comes from the corpus and excludes
        # itself from the ranking. Callers that pre-filter the corpus
        # (e.g. the IVF+PQ composite's probe semi-join) pass a one-row
        # ``query`` frame with column ``q`` instead.
        query = (embeddings.where(f"{id_col} = {query_id}")
                 .select(F.col(vec_col).alias("q")))
        embeddings = embeddings.where(f"{id_col} != {query_id}")
    df = embeddings.crossJoin(F.broadcast(query))
    score_terms = []
    for s, book in enumerate(codebooks):
        off = s * sub_dim + 1
        cb = codebook_literal_expr(book)
        xs = f"slice({e}, {off}, {sub_dim})"
        qs = f"slice({q}, {off}, {sub_dim})"
        code = (
            f"-(array_max(transform({cb}, c -> "
            f"struct(round({dot_expr(xs, 'c.cvec')}, 6) AS aff, "
            f"-c.cid AS neg_cid)))).neg_cid"
        )
        df = df.withColumn(f"code{s}", F.expr(code))
        score_terms.append(
            f"round({dot_expr(qs, f'element_at({cb}, CAST(code{s} AS INT)).cvec')}, 6)"
        )
    approx = " + ".join(score_terms)
    return (
        df.withColumn("pq_score", F.expr(f"round({approx}, 6)"))
        .withColumn("cosine", F.expr(f"round({cosine_expr(e, q)}, 6)"))
        .orderBy(F.col("pq_score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, *extra_cols, "pq_score", "cosine")
    )


def mmr_topk(
    embeddings: DataFrame, k: int = 5, pool: int = 20, lam: float = 0.7,
    query_id: int = 0, vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Maximal-Marginal-Relevance diversified top-k (Carbonell &
    Goldstein 1998): greedily pick argmax of
    lam*rel(v) - (1-lam)*max_{s in S} sim(v, s) — relevance traded
    against redundancy with what is already selected, the standard
    re-ranker for retrieval-augmented pipelines where the plain top-k
    returns k near-copies.

    Scale shape: the DISTRIBUTED stage is candidate generation — one
    corpus scan + TakeOrdered to a ``pool`` of candidates (the same
    plan as cosine_topk, linear at any corpus size). The greedy loop
    then runs k steps over the pool only: each step's scores are
    computed BY THE ENGINE on the persisted pool (a pool x |S| compare,
    |S| < k), and only the 1-row argmax is collected — the bounded
    train-out-of-plan pattern (IVF codebooks, BPE merges). Every
    cosine is rounded to 6 dp before comparison and ties break on id,
    so the selection is deterministic and replayable cross-engine;
    the DuckDB oracle unrolls all k steps."""
    spark = embeddings.sparkSession
    e = DOUBLE_VEC.format(col=vec_col)
    q = DOUBLE_VEC.format(col="q")
    qrow = (embeddings.where(f"{id_col} = {query_id}")
            .select(F.col(vec_col).alias("q")))
    pool_df = (
        embeddings.where(f"{id_col} <> {query_id}")
        .crossJoin(F.broadcast(qrow))
        .withColumn("rel", F.expr(f"round({cosine_expr(e, q)}, 6)"))
        .orderBy(F.col("rel").desc(), id_col)
        .limit(pool)
        .select(id_col, vec_col, "rel")
        .persist())
    ca = DOUBLE_VEC.format(col=vec_col)
    cb = DOUBLE_VEC.format(col="__sv")
    out = []
    selected_ids: list[int] = []
    for t in range(1, k + 1):
        if not selected_ids:
            first = pool_df.orderBy(
                F.col("rel").desc(), id_col).limit(1).collect()
            if not first:
                break  # empty pool (absent query_id / tiny corpus)
            pick = first[0]
            out.append((t, pick[id_col], pick["rel"], pick["rel"]))
        else:
            sel_vecs = (pool_df
                        .where(F.col(id_col).isin(selected_ids))
                        .select(F.col(vec_col).alias("__sv")))
            scored = (
                pool_df.where(~F.col(id_col).isin(selected_ids))
                .crossJoin(F.broadcast(sel_vecs))
                .withColumn("__sim", F.expr(
                    f"round({cosine_expr(ca, cb)}, 6)"))
                .groupBy(id_col, "rel")
                .agg(F.max("__sim").alias("red"))
                .withColumn("mmr", F.expr(
                    f"round({lam}e0 * rel - {round(1 - lam, 10)}e0 * red,"
                    f" 6)")))
            picked = scored.orderBy(
                F.col("mmr").desc(), id_col).limit(1).collect()
            if not picked:
                break  # pool exhausted before k picks (k > pool)
            pick = picked[0]
            out.append((t, pick[id_col], pick["rel"], pick["mmr"]))
        selected_ids.append(out[-1][1])
    pool_df.unpersist()
    return spark.createDataFrame(
        out, f"pick_rank long, {id_col} long, rel double, mmr double")


def power_iteration_top_eig(cells, dim: int, iters: int = 500):
    """Top eigenpair of a covariance matrix collected from
    ``embedding_covariance_matrix`` rows (upper-triangular
    (i, j, cov) cells) — the driver-side half of PCA reduction/
    whitening: the matrix is dim^2-bounded (codebook-sized) however
    large the corpus, so the eigensolve is O(dim^2 * iters) on the
    driver and the resulting component re-enters downstream plans as
    an array literal (the codebook convention; see
    embedding_random_projection for the projection plumbing).

    Deterministic: all-ones start vector, plain power iteration with
    L2 normalization each step. Converges to the dominant eigenpair
    whenever the start vector is not orthogonal to it (all-ones is
    safe for covariance matrices of real data; a zero matrix raises).
    Returns (eigenvalue, eigenvector as list[float])."""
    import math

    a = [[0.0] * dim for _ in range(dim)]
    for c in cells:
        i, j, v = c["i"] - 1, c["j"] - 1, float(c["cov"])
        a[i][j] = v
        a[j][i] = v
    v = [1.0] * dim
    lam = 0.0
    for _ in range(iters):
        w = [sum(a[r][c] * v[c] for c in range(dim)) for r in range(dim)]
        norm = math.sqrt(sum(x * x for x in w))
        if norm == 0.0:
            raise ValueError(
                "power_iteration_top_eig: zero matrix-vector product "
                "(all-zero covariance?)")
        v = [x / norm for x in w]
        lam = norm
    return lam, v


def project_components(embeddings: DataFrame, components: list[list[float]],
                       vec_col: str = "embedding",
                       id_col: str = "vec_id") -> DataFrame:
    """Project every vector onto ``components`` (rows = principal
    directions from ``power_iteration_top_eig`` / any trained basis):
    (id, pc1..pcK) with each coordinate a JVM-side dot-product fold
    against the component LITERAL — the PCA-reduction / whitening
    apply step. Zero shuffles, zero Python; the basis never drags its
    training DAG into the plan (codebook convention). Coordinates are
    round(6) for cross-run determinism."""
    e = DOUBLE_VEC.format(col=vec_col)
    cols = [F.col(id_col)]
    for k, comp in enumerate(components, start=1):
        lit = "array(" + ", ".join(f"{x!r}D" for x in comp) + ")"
        cols.append(
            F.expr(f"round({dot_expr(e, lit)}, 6)").alias(f"pc{k}"))
    return embeddings.select(*cols)


# ---------------------------------------------------------------------------
# Incremental ANN index maintenance (VERDICT r9 item 4)
# ---------------------------------------------------------------------------

# Default retrain gate for extend_or_retrain_ivf, in the same micro-
# cosine units as the embedding_centroid_drift catalog metric: while
# the appended batch's centroid stays within cos >= 0.98 of the
# indexed corpus's, the frozen codebook still tessellates the new data
# and append-only assignment preserves recall; below it the batch has
# drifted into regions the codebook never trained on and the index
# retrains. Same spirit as the PSI 0.25 alert line in psi_gate.
CENTROID_DRIFT_GATE_MICRO = 980_000


def embedding_dim_sums_micro(df: DataFrame,
                             vec_col: str = "embedding") -> dict:
    """{dim_idx: exact-decimal component sum quantized to micro-unit
    int} — one posexplode + map-side-partial aggregate; the collect is
    dim-sized (64 rows), never corpus-sized. These sums are ADDITIVE:
    a maintenance loop computes them once for the indexed corpus,
    carries the O(dim) dict forward, and folds each appended batch's
    sums in driver-side (``{d: a.get(d,0)+b.get(d,0)}``) — so drift
    gating never re-scans the index (see ``extend_or_retrain_ivf``)."""
    rows = (
        df.select(F.posexplode(
            F.expr(f"transform({vec_col}, x -> CAST(x AS DOUBLE))"))
            .alias("dim_idx", "x"))
        .groupBy("dim_idx")
        .agg(F.expr("CAST(floor(CAST(SUM(CAST(x AS DECIMAL(27,6)))"
                    " AS DOUBLE) * 1e6 + 0.5) AS BIGINT)").alias("s"))
        .collect())
    return {r["dim_idx"]: int(r["s"]) for r in rows}


def centroid_drift_from_sums(a: dict, b: dict) -> int:
    """Micro-cosine of two per-dimension sum dicts (exact integer
    dot/norms; the only float math is the final sqrt/divide)."""
    import math

    dims = sorted(set(a) | set(b))
    dot = sum(a.get(d, 0) * b.get(d, 0) for d in dims)
    na2 = sum(a.get(d, 0) ** 2 for d in dims)
    nb2 = sum(b.get(d, 0) ** 2 for d in dims)
    if na2 == 0 or nb2 == 0:
        return 0
    return int(math.floor(dot / (math.sqrt(na2) * math.sqrt(nb2))
                          * 1e6 + 0.5))


def centroid_drift_micro(base: DataFrame, appended: DataFrame,
                         vec_col: str = "embedding") -> int:
    """Cosine (micro-units, floor(x*1e6 + 0.5)) between the centroid of
    the indexed corpus and the centroid of an appended batch — the
    label-free variant of the ``embedding_centroid_drift`` catalog
    metric, on the same exact path: per-dimension DECIMAL sums
    quantized to micro-unit integers, then exact integer dot/norms
    (cosine is scale-invariant, so sums stand in for means and no
    centroid ever materializes). Driver math is over two dim-sized
    dicts; the only cluster work is one narrow aggregate per side."""
    return centroid_drift_from_sums(
        embedding_dim_sums_micro(base, vec_col),
        embedding_dim_sums_micro(appended, vec_col))


def assign_appended_batch(
    appended: DataFrame, codebook_rows,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Encode ONLY the appended rows against a FROZEN codebook
    (driver-collected (cid, cvec) rows rendered as a plan literal):
    a pure per-row projection — no join, no broadcast variable, no
    shuffle, no touch of the already-indexed corpus. The daily-append
    fast path of IVF maintenance: cost is O(|batch| x |codebook|)
    regardless of index size."""
    return assign_cells_literal(
        appended, codebook_literal_expr(codebook_rows), vec_col, id_col)


def extend_or_retrain_ivf(
    base_cells: DataFrame, appended: DataFrame, codebook_rows,
    gate_micro: int = CENTROID_DRIFT_GATE_MICRO,
    vec_col: str = "embedding", id_col: str = "vec_id",
    modulus: int = 43, iters: int = 2, init_limit: int | None = 64,
    assume_new_ids: bool = False, base_sums: dict | None = None,
):
    """IVF index maintenance for an append-only corpus: returns
    ``(cells, codebook_rows, retrained, drift_micro)`` — the codebook
    comes back so a maintenance loop always holds the CURRENT one for
    the next batch (the retrain arm mints a new codebook; losing it
    would strand every later append on the stale literal).

    - drift within the gate (appended centroid cosine >=
      ``gate_micro`` vs the indexed corpus): the appended batch is
      encoded against the frozen codebook (``assign_appended_batch``,
      zero shuffle) and unioned under the existing index — the
      existing assignment is NOT recomputed. By assignment determinism
      the result is row-identical to re-assigning the full corpus
      against the same codebook (pinned in pytest).
    - drift beyond the gate: the codebook no longer represents the
      data; retrain ``kmeans_codebook`` on base+appended and reassign
      everything (the full rebuild the gate exists to amortize).

    Replay safety (self-review r10): a replayed/retried batch must not
    double-insert its rows — by default appended ids already present
    in the index are dropped by an exact-id anti-join first (the
    near-dedup gate's idempotence rule), and a batch that dedupes to
    EMPTY short-circuits to the unchanged index (retrained=False,
    drift 1e6 = "no evidence of drift") instead of feeding the
    degenerate empty-centroid drift into a pointless full retrain.

    Cost at scale: the anti-join and (if ``base_sums`` is None) the
    drift sums scan the index once per batch — fine at probe SFs,
    wrong as a steady state at 100 TB. A production loop passes
    ``assume_new_ids=True`` (ids are new by construction, e.g.
    monotonic) and carries ``base_sums`` (``embedding_dim_sums_micro``
    is additive — compute once, fold each batch's sums in driver-side)
    so the whole append arm is O(|batch|) at any index size.

    ``base_cells`` is the existing index frame (id, vec, cell_id);
    ``codebook_rows`` the driver-collected frozen codebook."""
    appended = appended.select(id_col, vec_col)
    if not assume_new_ids:
        appended = appended.join(
            base_cells.select(id_col), id_col, "left_anti")
    appended = appended.persist()
    try:
        if appended.limit(1).count() == 0:
            return (base_cells.select(id_col, vec_col, "cell_id"),
                    codebook_rows, False, 1_000_000)
        a = (base_sums if base_sums is not None else
             embedding_dim_sums_micro(base_cells, vec_col))
        drift = centroid_drift_from_sums(
            a, embedding_dim_sums_micro(appended, vec_col))
        if drift >= gate_micro:
            new_cells = assign_appended_batch(
                appended, codebook_rows, vec_col, id_col)
            return (base_cells.select(id_col, vec_col, "cell_id")
                    .unionByName(new_cells), codebook_rows, False, drift)
        full = base_cells.select(id_col, vec_col).unionByName(appended)
        retrained = kmeans_codebook(
            full, modulus=modulus, iters=iters, init_limit=init_limit,
            vec_col=vec_col, id_col=id_col)
        # collect ONCE and re-enter the plan as a literal: returning
        # _assign_cells(full, retrained) would embed the un-
        # checkpointed Lloyd training DAG in the index plan, re-running
        # training on every downstream action. Bit-identical: centroids
        # are round(6) doubles and the literal renders %.6f exactly;
        # the argmax tie-breaks on cid, so codebook order is
        # irrelevant (review r10).
        rows = retrained.collect()
        return (assign_cells_literal(
                    full, codebook_literal_expr(rows), vec_col, id_col),
                rows, True, drift)
    finally:
        appended.unpersist()


def _pq_code_expr(codebooks: list[list[dict]], s: int, sub_dim: int,
                  vec_expr: str) -> str:
    """Per-subspace nearest-centroid code against the LITERAL codebook
    — the encode criterion shared by ``pq_topk`` and ``pq_encode``."""
    cb = codebook_literal_expr(codebooks[s])
    xs = f"slice({vec_expr}, {s * sub_dim + 1}, {sub_dim})"
    return (
        f"-(array_max(transform({cb}, c -> "
        f"struct(round({dot_expr(xs, 'c.cvec')}, 6) AS aff, "
        f"-c.cid AS neg_cid)))).neg_cid"
    )


def pq_encode(
    embeddings: DataFrame, codebooks: list[list[dict]],
    sub_dim: int = 16,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """(id, vec, code0..code{n_sub-1}) against FROZEN literal
    codebooks — the PQ analog of ``assign_appended_batch``: a pure
    per-row projection (no join, no shuffle, whole-stage codegen), so
    encoding a daily append batch costs O(|batch| x k x n_sub)
    regardless of index size. The per-subspace criterion is exactly
    ``pq_topk``'s inline encode, factored so a MAINTAINED code table
    can be stored/extended instead of re-encoding the corpus per
    probe."""
    e = DOUBLE_VEC.format(col=vec_col)
    cols = [F.col(id_col), F.col(vec_col)]
    for s in range(len(codebooks)):
        cols.append(F.expr(_pq_code_expr(codebooks, s, sub_dim, e))
                    .alias(f"code{s}"))
    return embeddings.select(*cols)


def pq_topk_over_codes(
    codes: DataFrame, codebooks: list[list[dict]], query: DataFrame,
    sub_dim: int = 16, k: int = 10, id_col: str = "vec_id",
) -> DataFrame:
    """ADC serving over an ALREADY-ENCODED table: (id, pq_score) top-k
    where the affinity estimate is the sum of per-subspace
    dot(query-sub, centroid-of-code) — raw vectors are NOT read, which
    is the whole point of storing codes (with 8 centroids/subspace a
    64-float vector serves from 4 small codes). ``query`` is a one-row
    frame with array column ``q``; the plan is scan -> per-row literal
    decode -> TakeOrderedAndProject(k), zero corpus shuffles."""
    q = DOUBLE_VEC.format(col="q")
    df = codes.crossJoin(F.broadcast(query))
    terms = []
    for s, book in enumerate(codebooks):
        cb = codebook_literal_expr(book)
        qs = f"slice({q}, {s * sub_dim + 1}, {sub_dim})"
        terms.append(
            f"round({dot_expr(qs, f'element_at({cb}, CAST(code{s} AS INT)).cvec')}, 6)")
    approx = " + ".join(terms)
    return (
        df.withColumn("pq_score", F.expr(f"round({approx}, 6)"))
        .orderBy(F.col("pq_score").desc(), F.col(id_col))
        .limit(k)
        .select(id_col, "pq_score")
    )


def extend_or_retrain_pq(
    base_codes: DataFrame, appended: DataFrame,
    codebooks: list[list[dict]],
    gate_micro: int = CENTROID_DRIFT_GATE_MICRO,
    n_sub: int | None = None, sub_dim: int | None = None,
    modulus: int = 13, iters: int = 1, init_limit: int = 8,
    vec_col: str = "embedding", id_col: str = "vec_id",
    assume_new_ids: bool = False, base_sums: dict | None = None,
):
    """PQ index maintenance — the product-quantization twin of
    ``extend_or_retrain_ivf``, same contract: returns
    ``(codes, codebooks, retrained, drift_micro)``.

    Append arm (drift within the gate): ``pq_encode`` ONLY the new
    rows against the frozen codebooks and union under the untouched
    code table — row-identical to re-encoding the full corpus against
    the same codebooks (per-row determinism; pinned). Retrain arm:
    ``pq_train_codebooks`` on base+appended, re-encode everything,
    hand back the NEW codebooks. Replay discipline, empty-batch
    short-circuit, ``assume_new_ids``/``base_sums`` fast path: all
    identical to the IVF twin (see its docstring).

    Geometry is a property of the INDEX, not a free parameter: both
    arms derive (n_sub, sub_dim) from the passed codebooks — the
    append arm's encode offsets and the retrain arm's new-codebook
    shape always agree with the serving schema (code0..code{n_sub-1}).
    Pre-review-r10 the append arm used ``len(codebooks)`` while the
    retrain arm used an independent ``n_sub=4`` default, so an index
    trained with non-default geometry silently encoded wrong slices
    and retrained to a mismatched schema. Explicit ``n_sub``/
    ``sub_dim`` are validated against the codebooks and refused on
    conflict."""
    derived_n_sub = len(codebooks)
    derived_sub_dim = len(codebooks[0][0]["cvec"])
    if n_sub is not None and n_sub != derived_n_sub:
        raise ValueError(
            f"extend_or_retrain_pq: n_sub={n_sub} conflicts with the "
            f"passed codebooks ({derived_n_sub} subspaces) — geometry "
            "is derived from the index; drop the argument")
    if sub_dim is not None and sub_dim != derived_sub_dim:
        raise ValueError(
            f"extend_or_retrain_pq: sub_dim={sub_dim} conflicts with "
            f"the passed codebooks (centroids are "
            f"{derived_sub_dim}-dim) — geometry is derived from the "
            "index; drop the argument")
    n_sub, sub_dim = derived_n_sub, derived_sub_dim
    appended = appended.select(id_col, vec_col)
    if not assume_new_ids:
        appended = appended.join(
            base_codes.select(id_col), id_col, "left_anti")
    appended = appended.persist()
    try:
        if appended.limit(1).count() == 0:
            return base_codes, codebooks, False, 1_000_000
        a = (base_sums if base_sums is not None else
             embedding_dim_sums_micro(base_codes, vec_col))
        drift = centroid_drift_from_sums(
            a, embedding_dim_sums_micro(appended, vec_col))
        if drift >= gate_micro:
            new_codes = pq_encode(appended, codebooks, sub_dim,
                                  vec_col, id_col)
            return (base_codes.unionByName(new_codes),
                    codebooks, False, drift)
        full = base_codes.select(id_col, vec_col).unionByName(appended)
        books = pq_train_codebooks(
            full, n_sub=n_sub, sub_dim=sub_dim, modulus=modulus,
            iters=iters, init_limit=init_limit,
            vec_col=vec_col, id_col=id_col)
        return (pq_encode(full, books, sub_dim, vec_col, id_col),
                books, True, drift)
    finally:
        appended.unpersist()
