"""Round-7 semantics: absolute training-sample caps (VERDICT r6 item
3). The `% mod` fraction samples compose with a bottom-k-by-salted-
hash cap; below the cap the filter is the identity (so every existing
green driver row stays valid), above it training cost is O(cap)."""

import os

import pytest
from pyspark.sql import functions as F

SF_SMALL = os.environ.get("OCM_TEST_SF_DIR", "/root/testdata/sf0.001")

from tests.conftest import catalog_rows  # noqa: E402


def test_cap_by_salted_hash_identity_below_cap(spark):
    """cap >= |input| must select every row (the identity), cap <
    |input| must select exactly cap rows, deterministically."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        cap_by_salted_hash)

    df = spark.range(0, 500).withColumnRenamed("id", "doc_id")
    full = cap_by_salted_hash(df, "doc_id", 1000, "t")
    assert full.count() == 500
    assert (sorted(r["doc_id"] for r in full.collect())
            == list(range(500)))

    capped = cap_by_salted_hash(df, "doc_id", 50, "t")
    rows1 = sorted(r["doc_id"] for r in capped.collect())
    rows2 = sorted(r["doc_id"] for r in
                   cap_by_salted_hash(df, "doc_id", 50, "t").collect())
    assert len(rows1) == 50 and rows1 == rows2
    # a different salt draws a different (still deterministic) sample
    rows3 = sorted(r["doc_id"] for r in
                   cap_by_salted_hash(df, "doc_id", 50, "u").collect())
    assert rows3 != rows1


def test_kmeans_train_cap_identity_below_cap(spark):
    """The capped Lloyd loop must produce bit-identical centroids when
    the cap doesn't bind — this is what keeps the r05/r06 green rows
    of every codebook-consuming query valid after the r7 cap."""
    from oracle_cassandra_migrator_spark.operators import similarity
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    capped = {r["cid"]: r["cvec"] for r in similarity.kmeans_codebook(
        emb, modulus=43, iters=2).collect()}
    uncapped = {r["cid"]: r["cvec"] for r in similarity.kmeans_codebook(
        emb, modulus=43, iters=2, train_cap=None).collect()}
    assert capped == uncapped


def test_kmeans_train_cap_binds(spark):
    """With cap < corpus the iteration input is the capped sample:
    centroids differ from the uncapped run but stay deterministic."""
    from oracle_cassandra_migrator_spark.operators import similarity
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    a = {r["cid"]: r["cvec"] for r in similarity.kmeans_codebook(
        emb, modulus=43, iters=2, train_cap=100).collect()}
    b = {r["cid"]: r["cvec"] for r in similarity.kmeans_codebook(
        emb, modulus=43, iters=2, train_cap=100).collect()}
    assert a == b
    uncapped = {r["cid"]: r["cvec"] for r in similarity.kmeans_codebook(
        emb, modulus=43, iters=2, train_cap=None).collect()}
    assert a != uncapped


def test_bigram_model_cap_identity_below_cap(spark):
    from oracle_cassandra_migrator_spark.operators.text import bigram_model
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    rows_c, total_c = bigram_model(docs, "text", "doc_id")
    # 10k >= the 500-doc corpus, so the cap must not bind (NB: the cap
    # sizes Spark's per-task bottom-k heap — keep it realistic, a 1e9
    # "cap" would allocate a 1e9-slot heap per task)
    rows_u, total_u = bigram_model(docs, "text", "doc_id",
                                   sample_cap=10_000)
    assert total_c == total_u
    assert ({(r["bg"], r["cnt"]) for r in rows_c}
            == {(r["bg"], r["cnt"]) for r in rows_u})
    # binding cap: fewer docs -> no more bigram mass than uncapped
    rows_b, total_b = bigram_model(docs, "text", "doc_id", sample_cap=5)
    assert 0 < total_b < total_c


def test_ivf_default_centroids_capped_and_identical(spark):
    """The untrained-IVF centroid sample is % modulus AND bottom-cap:
    not binding at driver SF (same result set as the bare % modulus
    filter), binding when the cap is forced small."""
    from oracle_cassandra_migrator_spark.operators import similarity
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    emb = read_table(spark, SF_SMALL, "embeddings")
    got = similarity._default_centroids(emb, 43, "embedding", "vec_id")
    want = emb.where("vec_id % 43 = 0")
    assert (sorted(r["cid"] for r in got.collect())
            == sorted(r["vec_id"] for r in want.collect()))

    old = similarity.IVF_CENTROID_CAP
    similarity.IVF_CENTROID_CAP = 3
    try:
        few = similarity._default_centroids(
            emb, 43, "embedding", "vec_id").collect()
    finally:
        similarity.IVF_CENTROID_CAP = old
    assert [r["cid"] for r in few] == sorted(
        r["vec_id"] for r in want.collect())[:3]


def test_capped_sample_plan_is_take_ordered(spark):
    """The cap must plan as TakeOrderedAndProject (per-task bottom-k,
    driver merge) — never a global sort of the corpus."""
    from oracle_cassandra_migrator_spark.operators.sampling import (
        cap_by_salted_hash)

    df = spark.range(0, 10_000).withColumnRenamed("id", "doc_id")
    plan = cap_by_salted_hash(df, "doc_id", 100, "p")._jdf \
        .queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange rangepartitioning" not in plan


# ---------------------------------------------------------------------------
# Real multimodal decode (VERDICT r6 item 5)
# ---------------------------------------------------------------------------

def test_decode_header_parses_real_containers():
    """Round-trip: build real BMP/PPM/WAV bytes, parse the headers
    back — plus a stdlib cross-check of the WAV bytes via wave."""
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    assert mm.decode_header(mm.build_bmp(17, 9)) == (
        "bmp", 17, 9, None, None, None)
    assert mm.decode_header(mm.build_ppm(3, 200)) == (
        "ppm", 3, 200, None, None, None)
    wav = mm.build_wav(2, 16000, 8001)
    assert mm.decode_header(wav) == ("wav", None, None, 2, 16000,
                                     8001 * 1000 // 16000)
    # r9: PNG (IHDR, color-type channels) and GIF (screen descriptor)
    assert mm.decode_header(mm.build_png(31, 12)) == (
        "png", 31, 12, 3, None, None)
    assert mm.decode_header(mm.build_gif(640, 480)) == (
        "gif", 640, 480, None, None, None)
    # r10: JPEG — baseline (SOF0) and progressive (SOF2) frame headers
    assert mm.decode_header(mm.build_jpeg(1920, 1080)) == (
        "jpeg", 1920, 1080, 3, None, None)
    assert mm.decode_header(
        mm.build_jpeg(33, 7, channels=1, progressive=True)) == (
        "jpeg", 33, 7, 1, None, None)

    import io
    import wave as stdwave

    with stdwave.open(io.BytesIO(wav)) as f:
        assert (f.getnchannels(), f.getframerate(), f.getnframes()) \
            == (2, 16000, 8001)


def test_decode_header_edge_cases():
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    # corrupt/unknown payloads degrade to 'unknown', never raise
    for bad in (b"", b"BM", b"BMxxxxxxxxxxxxxxxxxxxxxxxx"[:20],
                b"P6\n-3 4\n255\n", b"P6 garbage", b"RIFFxxxxJUNK",
                b"\x89PNG\r\n\x1a\n then not an IHDR chunk....",
                b"GIF89a\x00\x00\x10\x00\x00\x00\x00"):  # width 0
        assert mm.decode_header(bad)[0] == "unknown", bad

    # PNG: a flipped bit in the IHDR payload breaks the CRC-32 check —
    # corrupt headers must quarantine, not parse garbage dimensions
    png = bytearray(mm.build_png(9, 9))
    png[17] ^= 0x40  # width byte; CRC now mismatches
    assert mm.decode_header(bytes(png))[0] == "unknown"
    # ...and an illegal depth/color combination quarantines even with
    # a VALID crc (depth 4 truecolor is out of spec)
    import zlib as _zlib

    png2 = bytearray(mm.build_png(9, 9))
    png2[24] = 4  # bit depth
    png2[29:33] = _zlib.crc32(bytes(png2[12:29])).to_bytes(4, "big")
    assert mm.decode_header(bytes(png2))[0] == "unknown"
    # ...including depth-16 PALETTE (color 3), which the sub-byte
    # guard alone missed (self-review r9): palette caps at depth 8
    png3 = bytearray(mm.build_png(9, 9))
    png3[24], png3[25] = 16, 3
    png3[29:33] = _zlib.crc32(bytes(png3[12:29])).to_bytes(4, "big")
    assert mm.decode_header(bytes(png3))[0] == "unknown"

    # top-down BMP (negative height) reports |height|
    import struct

    bmp = bytearray(mm.build_bmp(5, 4))
    struct.pack_into("<i", bmp, 22, -4)
    assert mm.decode_header(bytes(bmp)) == ("bmp", 5, 4, None, None, None)

    # PPM comments between header tokens are legal
    ppm = b"P6\n# a comment\n6 # inline\n7\n255\n" + b"\0" * (3 * 6 * 7)
    assert mm.decode_header(ppm) == ("ppm", 6, 7, None, None, None)

    # WAV with an extra (odd-sized, word-aligned) chunk before data
    wav = mm.build_wav(1, 8000, 100)
    extra = struct.pack("<4sI", b"LIST", 3) + b"abc\x00"
    patched = wav[:36] + extra + wav[36:]
    patched = (struct.pack("<4sI4s", b"RIFF", len(patched) - 8, b"WAVE")
               + patched[12:])
    assert mm.decode_header(patched) == ("wav", None, None, 1, 8000,
                                         100 * 1000 // 8000)

    # JPEG quarantine paths (r10): truncated segment, SOS before SOF,
    # EOI before SOF, DNL-deferred height 0, declared-length mismatch
    jpg = mm.build_jpeg(9, 9)
    assert mm.decode_header(jpg[:20])[0] == "unknown"
    assert mm.decode_header(
        b"\xff\xd8\xff\xda\x00\x04\x01\x00\xff\xd9")[0] == "unknown"
    assert mm.decode_header(b"\xff\xd8\xff\xd9")[0] == "unknown"
    zero_h = bytearray(jpg)
    sof = zero_h.rindex(b"\xff\xc0")
    struct.pack_into(">H", zero_h, sof + 5, 0)  # height := 0 (DNL)
    assert mm.decode_header(bytes(zero_h))[0] == "unknown"
    bad_len = bytearray(jpg)
    struct.pack_into(">H", bad_len, sof + 2, 9)  # seglen != 8 + 3*ncomp
    assert mm.decode_header(bytes(bad_len))[0] == "unknown"
    # fill 0xFF bytes before a marker are legal padding (ITU T.81
    # B.1.1.2) — the walk must skip them, not quarantine
    padded = jpg[:2] + b"\xff\xff" + jpg[2:]
    assert mm.decode_header(padded) == ("jpeg", 9, 9, 3, None, None)


def test_decode_binary_metadata_quarantines_bad_rows(spark):
    """A corrupt payload inside a batch must yield an 'unknown' row
    while its neighbors decode — no task failure at 100 TB."""
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    rows = [(1, bytearray(mm.build_bmp(4, 4))),
            (2, bytearray(b"corrupt bytes")),
            (3, bytearray(mm.build_wav(1, 8000, 400)))]
    df = spark.createDataFrame(rows, "doc_id BIGINT, payload BINARY")
    got = {r["doc_id"]: r for r in
           mm.decode_binary_metadata(df).collect()}
    assert got[1]["mm_format"] == "bmp" and got[1]["width"] == 4
    assert got[2]["mm_format"] == "unknown"
    assert got[2]["width"] is None and got[2]["duration_ms"] is None
    assert got[3]["mm_format"] == "wav" and got[3]["duration_ms"] == 50


# ---------------------------------------------------------------------------
# DSIR importance resampling
# ---------------------------------------------------------------------------

def test_dsir_scoring_is_shuffle_free_and_topk_takeordered(spark):
    """Scoring must be a pure per-row fold against the model literal
    (zero Exchanges — the training DAG must NOT ride along), and the
    resample must plan TakeOrderedAndProject, never a global sort."""
    from oracle_cassandra_migrator_spark.operators import importance
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    ratios = importance.train_dsir_ratios(
        docs, "text", "doc_id", "lang = 'en'")
    scored = importance.dsir_logweight(docs, ratios, "text", "doc_id")
    plan = scored._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Scan" in plan

    topk = importance.dsir_resample_topk(scored, 100, "doc_id")
    plan_k = topk._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan_k
    assert "Exchange rangepartitioning" not in plan_k


def test_dsir_weights_separate_target_from_rest(spark):
    """Sanity on semantics: per-word-normalized weights must rank the
    target slice (en) above the rest on average — the model was
    trained to prefer exactly that slice."""
    from oracle_cassandra_migrator_spark.operators import importance
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    docs = read_table(spark, SF_SMALL, "documents")
    ratios = importance.train_dsir_ratios(
        docs, "text", "doc_id", "lang = 'en'")
    assert len(ratios) == importance.DSIR_BUCKETS
    scored = importance.dsir_logweight(docs, ratios, "text", "doc_id") \
        .join(docs.select("doc_id", "lang"), "doc_id")
    rows = scored.selectExpr(
        "lang = 'en' AS is_en",
        "CAST(logw_micro AS DOUBLE) / n_words AS per_word").groupBy(
        "is_en").avg("per_word").collect()
    avg = {r["is_en"]: r["avg(per_word)"] for r in rows}
    assert avg[True] > avg[False]

    # resample must enrich the target slice relative to the corpus
    base = docs.where("lang = 'en'").count() / docs.count()
    picked = importance.dsir_resample_topk(scored, 100, "doc_id")
    frac = picked.where("lang = 'en'").count() / 100.0
    assert frac > base


# ---------------------------------------------------------------------------
# Data-quality audits
# ---------------------------------------------------------------------------

def test_referential_integrity_audit_catches_planted_orphans(spark, tmp_path):
    """All-zero on the consistent testdata is necessary but not
    sufficient — plant orphans and assert the audit counts exactly
    them."""
    import shutil

    from oracle_cassandra_migrator_spark.queries.round7 import (
        audit_referential_integrity)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    clean = {r["relation"]: r for r in
             catalog_rows(spark, "audit_referential_integrity", SF_SMALL)[1]}
    assert set(clean) == {
        "lineitem->orders", "lineitem->part", "lineitem->supplier",
        "orders->customer", "customer->nation", "supplier->nation",
        "nation->region"}
    assert all(r["n_orphan_rows"] == 0 and r["n_orphan_keys"] == 0
               for r in clean.values())

    # corrupt copy: 3 lineitem rows pointed at a nonexistent order,
    # 2 of them sharing one bogus key
    broken = str(tmp_path / "broken")
    shutil.copytree(SF_SMALL, broken)
    li = read_table(spark, SF_SMALL, "lineitem")
    from pyspark.sql import functions as F

    patched = li.withColumn(
        "l_orderkey",
        F.expr("CASE WHEN l_linenumber = 1 AND l_orderkey % 97 = 1 "
               "THEN 999999990 + l_orderkey % 2 "
               "ELSE l_orderkey END"))
    n_planted = patched.where("l_orderkey >= 999999990").count()
    n_keys = patched.where("l_orderkey >= 999999990") \
        .select("l_orderkey").distinct().count()
    assert n_planted > 0
    import glob
    import os

    for f in glob.glob(f"{broken}/lineitem.parquet/*") + glob.glob(
            f"{broken}/lineitem.parquet"):
        if os.path.isfile(f):
            os.remove(f)
        else:
            shutil.rmtree(f)
    patched.write.mode("overwrite").parquet(f"{broken}/lineitem.parquet")

    got = {r["relation"]: r for r in
           audit_referential_integrity(spark, broken).collect()}
    assert got["lineitem->orders"]["n_orphan_rows"] == n_planted
    assert got["lineitem->orders"]["n_orphan_keys"] == n_keys
    assert got["orders->customer"]["n_orphan_rows"] == 0


def test_kappa_query_perfect_and_constant_raters(spark, tmp_path):
    """kappa = 1e6 ppm when the heuristic agrees everywhere; the
    catalog query is validated against the operator on real data."""
    from oracle_cassandra_migrator_spark.operators.evaluation import (
        cohens_kappa)
    from oracle_cassandra_migrator_spark.operators.text import (
        lang_guess_expr)
    from oracle_cassandra_migrator_spark.queries.round7 import (
        eval_cohens_kappa_lang_guess)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    row = catalog_rows(spark, "eval_cohens_kappa_lang_guess", SF_SMALL)[1][0]
    docs = read_table(spark, SF_SMALL, "documents").selectExpr(
        "lang AS ra", f"{lang_guess_expr('text')} AS rb")
    op = cohens_kappa(docs, "ra", "rb")
    assert row["kappa_ppm"] == op["kappa_ppm"]
    assert row["po_ppm"] == op["po_ppm"]
    assert row["pe_ppm"] == op["pe_ppm"]
    assert row["n_total"] == op["n"]

    # perfect agreement on a synthetic frame -> exactly 1e6 ppm via
    # the same SQL shape the query uses (two distinct categories)
    import shutil

    perfect_dir = str(tmp_path / "perfect")
    shutil.copytree(SF_SMALL, perfect_dir)
    docs_raw = read_table(spark, SF_SMALL, "documents")
    forced = docs_raw.withColumn(
        "text",
        # texts the heuristic maps deterministically onto the label
        __import__("pyspark.sql.functions", fromlist=["expr"]).expr(
            "CASE WHEN lang = 'en' THEN 'the and of to is' "
            "WHEN lang = 'de' THEN 'der die und ist das' "
            "WHEN lang = 'es' THEN 'el la que de es' "
            "WHEN lang = 'fr' THEN 'le et est les fil' "
            "ELSE 'zz qq xx' END"))
    only_known = forced.where("lang IN ('en','de','es','fr')")
    import glob
    import os

    for f in glob.glob(f"{perfect_dir}/documents.parquet*"):
        shutil.rmtree(f) if os.path.isdir(f) else os.remove(f)
    only_known.write.mode("overwrite").parquet(
        f"{perfect_dir}/documents.parquet")
    got = eval_cohens_kappa_lang_guess(spark, perfect_dir).collect()[0]
    assert got["agree"] == got["n_total"]
    assert got["kappa_ppm"] == 1_000_000


def test_power_iteration_matches_numpy_on_real_covariance(spark):
    """The driver-side eigensolver must agree with numpy.linalg.eigh
    on the covariance matrix the catalog query computes."""
    import numpy as np

    from oracle_cassandra_migrator_spark.operators.similarity import (
        power_iteration_top_eig)
    from oracle_cassandra_migrator_spark.queries.round7 import (
        EMB_DIM, embedding_covariance_matrix)

    rows = catalog_rows(spark, "embedding_covariance_matrix", SF_SMALL)[1]
    cells = [{"i": r["i"], "j": r["j"], "cov": r["cov_micro2"] / 1e12}
             for r in rows]
    lam, vec = power_iteration_top_eig(cells, EMB_DIM)

    a = np.zeros((EMB_DIM, EMB_DIM))
    for c in cells:
        a[c["i"] - 1, c["j"] - 1] = c["cov"]
        a[c["j"] - 1, c["i"] - 1] = c["cov"]
    w, v = np.linalg.eigh(a)
    assert lam == pytest.approx(w[-1], rel=1e-6)
    top = v[:, -1]
    cos = abs(float(np.dot(top, np.array(vec))))
    assert cos == pytest.approx(1.0, abs=1e-6)


def test_project_components_matches_numpy_and_plans_shuffle_free(spark):
    import numpy as np

    from oracle_cassandra_migrator_spark.operators.similarity import (
        power_iteration_top_eig, project_components)
    from oracle_cassandra_migrator_spark.queries.round7 import (
        EMB_DIM, embedding_covariance_matrix)
    from oracle_cassandra_migrator_spark.sources.testdata import read_table

    rows = catalog_rows(spark, "embedding_covariance_matrix", SF_SMALL)[1]
    cells = [{"i": r["i"], "j": r["j"], "cov": r["cov_micro2"] / 1e12}
             for r in rows]
    _, top = power_iteration_top_eig(cells, EMB_DIM)

    emb = read_table(spark, SF_SMALL, "embeddings")
    got = project_components(emb, [top])
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan

    sample = {r["vec_id"]: r["pc1"] for r in got.limit(0).sparkSession
              .createDataFrame(got.take(20)).collect()}
    raw = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
           for r in emb.collect()}
    t = np.array(top)
    for vid, pc1 in sample.items():
        assert pc1 == pytest.approx(float(raw[vid] @ t), abs=1e-5)


def test_decode_header_webp_variants_and_edges():
    """WebP (VERDICT r10 item 4): round-trip all three bitstream
    variants, then pin every quarantine path — interframe VP8, bad
    start code / VP8L signature, nonzero VP8L version, truncated
    chunk declarations, and canvas-first VP8X precedence."""
    import struct

    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    # round trips (channels: VP8 fixed 3, VP8L/VP8X 3 + alpha)
    assert mm.decode_header(mm.build_webp_vp8(320, 240)) == (
        "webp", 320, 240, 3, None, None)
    assert mm.decode_header(mm.build_webp_vp8l(16383, 1, alpha=True)) == (
        "webp", 16383, 1, 4, None, None)
    assert mm.decode_header(mm.build_webp_vp8x(70000, 3)) == (
        "webp", 70000, 3, 3, None, None)  # 24-bit canvas > 14-bit dims

    # VP8X is the spec-mandated FIRST chunk: its canvas wins even when
    # the inner VP8L geometry differs (a cropped/composed canvas)
    vp8x = mm.build_webp_vp8x(50, 60, alpha=True)
    assert mm.decode_header(vp8x) == ("webp", 50, 60, 4, None, None)

    # interframe VP8 (frame-tag bit 0 set) has no dims -> quarantine
    lossy = bytearray(mm.build_webp_vp8(9, 9))
    lossy[20] |= 0x01  # first payload byte of the VP8 chunk
    assert mm.decode_header(bytes(lossy))[0] == "unknown"

    # bad start code / bad VP8L signature / nonzero version
    bad_sc = bytearray(mm.build_webp_vp8(9, 9))
    bad_sc[23] = 0x00  # 9d 01 2a -> 00 01 2a
    assert mm.decode_header(bytes(bad_sc))[0] == "unknown"
    bad_sig = bytearray(mm.build_webp_vp8l(9, 9))
    bad_sig[20] = 0x2E
    assert mm.decode_header(bytes(bad_sig))[0] == "unknown"
    bad_ver = bytearray(mm.build_webp_vp8l(9, 9))
    bad_ver[24] |= 0xE0  # version bits 29..31 of the packed u32le
    assert mm.decode_header(bytes(bad_ver))[0] == "unknown"

    # chunk declares more bytes than the payload carries -> quarantine
    trunc = bytearray(mm.build_webp_vp8(9, 9))
    struct.pack_into("<I", trunc, 16, 10_000)
    assert mm.decode_header(bytes(trunc))[0] == "unknown"

    # unknown leading chunk is walked over (word-aligned) to the image
    vp8l = mm.build_webp_vp8l(7, 5)
    extra = b"EXIF" + struct.pack("<I", 3) + b"abc\x00"
    patched = vp8l[:12] + extra + vp8l[12:]
    patched = (b"RIFF" + struct.pack("<I", len(patched) - 8)
               + patched[8:])
    assert mm.decode_header(patched) == ("webp", 7, 5, 3, None, None)


def test_payload_for_doc_cycles_twelve_codecs():
    """The fixture contract the multimodal oracles replay: codec =
    doc_id % 12 across bmp/ppm/wav/png/gif/jpeg/webp/mp4/flac/tiff/
    ogg/mp3, every payload decodes to its own geometry arithmetic."""
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    fmts = [mm.decode_header(mm.payload_for_doc(i))[0] for i in range(24)]
    assert fmts == ["bmp", "ppm", "wav", "png", "gif", "jpeg", "webp",
                    "mp4", "flac", "tiff", "ogg", "mp3"] * 2
    # webp sub-cycle: variant (i//5)%3, alpha (i//12)%2 (sub-variant
    # selectors use the cycle index — i%k selectors freeze inside a
    # %12 codec slot, review r12)
    for i in (6, 18, 30, 42, 54, 66):
        got = mm.decode_header(mm.payload_for_doc(i))
        assert got[0] == "webp"
        assert got[1] == 1 + i % 37 and got[2] == 1 + (i * 19) % 23
        v, alpha = (i // 5) % 3, (i // 12) % 2
        assert got[3] == (3 if v == 0 else 3 + alpha), (i, v, alpha, got)
    # mp4 (r12): canvas from the video trak's tkhd, track count in the
    # channels slot, duration over the fixed 600 timescale, and the
    # exact box-size arithmetic for n_bytes
    for i in (7, 19, 31, 43, 127):
        got = mm.decode_header(mm.payload_for_doc(i))
        assert got == ("mp4", 1 + i % 43, 1 + (i * 29) % 31,
                       1 + (i // 12) % 3, None,
                       (1 + i % 900) * 1000 // 600)
        assert len(mm.payload_for_doc(i)) == \
            148 + 100 * (1 + (i // 12) % 3) + i % 50
    # flac (r12): channels / 20-bit sample rate / 36-bit total samples
    # from STREAMINFO's packed field, duration over the sample rate,
    # and the exact two-block byte arithmetic 46 + pad
    for i in (8, 20, 32, 44, 128):
        got = mm.decode_header(mm.payload_for_doc(i))
        rate = mm.WAV_RATES[(i // 7) % 3]
        assert got == ("flac", None, None, 1 + (i // 12) % 2, rate,
                       (1 + i % 2000) * 1000 // rate)
        assert len(mm.payload_for_doc(i)) == 46 + i % 64
    # tiff (r12): IFD ImageWidth/ImageLength/SamplesPerPixel, byte
    # order alternating II/MM on (i//2)%2 — invisible to the decoded
    # values — and the exact header+IFD arithmetic 98 + strip bytes
    for i in (9, 21, 33, 45, 129):
        got = mm.decode_header(mm.payload_for_doc(i))
        assert got == ("tiff", 1 + i % 41, 1 + (i * 23) % 27,
                       1 + (i // 12) % 4, None, None)
        assert len(mm.payload_for_doc(i)) == 98 + i % 97
    # ogg (r12): i%2 picks Vorbis (duration on the stream's own rate)
    # vs Opus (fixed 48 kHz granule clock); exact two-page byte
    # arithmetic 86 / 75
    for i in (10, 22, 34, 46, 130):
        got = mm.decode_header(mm.payload_for_doc(i))
        rate = mm.WAV_RATES[(i // 11) % 3]
        g = 1 + i % 3000
        vorbis = (i // 12) % 2 == 0
        # Opus durations subtract OpusHead's 312-sample pre-skip on
        # the 48 kHz clock (RFC 7845)
        dur = (g * 1000 // rate if vorbis
               else max(g - 312, 0) * 1000 // 48000)
        assert got == ("ogg", None, None, 1 + (i // 24) % 2, rate, dur)
        assert len(mm.payload_for_doc(i)) == (86 if vorbis else 75)
    # mp3 (r12): mono/stereo from the mode bits, rate from the MPEG-1
    # table, duration from the 1152-samples-per-frame count, and the
    # exact back-to-back frame arithmetic nf * (144 * 128000 // rate)
    for i in (11, 23, 35, 47, 143):
        got = mm.decode_header(mm.payload_for_doc(i))
        rate = mm.MP3_RATES[(i // 13) % 3]
        nf = 1 + i % 40
        assert got == ("mp3", None, None, 1 + (i // 12) % 2, rate,
                       nf * 1152 * 1000 // rate)
        assert len(mm.payload_for_doc(i)) == nf * (144 * 128000 // rate)


def test_fixture_exercises_every_variant_arm():
    """Review r12 regression pin: when the codec cycle moved from the
    odd % 9 to % 12, every doc_id % 2/3/4-derived sub-variant selector
    froze to a constant inside its codec slot (12 shares those
    factors) and Opus / big-endian TIFF / progressive JPEG / stereo
    WAV+FLAC / WebP alpha / multi-track MP4 silently left the
    certified fixture. Selectors now derive from the cycle index
    doc_id // 12; this test fails if any variant arm ever drops out
    of the first 500 doc ids again."""
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    decoded = [(i, mm.decode_header(mm.payload_for_doc(i)))
               for i in range(500)]
    by_fmt = {}
    for i, d in decoded:
        by_fmt.setdefault(d[0], []).append((i, d))
    # channel-variant spread per format
    assert {d[3] for _, d in by_fmt["wav"]} == {1, 2}
    assert {d[3] for _, d in by_fmt["flac"]} == {1, 2}
    assert {d[3] for _, d in by_fmt["ogg"]} == {1, 2}
    assert {d[3] for _, d in by_fmt["mp3"]} == {1, 2}
    assert {d[3] for _, d in by_fmt["jpeg"]} == {1, 3}
    assert {d[3] for _, d in by_fmt["mp4"]} == {1, 2, 3}
    assert {d[3] for _, d in by_fmt["tiff"]} == {1, 2, 3, 4}
    # WebP alpha: channels 4 occurs (and plain 3)
    assert {d[3] for _, d in by_fmt["webp"]} >= {3, 4}
    # Vorbis AND Opus both occur: byte length separates them (86/75)
    lens = {len(mm.payload_for_doc(i)) for i, d in by_fmt["ogg"]}
    assert lens == {86, 75}
    # both TIFF byte orders occur
    orders = {bytes(mm.payload_for_doc(i)[:2]) for i, _ in by_fmt["tiff"]}
    assert orders == {b"II", b"MM"}
    # progressive AND baseline JPEG occur (SOF2 vs SOF0 marker)
    sofs = set()
    for i, _ in by_fmt["jpeg"]:
        p = mm.payload_for_doc(i)
        sofs.add(b"\xff\xc2" in p)
    assert sofs == {True, False}


def test_ogg_trailing_garbage_quarantines():
    """Review r12: a stream cut mid-way through a following page's
    header used to decode 'successfully' with a stale duration; the
    tail check must quarantine it (same contract as _parse_mp3)."""
    from oracle_cassandra_migrator_spark.operators import multimodal as mm

    ok = mm.build_ogg_vorbis(2, 44100, 2205)
    assert mm.decode_header(ok)[0] == "ogg"
    assert mm.decode_header(ok + b"OggS\x00\x04garbage")[0] == "unknown"
    assert mm.decode_header(ok + b"\x01")[0] == "unknown"
