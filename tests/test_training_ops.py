"""Semantics tests for the training-flavored round-6 additions: BPE
merge-rule learning, IVF cluster-quality metrics (purity/NMI), and the
exact closed-form EWMA."""

import math
import random

from pyspark.sql import functions as F

from oracle_cassandra_migrator_spark.queries import QUERIES
from oracle_cassandra_migrator_spark.sources.testdata import read_table

from tests.conftest import SF_SMALL, catalog_rows


# --------------------------------------------------------------------------
# BPE
# --------------------------------------------------------------------------


def _bpe_reference(word_counts, k):
    """Plain-Python BPE trainer: greedy left-to-right merge, argmax by
    (count DESC, pair ASC). The independent oracle for the Spark fold."""
    vocab = {w: list(w) for w in word_counts}
    rules = []
    for idx in range(k):
        pairs = {}
        for w, toks in vocab.items():
            c = word_counts[w]
            for i in range(len(toks) - 1):
                pairs[(toks[i], toks[i + 1])] = pairs.get(
                    (toks[i], toks[i + 1]), 0) + c
        if not pairs:
            break
        (a, b), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        rules.append((idx + 1, a, b, a + b, n))
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    return rules


def test_bpe_matches_python_reference_on_random_corpora(spark):
    """The DataFrame train loop must reproduce a from-scratch Python
    BPE trainer exactly — rules, order, and counts — on corpora with
    repeated characters (aaa chains stress the greedy overlap rule)."""
    from oracle_cassandra_migrator_spark.operators.text import (
        bpe_merge_rules)

    for seed in (11, 12):
        rng = random.Random(seed)
        words = ["".join(rng.choice("aab") for _ in range(rng.randint(1, 6)))
                 for _ in range(200)]
        docs = spark.createDataFrame(
            [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
        got = [tuple(r) for r in
               bpe_merge_rules(spark, docs, "text", k=4)
               .orderBy("merge_idx").collect()]
        counts = {}
        for w in words:
            counts[w] = counts.get(w, 0) + 1
        want = _bpe_reference(counts, 4)
        assert got == want, (seed, got, want)


def test_bpe_query_counts_are_monotone_nonincreasing(spark):
    """Each merge's pair count can never exceed the previous one (new
    pairs created by a merge occur at most once per merge site)."""
    rows = (QUERIES["text_bpe_merge_rules"](spark, SF_SMALL)
            .orderBy("merge_idx").collect())
    assert len(rows) == 5
    counts = [r.pair_count for r in rows]
    assert counts == sorted(counts, reverse=True)
    assert all(r.merged == r.left_tok + r.right_tok for r in rows)


# --------------------------------------------------------------------------
# Cluster quality
# --------------------------------------------------------------------------


def test_cluster_nmi_matches_python_reference(spark):
    """Recompute purity/MI/NMI in plain Python from the same
    contingency table and compare to the engine-shared SQL tail."""
    from oracle_cassandra_migrator_spark.operators import similarity

    emb = read_table(spark, SF_SMALL, "embeddings")
    cents = similarity.kmeans_codebook(emb, modulus=43, iters=2)
    cells = similarity._assign_cells(emb, cents, "embedding", "vec_id")
    ct = {(r.cell_id, r.label): r.n
          for r in cells.join(emb.select("vec_id", "label"), "vec_id")
          .groupBy("cell_id", "label").agg(F.count("*").alias("n"))
          .collect()}
    n_total = sum(ct.values())
    n_c, n_l = {}, {}
    for (c, l), n in ct.items():
        n_c[c] = n_c.get(c, 0) + n
        n_l[l] = n_l.get(l, 0) + n
    # micro-quantized then scaled to nano — mirrors _CLUSTER_NMI_TAIL's
    # r6 half-up micro convention (ADVICE r5: nano floors sat 1 ulp
    # from libm boundaries)
    nano = lambda x: math.floor(x * 1e6 + 0.5) * 1000
    mi = sum(nano((n / n_total) * math.log2(n * n_total
                                           / (n_c[c] * n_l[l])))
             for (c, l), n in ct.items()) / 1e9
    hc = sum(nano(-(n / n_total) * math.log2(n / n_total))
             for n in n_c.values()) / 1e9
    hl = sum(nano(-(n / n_total) * math.log2(n / n_total))
             for n in n_l.values()) / 1e9
    purity = sum(max(n for (c2, _), n in ct.items() if c2 == c)
                 for c in n_c) / n_total
    row = catalog_rows(spark, "sim_cluster_quality_nmi", SF_SMALL)[1][0]
    assert row.n_vecs == n_total
    assert row.n_cells == len(n_c) and row.n_labels == len(n_l)
    assert row.purity_ppm == math.floor(purity * 1e6 + 0.5)
    assert abs(row.mutual_info_bits - round(mi, 6)) < 1e-9
    assert abs(row.nmi - round(mi / math.sqrt(hc * hl), 6)) < 1e-9
    assert 0.0 <= row.nmi <= 1.0


# --------------------------------------------------------------------------
# EWMA
# --------------------------------------------------------------------------


def test_ewma_matches_recursive_definition_exactly(spark):
    """The closed-form prefix sum must equal the textbook recursion
    s_d = 0.5*x_d + 0.5*s_{d-1}, s_0 = x_0 — bit-for-bit, because
    every intermediate is an exact power-of-two-scaled integer."""
    rows = catalog_rows(spark, "events_daily_ewma", SF_SMALL)[1]
    by_type = {}
    for r in sorted(rows, key=lambda r: (r.event_type, r.day)):
        by_type.setdefault(r.event_type, []).append(r)
    assert by_type
    for _typ, seq in by_type.items():
        s = None
        for r in seq:
            s = float(r.n_events) if s is None else \
                0.5 * r.n_events + 0.5 * s
            # SQL round() is half-away-from-zero; Python round() is
            # banker's — s is dyadic so s*1e6 is exact and floor+0.5
            # reproduces the engines' tie behavior.
            assert r.ewma == math.floor(s * 1e6 + 0.5) / 1e6, (r, s)


def test_ewma_plan_aggregates_before_window(spark):
    plan = (QUERIES["events_daily_ewma"](spark, SF_SMALL)
            ._jdf.queryExecution().executedPlan().toString())
    w = plan.index("Window")
    assert "HashAggregate" in plan[w:], "window must sit above the aggregate"


def test_ewma_stream_carries_state_across_batches(spark, tmp_path):
    """Streaming EWMA (the recursive/incremental form) must equal the
    batch fold over the same rows in the same (ts, value) order, with
    state carried across a two-micro-batch split — the unbounded-span
    path events_daily_ewma's docstring promises."""
    import time

    from oracle_cassandra_migrator_spark.streaming.stateful import (
        ewma_stream)

    ev = (read_table(spark, SF_SMALL, "events")
          .select("event_type", "ts", "value"))
    rows = sorted(ev.collect(), key=lambda r: (r.ts, r.value))
    cut = rows[len(rows) // 2].ts

    src = str(tmp_path / "ewma_src")
    ev.where(F.col("ts") < F.lit(cut)).coalesce(1).write.mode(
        "overwrite").parquet(src)

    stream = (spark.readStream.schema(ev.schema)
              .option("maxFilesPerTrigger", "1").parquet(src))
    q = (ewma_stream(stream, "event_type", "value", "ts")
         .writeStream.format("memory").queryName("ewma_stream")
         .outputMode("update").trigger(processingTime="500 milliseconds")
         .start())

    try:
        deadline = time.time() + 90
        while time.time() < deadline and not spark.table(
                "ewma_stream").count():
            time.sleep(0.5)
        assert spark.table("ewma_stream").count() > 0
        ev.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.mode(
            "append").parquet(src)
        n_total = len(rows)
        deadline = time.time() + 90
        done = False
        while time.time() < deadline and not done:
            got = {r.key: r for r in spark.table("ewma_stream")
                   .withColumn("rn", F.expr(
                       "row_number() OVER (PARTITION BY key"
                       " ORDER BY n_obs DESC)"))
                   .where("rn = 1").collect()}
            done = sum(r.n_obs for r in got.values()) == n_total
            time.sleep(0.5)
    finally:
        q.stop()

    assert done, "stream never processed both files"
    # batch reference: same fold, same per-batch (ts, value) order,
    # split by the SAME ts predicate the files used (index-splitting
    # would misplace rows that share the cut timestamp)
    ref = {}
    for half in ([r for r in rows if r.ts < cut],
                 [r for r in rows if r.ts >= cut]):
        for r in half:
            s, n = ref.get(r.event_type, (0.0, 0))
            s = float(r.value) if n == 0 else 0.5 * float(r.value) + 0.5 * s
            ref[r.event_type] = (s, n + 1)
    for k, r in got.items():
        assert r.n_obs == ref[k][1], k
        assert r.ewma == ref[k][0], (k, r.ewma, ref[k][0])


def test_ewma_stream_recovers_state_from_checkpoint(spark, tmp_path):
    """Kill-and-restart: the EWMA query processes batch 1, STOPS, and
    a new query instance restarts from the same checkpointLocation to
    process batch 2 — the final per-key state must equal the
    uninterrupted fold, proving the state store (not recomputation)
    carried s across the restart. This is the crash-recovery contract
    a production stateful pipeline leans on."""
    import time

    from oracle_cassandra_migrator_spark.streaming.stateful import (
        ewma_stream)

    ev = (read_table(spark, SF_SMALL, "events")
          .select("event_type", "ts", "value"))
    rows = sorted(ev.collect(), key=lambda r: (r.ts, r.value))
    cut = rows[len(rows) // 2].ts
    src = str(tmp_path / "ewma_ckpt_src")
    ckpt = str(tmp_path / "ewma_ckpt")
    ev.where(F.col("ts") < F.lit(cut)).coalesce(1).write.mode(
        "overwrite").parquet(src)

    out = str(tmp_path / "ewma_ckpt_out")

    def start():
        # memory sinks can't recover from a checkpoint — foreachBatch
        # to parquet is the restartable sink shape
        stream = (spark.readStream.schema(ev.schema)
                  .option("maxFilesPerTrigger", "10").parquet(src))

        def write_batch(df, _bid):
            df.write.mode("append").parquet(out)

        return (ewma_stream(stream, "event_type", "value", "ts")
                .writeStream.foreachBatch(write_batch)
                .option("checkpointLocation", ckpt)
                .outputMode("update").trigger(availableNow=True).start())

    q1 = start()
    q1.awaitTermination(120)          # batch 1 fully absorbed
    ev.where(F.col("ts") >= F.lit(cut)).coalesce(1).write.mode(
        "append").parquet(src)
    q2 = start()                      # NEW query, same checkpoint
    q2.awaitTermination(120)

    got = {r.key: r for r in spark.read.parquet(out)
           .withColumn("rn", F.expr(
               "row_number() OVER (PARTITION BY key ORDER BY n_obs DESC)"))
           .where("rn = 1").collect()}
    ref = {}
    for half in ([r for r in rows if r.ts < cut],
                 [r for r in rows if r.ts >= cut]):
        for r in half:
            s, n = ref.get(r.event_type, (0.0, 0))
            s = float(r.value) if n == 0 else 0.5 * float(r.value) + 0.5 * s
            ref[r.event_type] = (s, n + 1)
    assert sum(r.n_obs for r in got.values()) == len(rows)
    for k, r in got.items():
        assert r.n_obs == ref[k][1] and r.ewma == ref[k][0], k


def test_bpe_encode_stats_match_python_reference_encoding(spark):
    """The encode-stats profile must equal the Python reference's
    end-state: train with _bpe_reference, apply its merges, and
    recompute all five columns from the final python vocab."""
    import random

    from oracle_cassandra_migrator_spark.operators.text import (
        bpe_encode_stats)

    rng = random.Random(21)
    words = ["".join(rng.choice("aabc") for _ in range(rng.randint(1, 7)))
             for _ in range(300)]
    docs = spark.createDataFrame(
        [(i, w) for i, w in enumerate(words)], "doc_id long, text string")
    counts = {}
    for w in words:
        counts[w] = counts.get(w, 0) + 1
    # python reference: train k=4, then apply the merges
    vocab = {w: list(w) for w in counts}
    for _, a, b, _, _ in _bpe_reference(counts, 4):
        for w, toks in vocab.items():
            out, i = [], 0
            while i < len(toks):
                if i + 1 < len(toks) and toks[i] == a and toks[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(toks[i])
                    i += 1
            vocab[w] = out
    n_words = sum(counts.values())
    n_chars = sum(c * len(w) for w, c in counts.items())
    n_tokens = sum(c * len(vocab[w]) for w, c in counts.items())
    row = bpe_encode_stats(spark, docs, "text", k=4).collect()[0]
    assert row["n_distinct_words"] == len(counts)
    assert row["n_words"] == n_words
    assert row["n_chars"] == n_chars
    assert row["n_tokens"] == n_tokens
    assert row["compression_ppm"] == math.floor(
        n_tokens * 1e6 / n_chars + 0.5)
