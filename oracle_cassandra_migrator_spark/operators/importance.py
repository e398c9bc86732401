"""DSIR-style importance resampling (Xie et al. 2023, "Data Selection
for Language Models via Importance Resampling").

The pretraining-curation move the catalog was missing: score every
document by how much more likely its hashed bag-of-words is under a
TARGET distribution (here: the ``lang = 'en'`` slice, standing in for
"looks like the domain I want") than under the SOURCE (the whole
corpus), then resample by weight with Gumbel keys. Three parts, all
engine-exact:

- **Train** (``train_dsir_ratios``): two ``DSIR_BUCKETS``-bucket
  hashed-unigram histograms over a bounded sample (``% mod`` prefilter
  composed with the round-7 absolute cap), collected driver-side —
  2 x 128 longs — and turned into one integer ratio array:
  ``ratio_micro[b] = floor(ln(p_t[b])*1e6+.5) - floor(ln(p_s[b])*1e6+.5)``
  with add-half smoothing, the same stamp-a-literal convention as the
  bigram LM (each floor(ln(...)) term is reproduced verbatim by the
  DuckDB oracle, so the subtraction is exact integer math).
- **Score** (``dsir_logweight``): per-doc log importance weight =
  sum over words of ``ratio_micro[bucket(word)]`` — a pure JVM-side
  ``aggregate(transform(...))`` fold against the 128-long array
  LITERAL. Zero shuffles besides the scan; the model never drags its
  training DAG into the scoring plan.
- **Resample** (``dsir_resample_topk``): weighted sampling without
  replacement via Gumbel-top-k — key = logw_micro + floor(G*1e6+.5)
  where G = -ln(-ln(u)) and u is the salted-hash uniform in (0,1)
  (deterministic across engines/cluster sizes: same doc -> same
  Gumbel). Top-k by key plans as TakeOrderedAndProject — per-task
  bottom-k heaps, no corpus sort at 100 TB.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from oracle_cassandra_migrator_spark.operators.sampling import (
    cap_by_salted_hash)
from oracle_cassandra_migrator_spark.operators.text import words_expr

DSIR_BUCKETS = 128
DSIR_SAMPLE_MOD = 7
DSIR_SAMPLE_CAP = 100_000


def word_bucket_expr(word_expr: str) -> str:
    """Feature hash of a word into [0, DSIR_BUCKETS): the repo's
    md5 -> 60-bit BIGINT idiom (15 hex chars stay positive)."""
    return (f"CAST(conv(substring(md5({word_expr}), 1, 15), 16, 10)"
            f" AS BIGINT) % {DSIR_BUCKETS}")


def _ln_micro(count: int, total: int) -> int:
    """floor(ln((count + 0.5) / (total + DSIR_BUCKETS/2)) * 1e6 + 0.5)
    — one smoothed log-probability in integer micro-units, the exact
    term the oracle SQL re-derives with DuckDB's ln()."""
    return math.floor(
        math.log((count + 0.5) / (total + DSIR_BUCKETS / 2.0)) * 1e6 + 0.5)


def train_dsir_ratios(docs: DataFrame, text_col: str, id_col: str,
                      target_pred: str,
                      sample_mod: int = DSIR_SAMPLE_MOD,
                      sample_cap: int = DSIR_SAMPLE_CAP) -> list[int]:
    """The dense ``DSIR_BUCKETS``-long integer ratio array. Training
    reads the bounded sample once; the collect is 128 rows."""
    sampled = cap_by_salted_hash(
        docs.where(f"{id_col} % {sample_mod} = 0"), id_col,
        sample_cap, "dsir-train")
    hist = (
        sampled.select(
            F.expr(f"CASE WHEN {target_pred} THEN 1 ELSE 0 END")
            .alias("is_t"),
            F.explode(F.expr(words_expr(text_col))).alias("w"))
        .select("is_t", F.expr(word_bucket_expr("w")).alias("b"))
        .groupBy("b")
        .agg(F.expr("CAST(SUM(is_t) AS BIGINT)").alias("ct"),
             F.expr("CAST(COUNT(*) AS BIGINT)").alias("cs"))
        .collect())
    ct = {r["b"]: r["ct"] for r in hist}
    cs = {r["b"]: r["cs"] for r in hist}
    tt = sum(ct.values())
    ts = sum(cs.values())
    if not ts:
        raise ValueError(
            "train_dsir_ratios: empty training sample "
            "(check the sample predicate)")
    return [
        _ln_micro(ct.get(b, 0), tt) - _ln_micro(cs.get(b, 0), ts)
        for b in range(DSIR_BUCKETS)
    ]


def _ratio_array_literal(ratios: list[int]) -> str:
    return "array(" + ", ".join(f"{v}L" for v in ratios) + ")"


def dsir_logweight(docs: DataFrame, ratios: list[int], text_col: str,
                   id_col: str) -> DataFrame:
    """(id, n_words, logw_micro) for every document — one scan, the
    model folded in as an array literal."""
    arr = _ratio_array_literal(ratios)
    ws = words_expr(text_col)
    return docs.select(
        F.col(id_col).cast("bigint").alias(id_col),
        F.expr(f"CAST(size({ws}) AS BIGINT)").alias("n_words"),
        F.expr(
            f"aggregate(transform({ws}, w -> "
            f"element_at({arr}, CAST({word_bucket_expr('w')} AS INT) + 1)), "
            f"CAST(0 AS BIGINT), (acc, v) -> acc + v)"
        ).alias("logw_micro"),
    )


# 2^60 — the hash is 15 hex chars, so u = (h + 0.5) / 2^60 is in (0, 1)
HASH_DENOM = float(1 << 60)


def gumbel_key_expr(id_expr: str, logw_col: str,
                    salt: str = "dsir") -> str:
    """logw_micro + floor(Gumbel(u)*1e6 + 0.5), u from the salted hash
    of the id — the weighted-sampling-without-replacement key (same
    A-ES/Gumbel trick as ``sample_weighted_reservoir``, in integer
    micro-units so both engines agree bit-for-bit)."""
    h = (f"CAST(conv(substring(md5(concat('{salt}:', "
         f"CAST({id_expr} AS STRING))), 1, 15), 16, 10) AS BIGINT)")
    u = f"(({h}) + 0.5) / {HASH_DENOM!r}"
    return (f"{logw_col} + CAST(floor(-ln(-ln({u})) * 1e6 + 0.5)"
            f" AS BIGINT)")


def dsir_resample_topk(scored: DataFrame, k: int,
                       id_col: str) -> DataFrame:
    """Gumbel-top-k over the scored frame: a without-replacement
    sample of ``k`` docs with inclusion probability increasing in
    importance weight. TakeOrderedAndProject — no global sort."""
    return (
        scored
        .withColumn("sample_key",
                    F.expr(gumbel_key_expr(id_col, "logw_micro")))
        .orderBy(F.col("sample_key").desc(), F.col(id_col))
        .limit(k)
    )
