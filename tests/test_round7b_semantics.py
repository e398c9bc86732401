"""Semantic tests for the round-7b family: planted cases and
independent recomputations that the DuckDB replica (same formula,
different engine) cannot catch — brute-force skyline, Python
Kaplan-Meier, CDC maintenance vs recompute under adversarial deltas,
planted changepoints, attribution hand-calcs, MAD edge cases."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import Row, functions as F

from oracle_cassandra_migrator_spark.operators import incremental
from oracle_cassandra_migrator_spark.queries import QUERIES

from tests.conftest import SF_SMALL, catalog_rows


# ---------------------------------------------------------------------------
# skyline: brute-force dominance cross-check
# ---------------------------------------------------------------------------


def test_skyline_matches_bruteforce(spark):
    import duckdb

    rows = catalog_rows(spark, "parts_skyline_frontier", SF_SMALL)[1]
    got = {(r.price_cents, r.size): r.n_parts for r in rows}

    con = duckdb.connect()
    pairs = con.sql(
        "SELECT CAST(floor(p_retailprice * 100 + 0.5) AS BIGINT),"
        " CAST(p_size AS INT), CAST(COUNT(*) AS BIGINT)"
        f" FROM read_parquet('{SF_SMALL}/part.parquet') GROUP BY 1, 2"
    ).fetchall()
    want = {}
    for pc, sz, n in pairs:
        dominated = any(
            qc <= pc and qs >= sz and (qc < pc or qs > sz)
            for qc, qs, _ in pairs)
        if not dominated:
            want[(pc, sz)] = n
    assert got == want
    # frontier invariant: strictly increasing size along increasing price
    frontier = sorted(got)
    for (p1, s1), (p2, s2) in zip(frontier, frontier[1:]):
        assert p1 < p2 and s1 < s2


def test_skyline_planted_ties(spark):
    # duplicate pareto-optimal pairs are all kept (counted), same-price
    # smaller sizes and same-size pricier rows are dominated
    df = spark.createDataFrame(
        [(100, 5), (100, 5), (100, 3), (200, 5), (150, 7), (300, 1)],
        "price_cents INT, size INT")
    pairs = df.groupBy("price_cents", "size").agg(
        F.count("*").cast("bigint").alias("n_parts"))
    from pyspark.sql import Window
    per_price = Window.partitionBy("price_cents")
    best = (pairs.withColumn("m", F.max("size").over(per_price))
            .filter(F.col("size") == F.col("m")))
    prev = (Window.orderBy("price_cents")
            .rowsBetween(Window.unboundedPreceding, -1))
    sky = (best.withColumn("pm", F.max("size").over(prev))
           .filter(F.col("pm").isNull() | (F.col("size") > F.col("pm")))
           .select("price_cents", "size", "n_parts"))
    got = {(r.price_cents, r.size): r.n_parts for r in sky.collect()}
    assert got == {(100, 5): 2, (150, 7): 1}


# ---------------------------------------------------------------------------
# incremental maintenance: maintained == recomputed, adversarial deltas
# ---------------------------------------------------------------------------


def _agg(df, keys):
    return df.groupBy(*keys).agg(
        F.count("*").cast("bigint").alias("n"),
        F.expr("SUM(CAST(v AS DECIMAL(38,0)))").alias("s"))


def test_maintain_equals_recompute_with_group_death_and_birth(spark):
    base = spark.createDataFrame(
        [("a", 10), ("a", 20), ("b", 5)], "k STRING, v INT")
    # delete BOTH 'b' rows' worth? b has one row: delete it (group dies),
    # update one 'a', insert a brand-new group 'c' (birth)
    cdc = spark.createDataFrame(
        [Row(op="D", k="b", new_v=None, old_v=5),
         Row(op="U", k="a", new_v=25, old_v=20),
         Row(op="I", k="c", new_v=7, old_v=None)])
    deltas = incremental.cdc_to_group_deltas(cdc, ["k"], "new_v", "old_v")
    maintained = incremental.maintain_sum_count(
        _agg(base, ["k"]), deltas, ["k"])
    got = {r.k: (r.n, int(r.s)) for r in maintained.collect()}
    assert got == {"a": (2, 35), "c": (1, 7)}  # b removed entirely


def test_maintain_surfaces_negative_counts(spark):
    # a delete for a row the base never had -> n goes negative and the
    # row SURVIVES the n != 0 filter (audit visibility, not clamping)
    base = spark.createDataFrame([("a", 1)], "k STRING, v INT")
    cdc = spark.createDataFrame(
        [("D", "z", None, 9)],
        "op STRING, k STRING, new_v INT, old_v INT")
    deltas = incremental.cdc_to_group_deltas(cdc, ["k"], "new_v", "old_v")
    maintained = incremental.maintain_sum_count(
        _agg(base, ["k"]), deltas, ["k"])
    got = {r.k: (r.n, int(r.s)) for r in maintained.collect()}
    assert got["z"] == (-1, -9)


def test_maintain_is_associative_across_batches(spark):
    # applying one big batch == applying its split in sequence
    base = spark.createDataFrame(
        [("a", 10), ("b", 5), ("b", 6)], "k STRING, v INT")
    rows = [Row(op="I", k="a", new_v=1, old_v=None),
            Row(op="U", k="b", new_v=8, old_v=5),
            Row(op="D", k="b", new_v=None, old_v=6),
            Row(op="I", k="c", new_v=2, old_v=None)]
    one = incremental.maintain_sum_count(
        _agg(base, ["k"]),
        incremental.cdc_to_group_deltas(
            spark.createDataFrame(rows), ["k"], "new_v", "old_v"),
        ["k"])
    two = _agg(base, ["k"])
    for half in (rows[:2], rows[2:]):
        two = incremental.maintain_sum_count(
            two,
            incremental.cdc_to_group_deltas(
                spark.createDataFrame(half), ["k"], "new_v", "old_v"),
            ["k"])
    a = {r.k: (r.n, int(r.s)) for r in one.collect()}
    b = {r.k: (r.n, int(r.s)) for r in two.collect()}
    assert a == b == {"a": (2, 11), "b": (1, 8), "c": (1, 2)}


# ---------------------------------------------------------------------------
# CUSUM: planted level shift is found
# ---------------------------------------------------------------------------


def test_cusum_flags_planted_level_shift(spark):
    # 10 days at 100/day then 10 days at 200/day: |CUSUM| peaks at the
    # last pre-shift day (day 10)
    rows = []
    eid = 0
    for day in range(1, 21):
        n = 100 if day <= 10 else 200
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d}"))
    df = spark.createDataFrame(rows, "event_id LONG, day STRING")
    daily = df.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n_events"))
    c = daily.selectExpr(
        "day", "n_events",
        "SUM(n_events) OVER (ORDER BY day ROWS BETWEEN UNBOUNDED"
        " PRECEDING AND CURRENT ROW) AS cum_n",
        "ROW_NUMBER() OVER (ORDER BY day) AS rn",
        "COUNT(*) OVER () AS n_days",
        "SUM(n_events) OVER () AS total")
    s = c.selectExpr(
        "day", "CAST(n_days * cum_n - rn * total AS BIGINT) AS cs")
    flagged = (s.selectExpr(
        "day", "cs", "abs(cs) = MAX(abs(cs)) OVER () AS cp")
        .filter("cp").collect())
    assert [r.day for r in flagged] == ["2024-01-10"]
    # scaled statistic at the peak: i*(total - n_days*mu_pre) check:
    # cum at day10 = 1000, cs = 20*1000 - 10*3000 = -10000
    assert flagged[0].cs == -10000


# ---------------------------------------------------------------------------
# Kaplan-Meier: independent Python recomputation
# ---------------------------------------------------------------------------


def _km_reference(lifes):
    """Plain-Python Kaplan-Meier with the catalog's micro-ln terms.
    ``lifes`` = [(duration_days, died), ...]."""
    want = {}
    cum = 0
    for t in sorted({d for d, _ in lifes}):
        n_risk = sum(1 for d, _ in lifes if d >= t)
        n_deaths = sum(dead for d, dead in lifes if d == t and dead)
        if n_deaths == 0:
            continue
        if n_deaths < n_risk:
            term = math.floor(
                math.log((n_risk - n_deaths) / n_risk) * 1e6 + 0.5)
        else:
            term = -1_000_000_000
        cum += term
        want[t] = (n_risk, n_deaths, cum)
    return want


def test_km_curve_matches_python_reference(spark):
    import duckdb

    rows = catalog_rows(spark, "events_survival_km_curve", SF_SMALL)[1]
    got = {r.dur_days: (r.n_risk, r.n_deaths, r.km_log_micro)
           for r in rows}
    assert got, "KM curve must not be vacuous on the test data"

    con = duckdb.connect()
    users = con.sql(
        "SELECT user_id, MIN(CAST(ts AS DATE)) f, MAX(CAST(ts AS DATE)) l,"
        " MIN(CASE WHEN event_type = 'purchase' THEN CAST(ts AS DATE) END)"
        f" p FROM read_parquet('{SF_SMALL}/events.parquet') GROUP BY 1"
    ).fetchall()
    lifes = [((p - f).days, 1) if p is not None else ((l - f).days, 0)
             for _, f, l, p in users]
    assert got == _km_reference(lifes)
    # survival is monotone nonincreasing
    logs = [v[2] for _, v in sorted(got.items())]
    assert all(a >= b for a, b in zip(logs, logs[1:]))


def test_km_censoring_keeps_users_in_risk_set(spark):
    # planted frame: censored users must stay at risk through their
    # lifetime (risk sets differ from a deaths-only computation) and
    # never count as deaths.
    #   deaths at t=1 (2 users), t=3 (1 user)
    #   censored at t=2 (1 user), t=5 (2 users)
    rows = [
        # (user, first day, purchase day or None, last day)
        (1, 1, 2, 2), (2, 1, 2, 2),          # die at dur 1
        (3, 1, 4, 4),                        # dies at dur 3
        (4, 1, None, 3),                     # censored at dur 2
        (5, 1, None, 6), (6, 1, None, 6),    # censored at dur 5
    ]
    ev = []
    eid = 0
    for u, f, p, l in rows:
        for d in (f, l):
            eid += 1
            ev.append((eid, u, f"2024-01-{d:02d} 00:00:00", "view"))
        if p is not None:
            eid += 1
            ev.append((eid, u, f"2024-01-{p:02d} 00:00:00", "purchase"))
    df = spark.createDataFrame(
        ev, "event_id LONG, user_id LONG, ts_s STRING, event_type STRING"
    ).selectExpr("event_id", "user_id", "CAST(ts_s AS TIMESTAMP) AS ts",
                 "event_type")
    per_user = df.groupBy("user_id").agg(
        F.expr("CAST(MIN(CAST(ts AS DATE)) AS DATE)").alias("first_d"),
        F.expr("CAST(MAX(CAST(ts AS DATE)) AS DATE)").alias("last_d"),
        F.expr("MIN(CASE WHEN event_type = 'purchase'"
               " THEN CAST(ts AS DATE) END)").alias("purch_d"))
    u = per_user.selectExpr(
        "CASE WHEN purch_d IS NOT NULL THEN datediff(purch_d, first_d)"
        " ELSE datediff(last_d, first_d) END AS dur",
        "CASE WHEN purch_d IS NOT NULL THEN 1 ELSE 0 END AS died")
    got_lifes = [(r.dur, r.died) for r in u.collect()]
    want = _km_reference([(1, 1), (1, 1), (3, 1), (2, 0), (5, 0), (5, 0)])
    assert _km_reference(got_lifes) == want
    # risk set at t=3 must still include the two dur-5 censored users:
    # n_risk(3) = 3 (user 3 + users 5,6), NOT 1
    assert want[3][0] == 3
    # and censored users never appear as deaths
    assert sum(v[1] for v in want.values()) == 3


# ---------------------------------------------------------------------------
# attribution: hand-computed journeys
# ---------------------------------------------------------------------------


def test_attribution_hand_case(spark):
    # u1: view,click,view -> purchase  (3 touches: 40/20/40)
    # u2: click -> purchase            (1 touch: 100%)
    # u3: view,click -> purchase       (2 touches: 50/50)
    # u4: purchase only                (no journey, contributes nothing)
    rows = [
        (1, 1, "2024-01-01 00:00:00", "view"),
        (2, 1, "2024-01-01 00:01:00", "click"),
        (3, 1, "2024-01-01 00:02:00", "view"),
        (4, 1, "2024-01-01 00:03:00", "purchase"),
        (5, 2, "2024-01-01 00:00:00", "click"),
        (6, 2, "2024-01-01 00:01:00", "purchase"),
        (7, 3, "2024-01-01 00:00:00", "view"),
        (8, 3, "2024-01-01 00:00:30", "click"),
        (9, 3, "2024-01-01 00:01:00", "purchase"),
        (10, 4, "2024-01-01 00:00:00", "purchase"),
    ]
    df = spark.createDataFrame(
        rows, "event_id LONG, user_id LONG, ts_s STRING, event_type STRING"
    ).selectExpr("event_id", "user_id",
                 "CAST(ts_s AS TIMESTAMP) AS ts", "event_type")
    df.createOrReplaceTempView("t_attr_events")
    from pyspark.sql import Window
    w_u = Window.partitionBy("user_id").orderBy("ts", "event_id")
    fp = (df.filter("event_type = 'purchase'")
          .withColumn("rn", F.row_number().over(w_u)).filter("rn = 1")
          .select("user_id", F.col("ts").alias("p_ts"),
                  F.col("event_id").alias("p_eid")))
    j = (df.join(fp, "user_id")
         .filter("ts < p_ts OR (ts = p_ts AND event_id < p_eid)"))
    pos = j.select(
        "event_type", F.row_number().over(w_u).alias("rn"),
        F.count("*").over(Window.partitionBy("user_id")).alias("k"))
    credit = pos.selectExpr(
        "event_type",
        "CASE WHEN k = 1 THEN 1000000 WHEN k = 2 THEN 500000"
        " WHEN rn = 1 OR rn = k THEN 400000"
        " ELSE 200000 DIV (k - 2) END AS c")
    got = {r.event_type: (r.n, r.c) for r in credit.groupBy("event_type")
           .agg(F.count("*").cast("bigint").alias("n"),
                F.sum("c").cast("bigint").alias("c")).collect()}
    # u1: view 400000 + 400000, click 200000
    # u2: click 1000000
    # u3: view 500000, click 500000
    assert got == {"view": (3, 1_300_000), "click": (3, 1_700_000)}


# ---------------------------------------------------------------------------
# MAD: zero-MAD convention and integer predicate
# ---------------------------------------------------------------------------


def test_mad_zero_mad_group_convention(spark):
    # 5 identical values + 1 deviant: median = 7, MAD = 0 -> the
    # deviant (and only it) is an outlier; max_z is NULL
    df = spark.createDataFrame(
        [("x", 7)] * 5 + [("x", 9)], "lang STRING, n_chars LONG")
    med = df.groupBy("lang").agg(F.expr(
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY n_chars)"
        " AS BIGINT)").alias("med"))
    dev = df.join(med, "lang").selectExpr(
        "lang", "med", "abs(n_chars - med) AS dev")
    mad = dev.groupBy("lang").agg(F.expr(
        "CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY dev)"
        " AS BIGINT)").alias("mad"))
    out = (dev.join(mad, "lang").groupBy("lang").agg(
        F.expr("CAST(SUM(CASE WHEN dev * 10000 > 51891 * mad THEN 1"
               " ELSE 0 END) AS BIGINT)").alias("n_outliers"),
        F.expr("CASE WHEN MAX(mad) > 0 THEN 1 END").alias("z"))
        .collect()[0])
    assert out.n_outliers == 1 and out.z is None


def test_mad_integer_predicate_matches_float_zscore(spark):
    # the integer rule dev*1e4 > 51891*mad is exactly z > 3.5 with
    # z = dev / (1.4826 * mad) on a grid of values
    for med, mad in ((100, 7), (50, 3), (1000, 40)):
        for dev in range(0, 30 * mad, max(1, mad // 3)):
            int_rule = dev * 10000 > 51891 * mad
            z = dev / (1.4826 * mad)
            # 3.5 * 1.4826 = 5.1891 exactly in decimal, so the integer
            # rule IS z > 3.5; strict on both sides, and the grid
            # avoids exact-boundary rationals
            assert int_rule == (z > 3.5), (med, mad, dev)


# ---------------------------------------------------------------------------
# spearman: perfect and inverted monotone pins
# ---------------------------------------------------------------------------


def test_spearman_perfect_monotone_pins(spark):
    from oracle_cassandra_migrator_spark.queries.round7b import _rank_map

    df = spark.createDataFrame(
        [(i, i * 10) for i in range(1, 21)], "q LONG, disc LONG")
    qr = _rank_map(df, "q").withColumnRenamed("q_rank2", "x")
    dr = _rank_map(df, "disc").withColumnRenamed("disc_rank2", "y")
    rk = df.join(qr, "q").join(dr, "disc")
    s = rk.agg(
        F.expr("CAST(COUNT(*) AS DOUBLE)").alias("n"),
        F.expr("SUM(CAST(x AS DOUBLE))").alias("sx"),
        F.expr("SUM(CAST(y AS DOUBLE))").alias("sy"),
        F.expr("SUM(CAST(x AS DOUBLE) * y)").alias("sxy"),
        F.expr("SUM(CAST(x AS DOUBLE) * x)").alias("sxx"),
        F.expr("SUM(CAST(y AS DOUBLE) * y)").alias("syy")).collect()[0]
    rho = ((s.n * s.sxy - s.sx * s.sy)
           / math.sqrt((s.n * s.sxx - s.sx ** 2)
                       * (s.n * s.syy - s.sy ** 2)))
    assert abs(rho - 1.0) < 1e-12


def test_spearman_catalog_sign_sanity(spark):
    # quantity and discount are independently drawn in the testdata:
    # |rho| must be far from +-1 (this catches rank-map join bugs that
    # would alias one variable onto the other)
    r = catalog_rows(spark, "corr_spearman_qty_discount", SF_SMALL)[1][0]
    assert abs(r.rho_ppm) < 500_000


# ---------------------------------------------------------------------------
# benford / calibration / zipf: structural pins
# ---------------------------------------------------------------------------


def test_benford_expected_ppm_literals():
    from oracle_cassandra_migrator_spark.queries.round7b import _BENFORD_PPM

    assert _BENFORD_PPM[1] == 301030  # log10(2)
    assert _BENFORD_PPM[9] == 45757
    assert abs(sum(_BENFORD_PPM.values()) - 1_000_000) <= 5  # rounding


def test_calibration_bins_partition_corpus(spark):
    rows = catalog_rows(spark, "eval_calibration_doclen", SF_SMALL)[1]
    import duckdb
    con = duckdb.connect()
    n_docs = con.sql(
        f"SELECT COUNT(*) FROM read_parquet('{SF_SMALL}/documents.parquet')"
    ).fetchone()[0]
    assert sum(r.n for r in rows) == n_docs
    assert all(0 <= r.bucket <= 9 for r in rows)
    assert all(0 <= r.mean_score_ppm <= 1_000_000 for r in rows)
    assert all(0 <= r.pos_rate_ppm <= 1_000_000 for r in rows)
    # mean score of bucket b lives inside the bucket's score range
    for r in rows:
        assert r.bucket * 100_000 <= r.mean_score_ppm < (r.bucket + 1) * 100_000


def test_zipf_fit_matches_python_reference(spark):
    # independent recomputation: tokenize in DuckDB, rank/fit in
    # plain Python with the same micro-quantization
    import duckdb

    r = catalog_rows(spark, "text_zipf_vocab_fit", SF_SMALL)[1][0]
    con = duckdb.connect()
    freqs = con.sql(
        "SELECT tok, COUNT(*) FROM (SELECT unnest(list_filter("
        "string_split_regex(lower(text), '\\s+'), x -> x != '')) tok"
        f" FROM read_parquet('{SF_SMALL}/documents.parquet'))"
        " GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 1000").fetchall()
    xs = [math.floor(math.log(i + 1) * 1e6 + 0.5)
          for i in range(len(freqs))]
    ys = [math.floor(math.log(n) * 1e6 + 0.5) for _, n in freqs]
    k = len(freqs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    sxx = sum(x * x for x in xs)
    slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert r.n_top == k
    assert r.slope_ppm == math.floor(slope * 1e6 + 0.5)
    # frequency decays with rank on any corpus: slope strictly negative
    assert r.slope_ppm < 0


def test_seasonality_indices_average_to_one(spark):
    rows = catalog_rows(spark, "events_seasonality_dow", SF_SMALL)[1]
    assert {r.dow for r in rows} <= set(range(7))
    # weighted (by n_days*mean) identity: sum(n_events) based index
    # must straddle 1e6 — all-below or all-above is impossible
    assert min(r.index_ppm for r in rows) <= 1_000_000
    assert max(r.index_ppm for r in rows) >= 1_000_000


def test_l_diversity_flags_match_definition(spark):
    rows = catalog_rows(spark, "privacy_l_diversity_audit", SF_SMALL)[1]
    for r in rows:
        assert r.is_weak == (r.l_distinct < 3)
        assert r.l_distinct <= r.n_rows


# ---------------------------------------------------------------------------
# incremental maintenance: hypothesis property vs recompute
# ---------------------------------------------------------------------------

from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


@settings(max_examples=5, deadline=None)
@given(
    base=st.lists(
        st.tuples(st.sampled_from("abcde"), st.integers(-1000, 1000)),
        min_size=1, max_size=12),
    ops=st.lists(
        st.tuples(st.sampled_from("IUD"), st.integers(0, 10 ** 6),
                  st.sampled_from("abcde"), st.integers(-1000, 1000)),
        min_size=0, max_size=12),
    n_batches=st.integers(1, 3),
)
def test_maintain_matches_recompute_randomized(spark, base, ops, n_batches):
    """Random consistent CDC streams, applied in 1-3 batches, always
    reproduce the from-scratch aggregate of the final table state —
    including group deaths, births, and re-births."""
    state = list(base)  # the "true table": list of (key, value) rows
    cdc_rows = []
    for kind, pick, key, val in ops:
        if kind == "I" or not state:
            state.append((key, val))
            cdc_rows.append(("I", key, val, None))
        else:
            idx = pick % len(state)
            old_k, old_v = state[idx]
            if kind == "D":
                state.pop(idx)
                cdc_rows.append(("D", old_k, None, old_v))
            else:  # U: key immutable by contract, value changes
                state[idx] = (old_k, val)
                cdc_rows.append(("U", old_k, val, old_v))

    agg = _agg(spark.createDataFrame(base, "k STRING, v INT"), ["k"])
    # split the stream into sequential batches
    size = max(1, (len(cdc_rows) + n_batches - 1) // n_batches)
    for i in range(0, len(cdc_rows), size):
        batch = spark.createDataFrame(
            cdc_rows[i:i + size],
            "op STRING, k STRING, new_v INT, old_v INT")
        deltas = incremental.cdc_to_group_deltas(
            batch, ["k"], "new_v", "old_v")
        agg = incremental.maintain_sum_count(agg, deltas, ["k"])

    got = {r.k: (r.n, int(r.s)) for r in agg.collect()}
    want = {}
    for k, v in state:
        n, s = want.get(k, (0, 0))
        want[k] = (n + 1, s + v)
    assert got == want


# ---------------------------------------------------------------------------
# round-7b second batch: kendall / hodges-lehmann / mase / deseasonalized
# ---------------------------------------------------------------------------


def test_kendall_tau_matches_bruteforce(spark):
    import duckdb

    r = catalog_rows(spark, "corr_kendall_tau_qty_discount", SF_SMALL)[1][0]
    con = duckdb.connect()
    rows = con.sql(
        "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT),"
        " CAST(floor(l_discount * 100 + 0.5) AS BIGINT)"
        f" FROM read_parquet('{SF_SMALL}/lineitem.parquet')").fetchall()
    n = len(rows)
    c = d = tq = td = 0
    for i in range(n):
        for j in range(i + 1, n):
            (q1, d1), (q2, d2) = rows[i], rows[j]
            if q1 == q2:
                tq += 1
                continue
            if d1 == d2:
                td += 1
                continue
            if (q1 < q2) == (d1 < d2):
                c += 1
            else:
                d += 1
    assert (r.n_rows, r.n_concordant, r.n_discordant) == (n, c, d)
    # brute-force tau-b: note tq here excludes joint ties the same way
    # ONLY if accumulated per standard definition — recompute exactly:
    from collections import Counter
    n0 = n * (n - 1) // 2
    t_q = sum(v * (v - 1) // 2 for v in Counter(q for q, _ in rows).values())
    t_d = sum(v * (v - 1) // 2 for v in Counter(d2 for _, d2 in rows).values())
    tau = (c - d) / math.sqrt((n0 - t_q) * (n0 - t_d))
    assert r.tau_b_ppm == math.floor(tau * 1e6 + 0.5)


def test_hodges_lehmann_matches_bruteforce(spark):
    import duckdb

    r = catalog_rows(spark, "agg_hodges_lehmann_quantity", SF_SMALL)[1][0]
    con = duckdb.connect()
    vals = [v for (v,) in con.sql(
        "SELECT CAST(floor(l_quantity + 0.5) AS BIGINT)"
        f" FROM read_parquet('{SF_SMALL}/lineitem.parquet')").fetchall()]
    walsh2 = sorted(vals[i] + vals[j]
                    for i in range(len(vals))
                    for j in range(i, len(vals)))
    w = len(walsh2)
    assert r.n_walsh_pairs == w
    # weighted lower median = smallest w2 with 2*cum >= W+1, which on
    # the expanded list is element ceil(W/2)-1 = (W+1)//2 - 1
    assert r.hl2 == walsh2[(w + 1) // 2 - 1]


def test_mase_hand_case(spark):
    # 14 days: first week flat 100, second week flat 100 except one
    # day at 130 -> seasonal-naive errors all 0 except 30; naive-1
    # errors are the two edges of the spike (30 + 30)
    counts = [100] * 7 + [100, 100, 130, 100, 100, 100, 100]
    rows = []
    eid = 0
    for day, n in enumerate(counts, start=1):
        for _ in range(n):
            eid += 1
            rows.append((eid, f"2024-01-{day:02d}"))
    df = spark.createDataFrame(rows, "event_id LONG, day STRING")
    daily = df.groupBy("day").agg(
        F.count("*").cast("bigint").alias("n"))
    lagged = daily.selectExpr(
        "day", "n",
        "lag(n, 7) OVER (ORDER BY day) AS n_7",
        "lag(n, 1) OVER (ORDER BY day) AS n_1")
    s = lagged.selectExpr(
        "CAST(SUM(CASE WHEN n_7 IS NOT NULL THEN abs(n - n_7) END)"
        " AS BIGINT) AS ae7",
        "CAST(SUM(CASE WHEN n_7 IS NOT NULL THEN 1 ELSE 0 END)"
        " AS BIGINT) AS t7",
        "CAST(SUM(CASE WHEN n_1 IS NOT NULL THEN abs(n - n_1) END)"
        " AS BIGINT) AS ae1",
        "CAST(SUM(CASE WHEN n_1 IS NOT NULL THEN 1 ELSE 0 END)"
        " AS BIGINT) AS t1").collect()[0]
    assert (s.ae7, s.t7, s.ae1, s.t1) == (30, 7, 60, 13)
    # mase = (30/7) / (60/13) = 13/14
    assert math.floor((30 * 13) * 1e6 / (7 * 60) + 0.5) == 928571


def test_deseasonalized_anomaly_catalog_sanity(spark):
    rows = catalog_rows(spark, "events_anomaly_deseasonalized", SF_SMALL)[1]
    assert rows and sum(1 for r in rows if r.is_anomaly) >= 1
    # flagged day(s) carry the maximal |ratio - 1e6|
    mx = max(abs(r.ratio_ppm - 1_000_000) for r in rows)
    for r in rows:
        assert r.is_anomaly == (abs(r.ratio_ppm - 1_000_000) == mx)
    # each weekday's ratios average to ~1e6 by construction (weighted
    # by day counts): per-dow mean of n equals the dow mean
    from collections import defaultdict
    by_dow = defaultdict(list)
    for r in rows:
        by_dow[r.dow].append((r.n_events, r.ratio_ppm))
    for dow, pairs in by_dow.items():
        tot_n = sum(n for n, _ in pairs)
        days = len(pairs)
        for n, ratio in pairs:
            assert ratio == math.floor(n * days * 1e6 / tot_n + 0.5)
