"""Randomized cross-checks for the graph kernels: seeded random
graphs / event logs, Spark operator vs an independent pure-Python
computation. Seeded (not hypothesis) because each example spins Spark
jobs — 12 deterministic graphs give the coverage without per-example
shrinkage machinery."""

import itertools
import random

from pyspark.sql import functions as F


def _random_graph(rng, n_nodes, p):
    nodes = [f"v{i}" for i in range(n_nodes)]
    edges = [(a, b) for a, b in itertools.combinations(nodes, 2)
             if rng.random() < p]
    return nodes, edges


def _brute_triangles(nodes, edges):
    und = {frozenset(e) for e in edges}
    counts = {n: 0 for n in nodes}
    for a, b, c in itertools.combinations(sorted(nodes), 3):
        if ({frozenset((a, b)), frozenset((b, c)), frozenset((a, c))}
                <= und):
            counts[a] += 1
            counts[b] += 1
            counts[c] += 1
    return counts


def test_triangle_counts_random_graphs(spark):
    from oracle_cassandra_migrator_spark.operators.graph import (
        triangle_counts)

    rng = random.Random(20260814)
    for case in range(12):
        n_nodes = rng.randint(3, 9)
        p = rng.choice([0.2, 0.5, 0.8])
        nodes, edges = _random_graph(rng, n_nodes, p)
        nodes_df = spark.createDataFrame(
            [(n,) for n in nodes], "node STRING")
        if edges:
            und = spark.createDataFrame(edges, "a STRING, b STRING")
        else:
            und = spark.createDataFrame([], "a STRING, b STRING")
        got = {r["node"]: r["n_triangles"]
               for r in triangle_counts(und, nodes_df).collect()}
        assert got == _brute_triangles(nodes, edges), (case, edges)


def test_transition_matrix_random_logs(spark):
    """events_type_transition_matrix's core math vs a pure-Python
    replay on seeded random event logs written to parquet (through the
    real query, including the ns-timestamp read path's floor).

    Uses synthetic parquet in the events schema; ts spacing is whole
    seconds so engine timestamp-precision differences can't reorder."""
    import datetime
    import os
    import tempfile

    from oracle_cassandra_migrator_spark.queries import QUERIES

    rng = random.Random(99)
    types = ["view", "click", "purchase"]
    rows = []
    eid = 0
    for user in range(6):
        t0 = datetime.datetime(2024, 1, 1)
        for _ in range(rng.randint(0, 15)):
            t0 += datetime.timedelta(seconds=rng.randint(1, 500))
            rows.append((eid, t0, user, rng.choice(types), 1.0, "{}"))
            eid += 1
    with tempfile.TemporaryDirectory() as d:
        sf_dir = os.path.join(d, "sf")
        os.makedirs(sf_dir)
        # single-file ns-timestamp parquet, the exact testdata shape
        # read_table's nanosAsLong rebuild expects
        import pyarrow as pa
        import pyarrow.parquet as pq

        table = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("ns")),
            "user_id": pa.array([r[2] for r in rows], pa.int64()),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
            "value": pa.array([r[4] for r in rows], pa.float64()),
            "props": pa.array([r[5] for r in rows], pa.string()),
        })
        pq.write_table(table, os.path.join(sf_dir, "events.parquet"))
        got = {(r["prev_type"], r["next_type"]):
               (r["n_transitions"], r["prob_ppm"])
               for r in QUERIES["events_type_transition_matrix"](
                   spark, sf_dir).collect()}
    # pure-python replay
    by_user = {}
    for eid_, ts, user, typ, _, _ in rows:
        by_user.setdefault(user, []).append((ts, eid_, typ))
    counts = {}
    for seq in by_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    prev_totals = {}
    for (a, _), n in counts.items():
        prev_totals[a] = prev_totals.get(a, 0) + n
    import math

    expected = {
        k: (n, math.floor(n * 1e6 / prev_totals[k[0]] + 0.5))
        for k, n in counts.items()}
    assert got == expected
