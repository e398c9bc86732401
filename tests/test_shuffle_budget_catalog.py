"""Catalog-wide shuffle-budget lockfile: the exchange counts of EVERY
query's physical plan are snapshotted in shuffle_budget_catalog.json;
a refactor that adds a shuffle anywhere in the catalog fails here.

Counts going DOWN is an improvement — the test only rejects increases
(and flags removed/renamed queries so the lockfile stays in sync).
To accept an intentional change, regenerate the entry and say why in
the commit (generator snippet in the git history of this file):

    plan = QUERIES[name](spark, SF_SMALL)._jdf.queryExecution()\\
        .executedPlan().toString()
    counts = {kind: len(re.findall(f"Exchange {pat}", plan)) ...}
"""

import json
import pathlib
import re

import pytest

from oracle_cassandra_migrator_spark.queries import QUERIES

from tests.conftest import SF_SMALL

LOCKFILE = pathlib.Path(__file__).with_name("shuffle_budget_catalog.json")
BUDGET = json.loads(LOCKFILE.read_text())

_PATTERNS = {
    "hash": r"Exchange hashpartitioning",
    "range": r"Exchange rangepartitioning",
    "single": r"Exchange SinglePartition",
    # VERDICT r8 item 6: a new BroadcastNestedLoopJoin anywhere in the
    # catalog is a potential unbounded nested loop — it must be
    # adjudicated here (and pass the build-side shape gate in
    # test_plan_quality.py::test_bnlj_build_sides_are_bounded) before
    # its count is locked.
    "bnlj": r"BroadcastNestedLoopJoin",
}


def test_lockfile_covers_catalog():
    missing = sorted(set(QUERIES) - set(BUDGET))
    stale = sorted(set(BUDGET) - set(QUERIES))
    assert not missing, f"queries missing from shuffle lockfile: {missing}"
    assert not stale, f"stale lockfile entries: {stale}"


@pytest.mark.parametrize("name", sorted(BUDGET))
def test_query_within_catalog_shuffle_budget(spark, name):
    if name not in QUERIES:
        pytest.skip("covered by test_lockfile_covers_catalog")
    # cached relations from earlier tests substitute InMemoryRelation
    # subtrees into plans and skew the exchange counts — the shared
    # memo always builds against a cold cache (lockfile was generated
    # the same way), and one build serves both this lockfile and the
    # plan-quality gates (r11 suite-runtime pass)
    from tests.conftest import catalog_plan_string

    plan = catalog_plan_string(spark, name)
    for kind, pat in _PATTERNS.items():
        n = len(re.findall(pat, plan))
        assert n <= BUDGET[name][kind], (
            f"{name}: {kind} exchanges {n} > locked {BUDGET[name][kind]} — "
            f"a shuffle was added; regenerate the lockfile entry only if "
            f"intentional")
