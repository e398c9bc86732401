"""Registration plumbing for the query/oracle catalog."""

from __future__ import annotations

from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is the equivalent DuckDB ANSI SQL
    (omit for non-SQL-expressible ops -> driver does a rows-only check).

    Exactness conventions shared by every query and its oracle so the
    driver's order-insensitive value-hash matches bit-for-bit:
    - SUM/AVG over doubles goes through CAST(x AS DECIMAL(18,4)) so the
      accumulation is exact and order-independent, then the final value
      is CAST(... AS DOUBLE) on both sides.
    - Timestamps are surfaced as DATE or epoch BIGINT, never raw
      timestamps (timezone-neutral on both engines).
    - Every top-k has a total-order tiebreak key.
    - Every computed column is aliased identically on both sides.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco
