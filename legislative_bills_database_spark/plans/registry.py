"""Query registry: name → (spark, sf_dir) -> DataFrame, plus oracle SQL.

Every operator claimed done in SURVEY.md §2 registers here; queries with
an oracle string get full value-hash verification against DuckDB, queries
without one (nondeterministic / non-SQL-expressible: uuid, LSH, HLL,
pandas-UDF plumbing) get rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a named query; ``oracle`` is its ANSI-SQL DuckDB twin.

    Column names/aliases MUST match between the Spark result and the
    oracle — the driver sorts columns by name before value-hashing.
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")

        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver hands us its own session — apply engine defaults
            # (UTC, AQE, nanos-as-long) before planning anything
            from ..session import tune_session

            return fn(tune_session(spark), sf_dir)

        wrapped.__name__ = fn.__name__
        wrapped.__doc__ = fn.__doc__
        QUERIES[name] = wrapped
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco
