"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` runs the flagship query (the legislator-bill-counts
pivot analog) at sf0.001. ``queries()``/``oracle_sql()`` expose the full
declared operator inventory from
``legislative_bills_database_spark.plans`` (SURVEY.md §2): every query
with a DuckDB-expressible twin carries oracle SQL; nondeterministic or
non-SQL ops (uuid, xxhash64-based LSH, HLL, pandas-UDF plumbing) are
declared without one → rows-only checks.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from legislative_bills_database_spark.plans import ORACLE, QUERIES
from legislative_bills_database_spark.session import tune_session

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    Passed-order counts per customer pivoted by year — the engine analog
    of the reference's legislator×session passed-bill matrix
    (legislator_bill_counts_run.R:89-124): scan → filter → broadcast join
    → pivot count.
    """
    tune_session(spark)
    return QUERIES["q_pivot_count"](spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 / §2.10."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB twins for every value-hash-checkable query."""
    return dict(ORACLE)
