"""One-pass column profiler — the data-quality census over any table.

The first thing a pipeline runs against a new 100 TB source: per-column
null counts and exact distinct cardinalities, computed in a SINGLE scan.
Generalizes the reference's ad-hoc sanity checks (row counts and column
glimpses at legiscan_main.R:141-154) into an operator.

Scale shape: one aggregate pass; Spark plans the multi-distinct
aggregate via EXPAND (one shuffle, rows × profiled-columns — slim key
tuples, not table payloads), then the single result row unpivots with
``stack`` driver-side-free. At 100 TB swap ``count_distinct`` for
``approx_count_distinct`` (HLL, already surfaced by q_approx_distinct) —
the plan shape is otherwise identical; exact distincts here make the
result value-hash-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_columns(df: DataFrame, cols: list[str]) -> DataFrame:
    """(col_name, n_nulls, n_distinct) per profiled column, one scan."""
    aggs = [F.count("*").alias("__total")]
    for c in cols:
        aggs.append(F.count(c).alias(f"__cnt_{c}"))
        aggs.append(F.count_distinct(c).alias(f"__dst_{c}"))
    one = df.agg(*aggs)

    stack_args = ", ".join(
        f"'{c}', __total - __cnt_{c}, __dst_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args})"
        " AS (col_name, n_nulls, n_distinct)"
    ).select(
        "col_name",
        F.col("n_nulls").cast("bigint").alias("n_nulls"),
        F.col("n_distinct").cast("bigint").alias("n_distinct"),
    )


def sql_profile_columns(table: str, cols: list[str]) -> str:
    """DuckDB twin of :func:`profile_columns`."""
    parts = [
        f"SELECT '{c}' AS col_name,"
        f" CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct"
        f" FROM {table}"
        for c in cols
    ]
    return "\nUNION ALL\n".join(parts)
