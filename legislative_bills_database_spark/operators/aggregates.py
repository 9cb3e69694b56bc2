"""Aggregation operators: the reference's pivot-count family.

The reference fills a legislator×session matrix imperatively
(legislator_bill_counts_run.R:89-90,124,139-143); here it is
groupBy().pivot().count() with explicit pivot values — explicit values
matter: without them Spark runs an extra distinct job to discover columns,
which is an avoidable full scan at 100 TB.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pivot_count(
    df: DataFrame,
    group_col: str,
    pivot_col: str,
    pivot_values: list,
    prefix: str = "",
    strict: bool = True,
) -> DataFrame:
    """COUNT(*) GROUP BY group, pivot — reshaped wide, nulls → 0.

    ``strict`` (default): a pivot value outside the declared list raises at
    runtime instead of being silently dropped — explicit values skip the
    discovery scan, but must not silently lose out-of-range rows. The check
    is embedded in the pivot expression itself so the optimizer can't prune
    it away. A NULL pivot value gets its own dedicated error (``isin``
    yields NULL for NULL input, which would otherwise fall into the
    out-of-range branch with a NULL-concatenated message).
    """
    if strict:
        checked = (
            F.when(
                F.col(pivot_col).isNull(),
                F.raise_error(
                    F.lit(
                        f"pivot value of '{pivot_col}' is NULL; strict pivot "
                        f"refuses NULLs — filter them or pass strict=False"
                    )
                ),
            )
            .when(F.col(pivot_col).isin(pivot_values), F.col(pivot_col))
            .otherwise(
                F.raise_error(
                    F.concat(
                        F.lit(
                            f"pivot value of '{pivot_col}' outside declared values: "
                        ),
                        F.col(pivot_col).cast("string"),
                    )
                )
            )
        )
        df = df.withColumn(pivot_col, checked)
    wide = (
        df.groupBy(group_col)
        .pivot(pivot_col, pivot_values)
        .count()
        .na.fill(0, [str(v) for v in pivot_values])
    )
    if prefix:
        for v in pivot_values:
            wide = wide.withColumnRenamed(str(v), f"{prefix}{v}")
    return wide


def row_total(df: DataFrame, cols: list[str], alias: str = "total") -> DataFrame:
    """Horizontal sum across pivoted columns (rowSums,
    legislator_bill_counts_run.R:141)."""
    return df.withColumn(
        alias, reduce(add, [F.coalesce(F.col(c), F.lit(0)) for c in cols])
    )


def merge_rollup(
    existing: DataFrame,
    increment: DataFrame,
    keys: list[str],
    merges: dict[str, str],
) -> DataFrame:
    """Incremental materialized-aggregate maintenance: fold a new
    partition's PARTIAL aggregate into an existing rollup table without
    re-reading history — union the two aggregate tables and re-reduce
    per key with each measure's merge function (``sum`` for counts and
    sums; anything algebraic decomposes into such partials; non-mergeable
    measures like exact medians are exactly what this pattern excludes).

    This is the nightly-ingest shape at 100 TB: the rollup is
    key-cardinality, the increment is one partition's partial, and the
    merge shuffles only those two small aggregate tables — the fact
    history is never touched. Correctness requires order-insensitive
    merge fns (use exact decimal sums, not double sums) so that
    maintained-vs-recomputed results match bit-for-bit.

    ``merges`` maps measure column → merge fn name (e.g. {"n": "sum"}).
    """
    aggs = [
        getattr(F, fn)(F.col(c)).alias(c) for c, fn in merges.items()
    ]
    return existing.unionByName(increment).groupBy(*keys).agg(*aggs)
