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


def heavy_hitters(
    df: DataFrame, key_col: str, k: int = 20
) -> DataFrame:
    """Exact top-``k`` keys by frequency with their share of all rows —
    the pre-join skew audit: any key whose share approaches 1/shuffle-
    partitions is a salting/AQE-skew-split candidate.

    Scale shape: one partial-aggregated groupBy on the key, then
    ``orderBy(...).limit(k)`` — Spark plans TakeOrderedAndProject (each
    task keeps a k-row heap, the driver merges #partitions × k rows),
    never a global sort. The row total rides along as a 1-row broadcast
    cross join, not a second scan (the grouped counts sum to it).
    Deterministic tie-break: (count DESC, key ASC).

    Returns (key, n, share) — share rounded to 6 places.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count("*").alias("n")
    )
    total = counts.agg(F.sum("n").alias("__total"))
    return (
        counts.orderBy(F.col("n").desc(), F.col("key"))
        .limit(k)
        .crossJoin(F.broadcast(total))
        .select(
            "key",
            "n",
            F.round(F.col("n") / F.col("__total"), 6).alias("share"),
        )
    )


def sql_heavy_hitters(table: str, key_expr: str, k: int = 20) -> str:
    """DuckDB twin of :func:`heavy_hitters`."""
    return f"""
    WITH counts AS (
      SELECT {key_expr} AS key, COUNT(*) AS n FROM {table} GROUP BY 1
    ), total AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM counts)
    SELECT key, n, ROUND(CAST(n AS DOUBLE) / t, 6) AS share
    FROM counts, total
    ORDER BY n DESC, key
    LIMIT {k}
    """


def mad_outlier_census(
    df: DataFrame,
    group_col: str,
    value_col: str,
    cutoff: float = 3.5,
) -> DataFrame:
    """Robust outlier census per group via median absolute deviation.

    The skew-immune alternative to mean+stddev fences: a single whale
    value drags a z-score fence but not a median+MAD one. A value is an
    outlier when |x − median| > cutoff · 1.4826 · MAD (1.4826 scales MAD
    to σ under normality; 3.5 is the conventional robust-z cutoff).

    Scale shape: two exact-percentile aggregates over the group key —
    each produces |groups| rows that broadcast back onto the detail
    scan — then one census aggregate. The detail table is never
    shuffled on a fact key; at 100 TB swap ``percentile`` for
    ``percentile_approx`` (same plan shape, mergeable sketches).

    Returns (group, n, n_outliers, med, mad), medians rounded to 4.
    """
    vals = df.select(F.col(group_col).alias("grp"), F.col(value_col).alias("x"))
    med = vals.groupBy("grp").agg(F.expr("percentile(x, 0.5)").alias("med"))
    dev = vals.join(F.broadcast(med), "grp").withColumn(
        "adev", F.abs(F.col("x") - F.col("med"))
    )
    mad = dev.groupBy("grp").agg(F.expr("percentile(adev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "grp")
        .groupBy("grp")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum(
                (F.col("adev") > cutoff * 1.4826 * F.col("mad")).cast("long")
            )
            .cast("long")
            .alias("n_outliers"),
            F.round(F.first("med"), 4).alias("med"),
            F.round(F.first("mad"), 4).alias("mad"),
        )
    )


def approx_quantiles_rollup(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probabilities: tuple[float, ...] = (0.5, 0.9, 0.99),
    accuracy: int = 10_000,
) -> DataFrame:
    """Mergeable approximate quantiles per group PLUS the all-groups
    rollup — without rescanning or re-sorting.

    ``percentile_approx`` aggregates a Greenwald-Khanna-style sketch
    that Spark merges in partial aggregation, so ``rollup(group)``
    computes every per-group sketch AND the grand-total sketch in ONE
    shuffle of sketch summaries — the 100 TB replacement for the exact
    percentile (a full sort) that q_quantiles/q_length_trim use at
    hash-checkable scale. Rank error ≤ 1/accuracy, pinned against exact
    quantiles in tests/test_importance_profile.py.

    Returns (group, p50, p90, p99) with the rollup row as group='ALL'.
    """
    aliases = [f"p{int(p * 100)}" for p in probabilities]
    aggs = [
        F.percentile_approx(value_col, F.lit(p), F.lit(accuracy)).alias(a)
        for p, a in zip(probabilities, aliases)
    ]
    return (
        df.rollup(group_col)
        .agg(*aggs)
        .select(
            F.coalesce(F.col(group_col).cast("string"), F.lit("ALL")).alias(
                "grp"
            ),
            *[F.round(a, 4).alias(a) for a in aliases],
        )
    )
