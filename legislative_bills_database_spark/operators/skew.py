"""Skew mitigation: salted two-phase aggregation.

A pivoted/grouped count on a skewed key (one legislator sponsoring a
large share of bills; one hot event_type) concentrates a partition on one
executor. AQE's skew handling covers joins; for aggregations the classic
fix is SALTING: append a random salt to the key, aggregate
(key, salt) partials — splitting the hot key across ``n_salts``
partitions — then aggregate the partials by key alone. Results are
identical to the direct aggregate (verified against the plain GROUP BY
oracle); the cost is one extra (tiny) shuffle of partial rows.

Spark already does map-side partial aggregation, which usually absorbs
skew for simple counts; salting matters when per-key state is large
(collect_list, distinct counts) or when AQE is unavailable. The operator
exists so pipelines can opt in per-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_agg(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[Column, Column]],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase salted aggregation.

    ``aggs`` maps output column name → (partial_agg_expr, merge_agg_expr):
    e.g. a count is ``(F.count('*'), F.sum(...))``, a sum is
    ``(F.sum(c), F.sum(...))``, a max is ``(F.max(c), F.max(...))``.
    The merge expr receives the partial column under the output name.
    """
    salted = df.withColumn(
        "__salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "__salt").agg(
        *[p.alias(name) for name, (p, _) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[m.alias(name) for name, (_, m) in aggs.items()]
    )


def salted_count(df: DataFrame, keys: list[str], n_salts: int = 16) -> DataFrame:
    """COUNT(*) per key with the hot key split across ``n_salts``
    pre-aggregation partitions; identical result to the direct count."""
    return salted_agg(
        df,
        keys,
        {"n": (F.count("*"), F.sum("n").cast("bigint"))},
        n_salts=n_salts,
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_on: Column | str,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: split each hot fact key across ``n_salts``
    shuffle partitions by salting the fact side, and replicate the dim
    side once per salt so every (key, salt) bucket still finds its match.
    Result rows are identical to ``fact.join(dim, key, how)``.

    This is the manual fallback for the cases AQE's skew-join can't fix:
    a single hot key too large for any one task even after AQE splits
    (AQE subdivides partitions, not keys, when the build side can't
    broadcast), or a sort-merge join where one key's row block alone
    exceeds executor memory.

    The salt is ``pmod(xxhash64(salt_on), n_salts)`` over a high-
    cardinality fact column — deterministic (stable under task retry and
    partition re-planning, unlike ``rand()``) and uniform, so the hot
    key spreads evenly. Cost: the dim shuffles ``n_salts``× bigger —
    explode of a literal sequence, rows only duplicated in the exchange.
    Keep ``n_salts`` ≈ (hot-key rows / target task rows), not larger.
    """
    s = F.col(salt_on) if isinstance(salt_on, str) else salt_on
    salted_fact = fact.withColumn("__salt", F.pmod(F.xxhash64(s), F.lit(n_salts)))
    replicated_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    ).withColumn("__salt", F.col("__salt").cast("bigint"))
    return salted_fact.join(replicated_dim, [key, "__salt"], how).drop("__salt")
