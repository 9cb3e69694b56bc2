"""Join operators mirroring the reference's lookup/semi/fallback semantics.

The reference does joins as membership tests inside loops
(legislator_bill_counts_run.R:114-122, legiscan_main.R:126-132); here they
are real distributed joins. Dimension sides that are bounded (legislator
roster ≈ thousands of rows even nationally) are broadcast to skip the
shuffle entirely — at 100 TB of fact data that is the difference between a
map-side join and a full-cluster shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def semi_join(
    facts: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Keep fact rows whose key appears in the dimension (no dim columns).

    Reference: sponsor people_id %in% legislators$id,
    legislator_bill_counts_run.R:114.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, facts[fact_key] == d[dim_key], "left_semi")


def fallback_join(
    facts: DataFrame,
    dim: DataFrame,
    primary_key: str,
    fallback_key: str,
    dim_key: str,
    matched_alias: str = "matched_key",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Prioritized two-key join with drop-if-neither.

    Reference semantics (legislator_bill_counts_run.R:114-122): try the
    primary key against the dimension; if it finds no match (including
    primary key NULL), retry with the fallback key; if neither matches,
    drop the row. Implemented as two left joins + COALESCE + null filter —
    one broadcast dimension read, no driver loop, no shuffle when the
    dimension broadcasts.

    The dimension keys are DISTINCTed first: the semantics is a membership
    test, and a duplicate-key dimension must not fan out fact rows. The
    distinct is cheap — the dimension is broadcast-sized by contract.
    """
    keys = dim.select(F.col(dim_key)).distinct()
    p = (F.broadcast(keys) if broadcast_dim else keys).select(
        F.col(dim_key).alias("__p_match")
    )
    f = (F.broadcast(keys) if broadcast_dim else keys).select(
        F.col(dim_key).alias("__f_match")
    )
    out = (
        facts.join(p, facts[primary_key] == p["__p_match"], "left")
        .join(f, facts[fallback_key] == f["__f_match"], "left")
        .withColumn(matched_alias, F.coalesce(F.col("__p_match"), F.col("__f_match")))
        .filter(F.col(matched_alias).isNotNull())
        .drop("__p_match", "__f_match")
    )
    return out


def lookup_join(
    facts: DataFrame,
    dim: DataFrame,
    on: list[str] | Column,
    broadcast_dim: bool = True,
) -> DataFrame:
    """Plain equi lookup-join against a bounded dimension (broadcast).

    Reference: budget-bill number → bill JSON path, legiscan_main.R:126-132.
    """
    d = F.broadcast(dim) if broadcast_dim else dim
    return facts.join(d, on, "inner")


def session_label_for_year(year: Column) -> Column:
    """California-legislature session label from a year (parity rule).

    Odd year y → "y-(y+1)"; even year y → "(y-1)-y".
    Reference: legiscan_main.R:107-123,228-231.
    """
    odd = F.concat(year.cast("string"), F.lit("-"), (year + 1).cast("string"))
    even = F.concat((year - 1).cast("string"), F.lit("-"), year.cast("string"))
    return F.when(year % 2 == 1, odd).otherwise(even)


SQL_SESSION_LABEL = (
    "(CASE WHEN {y} % 2 = 1"
    " THEN CAST({y} AS VARCHAR) || '-' || CAST({y} + 1 AS VARCHAR)"
    " ELSE CAST({y} - 1 AS VARCHAR) || '-' || CAST({y} AS VARCHAR) END)"
)
