"""Temporal joins Spark lacks as built-ins: as-of join and range join.

Both are expressed as compositions of existing DataFrame ops (the
preferred strategy for custom operators — no pandas UDF, no driver loop):

- **as-of join**: union both sides tagged, one window per key ordered by
  (ts, side-tag), carry the last right-side value forward with
  ``last(..., ignorenulls=True)``, keep left rows. ONE shuffle on the
  key — the same cost as a plain equi-join — versus the naive
  theta-join (l.ts >= r.ts) which is quadratic per key.
- **range join** (point-in-fixed-width-interval): derive a bucket id on
  both sides with integer division and equi-join on it — a broadcast/
  shuffle HASH join instead of the nested-loop theta join Spark would
  otherwise plan for a BETWEEN condition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    value_cols: list[str] | None = None,
    alias_prefix: str = "asof_",
) -> DataFrame:
    """For each left row: the most recent right row with
    ``right.ts <= left.ts`` for the same key (inclusive, like DuckDB's
    ASOF JOIN). Left rows with no prior right row keep NULLs.

    ``right`` should be unique per (key, ts) — pre-aggregate if not, or
    the carried value is the last in (ts, value) order.
    """
    value_cols = value_cols or [
        c for c in right.columns if c not in (key, right_ts)
    ]
    l_tag = left.select(
        F.col(key),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}")
          for c in value_cols],
        F.struct(*left.columns).alias("__row"),
    )
    r_tag = right.select(
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        *[F.col(c).alias(f"__r_{c}") for c in value_cols],
        F.lit(None).cast(l_tag.schema["__row"].dataType).alias("__row"),
    )
    # at equal ts the right row sorts first (__side 0 < 1) → inclusive <=
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = l_tag.unionByName(r_tag).select(
        "__side",
        "__row",
        *[
            F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"{alias_prefix}{c}")
            for c in value_cols
        ],
    )
    out_cols = [F.col(f"__row.{c}").alias(c) for c in left.columns]
    return carried.filter(F.col("__side") == 1).select(
        *out_cols, *[f"{alias_prefix}{c}" for c in value_cols]
    )


def range_join_fixed_buckets(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """Join each point row to every range row with lo <= point < hi,
    for ranges no wider than ``bucket_width``.

    Both sides map to integer buckets (ranges to the buckets they
    overlap: at most 2 when width <= bucket_width); the join is a plain
    equi-join on bucket with the exact BETWEEN as a post-filter — hash
    join work proportional to true matches, not |points|×|ranges|.
    """
    p = points.withColumn(
        "__bucket", F.floor(F.col(point_col) / bucket_width).cast("long")
    )
    r = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bucket_width).cast("long"),
                F.floor(F.col(hi_col) / bucket_width).cast("long"),
            )
        ),
    )
    return (
        p.join(r, "__bucket")
        .filter((F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col)))
        .drop("__bucket")
    )
