"""Time-series regularization operators: calendar gap-fill with
forward-fill (LOCF) and exponentially-weighted moving averages.

The reference has no time-series surface (its "dates" are fiscal-year
strings, legiscan_main.R:228-231), but a metrics/training-data pipeline
over event streams needs a regular grid: ML feature tables want one row
per (key, day) even when no event landed that day, with the last
observation carried forward.

Scale posture:

- **gap-fill** generates the per-key calendar with ``sequence()`` +
  ``explode`` — the grid is produced *distributed, next to the data*
  (rows/key × days/key), never on the driver, and joins back on
  (key, day) — one shuffle. The LOCF pass is one window per key with
  ``last(..., ignorenulls=True)`` — a second shuffle-free pass over the
  same partitioning (Catalyst reuses the hash partitioning from the
  join for the window when keys match).
- **EWMA** is an inherently sequential recurrence (acc = (1-α)·acc +
  α·x), which a window function cannot express. Rather than a pandas
  UDF, each key's ordered values are gathered with ``collect_list`` and
  folded JVM-side with the ``aggregate`` higher-order function — one
  shuffle, whole-stage-codegen'd fold, no Python in the loop. Per-key
  history must fit in one array (fine for bounded keys like user
  sessions; for unbounded history, window the input first).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def gap_fill_daily(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Regularize an event stream to a dense per-key daily grid.

    Days between each key's first and last event with no observation get
    a row with ``daily_value`` NULL and ``filled_value`` carried forward
    from the most recent observed day (LOCF). The first day always has an
    observation by construction, so ``filled_value`` is never NULL.

    Returns (key, day, daily_value, filled_value, observed).
    """
    daily = (
        df.groupBy(key_col, F.to_date(ts_col).alias("day"))
        .agg(F.sum(value_col).alias("daily_value"))
    )
    # per-key calendar, generated executor-side: sequence() builds the
    # array of days inside the row, explode fans it out — no driver loop,
    # no cross join against a global calendar (which would shuffle every
    # key against every day)
    calendar = (
        daily.groupBy(key_col)
        .agg(F.min("day").alias("d0"), F.max("day").alias("d1"))
        .select(
            key_col,
            F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day"),
        )
    )
    grid = calendar.join(daily, [key_col, "day"], "left")
    w = (
        Window.partitionBy(key_col)
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return grid.select(
        key_col,
        "day",
        "daily_value",
        F.last("daily_value", ignorenulls=True).over(w).alias("filled_value"),
        F.col("daily_value").isNotNull().alias("observed"),
    )


def ewma_last(
    df: DataFrame,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    order_tiebreak: str = "event_id",
    alpha: float = 0.3,
) -> DataFrame:
    """Final EWMA value per key over the (ts, tiebreak)-ordered series.

    acc₀ = x₀; accᵢ = (1-α)·accᵢ₋₁ + α·xᵢ. The fold runs JVM-side via
    the ``aggregate`` higher-order function over the sorted per-key
    array — the recurrence a window frame can't express, without a
    pandas UDF. The (ts, tiebreak) sort key makes the fold order — and
    therefore the float result — deterministic even when timestamps tie.
    """
    beta = 1.0 - alpha
    gathered = (
        df.groupBy(key_col)
        .agg(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col(ts_col).alias("ts"),
                        F.col(order_tiebreak).alias("tb"),
                        F.col(value_col).cast("double").alias("v"),
                    )
                )
            ).alias("series")
        )
    )
    vals = F.transform("series", lambda s: s["v"])
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: acc * F.lit(beta) + x * F.lit(alpha),
    )
    return gathered.select(
        key_col,
        F.size("series").alias("n_obs"),
        F.round(ewma, 4).alias("ewma"),
    )
