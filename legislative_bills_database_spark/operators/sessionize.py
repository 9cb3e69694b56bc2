"""Sessionization over event streams (batch form).

Gap-based session ids via lag + cumulative sum — the standard
shuffle-once-per-user pattern; the streaming twin is
``session_window(ts, gap)`` in streaming/events.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: int = 30,
) -> DataFrame:
    """Assign per-user session ids: a new session starts when the gap from
    the previous event exceeds ``gap_minutes``."""
    w = Window.partitionBy(user_col).orderBy(F.col(ts_col))
    # Compare integer microseconds: sub-second-exact and identical in the
    # DuckDB oracle (epoch_us), where float seconds would drift.
    gap_us = gap_minutes * 60 * 1_000_000
    prev = F.lag(F.col(ts_col)).over(w)
    new_session = (
        prev.isNull() | ((F.unix_micros(F.col(ts_col)) - F.unix_micros(prev)) > gap_us)
    ).cast("int")
    return df.withColumn(
        "session_id", F.sum(new_session).over(w.rowsBetween(Window.unboundedPreceding, 0))
    )
