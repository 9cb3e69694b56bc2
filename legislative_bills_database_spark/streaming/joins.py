"""Streaming joins: stream-static enrichment and stream-stream
correlation with watermark-bounded state.

The two join shapes every event pipeline needs beyond windowed
aggregation (events.py):

- **stream-static**: enrich each micro-batch against a slow dimension
  (user → segment, document → source metadata). The static side is
  re-planned per micro-batch, so a dimension refresh is picked up
  without restarting the query; small dims broadcast exactly as in
  batch.
- **stream-stream**: correlate two live streams (click ↔ conversion,
  request ↔ response). Spark buffers BOTH sides in state until the
  watermark says a match can no longer arrive; an explicit time-range
  predicate is what lets the engine EVICT — an equi-join alone would
  grow state forever. State size ≈ rate × join-window, independent of
  stream lifetime: the property that makes this run for months at
  100 TB/day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def enrich_stream(
    events: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "left",
) -> DataFrame:
    """Stream-static join: per-micro-batch lookup against a batch
    dimension (broadcast when small — same planner rules as batch)."""
    return events.join(dim, key, how)


def correlate_streams(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    within: str = "10 minutes",
    watermark: str = "20 minutes",
) -> DataFrame:
    """Stream-stream inner join: match right-events to left-events with
    the same ``key`` arriving within ``[left_ts, left_ts + within]``.

    Both sides carry a watermark and the join predicate includes the
    time range — the two ingredients state eviction requires (without
    them Spark must keep every row forever waiting for a future match).
    Buffered state is bounded by ``watermark + within`` per side.
    """
    l_wm = left.withWatermark(left_ts, watermark).alias("l")
    r_wm = right.withWatermark(right_ts, watermark).alias("r")
    lt, rt = F.col(f"l.{left_ts}"), F.col(f"r.{right_ts}")
    return l_wm.join(
        r_wm,
        (F.col(f"l.{key}") == F.col(f"r.{key}"))
        & (rt >= lt)
        & (rt <= lt + F.expr(f"INTERVAL {within}")),
        "inner",
    )
