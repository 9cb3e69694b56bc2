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


def join_parity_report(spark, sf_dir: str):
    """Stream-stream self-join batch==stream census (``q_stream_join``).

    Purchase events join later same-user events within 30 minutes. The
    stream side is a genuine stream-stream join (two filtered branches
    of one file stream, both watermarked) run append-mode over 3
    time-ordered micro-batches — a purchase buffered in batch k's join
    state must still match a follower arriving in batch k+1, so the
    cross-batch state RETENTION path is what the census certifies (the
    aggregation censuses certify state *merge*; joins certify state
    *lookup*). Inner stream-stream joins emit on match, so with an
    effectively-unbounded watermark the append-mode result is exactly
    the batch join; eviction under a production watermark is pinned
    separately in tests/test_streaming.py (correlate_streams eviction).
    """
    from .events import _run_parity_census

    def mk(events):
        purchases = events.filter(F.col("event_type") == "purchase").select(
            F.col("event_id").alias("p_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("p_ts"),
        )
        follows = events.filter(F.col("event_type") != "purchase").select(
            F.col("event_id").alias("f_id"),
            F.col("user_id").alias("f_user"),
            F.col("ts").alias("f_ts"),
        )
        return purchases, follows

    def joined(purchases, follows, watermarked: bool):
        if watermarked:
            # effectively-unbounded watermark: state never evicted, so
            # every cross-batch match is still findable — the census
            # measures retention/lookup correctness, not eviction policy
            purchases = purchases.withWatermark("p_ts", "876000 hours")
            follows = follows.withWatermark("f_ts", "876000 hours")
        cond = (
            (F.col("p_user") == F.col("f_user"))
            & (F.col("f_ts") > F.col("p_ts"))
            & (F.col("f_ts") <= F.col("p_ts") + F.expr("INTERVAL 30 minutes"))
        )
        return (
            purchases.join(follows, cond, "inner")
            .select(
                "p_id",
                "f_id",
                F.col("p_user").alias("user_id"),
                (F.unix_micros("f_ts") - F.unix_micros("p_ts")).alias(
                    "delta_us"
                ),
            )
        )

    def stream(events):
        p, f = mk(events)
        return joined(p, f, watermarked=True)

    def batch(events):
        p, f = mk(events)
        return joined(p, f, watermarked=False)

    # deterministic 25% user slice, applied at LANDING so both sides read
    # the same smaller files: stream-stream join state buffers raw rows on
    # both sides (far heavier than aggregation state), and the census
    # certifies cross-batch state RETENTION, not throughput — the
    # full-volume run burned 45 s at sf0.1 for the same 1-row verdict
    return _run_parity_census(
        spark,
        sf_dir,
        stream,
        batch,
        "q_stream_join",
        output_mode="append",
        row_filter=F.col("user_id") % 4 == 0,
    )
