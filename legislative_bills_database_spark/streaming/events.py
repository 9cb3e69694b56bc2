"""Structured Streaming over the events table shape.

Each builder takes a streaming DataFrame (``readStream``) and returns the
transformed streaming frame — identical logical plans to the batch twins
(plans/reference_queries.py::q_tumbling_window_batch,
operators/sessionize.py), so batch/stream agreement is testable with the
file source + ``Trigger.AvailableNow`` (tests/test_streaming.py).

Watermarks bound state: at 100 TB/day of events the windowed aggregation
state is per-(window, type) only, and late rows beyond the watermark are
dropped deterministically rather than growing state forever.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# events fixture shape (FIXTURES.md §B) — ts as timestamp here; the
# parquet NANOS quirk is a batch-reader concern, streaming tests feed JSON
EVENTS_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string,"
    " value double, props string"
)


def stream_events_from_files(
    spark: SparkSession,
    path: str,
    fmt: str = "json",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """File-source event stream with the declared schema (exactly-once
    ingestion of a growing directory — the streaming upgrade of the
    reference's skip-if-downloaded idempotency, SURVEY §2.8)."""
    reader = spark.readStream.format(fmt).schema(EVENTS_SCHEMA)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.load(path)


def tumbling_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window count+sum per event_type — streaming twin of
    q_tumbling_window_batch; exact decimal sum for cross-run determinism."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias(
                "sum_value"
            ),
        )
        .select(
            F.col("window.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def sliding_counts(
    events: DataFrame,
    window: str = "1 hour",
    slide: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Sliding-window event counts per type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("window.start").alias("window_start"),
            F.col("window.end").alias("window_end"),
            "event_type",
            "n",
        )
    )


def dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Stateful exactly-once dedup: duplicates of a key arriving within
    the watermark are dropped; state is GC'd past it (bounded memory —
    the streaming analog of exact_dedup)."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


def session_counts(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
) -> DataFrame:
    """Gap-based session aggregation via session_window — streaming twin
    of operators.sessionize (same 30-minute gap rule)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("session_window.start").alias("session_start"),
            "n_events",
        )
    )
