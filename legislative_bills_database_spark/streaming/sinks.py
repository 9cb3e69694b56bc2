"""Streaming sinks beyond the built-ins: exactly-once parquet via
foreachBatch.

Structured Streaming's file sink is append-only with its own log; when
the destination needs overwrite semantics, partition routing, or any
batch-DataFrame API, the escape hatch is ``foreachBatch`` — but the
function may be re-invoked with the SAME ``batch_id`` after a failure,
so exactly-once becomes the SINK's contract: every write keyed by
``batch_id`` must be a full idempotent replacement, never an append.

``idempotent_parquet_sink`` implements the standard recipe: micro-batch
``n`` lands at ``<base>/batch=n`` with ``mode("overwrite")`` — a retry
of batch ``n`` rewrites the same directory byte-for-byte instead of
duplicating rows, and the checkpoint's offset log guarantees each input
file is assigned to exactly one batch id. Readers see the table as one
directory-partitioned parquet dataset (``batch`` is a normal partition
column, prunable like any other).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def write_batch_overwrite(base_path: str):
    """The foreachBatch function: full idempotent replacement of the
    micro-batch's own ``batch=<id>`` directory. Exposed separately so a
    retry can be simulated in tests by calling it twice."""

    def _write(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("overwrite").parquet(
            f"{base_path}/batch={batch_id}"
        )

    return _write


def idempotent_parquet_sink(
    stream_df: DataFrame,
    base_path: str,
    checkpoint: str,
    available_now: bool = True,
):
    """Start the exactly-once parquet sink; returns the StreamingQuery.

    ``checkpoint`` holds the offset log that makes batch ids stable
    across restarts — the other half of the exactly-once contract.
    """
    writer = (
        stream_df.writeStream.foreachBatch(write_batch_overwrite(base_path))
        .option("checkpointLocation", checkpoint)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
