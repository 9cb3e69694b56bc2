"""Streaming SCD2 dimension maintenance via foreachBatch.

The streaming twin of ``operators/scd.scd2_merge``: a stream of
dimension updates folds into the versioned dimension one micro-batch at
a time. Because the batch merge recomputes validity windows from the
union of version-starts and new updates (incremental == from-scratch,
pinned in tests/test_scd.py), applying batches in ANY arrival order
that respects the checkpoint's batch assignment converges to the same
history — which is what makes the foreachBatch form safe:

- each micro-batch reads the current staged dimension, merges, and
  atomically replaces it (write-new-then-swap-view via an epoch
  subdirectory keyed by batch_id — a retried batch id overwrites its
  own epoch, never appends: the exactly-once contract of
  streaming/sinks.py applied to MERGE instead of INSERT).
- state lives in the staged parquet, not executor memory: a restarted
  stream resumes from the checkpoint + last epoch, and the dimension
  table is readable by any batch consumer mid-stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.scd import scd2_merge


def scd2_batch_applier(
    spark: SparkSession,
    base_path: str,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "effective_ts",
):
    """foreachBatch function maintaining the SCD2 dimension under
    ``base_path``: epoch ``batch_id`` merges the micro-batch into the
    previous epoch's table. Exposed separately so tests can replay a
    batch id and assert idempotence."""

    def _apply(batch_df: DataFrame, batch_id: int) -> None:
        prev = _latest_epoch(spark, base_path, before=batch_id)
        if prev is None:
            schema = (
                ", ".join(
                    f"{c} {t}"
                    for c, t in batch_df.select(key_col, *attr_cols).dtypes
                )
                + f", valid_from timestamp, valid_to timestamp, is_current boolean"
            )
            current = spark.createDataFrame([], schema)
        else:
            current = spark.read.parquet(prev)
        merged = scd2_merge(current, batch_df, key_col, attr_cols, ts_col)
        merged.write.mode("overwrite").parquet(f"{base_path}/epoch={batch_id}")

    return _apply


def _latest_epoch(spark: SparkSession, base_path: str, before: int) -> str | None:
    """Most recent epoch directory strictly before ``before`` (a retried
    batch must merge onto its PREDECESSOR, not its own failed output).

    Epochs are resolved through Hadoop's FileSystem API, not os.listdir,
    so ``base_path`` may be any supported URI (file://, hdfs://, s3a://)
    — a driver-local listing would silently return None on a remote
    store and restart the dimension history from empty."""
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(base_path)
    fs = jpath.getFileSystem(spark._jsc.hadoopConfiguration())
    if not fs.exists(jpath):
        return None
    epochs = []
    for status in fs.listStatus(jpath):
        name = status.getPath().getName()
        suffix = name.split("=", 1)[1] if name.startswith("epoch=") else ""
        if suffix.isdigit():
            epochs.append(int(suffix))
    prior = [e for e in epochs if e < before]
    return f"{base_path}/epoch={max(prior)}" if prior else None


def scd2_stream(
    updates: DataFrame,
    spark: SparkSession,
    base_path: str,
    checkpoint: str,
    key_col: str,
    attr_cols: list[str],
    ts_col: str = "effective_ts",
):
    """Start the SCD2-maintaining stream (availableNow); returns the
    StreamingQuery. Read the dimension at ``<base>/epoch=<last>``."""
    return (
        updates.writeStream.foreachBatch(
            scd2_batch_applier(spark, base_path, key_col, attr_cols, ts_col)
        )
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
