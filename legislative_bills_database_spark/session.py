"""SparkSession factory.

Defaults chosen for correctness-vs-oracle and 100 TB posture:

- ``spark.sql.session.timeZone=UTC``: Spark timestamps are session-TZ;
  the DuckDB oracle is UTC-naive. Pinning UTC makes them comparable.
- AQE on (runtime re-planning, skew-join splitting, partition coalescing)
  — the local plan is the same plan a 1000-executor cluster would get.
- ``spark.sql.shuffle.partitions`` sized to local cores here; on a real
  cluster AQE's coalescePartitions makes the static number mostly moot.
- Arrow enabled for any pandas-UDF path (vectorized batch transfer).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "legislative-bills-engine",
    cpus: str | int | None = None,
    shuffle_partitions: int | None = None,
) -> SparkSession:
    cpus = cpus if cpus is not None else os.environ.get("SPARK_GRAFT_CPUS", "*")
    shuffle = shuffle_partitions or int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))
    builder = (
        SparkSession.builder.appName(app_name)
        .master(f"local[{cpus}]")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.shuffle.partitions", str(shuffle))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce small shuffles below core-count parallelism too: tiny
        # exchanges (iterative-loop label/rank frames, dim-side aggs) are
        # pure scheduler overhead at 32 tasks; big shuffles still target
        # advisoryPartitionSizeInBytes. Spark's own docs recommend
        # parallelismFirst=false in production.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # spill-aware split sizing: scan partitions stay ~128 MB so a
        # 100 TB table fans out to ~800k well-sized tasks rather than
        # fewer oversized ones that spill; override per-deployment
        .config(
            "spark.sql.files.maxPartitionBytes",
            os.environ.get("SPARK_GRAFT_MAX_PARTITION_BYTES", "134217728"),
        )
        # fixture events.ts is parquet TIMESTAMP(NANOS) — illegal for Spark's
        # reader; read as long nanos, io.load_table converts to µs timestamps
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
    )
    return builder.getOrCreate()


def release_checkpoint(df) -> None:
    """Best-effort release of a ``localCheckpoint(eager=True)`` frame's
    storage blocks.

    ``DataFrame.unpersist()`` only consults the cache manager and is a
    no-op for checkpointed data; the blocks belong to the RDD inside the
    plan's ``LogicalRDD`` node. Iterative operators (PageRank, connected
    components) checkpoint every round — without an explicit release,
    executor storage accumulates O(n_iter) copies of the frame for the
    duration of the call. Reaches through the JVM plan (private API), so
    failures are swallowed: worst case is the old behavior, blocks live
    until the session GCs them.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass


def tune_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine defaults to an externally-built session
    (the driver hands us one; memory/master are fixed by then)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.adaptive.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.enabled", "true"),
        ("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false"),
        ("spark.sql.adaptive.coalescePartitions.minPartitionSize", "1m"),
        ("spark.sql.adaptive.skewJoin.enabled", "true"),
        ("spark.sql.execution.arrow.pyspark.enabled", "true"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            spark.conf.set(k, v)
        except Exception:
            pass  # immutable in this deployment — keep going
    return spark


def materialize_fully(df) -> int:
    """Benchmark materializer: force evaluation of EVERY output column
    and return the exact row count.

    The old idiom — ``count(hash(*cols))`` — is silently DEFEATED on
    Spark 4.1: Catalyst rewrites count over a provably non-null
    expression into a plain row count, drops the hash entirely, and
    column-prunes the whole projection (verified: ``hash`` absent from
    the physical plan, ``ReadSchema: struct<>`` empty — a map-only
    scoring pipeline collapsed to a parquet footer count). A
    value-dependent AGGREGATE over the hash cannot be pruned: the
    bit_xor checksum changes if any cell changes, so every output
    expression must actually execute. Still collects exactly one row.
    """
    from pyspark.sql import functions as F

    return df.agg(
        F.count(F.lit(1)).alias("n"),
        F.bit_xor(
            F.xxhash64(*[F.col(c) for c in df.columns])
        ).alias("h"),
    ).collect()[0]["n"]
