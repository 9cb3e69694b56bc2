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


def max_concurrency(
    df: DataFrame,
    start_col: str,
    end_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Peak number of simultaneously-open ``[start, end)`` intervals and
    the earliest instant it is reached — the capacity question (max
    in-flight sessions / shipments / connections) a naive per-bucket
    count can only approximate.

    Classic sweep: +1 at each start, −1 at each end, running sum in
    (ts, delta) order (ends sort before starts at the same instant, so a
    back-to-back interval pair never double-counts). A bare
    unpartitioned window would drag every delta through ONE task; this
    runs distributed with the ordering.global_sort_index offset trick —
    range-partition by (ts, delta), per-partition cumulative sums, then
    each partition's prefix total (O(#partitions) driver rows) broadcast
    back as an offset. The peak is deterministic under ties: rows tied
    on (ts, delta) carry equal deltas, so every permutation reaches the
    same group-boundary running values.

    Returns one row (peak_concurrency, peak_start).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    deltas = df.select(
        F.col(start_col).alias("ts"), F.lit(1).alias("delta")
    ).unionByName(
        df.select(F.col(end_col).alias("ts"), F.lit(-1).alias("delta"))
    )
    pinned = (
        deltas.repartitionByRange(num_partitions, F.col("ts"), F.col("delta"))
        .sortWithinPartitions("ts", "delta")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin range boundaries
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("ts", "delta")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pinned.withColumn("__csum", F.sum("delta").over(w))
    # O(#partitions) rows to the driver: per-partition delta totals
    totals = sorted(
        pinned.groupBy("__pid").agg(F.sum("delta").alias("t")).collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc = [], 0
    for r in totals:
        offsets.append((r["__pid"], acc))
        acc += r["t"]
    off = spark.createDataFrame(offsets, "__pid int, __offset bigint")
    running = local.join(F.broadcast(off), "__pid").select(
        "ts", (F.col("__csum") + F.col("__offset")).alias("c")
    )
    peak = running.agg(F.max("c").alias("peak_concurrency"))
    return (
        running.join(
            F.broadcast(peak), running.c == F.col("peak_concurrency")
        )
        .groupBy("peak_concurrency")
        .agg(F.min("ts").alias("peak_start"))
        .select("peak_concurrency", "peak_start")
    )


def interval_union_length(
    df: DataFrame,
    key_col: str,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-key total length of the UNION of (possibly overlapping)
    integer intervals ``[start, end)`` — the gaps-and-islands merge:
    double-billing overlap is the classic error in "time spent" /
    "coverage" metrics, and the fix is merging intervals BEFORE summing.

    Physical shape: one shuffle on ``key_col`` shared by both windows —
    a running ``max(end)`` over preceding rows marks island starts
    (``start > max_end_so_far``), a running sum of those markers numbers
    the islands, then per-island extents aggregate to per-key totals.
    No self-join, no explode-per-unit-time (the naive minute-explosion
    is O(duration) rows per interval — unusable at scale); cost is
    O(n log n) per key partition, exactly one exchange end to end.

    Returns (key, n_intervals, n_islands, covered) with ``covered`` in
    the interval unit (exact integer arithmetic).
    """
    # windows rank the RENAMED (key, s, e) frame built below — both
    # share one (key) partitioning, so the whole operator is one exchange
    w_order = (
        Window.partitionBy("key")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_run = (
        Window.partitionBy("key")
        .orderBy("s", "e")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    marked = df.select(
        F.col(key_col).alias("key"),
        F.col(start_col).cast("long").alias("s"),
        F.col(end_col).cast("long").alias("e"),
    ).withColumn(
        "new_island",
        F.when(
            F.col("s") > F.max("e").over(w_order), F.lit(1)
        ).otherwise(
            F.when(F.max("e").over(w_order).isNull(), F.lit(1)).otherwise(
                F.lit(0)
            )
        ),
    ).withColumn("island", F.sum("new_island").over(w_run))
    islands = marked.groupBy("key", "island").agg(
        F.count("*").alias("n_intervals"),
        F.min("s").alias("island_s"),
        F.max("e").alias("island_e"),
    )
    return islands.groupBy(F.col("key")).agg(
        F.sum("n_intervals").cast("long").alias("n_intervals"),
        F.count("*").cast("long").alias("n_islands"),
        F.sum(F.col("island_e") - F.col("island_s"))
        .cast("long")
        .alias("covered"),
    )
