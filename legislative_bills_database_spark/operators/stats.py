"""Two-sample distribution tests as distributed plans.

Complements the drift family in plans/analytics_queries.py (chi-square,
PSI): the Kolmogorov–Smirnov statistic is the binning-free drift test —
max CDF gap over EVERY distinct value, no bucketing choices to defend.

Scale posture: the naive form is a running count over a globally-sorted
stream — `SUM() OVER (ORDER BY v)` with no partitioning, which Spark
plans as ONE window task. This implementation pre-aggregates per
distinct value (the only rows the CDF can change at), then computes the
running counts DISTRIBUTED with the prefix-offset pattern shared with
ordering.global_sort_index / temporal.max_concurrency: range-partition
by value, per-partition cumulative sums, per-partition totals (
O(#partitions) driver rows) broadcast back as offsets. Every arithmetic
step is integer counts and single IEEE divisions, so the statistic is
bit-identical across engines — the DuckDB oracle can hash-match the
exact D, not an approximation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def percent_rank_by_key(
    df: DataFrame,
    key_col: str,
    value_col: str,
    out_pr: str = "pr",
    out_cd: str = "cd",
    round_dp: int = 6,
) -> DataFrame:
    """``percent_rank()`` + ``cume_dist()`` per key WITHOUT a row-grain
    window sort.

    A naive ``Window.partitionBy(key).orderBy(value)`` drags every row
    of a key through ONE sorted window task — for low-cardinality keys
    (5 event types over 100 TB) that is a single-task sort of the
    column. Rank arithmetic only depends on the VALUE-grain
    distribution: aggregate to (key, value, count) first (map-side
    combined, output bounded by distinct values), compute
    rank(v) = 1 + Σ count(<v) and the inclusive cumulative with windows
    over that reduced frame, then join the scores back on (key, value)
    — co-partitioned with the aggregate, no row-grain sort anywhere.
    Tie semantics match SQL exactly: every row of a tied value shares
    rank = 1 + #smaller-rows, so pr = (rank−1)/(n−1) and
    cd = cum_inclusive/n are the standard definitions. (The remaining
    per-key value-grain window can go through the ks_statistic
    prefix-offset pattern if even distinct values are huge.)

    Appends ``out_pr``/``out_cd`` (rounded) to the input rows.
    """
    counts = df.groupBy(key_col, value_col).agg(F.count(F.lit(1)).alias("__c"))
    w_prev = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    w_cum = (
        Window.partitionBy(key_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    w_all = Window.partitionBy(key_col)
    smaller = F.coalesce(F.sum("__c").over(w_prev), F.lit(0))
    n = F.sum("__c").over(w_all)
    pr = F.when(n > 1, smaller.cast("double") / (n - 1)).otherwise(0.0)
    cd = F.sum("__c").over(w_cum).cast("double") / n
    scored = counts.select(
        key_col,
        value_col,
        F.round(pr, round_dp).alias(out_pr),
        F.round(cd, round_dp).alias(out_cd),
    )
    return df.join(scored, [key_col, value_col])


def ks_statistic(
    df: DataFrame,
    value_col: str,
    side_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact two-sample Kolmogorov–Smirnov statistic.

    ``side_col`` must be 1 for sample A rows and 0 for sample B rows.
    Returns one row (n_a, n_b, ks, ks_at): the max |F_a(v) − F_b(v)|
    over all distinct values, rounded to 6, and the smallest value
    where the max is attained. NULL values are excluded (a CDF has no
    place for them).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    vals = df.select(
        F.col(value_col).alias("v"), F.col(side_col).cast("long").alias("ia")
    ).filter(F.col("v").isNotNull())
    per_v = vals.groupBy("v").agg(
        F.sum("ia").alias("a_n"), F.sum(1 - F.col("ia")).alias("b_n")
    )
    pinned = (
        per_v.repartitionByRange(num_partitions, "v")
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin range boundaries
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pinned.select(
        "v",
        "__pid",
        F.sum("a_n").over(w).alias("ca_l"),
        F.sum("b_n").over(w).alias("cb_l"),
    )
    totals = sorted(
        pinned.groupBy("__pid")
        .agg(F.sum("a_n").alias("ta"), F.sum("b_n").alias("tb"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets, acc_a, acc_b = [], 0, 0
    for r in totals:
        offsets.append((r["__pid"], acc_a, acc_b))
        acc_a += r["ta"]
        acc_b += r["tb"]
    n_a, n_b = acc_a, acc_b
    off = spark.createDataFrame(offsets, "__pid int, __oa bigint, __ob bigint")
    # integer counts / integer totals: two correctly-rounded IEEE
    # divisions and one exact subtraction — bit-identical cross-engine,
    # so the argmax row is too
    d = F.abs(
        (F.col("ca_l") + F.col("__oa")) / F.lit(float(n_a))
        - (F.col("cb_l") + F.col("__ob")) / F.lit(float(n_b))
    )
    gaps = local.join(F.broadcast(off), "__pid").select("v", d.alias("d"))
    peak = gaps.agg(F.max("d").alias("__dmax"))
    return (
        gaps.join(F.broadcast(peak), gaps.d == F.col("__dmax"))
        .agg(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            F.round(F.first("__dmax"), 6).alias("ks"),
            F.min("v").alias("ks_at"),
        )
    )


def auc_exact(
    df: DataFrame,
    score_col: str,
    label_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact tie-aware ROC AUC (Mann–Whitney), fully distributed.

    ``label_col`` must be 1 for positives and 0 for negatives. Uses the
    per-score-group decomposition

        AUC·(2·n_pos·n_neg) = Σ_v (2·neg_below(v)·pos_v + pos_v·neg_v)

    where ``neg_below`` is the count of negatives with strictly smaller
    score — the tie term ``pos_v·neg_v`` contributes the ½ credit. The
    running ``neg_below`` is the same prefix-offset pattern as
    :func:`ks_statistic` (range partition + per-partition cumsums +
    O(#partitions) broadcast offsets) — never a one-task global window.
    Every term is an exact integer; the single IEEE division at the end
    makes the statistic bit-identical cross-engine, so a DuckDB oracle
    hash-checks the EXACT AUC. NULL scores are excluded (they have no
    rank). Degenerate inputs: one-class data yields auc=0.0 (GREATEST
    guard, no division by zero); an ALL-NULL-score input still emits the
    one global-agg row (n_pos=0, n_neg=0, auc=0.0) — Spark's grand
    aggregate semantics — whereas a GROUP BY-shaped oracle would emit
    zero rows, so oracle twins must aggregate globally too.
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    vals = df.select(
        F.col(score_col).alias("v"),
        F.col(label_col).cast("long").alias("y"),
    ).filter(F.col("v").isNotNull())
    per_v = vals.groupBy("v").agg(
        F.sum("y").alias("p_n"), F.sum(1 - F.col("y")).alias("q_n")
    )
    pinned = (
        per_v.repartitionByRange(num_partitions, "v")
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin range boundaries
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pinned.select(
        "p_n",
        "q_n",
        "__pid",
        (F.sum("q_n").over(w) - F.col("q_n")).alias("qb_l"),
    )
    totals = sorted(
        pinned.groupBy("__pid")
        .agg(F.sum("p_n").alias("tp"), F.sum("q_n").alias("tq"))
        .collect(),
        key=lambda r: r["__pid"],
    )
    offsets, n_pos, n_neg = [], 0, 0
    for r in totals:
        offsets.append((r["__pid"], n_neg))
        n_pos += r["tp"]
        n_neg += r["tq"]
    off = spark.createDataFrame(offsets, "__pid int, __oq bigint")
    # The numerator equals AUC·2·n_pos·n_neg, which exceeds int64 once
    # n_pos·n_neg > ~4.6e18 (plausible at 100 TB). Spark longs wrap
    # SILENTLY (non-ANSI) where DuckDB's HUGEINT would stay exact, so
    # every product rides decimal(38,0) — same posture as
    # :func:`wasserstein_1`.
    qb = (F.col("qb_l") + F.col("__oq")).cast("decimal(38,0)")
    p_dec = F.col("p_n").cast("decimal(38,0)")
    num2 = F.sum(
        F.lit(2).cast("decimal(38,0)") * qb * p_dec
        + p_dec * F.col("q_n").cast("decimal(38,0)")
    )
    return (
        local.join(F.broadcast(off), "__pid")
        .agg(
            F.lit(n_pos).cast("long").alias("n_pos"),
            F.lit(n_neg).cast("long").alias("n_neg"),
            F.round(
                # GREATEST guard (KMV precedent): degenerate one-class
                # inputs yield auc=0.0 instead of a division by zero
                num2.cast("double") / F.lit(2.0 * max(n_pos * n_neg, 1)),
                6,
            ).alias("auc"),
        )
    )


def wasserstein_1(
    df: DataFrame,
    value_col: str,
    side_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between two samples.

    ``value_col`` must be INTEGER-valued (quantize upstream — cents,
    micros); ``side_col`` 1 for sample A, 0 for sample B. W1 is the
    area between the two empirical CDFs:

        W1·(n_a·n_b) = Σ_v (next_v − v) · |cumA(v)·n_b − cumB(v)·n_a|

    — every term exact integer, one IEEE division at the end, so a
    DuckDB oracle hash-checks the EXACT distance (the drift metric
    with magnitude, where ks_statistic only sees the max gap).
    Distributed exactly like :func:`ks_statistic`: per-value
    pre-aggregation + the prefix-offset running-sum pattern. The value
    gap needs each row's successor: a partitioned lead() plus an
    O(#partitions) driver exchange of per-partition minima stitches the
    partition boundaries — no global window. Per-term products can
    exceed 64 bits summed; the sum rides decimal(38,0) (Spark longs
    wrap silently — the oracle's HUGEINT would diverge loudly).
    """
    spark = df.sparkSession
    if num_partitions is None:
        num_partitions = spark.sparkContext.defaultParallelism
    vals = df.select(
        F.col(value_col).cast("long").alias("v"),
        F.col(side_col).cast("long").alias("ia"),
    ).filter(F.col("v").isNotNull())
    per_v = vals.groupBy("v").agg(
        F.sum("ia").alias("a_n"), F.sum(1 - F.col("ia")).alias("b_n")
    )
    pinned = (
        per_v.repartitionByRange(num_partitions, "v")
        .sortWithinPartitions("v")
        .withColumn("__pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pin range boundaries
    )
    w = (
        Window.partitionBy("__pid")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    local = pinned.select(
        "v",
        "__pid",
        F.sum("a_n").over(w).alias("ca_l"),
        F.sum("b_n").over(w).alias("cb_l"),
        F.lead("v").over(Window.partitionBy("__pid").orderBy("v")).alias(
            "nv_l"
        ),
    )
    stats = sorted(
        pinned.groupBy("__pid")
        .agg(
            F.sum("a_n").alias("ta"),
            F.sum("b_n").alias("tb"),
            F.min("v").alias("minv"),
        )
        .collect(),
        key=lambda r: r["__pid"],
    )
    # offsets + each partition's successor-start (stitches lead() across
    # partition boundaries) — all O(#partitions) driver rows
    offsets, acc_a, acc_b = [], 0, 0
    for i, r in enumerate(stats):
        nxt = stats[i + 1]["minv"] if i + 1 < len(stats) else None
        offsets.append((r["__pid"], acc_a, acc_b, nxt))
        acc_a += r["ta"]
        acc_b += r["tb"]
    n_a, n_b = acc_a, acc_b
    off = spark.createDataFrame(
        offsets, "__pid int, __oa bigint, __ob bigint, __nxt bigint"
    )
    gap = F.coalesce(F.col("nv_l"), F.col("__nxt")) - F.col("v")
    # dev can approach n_a·n_b and gap the full quantized value range:
    # BOTH the cum·n products and the gap·dev product must already be
    # decimal(38,0), or Spark's non-ANSI long multiply wraps silently
    # BEFORE the decimal sum ever sees the term (the oracle's HUGEINT
    # arithmetic is exact throughout, so a wrap breaks the hash claim).
    dev = F.abs(
        (F.col("ca_l") + F.col("__oa")).cast("decimal(38,0)") * F.lit(n_b)
        - (F.col("cb_l") + F.col("__ob")).cast("decimal(38,0)") * F.lit(n_a)
    )
    term = F.coalesce(gap, F.lit(0)).cast("decimal(38,0)") * dev
    return (
        local.join(F.broadcast(off), "__pid")
        .agg(
            F.lit(n_a).cast("long").alias("n_a"),
            F.lit(n_b).cast("long").alias("n_b"),
            F.round(
                F.sum(term).cast("double")
                / F.lit(float(max(n_a, 1)) * float(max(n_b, 1))),
                6,
            ).alias("w1"),
        )
    )
