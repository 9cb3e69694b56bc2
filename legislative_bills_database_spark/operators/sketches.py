"""Mergeable distinct-count sketches (Apache DataSketches HLL builtins).

THE 100 TB pattern for COUNT(DISTINCT): a global exact distinct is a
full shuffle of every key; a sketch is computed per shard/partition/day
(map-side, bytes-sized), MERGED without rescanning anything, and stored
next to the data so tomorrow's query unions yesterday's sketches instead
of re-reading 100 TB. Spark 4 ships the DataSketches HLL pair
(``hll_sketch_agg`` / ``hll_union_agg``) natively — this operator wires
them into the per-group → merged rollup with the exact count alongside,
so the error is observable.

Measured caveat (pinned in tests/test_sketches.py): union-of-sketches ==
direct-sketch requires headroom in lgConfigK — at lgConfigK=12 the union
path forces the sketch out of its exact sparse mode and the estimate
drops below the direct computation (493 vs 500 on the sf0.001 fixture);
at lgConfigK=14 both agree exactly at fixture cardinalities. Size the
config to the per-group cardinality you expect, not the global one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cm_sketch_report(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 256,
    top_k: int = 20,
) -> DataFrame:
    """Count-Min sketch frequency estimates vs exact counts for the
    ``top_k`` hottest keys — the mergeable point-frequency sketch next
    to HLL (distinct) and percentile_approx (quantiles): fixed
    depth×width integer state answers "how often did key x occur"
    within +ε·N, never undercounting.

    The sketch is RELATIONAL, not a UDF: bucket ids are
    ``pmod(xxhash64(key, row), width)`` per hash row, so the build is
    one explode(depth) + one map-side-combined groupBy collapsing to
    depth×width rows — and because Count-Min is a LINEAR sketch,
    per-shard sketches merge by plain element-wise ``SUM`` of those
    rows (a groupBy, no special union kernel), which is why it survives
    incremental/sharded ingestion at 100 TB. Estimates join the probe
    keys against the (broadcast-sized) sketch and take the per-key MIN
    across hash rows.

    Returns (key, exact_n, cm_est, overcount) for the top_k exact
    heavy keys, (exact_n DESC, key) ordered; overcount ≥ 0 always
    (one-sided error), expected ≤ e·N/width per the standard bound —
    both pinned in tests/test_sketches.py.
    """
    key = F.col(key_col).cast("string")
    rows = df.select(key.alias("k"))

    def buckets(col):
        c = F.col(col) if isinstance(col, str) else col
        return F.array(
            *[
                F.struct(
                    F.lit(i).alias("i"),
                    F.pmod(F.xxhash64(c, F.lit(i)), F.lit(width)).alias("b"),
                )
                for i in range(depth)
            ]
        )

    sketch = (
        rows.select(F.explode(buckets("k")).alias("hb"))
        .groupBy(F.col("hb.i").alias("i"), F.col("hb.b").alias("b"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    exact_top = (
        rows.groupBy("k")
        .agg(F.count(F.lit(1)).alias("exact_n"))
        .orderBy(F.col("exact_n").desc(), "k")
        .limit(top_k)
    )
    probes = exact_top.select("k", F.explode(buckets("k")).alias("hb")).select(
        "k", F.col("hb.i").alias("i"), F.col("hb.b").alias("b")
    )
    est = (
        probes.join(F.broadcast(sketch), ["i", "b"])
        .groupBy("k")
        .agg(F.min("c").alias("cm_est"))
    )
    return (
        exact_top.join(est, "k")
        .select(
            F.col("k").alias("key"),
            F.col("exact_n").cast("long").alias("exact_n"),
            F.col("cm_est").cast("long").alias("cm_est"),
            (F.col("cm_est") - F.col("exact_n")).cast("long").alias("overcount"),
        )
        .orderBy(F.col("exact_n").desc(), "key")
    )


def hll_merge_report(
    df: DataFrame,
    group_col: str,
    key_col: str,
    lg_config_k: int = 14,
) -> DataFrame:
    """One row comparing three distinct-counts of ``key_col``: the
    per-``group_col`` sketches union-merged, a direct global sketch, and
    the exact distinct — (n_groups, merged_est, direct_est, exact,
    rel_err). merged_est is the only one a shard-incremental pipeline
    would compute; the other two exist to make its error visible."""
    lg = F.lit(lg_config_k)
    per_group = df.groupBy(group_col).agg(
        F.hll_sketch_agg(key_col, lg).alias("__sk")
    )
    merged = per_group.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.hll_sketch_estimate(F.hll_union_agg("__sk", F.lit(False))).alias(
            "merged_est"
        ),
    )
    direct = df.agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(key_col, lg)).alias("direct_est"),
        F.count_distinct(F.col(key_col)).alias("exact"),
    )
    return (
        merged.crossJoin(direct)  # two 1-row aggregates
        .withColumn(
            "rel_err",
            F.round(
                F.abs(F.col("merged_est") - F.col("exact"))
                / F.col("exact").cast("double"),
                4,
            ),
        )
    )


def kmv_distinct_report(
    df: DataFrame, col: str, k: int = 256
) -> DataFrame:
    """K-minimum-values distinct-count sketch with an ENGINE-PORTABLE
    hash (md5 of the key's string form), so — unlike HLL, whose
    xxhash64-based registers no other engine reproduces — the estimate
    itself is value-hash-checkable against a SQL oracle: both engines
    rank the identical lowercase-hex digests.

    Estimator: with h(k-th smallest of n distinct hashes) mapped to
    (0,1) via its first 8 nibbles / 2^32, E[distinct] ≈ (k−1)/h_(k).
    Below k distinct values the sketch is EXACT (it holds every hash).

    Scale shape: the distinct pre-pass is the only key shuffle; the
    k-smallest selection is a TakeOrdered (per-partition top-k, O(k)
    rows to one reducer — the mergeability that lets per-shard sketches
    union without rescanning, same posture as the HLL rollup above).
    Returns one row: (n_exact, kmv_k, kmv_estimate, rel_err).
    """
    hashed = (
        df.select(F.col(col).cast("string").alias("s"))
        .na.drop()
        .distinct()
        .select(F.md5("s").alias("hx"))
        .persist()
    )
    n_exact = hashed.count()
    smallest = hashed.orderBy("hx").limit(k)

    def nib(pos: int):
        a = F.ascii(F.substring(F.col("hx"), pos, 1))
        return (a - F.when(a >= 97, F.lit(87)).otherwise(F.lit(48))).cast(
            "long"  # 8 nibbles reach 2^32-1 — int32 would overflow
        )

    frac_num = nib(1)
    for p in range(2, 9):
        frac_num = frac_num * 16 + nib(p)
    out = (
        smallest.select(
            F.col("hx"), frac_num.cast("double").alias("num")
        )
        .agg(
            F.count("*").alias("kmv_k"),
            F.max("num").alias("kth_num"),
        )
        .select(
            F.lit(n_exact).cast("long").alias("n_exact"),
            F.col("kmv_k").cast("long").alias("kmv_k"),
            F.round(
                F.when(
                    F.col("kmv_k") < k, F.col("kmv_k").cast("double")
                ).otherwise(
                    # GREATEST(kth_num,1): if the k-th smallest digest
                    # starts with 8 zero nibbles (p ~ k*2^-32), Spark's
                    # /0 returns NULL while DuckDB errors — clamp both
                    (F.lit(float(k - 1)))
                    / (F.greatest(F.col("kth_num"), F.lit(1.0))
                       / F.lit(float(1 << 32)))
                ),
                2,
            ).alias("kmv_estimate"),
        )
        .select(
            "n_exact",
            "kmv_k",
            "kmv_estimate",
            F.round(
                F.abs(F.col("kmv_estimate") - F.col("n_exact"))
                / F.col("n_exact"),
                4,
            ).alias("rel_err"),
        )
    )
    out = out.localCheckpoint(eager=True)
    hashed.unpersist()
    return out


def sql_kmv_distinct(table: str, col: str, k: int = 256) -> str:
    """DuckDB twin of :func:`kmv_distinct_report`."""

    def nib(pos: int) -> str:
        c = f"ascii(substring(hx, {pos}, 1))"
        return f"({c} - CASE WHEN {c} >= 97 THEN 87 ELSE 48 END)"

    # seed the fold as BIGINT: 8 nibbles reach 2^32-1, past INT32
    num = f"CAST({nib(1)} AS BIGINT)"
    for p in range(2, 9):
        num = f"({num} * 16 + {nib(p)})"
    return f"""
    WITH h AS (
      SELECT DISTINCT md5(CAST({col} AS VARCHAR)) AS hx
      FROM {table} WHERE {col} IS NOT NULL
    ), tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM h
    ), small AS (
      SELECT hx FROM h ORDER BY hx LIMIT {k}
    ), agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS kmv_k,
             MAX(CAST({num} AS DOUBLE)) AS kth_num
      FROM small
    ), est AS (
      SELECT t.n_exact, a.kmv_k,
             ROUND(CASE WHEN a.kmv_k < {k}
                        THEN CAST(a.kmv_k AS DOUBLE)
                        ELSE {float(k - 1)} / (GREATEST(a.kth_num, 1.0) / {float(1 << 32)})
                   END, 2) AS kmv_estimate
      FROM tot t CROSS JOIN agg a
    )
    SELECT n_exact, kmv_k, kmv_estimate,
           ROUND(ABS(kmv_estimate - n_exact) / n_exact, 4) AS rel_err
    FROM est
    """
