"""Similarity search over embedding columns.

Brute-force cosine top-k is the correctness baseline; random-hyperplane
LSH bucketing is the scale path (candidates only meet inside a bucket, so
the join is linear-ish in data size instead of quadratic). Hyperplanes are
generated from a fixed seed so results — and the generated oracle SQL —
are fully deterministic.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.vectors import cosine, dot


def cosine_topk(
    vectors: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for each query vector.

    queries is expected to be small (it is broadcast); vectors can be
    arbitrarily large — the plan is scan + broadcast-nested-loop +
    per-query window top-k, no shuffle of the big side beyond the window.
    Deterministic tie-break: (cosine desc, neighbor id asc).
    """
    q = F.broadcast(
        queries.select(F.col(id_col).alias("qid"), F.col(vec_col).alias("qv"))
    )
    n = vectors.select(F.col(id_col).alias("nid"), F.col(vec_col).alias("nv"))
    scored = (
        q.join(n, F.col("qid") != F.col("nid"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("nid"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "nid", F.round(F.col("cos"), 3).alias("cosine"), "rank")
    )


def random_hyperplanes(dim: int, n_planes: int, seed: int = 42) -> list[list[float]]:
    """Deterministic signed hyperplanes for LSH signatures (fixed seed)."""
    rng = np.random.default_rng(seed)
    return [[float(x) for x in row] for row in rng.standard_normal((n_planes, dim))]


def lsh_signature(vec_col: str, planes: list[list[float]]) -> F.Column:
    """Bit signature: bit i = 1 iff dot(vec, plane_i) > 0. Returns a long."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        d = dot(F.col(vec_col), F.array(*[F.lit(x) for x in plane]))
        sig = sig + F.when(d > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
    return sig


def lsh_bucketed_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim: int,
    n_planes: int = 8,
    min_cosine: float = 0.4,
    seed: int = 42,
) -> DataFrame:
    """Scale-path near-neighbor pairs: bucket by hyperplane signature, then
    exact cosine only within buckets.

    At 100 TB the all-pairs join is impossible; this shuffles once on the
    signature (16..64 buckets per plane count, tune n_planes so buckets fit
    in an executor), and the quadratic blowup is confined to each bucket.
    Recall < 1.0 by construction (pairs split across buckets are missed) —
    raise recall with multiple signature tables (repeat with different
    seeds, union, dropDuplicates).
    """
    planes = random_hyperplanes(dim, n_planes, seed)
    sig = df.select(
        F.col(id_col), F.col(vec_col), lsh_signature(vec_col, planes).alias("bucket")
    )
    a = sig.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"), F.col("bucket")
    )
    b = sig.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"), F.col("bucket")
    )
    cos = cosine(F.col("va"), F.col("vb"))
    return (
        a.join(b, ["bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cos)
        .filter(F.col("cos") >= min_cosine)
        .select("id_a", "id_b", F.round(F.col("cos"), 3).alias("cosine"))
    )
